package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.mapping.Template

/** Property-style tests for the pure (non-Spark) layers, using ScalaCheck
  * generators sampled directly (no scalatest-plus bridge in the offline
  * dependency set). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (1 to n).flatMap(_ => g.sample)

  private val colValue: Gen[String] = Gen.chooseNum(0L, Long.MaxValue).map(_.toString)

  test("single-column template: build∘invert is identity") {
    val t = Template("urn:g:cust:{c_custkey}")
    samples(colValue).foreach { v =>
      assert(t.invert(s"urn:g:cust:$v") == Some(List("c_custkey" -> v)))
    }
  }

  test("multi-column template roundtrip with separator") {
    val t = Template("urn:g:line:{a}_{b}")
    samples(Gen.zip(colValue, colValue)).foreach { case (x, y) =>
      assert(t.invert(s"urn:g:line:${x}_$y") == Some(List("a" -> x, "b" -> y)))
    }
  }

  test("invert rejects values from other templates") {
    samples(colValue).foreach { v =>
      assert(Template("urn:g:cust:{k}").invert(s"urn:g:part:$v").isEmpty)
    }
  }

  test("signature equality is prefix-structure equality") {
    samples(Gen.zip(Gen.identifier, Gen.identifier), 100).foreach { case (c1, c2) =>
      assert(Template(s"urn:g:x:{$c1}").signature == Template(s"urn:g:x:{$c2}").signature)
      assert(Template(s"urn:g:x:{$c1}").signature != Template(s"urn:g:y:{$c2}").signature)
    }
  }

  test("parser: integer literal datatypes over the full range") {
    import graft.parser.SparqlParser
    import graft.algebra._
    samples(Gen.chooseNum(-1000000, 1000000), 100).foreach { n =>
      val q = SparqlParser.parseUnsafe(s"SELECT ?x WHERE { ?x <urn:p> $n }")
      val Pattern.Bgp(List(tp)) = q.pattern: @unchecked
      assert(tp.o == Lit(n.toString, Some(Terms.XsdInt)))
    }
  }

  test("SparqlText: serialize∘parse is identity on generated patterns") {
    import graft.algebra._
    import graft.compiler.SparqlText
    import graft.parser.SparqlParser
    // generator avoids shapes the grammar legitimately normalizes
    // (adjacent BGPs merge into one; stacked FILTERs reorder) — those are
    // semantic no-ops, not serializer bugs
    val genVar: Gen[Term] = Gen.oneOf("a", "b", "c", "d").map(Var(_))
    val genIri: Gen[Term] =
      Gen.oneOf("urn:g:p1", "urn:g:p2", "urn:g:name").map(Iri(_))
    val genLit: Gen[Term] = Gen.oneOf(
      Lit("plain value"), Lit("42", Some(Terms.XsdInt)),
      Lit("bonjour", None, Some("fr")))
    val genTriple = for {
      s <- Gen.oneOf(genVar, genIri)
      p <- genIri
      o <- Gen.oneOf(genVar, genIri, genLit)
    } yield TriplePattern(s, p, o)
    val genBgp: Gen[Pattern] =
      Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genTriple).map(Pattern.Bgp(_)))
    val genFilter: Gen[Pattern] = genBgp.map(b => Pattern.Filter(
      Expr.Cmp(">", Expr.TermRef(Var("a")),
        Expr.TermRef(Lit("5", Some(Terms.XsdInt)))), b))
    def genPattern(depth: Int): Gen[Pattern] =
      if (depth == 0) genBgp
      else Gen.oneOf(
        genBgp, genFilter,
        Gen.zip(genPattern(depth - 1), genPattern(depth - 1))
          .map { case (l, r) => Pattern.Union(l, r) },
        Gen.zip(genBgp, genBgp)
          .map { case (l, r) => Pattern.LeftJoin(l, r, None) })
    samples(genPattern(2), 150).foreach { p =>
      val text = s"SELECT * WHERE { ${SparqlText.pattern(p)} }"
      val parsed = SparqlParser.parseUnsafe(text).pattern
      assert(parsed == p, s"round-trip drifted for:\n$p\nvia\n$text")
    }
  }

  test("BoundedMinPairs: any partition/merge tree equals sorted.take(n)") {
    import graft.pipeline.Sketches
    val genRow: Gen[(String, Long, Long)] =
      Gen.zip(Gen.const("g"), Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 1000L))
        .map { case (g, k, p) => (g, k, p) }
    val genStream = Gen.zip(
      Gen.chooseNum(1, 8),                       // cap n
      Gen.listOfN(120, genRow),                  // the group's rows
      Gen.chooseNum(1, 6))                       // number of partitions
    samples(genStream, 120).foreach { case (n, rows, parts) =>
      val agg = new Sketches.BoundedMinPairs(n)
      // fold each partition independently, then merge in pair order — an
      // arbitrary partitioning of an arbitrary stream
      val buffers = rows.grouped(math.max(1, rows.length / parts))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toList
      val merged = buffers.foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged)
      val want = rows.map(r => (r._2, r._3)).sorted.take(n)
      assert(got == want,
        s"n=$n parts=$parts: $got != $want")
    }
  }

  test("TopKBuffer: offer/merge/serialize equals sort-take-k for any stream") {
    import graft.functions.{TopKBuffer, TopKIds}
    val rnd = new scala.util.Random(131)
    for (_ <- 1 to 120) {
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      // small score domain forces duplicate scores (the tie-break path)
      val rows = (0 until n).map(_ =>
        (rnd.nextInt(6) / 2.0 - 1.0, rnd.nextLong(1000)))
      val want = rows.sortBy { case (s, id) => (-s, id) }.map(_._2).take(k)
      // single-buffer path
      val b = new TopKBuffer(k)
      rows.foreach { case (s, id) => b.offer(s, id) }
      assert(b.sortedIds.toSeq == want, s"k=$k rows=$rows")
      // partitioned + merged path, with a serialization round-trip per
      // partial (exactly what the shuffle does to partial_topk_ids)
      val parts = rows.grouped(math.max(1, n / 3 + 1)).map { chunk =>
        val p = new TopKBuffer(k)
        chunk.foreach { case (s, id) => p.offer(s, id) }
        p
      }.toSeq
      val agg = TopKIds(null, null, k)
      val merged = parts
        .map(p => agg.deserialize(agg.serialize(p)))
        .foldLeft(new TopKBuffer(k))(agg.merge)
      assert(merged.sortedIds.toSeq == want,
        s"merge path diverged: k=$k rows=$rows")
    }
  }
}
