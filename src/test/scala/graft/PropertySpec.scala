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
}
