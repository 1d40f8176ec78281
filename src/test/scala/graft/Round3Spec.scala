package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.api.{Graft, TpchCatalog}
import graft.mapping._

/** Round-3 compiler fixes: deep-chain closures (no silent truncation), lazy
  * ASK, DISTINCT aggregate modifiers, DESCRIBE term-map serialization. */
class Round3Spec extends SparkTestBase {

  lazy val g: Graft = Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)

  /** 31-node linked list 0→1→…→30 — deeper than the old 20-round cap. */
  private def chainGraft: Graft = {
    val s = spark
    import s.implicits._
    val chain = (0 until 30).map(i => (i.toLong, i + 1L)).toDF("id", "next")
    val cat = Catalog(List(Molecule(
      rdfType = "urn:t:Node",
      table = "chain",
      subject = Template("urn:t:n:{id}"),
      predicates = Map("urn:t:next" -> TemplateMap(Template("urn:t:n:{next}"))))))
    new Graft(cat, _ => chain)(spark)
  }

  test("closure converges past 20 hops (30-deep chain, full pair set)") {
    val rows = chainGraft.sparql(
      "SELECT ?x ?y WHERE { ?x <urn:t:next>+ ?y }").count()
    // 31 nodes in a line: every ordered ancestor/descendant pair
    assert(rows == 31L * 30 / 2)
  }

  test("doubling reaches depths far beyond the iteration cap: 200-deep chain") {
    // pure semi-naive could NEVER finish this under the default 50-round
    // cap (diameter 200); the hybrid's doubling phase covers it in
    // ~4 + log2(200/5) ≈ 10 rounds. 201 nodes in a line → every ordered
    // ancestor/descendant pair.
    val s = spark
    import s.implicits._
    val chain = (0 until 200).map(i => (i.toLong, i + 1L)).toDF("id", "next")
    val cat = Catalog(List(Molecule(
      rdfType = "urn:t:Node",
      table = "chain",
      subject = Template("urn:t:n:{id}"),
      predicates = Map("urn:t:next" -> TemplateMap(Template("urn:t:n:{next}"))))))
    val gc = new Graft(cat, _ => chain)(spark)
    val rows = gc.sparql(
      "SELECT ?x ?y WHERE { ?x <urn:t:next>+ ?y }").count()
    assert(rows == 201L * 200 / 2)
    // seeded reach deeper than the BFS round cap (50): falls back to the
    // doubling closure instead of failing — previously impossible
    assert(gc.sparql(
      "SELECT ?y WHERE { <urn:t:n:0> <urn:t:next>+ ?y }").count() == 200)
  }

  test("seeded BFS converges past 20 hops and a too-low cap throws loudly") {
    val gc = chainGraft
    assert(gc.sparql(
      "SELECT ?y WHERE { <urn:t:n:0> <urn:t:next>+ ?y }").count() == 30)
    spark.conf.set("graft.path.maxIters", "5")
    try {
      val ex = intercept[IllegalStateException] {
        gc.sparql("SELECT ?y WHERE { <urn:t:n:0> <urn:t:next>+ ?y }").count()
      }
      assert(ex.getMessage.contains("did not converge"))
      val ex2 = intercept[IllegalStateException] {
        gc.sparql("SELECT ?x ?y WHERE { ?x <urn:t:next>+ ?y }").count()
      }
      assert(ex2.getMessage.contains("did not converge"))
    } finally spark.conf.unset("graft.path.maxIters")
  }

  test("ASK compiles lazily: no Spark job until the caller acts") {
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    // warm the table loader first: the initial parquet footer read is a
    // (legitimate) job that belongs to the scan setup, not to ASK
    g.sparql("PREFIX g: <urn:g:> SELECT ?seg WHERE { ?c g:mktsegment ?seg }")
    Thread.sleep(300)
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = g.sparql(
        "PREFIX g: <urn:g:> ASK { ?c g:mktsegment \"BUILDING\" }")
      Thread.sleep(500) // listener bus is async; give a phantom job time to show
      assert(jobs == 0, "ASK ran a Spark job at compile time")
      assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true))
      val dfNo = g.sparql(
        "PREFIX g: <urn:g:> ASK { ?c g:mktsegment \"NO_SUCH_SEGMENT\" }")
      assert(dfNo.collect().map(_.getBoolean(0)).toSeq == Seq(false))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("AVG(DISTINCT) averages the distinct multiset") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT (AVG(DISTINCT ?b) AS ?a) WHERE { ?c a g:Customer ; g:acctbal ?b }""".stripMargin)
      .collect().head.getDouble(0)
    val expected = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_acctbal")).distinct()
      .agg(avg("c_acctbal")).collect().head.getDouble(0)
    assert(math.abs(got - expected) < 1e-9)
  }

  test("COUNT(DISTINCT *) counts distinct solutions (null-safe)") {
    val distinctSegs = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT (COUNT(DISTINCT *) AS ?n) WHERE {
        |  { SELECT ?seg WHERE { ?c g:mktsegment ?seg } } }""".stripMargin)
      .collect().head.getLong(0)
    assert(distinctSegs == 5) // TPC-H market segments
    // with the unique subject in scope every solution is distinct
    val all = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT (COUNT(DISTINCT *) AS ?n) WHERE { ?c g:mktsegment ?seg }""".stripMargin)
      .collect().head.getLong(0)
    assert(all == spark.read.parquet(s"$sfDir/customer.parquet").count())
  }

  test("subquery as a UNION branch parses and unions with the other side") {
    val segs = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?seg WHERE {
        |  { SELECT ?seg WHERE { ?c g:mktsegment ?seg } LIMIT 3 }
        |  UNION
        |  { ?s a g:Supplier . BIND("SUPPLIER" AS ?seg) FILTER(?s = <urn:g:supp:1>) }
        |} """.stripMargin).collect().map(_.getString(0))
    assert(segs.length == 4 && segs.count(_ == "SUPPLIER") == 1)
    // subquery as the *second* branch too
    val rev = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?seg WHERE {
        |  { ?s a g:Supplier . BIND("SUPPLIER" AS ?seg) FILTER(?s = <urn:g:supp:1>) }
        |  UNION
        |  { SELECT ?seg WHERE { ?c g:mktsegment ?seg } LIMIT 3 }
        |} """.stripMargin).collect().map(_.getString(0))
    assert(rev.length == 4 && rev.count(_ == "SUPPLIER") == 1)
  }

  test("DESCRIBE serializes by term map: IRI-looking literals stay quoted") {
    val s = spark
    import s.implicits._
    // `link` values match the scheme:rest IRI shape but are RefMap literals
    val things = Seq((1L, "mailto:a@b.example", 2L))
      .toDF("id", "link", "peer")
    val cat = Catalog(List(Molecule(
      rdfType = "urn:t:Thing",
      table = "things",
      subject = Template("urn:t:thing:{id}"),
      predicates = Map(
        "urn:t:contact" -> RefMap("link"),
        "urn:t:peer" -> TemplateMap(Template("urn:t:thing:{peer}"))))))
    val gd = new Graft(cat, _ => things)(spark)
    val rows = gd.sparql("DESCRIBE <urn:t:thing:1>")
      .collect().map(r => (r.getString(1), r.getString(2))).toMap
    assert(rows("<urn:t:contact>") == "\"mailto:a@b.example\"")
    assert(rows("<urn:t:peer>") == "<urn:t:thing:2>")
    assert(rows("<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>") == "<urn:t:Thing>")
  }

  test("CONSTRUCT and DESCRIBE escape literal quotes/backslashes/newlines") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "say \"hi\"\nback\\slash")).toDF("id", "note")
    val cat = Catalog(List(Molecule(
      rdfType = "urn:t:Doc",
      table = "docs",
      subject = Template("urn:t:doc:{id}"),
      predicates = Map("urn:t:note" -> RefMap("note")))))
    val gd = new Graft(cat, _ => docs)(spark)
    val o = gd.sparql(
      "CONSTRUCT { ?d <urn:t:note> ?n } WHERE { ?d <urn:t:note> ?n }")
      .collect().head.getString(2)
    assert(o == "\"say \\\"hi\\\"\\nback\\\\slash\"", o)
    val d = gd.sparql("DESCRIBE <urn:t:doc:1>")
      .collect().map(r => (r.getString(1), r.getString(2))).toMap
    assert(d("<urn:t:note>") == "\"say \\\"hi\\\"\\nback\\\\slash\"")
  }
}
