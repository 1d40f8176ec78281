package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.api.{Graft, TpchCatalog}

/** Round-4 compiler fixes: lazy disjoint-domain EXISTS (no job at compile
  * time), and the MINUS vs NOT-EXISTS no-shared-vars semantic split. */
class Round4Spec extends SparkTestBase {

  lazy val g: Graft = Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)

  test("disjoint-domain FILTER EXISTS compiles lazily and evaluates correctly") {
    // warm the table loader for BOTH tables: parquet footer reads are
    // scan-setup jobs, not compile-time evaluation
    g.sparql("PREFIX g: <urn:g:> SELECT ?r WHERE { ?r a g:Region }").collect()
    g.sparql("PREFIX g: <urn:g:> SELECT ?n WHERE { ?n a g:Nation }").collect()
    Thread.sleep(300)
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // probe pattern shares no variable with the outer pattern
      val df = g.sparql(
        """PREFIX g: <urn:g:>
          |SELECT ?rn WHERE { ?r a g:Region ; g:name ?rn
          |  FILTER EXISTS { ?n a g:Nation } }""".stripMargin)
      Thread.sleep(500) // listener bus is async
      assert(jobs == 0, "disjoint-domain EXISTS ran a Spark job at compile time")
      assert(df.count() == 5) // nations exist => keep all 5 regions
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("disjoint-domain NOT EXISTS drops all rows iff the probe has solutions") {
    val nonEmptyProbe = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?rn WHERE { ?r a g:Region ; g:name ?rn
        |  FILTER NOT EXISTS { ?n a g:Nation } }""".stripMargin)
    assert(nonEmptyProbe.count() == 0) // nations exist => NOT EXISTS is false everywhere
    val emptyProbe = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?rn WHERE { ?r a g:Region ; g:name ?rn
        |  FILTER NOT EXISTS { ?n a g:Nation ; g:name "NO_SUCH_NATION" } }""".stripMargin)
    assert(emptyProbe.count() == 5) // empty probe => keep everything
  }

  test("SERVICE scopes to the named source; SILENT failures yield the unit solution") {
    // supplier lives in srcB: asking srcC for it non-silently is an error
    val ex = intercept[Exception] {
      g.sparql(
        """PREFIX g: <urn:g:>
          |SELECT ?s WHERE { SERVICE <urn:g:src:nosuch> { ?s a g:Supplier } }""".stripMargin)
    }
    assert(ex.getMessage.contains("no molecules registered"))
    // SILENT on an unknown source = unit solution: outer rows unaffected
    val silent = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?rn WHERE { ?r a g:Region ; g:name ?rn
        |  SERVICE SILENT <urn:g:src:nosuch> { ?x a g:Supplier } }""".stripMargin)
    assert(silent.count() == 5)
    // scoped join across two services on a shared template variable
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?sname ?nname WHERE {
        |  SERVICE <urn:g:src:srcB> { ?s a g:Supplier ; g:name ?sname ; g:nation ?n }
        |  SERVICE <urn:g:src:srcC> { ?n a g:Nation ; g:name ?nname }
        |}""".stripMargin)
    val want = spark.read.parquet(s"$sfDir/supplier.parquet")
      .join(spark.read.parquet(s"$sfDir/nation.parquet"),
        org.apache.spark.sql.functions.col("s_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
    assert(got.count() == want.count() && got.count() > 0)
  }

  test("disjoint-domain MINUS removes nothing (SPARQL dom-disjointness rule)") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?rn WHERE { { ?r a g:Region ; g:name ?rn }
        |  MINUS { ?n a g:Nation } }""".stripMargin)
    assert(got.count() == 5)
  }
}
