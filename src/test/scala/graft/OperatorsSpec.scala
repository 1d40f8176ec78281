package graft

import org.apache.spark.sql.functions._
import graft.operators.BindJoin
import graft.api.{Graft, TpchCatalog}

class OperatorsSpec extends SparkTestBase {

  def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
  lazy val g: Graft = Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)

  test("bind join batches IN-lists and matches the plain join") {
    val left = t("customer").filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("k"), col("c_name"))
    var batches = 0
    val joined = BindJoin(left, Seq("k"), { keys =>
      batches += 1
      assert(keys.size <= 20)
      // simulates a remote SQL source receiving the IN-list as constants
      val in = keys.map(_.getLong(0))
      t("orders").filter(col("o_custkey").isin(in: _*))
        .select(col("o_custkey").as("k"), col("o_orderkey"))
    }, windowSize = 20)
    val expected = left.join(
      t("orders").select(col("o_custkey").as("k"), col("o_orderkey")), Seq("k"))
    assert(joined.count() == expected.count() && joined.count() > 0)
    val distinctKeys = left.select("k").distinct().count()
    assert(batches == math.ceil(distinctKeys / 20.0).toInt)
  }

  test("adaptive bind-join window: batch count FLIPS with build size — " +
    "a selective build pays ONE round trip, a huge build batches at the " +
    "page-filling width, a pinned window still wins") {
    import graft.operators.BindJoin.adaptiveWindow
    // the model: min(nKeys, clamp(20, pageSize/fanout, MaxWindow))
    assert(adaptiveWindow(5) == 5)              // few keys → one batch
    assert(adaptiveWindow(400) == 400)          // still one batch
    assert(adaptiveWindow(100000) == 512)       // MaxWindow caps the width
    assert(adaptiveWindow(100000, pageSize = 800) == 200) // page bound binds
    assert(adaptiveWindow(100, pageSize = 40) == 20) // floor: ref's 20
    assert(adaptiveWindow(3, pageSize = 40) == 3)
    def run(nKeys: Int, window: Int = 0): Int = {
      var batches = 0
      val left = spark.range(nKeys).select(col("id").as("k"))
      BindJoin(left, Seq("k"), { ks =>
        batches += 1
        spark.range(nKeys).select(col("id").as("k"), (col("id") * 2).as("v"))
      }, windowSize = window).count()
      batches
    }
    assert(run(5) == 1, "5 distinct keys must be ONE remote request")
    assert(run(500) == 1)
    assert(run(6000) == 12, "6000 keys batch at the 512-key width")
    assert(run(6000, window = 20) == 300, "a pinned window is honored")
  }

  test("bind join drives IN-list batches through a live HTTP endpoint") {
    // the reference's flagship composition: NestedHashJoinFilter over a
    // SPARQL endpoint (NestedHashJoinFilter.py:166-234) — selective left
    // bindings travel to the remote side as FILTER IN constants, one
    // endpoint query per windowSize-batch of distinct keys
    val server = new graft.api.GraftServer(g)
    val port = server.start()
    try {
      val endpoint = s"http://127.0.0.1:$port/sparql"
      val left = t("customer").filter(col("c_acctbal") > 7500)
        .select(concat(lit("urn:g:nation:"), col("c_nationkey")).as("n"),
          col("c_name"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("sname",
          org.apache.spark.sql.types.StringType)))
      val requests = new java.util.concurrent.atomic.AtomicInteger(0)
      val joined = BindJoin(left, Seq("n"), { keys =>
        requests.incrementAndGet()
        assert(keys.size <= 10)
        val inList = keys.map(r => "\"" + r.getString(0) + "\"").mkString(", ")
        val rows = graft.sources.SparqlHttp.select(endpoint,
          s"""PREFIX g: <urn:g:>
             |SELECT ?n ?sname WHERE {
             |  ?s a g:Supplier ; g:name ?sname ; g:nation ?nn .
             |  BIND (STR(?nn) AS ?n)
             |  FILTER (?n IN ($inList))
             |} ORDER BY ?n ?sname""".stripMargin, schema)
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), schema)
      }, windowSize = 10)
      val want = left.join(
        t("supplier").select(
          concat(lit("urn:g:nation:"), col("s_nationkey")).as("n"),
          col("s_name").as("sname")), Seq("n"))
      assert(joined.count() == want.count() && joined.count() > 0)
      val distinctKeys = left.select("n").distinct().count()
      assert(requests.get() == math.ceil(distinctKeys / 10.0).toInt,
        s"expected ceil($distinctKeys/10) endpoint batches, got ${requests.get()}")
    } finally server.stop()
  }

  test("property path sequence + inverse desugar to joins") {
    val seq = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?sname ?rname WHERE {
        |  ?s a g:Supplier ; g:name ?sname ; g:nation/g:region/g:name ?rname .
        |}""".stripMargin)
    val want = t("supplier")
      .join(t("nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t("region"), col("n_regionkey") === col("r_regionkey"))
    assert(seq.count() == want.count() && seq.count() > 0)

    val inv = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?cname WHERE {
        |  ?o a g:Order ; g:totalprice ?tp . FILTER (?tp > 400000)
        |  ?c ^g:customer ?o ; g:name ?cname .
        |}""".stripMargin)
    val wantInv = t("orders").filter(col("o_totalprice") > 400000)
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
    assert(inv.count() == wantInv.count() && inv.count() > 0)
  }
}
