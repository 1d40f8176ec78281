package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed co-located joins: layout on disk, Exchange-free plan, parity. */
class BucketingSpec extends SparkTestBase {

  private def sortExecs(plan: String): Int =
    plan.linesIterator.count(_.matches(".*[+*:]- Sort \\[.*"))

  test("materialize writes one file per bucket") {
    val n = 8
    Bucketing.bucketedTable(spark, sfDir, "orders", Seq("o_orderkey"), n)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_buckets/" +
      s"${Bucketing.tableName(sfDir, "", s"o_orderkey@$n")}/orders"
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-"))
    assert(files.length == n,
      s"expected $n bucket files, got ${files.map(_.getName).mkString(", ")}")
  }

  test("bucketed join: no Exchange, no Sort, rows match the plain join") {
    val n = 8
    val orders = Bucketing.bucketedTable(spark, sfDir, "orders", Seq("o_orderkey"), n)
    val lineitem = Bucketing.bucketedTable(spark, sfDir, "lineitem", Seq("l_orderkey"), n)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // since Spark 3.0 a bucketed scan reports its sortBy order only under
    // this conf (unsafe with >1 file per bucket; materialize() guarantees
    // exactly one, which is the case the conf exists for)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val j = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("l_quantity"))
      val got = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-located join should not shuffle either side:\n$plan")
      assert(sortExecs(plan) == 0,
        s"one-file-per-bucket sorted scans should elide SortExec:\n$plan")

      val plainO = spark.read.parquet(s"$sfDir/orders.parquet")
      val plainL = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val want = plainO.join(plainL, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("l_quantity"))
        .collect()
      assert(got.map(_.toString).sorted.toSeq == want.map(_.toString).sorted.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("partitioned table: selective filter prunes directories at plan time") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.sources.EventTime.toEpochNanos(
        spark.read.parquet(s"$sfDir/events.parquet"), "ts")
      .withColumn("event_date", to_date(timestamp_micros((col("ts") / 1000L).cast("long"))))
    val table = Bucketing.tableName(sfDir, "events_bydate")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_buckets/" +
      s"${Bucketing.tableName(sfDir, "")}/events_bydate"
    Bucketing.materializePartitioned(spark, table, events, Seq("event_date"), path)

    val day = spark.table(table).select(max("event_date")).collect()(0).getDate(0)
    val q = spark.table(table).filter(col("event_date") === lit(day))
      .select("event_id", "user_id")
    val got = q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"date filter should prune partitions:\n$plan")
    // the filter must NOT appear as a post-scan Filter — pruning is
    // directory-level, before any file is opened
    assert(!plan.linesIterator.exists(_.matches(".*[+*:]- Filter .*event_date.*")),
      s"partition filter leaked into a row-level Filter:\n$plan")
    val want = events.filter(col("event_date") === lit(day))
      .select("event_id", "user_id").collect()
    assert(got.map(_.toString).sorted.toSeq == want.map(_.toString).sorted.toSeq)
    assert(got.nonEmpty)
  }

  test("SPARQL star joins over a bucketed lake plan Exchange-free") {
    // the federated engine composes with the layout: a catalog whose
    // loader serves bucketed tables gets co-located star-to-star joins —
    // template-built join vars carry raw key columns (__k_*), which are
    // projections of the bucketed columns, so the scan's HashPartitioning
    // survives into the join
    import graft.api.{Graft, TpchCatalog}
    val n = 8
    val cust = Bucketing.bucketedTable(spark, sfDir, "customer", Seq("c_custkey"), n)
    val ords = Bucketing.bucketedTable(spark, sfDir, "orders", Seq("o_custkey"), n)
    val g = new Graft(TpchCatalog.catalog, {
      case "customer" => cust
      case "orders"   => ords
      case t          => spark.read.parquet(s"$sfDir/$t.parquet")
    })(spark)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = g.sparql(
        """PREFIX g: <urn:g:>
          |SELECT ?name ?tp WHERE {
          |  ?c a g:Customer ; g:name ?name .
          |  ?o g:customer ?c ; g:totalprice ?tp .
          |}""".stripMargin)
      val got = q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed star join should not shuffle:\n$plan")
      // parity against the plain-parquet engine
      val plain = graft.api.Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)
        .sparql("""PREFIX g: <urn:g:>
          |SELECT ?name ?tp WHERE {
          |  ?c a g:Customer ; g:name ?name .
          |  ?o g:customer ?c ; g:totalprice ?tp .
          |}""".stripMargin).collect()
      assert(got.map(_.toString).sorted.toSeq == plain.map(_.toString).sorted.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("config-declared bucketBy layout: whole engine joins Exchange-free") {
    implicit val s = spark
    val config =
      s"""{
         |  "datasources": [
         |    {"table": "customer", "type": "parquet",
         |     "url": "$sfDir/customer.parquet",
         |     "bucketBy": {"keys": ["c_custkey"], "buckets": 8}},
         |    {"table": "orders", "type": "parquet",
         |     "url": "$sfDir/orders.parquet",
         |     "bucketBy": {"keys": ["o_custkey"], "buckets": 8}}
         |  ],
         |  "molecules": [
         |    {"type": "urn:g:Customer", "table": "customer",
         |     "subject": "urn:g:cust:{c_custkey}",
         |     "predicates": [{"predicate": "urn:g:name", "column": "c_name"}]},
         |    {"type": "urn:g:Order", "table": "orders",
         |     "subject": "urn:g:order:{o_orderkey}",
         |     "predicates": [
         |       {"predicate": "urn:g:customer", "template": "urn:g:cust:{o_custkey}"},
         |       {"predicate": "urn:g:totalprice", "column": "o_totalprice"}]}
         |  ]
         |}""".stripMargin
    val loaded = graft.api.GraftConfig.parse(config)
    assert(loaded.bucketed == Map(
      "customer" -> graft.api.GraftConfig.BucketLayout(
        Seq("c_custkey"), 8, s"$sfDir/customer.parquet"),
      "orders" -> graft.api.GraftConfig.BucketLayout(
        Seq("o_custkey"), 8, s"$sfDir/orders.parquet")))
    val g = loaded.graft
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = g.sparql(
        """PREFIX g: <urn:g:>
          |SELECT ?name ?tp WHERE {
          |  ?c a g:Customer ; g:name ?name .
          |  ?o g:customer ?c ; g:totalprice ?tp . }""".stripMargin)
      val n = q.count()
      assert(n > 0)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"config-declared co-location should kill the join shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("re-materialization in the same session is free (idempotence guard)") {
    // assert the BEHAVIOR (no rewrite: file mtimes untouched, no new
    // files), not a wall-clock bound — a latency assertion flaked at
    // 1644 ms on a noisy host whose calib drifted 2x (round-8 forensics)
    Bucketing.bucketedTable(spark, sfDir, "orders", Seq("o_orderkey"), 8)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_buckets/" +
      s"${Bucketing.tableName(sfDir, "", "o_orderkey@8")}/orders"
    def snapshot() = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = snapshot()
    Bucketing.bucketedTable(spark, sfDir, "orders", Seq("o_orderkey"), 8)
    assert(snapshot() == before,
      "cached re-materialization must not touch the layout files")
  }

  test("distinct (dir, layout) pairs cannot alias to one table") {
    // "Aa" and "BB" collide under 32-bit String.hashCode — the md5 tag
    // must keep them apart (a collision here silently serves one
    // dataset's buckets for the other's query)
    assert("Aa".hashCode == "BB".hashCode)
    assert(Bucketing.tableName("Aa", "t") != Bucketing.tableName("BB", "t"))
    assert(Bucketing.tableName("d", "t", "k@8") != Bucketing.tableName("d", "t", "k@16"))
  }

  test("marker pins the source identity: a different table at the same path rewrites") {
    val s = spark
    import s.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_marker_identity_" +
      System.nanoTime()
    val dfA = Seq((1L, "a")).toDF("k", "v")
    val dfB = Seq((2L, "b"), (3L, "c")).toDF("k", "v")
    Bucketing.materialize(spark, Bucketing.tableName("dirA", "t", "k@2"),
      dfA, Seq("k"), 2, path)
    // same pinned path, DIFFERENT source identity (table name differs):
    // the marker must NOT vouch for dirA's files — dirB rewrites
    val s2 = spark.newSession()
    val tableB = Bucketing.tableName("dirB", "t", "k@2")
    Bucketing.materialize(s2, tableB, dfB, Seq("k"), 2, path)
    assert(s2.table(tableB).count() == 2, "stale layout served for a different source")
  }

  test("cross-session reuse: a second session re-registers, never rewrites") {
    val n = 8
    Bucketing.bucketedTable(spark, sfDir, "nation", Seq("n_nationkey"), n)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_buckets/" +
      s"${Bucketing.tableName(sfDir, "", s"n_nationkey@$n")}/nation"
    val before = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified).toMap
    assert(before.nonEmpty)
    // a new session has its own done-guard entry, so materialize runs
    // again — the layout marker must route it to re-registration of the
    // existing files, not a second ingest shuffle
    val s2 = spark.newSession()
    val df2 = Bucketing.bucketedTable(s2, sfDir, "nation", Seq("n_nationkey"), n)
    assert(df2.count() ==
      spark.read.parquet(s"$sfDir/nation.parquet").count())
    val after = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified).toMap
    assert(after == before, "second session rewrote the layout")
  }

  test("compact crash between renames leaves a MARKED tmp: recovery re-registers") {
    val s = spark
    import s.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_compact_crash_" +
      System.nanoTime()
    val table = Bucketing.tableName("crashdir", "t", "k@2")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    Bucketing.materialize(spark, table, df, Seq("k"), 2, path)
    val markerFile = new java.io.File(path, "_GRAFT_LAYOUT")
    val markerContent = java.nio.file.Files.readString(markerFile.toPath)

    Bucketing.crashBetweenRenames = true
    try {
      val ex = intercept[java.io.IOException] {
        Bucketing.compactInPlace(spark, table, Seq("k"), 2, path)
      }
      assert(ex.getMessage.contains("injected crash"))
    } finally Bucketing.crashBetweenRenames = false

    // the crash state: current moved aside to .bak, tmp complete — and tmp
    // must ALREADY carry the layout marker (the fix under test); an
    // unmarked-but-complete layout would be silently rebuilt from source
    // on the next materialize, dropping appends
    val tmp = new java.io.File(path + ".graft_compact_tmp")
    val bak = new java.io.File(path + ".graft_compact_bak")
    assert(!new java.io.File(path).exists() && tmp.exists() && bak.exists())
    val tmpMarker = new java.io.File(tmp, "_GRAFT_LAYOUT")
    assert(tmpMarker.exists(), "tmp layout installed without its marker")
    assert(java.nio.file.Files.readString(tmpMarker.toPath) == markerContent,
      "compaction must preserve the layout identity")

    // recovery = completing the interrupted swap: install tmp as current
    assert(tmp.renameTo(new java.io.File(path)))
    val recovered = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified).toMap
    // a fresh session's materialize must take the register fast path over
    // the recovered directory (marker match), never a rebuild
    val s2 = spark.newSession()
    Bucketing.materialize(s2, table, df, Seq("k"), 2, path)
    assert(s2.table(table).count() == 3)
    val post = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified).toMap
    assert(post == recovered, "recovered marked layout was rebuilt, not re-registered")
  }
}
