package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for driving the public API during development. Default run
  * smokes the driver contract (`SparkEntry.entry` must return rows); pass
  * `--plan <queryName>` to also dump a registered query's executed plan.
  * The data directory comes from arg 0 (default sf0.001).
  *
  * `--stats-probe <sfDir>` measures the snapshot stats layer at scale:
  * commit cost with/without statsCols, then skip effectiveness (files
  * planned with vs without a declared range). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.sliding(2).collect { case Array("--stats-probe", d) => d }
      .foreach { d => statsProbe(spark, d); spark.stop(); return }
    args.sliding(2).collect { case Array("--substr-probe", d) => d }
      .foreach { d => substrProbe(spark, d); spark.stop(); return }
    args.sliding(2).collect { case Array("--plantime-probe", n) => n }
      .foreach { n => planTimeProbe(spark, n.toInt); spark.stop(); return }
    args.sliding(2).collect { case Array("--twopass-probe", d) => d }
      .foreach { d => twoPassProbe(spark, d); spark.stop(); return }
    args.sliding(2).collect { case Array("--jobs-probe", q) => q }
      .foreach { q => jobsProbe(spark, q); spark.stop(); return }
    val sfDir = args.takeWhile(_ != "--plan").headOption
      .getOrElse("/root/testdata/sf0.001")
    val n = graft.SparkEntry.entry(spark).count()
    require(n > 0, "entry() returned no rows — driver smoke contract broken")
    println(s"entry() rows: $n")
    args.sliding(2).collect { case Array("--plan", q) => q }.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }

  /** Per-JOB breakdown of one registered query: description, wall, stage
    * count — the view Profile's aggregate counters can't give when the
    * question is "where do the 50 driver-synchronized jobs go". Data dir
    * from $SPARK_GRAFT_SF_DIR (default sf0.1); runs the query twice and
    * reports the second (warm) run. */
  private def jobsProbe(spark: SparkSession, q: String): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries(q)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.put(e.jobId, System.nanoTime())
        // the result stage's name carries the action's call site — the
        // most attributable label available without operator cooperation
        val desc = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs.put(e.jobId, (desc, 0L, e.stageIds.size))
        order.add(e.jobId)
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(starts.get(e.jobId)).getOrElse(System.nanoTime())
        val (d, _, s) = jobs.getOrDefault(e.jobId, ("?", 0L, 0))
        jobs.put(e.jobId, (d, System.nanoTime() - t0, s))
      }
    }
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"== $q: wall $wall%.2f s, ${jobs.size} jobs ==")
    order.forEach { id =>
      val (d, ns, st) = jobs.get(id)
      println(f"  job $id%3d ${ns / 1e9}%6.3f s stages=$st%2d  ${d.take(110)}")
    }
  }

  private def substrProbe(spark: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val occ = docs.repartition(col("doc_id"))
      .filter(length(col("text")) >= 40)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, CAST(floor((length(text) - 40) / 1) AS INT))," +
          " i -> named_struct('pos', CAST(1 + i AS BIGINT), " +
          "'g', substring(md5(substring(text, 1 + i, 40)), 1, 16)))")).as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.g").as("g"))
    t("occ count")(println(occ.count()))
    t("occ count again")(println(occ.count()))
    val firsts = occ.groupBy("g").agg(count(lit(1)).as("c"),
      min(struct(col("doc_id"), col("pos"))).as("first")).filter(col("c") >= 2)
    t("firsts")(println(firsts.count()))
    val spans = occ.join(firsts, Seq("g"))
      .filter(!(col("doc_id") === col("first.doc_id") &&
        col("pos") === col("first.pos")))
    t("spans join")(println(spans.count()))
    // apportion: same explode but xxhash64 instead of md5
    val occX = docs.repartition(col("doc_id"))
      .filter(length(col("text")) >= 40)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, CAST(floor((length(text) - 40) / 1) AS INT))," +
          " i -> named_struct('pos', CAST(1 + i AS BIGINT), " +
          "'g', xxhash64(substring(text, 1 + i, 40))))")).as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.g").as("g"))
    t("occ xxhash64")(println(occX.count()))
    // and: no per-window hash at all (string key)
    val occS = docs.repartition(col("doc_id"))
      .filter(length(col("text")) >= 40)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, CAST(floor((length(text) - 40) / 1) AS INT))," +
          " i -> named_struct('pos', CAST(1 + i AS BIGINT), " +
          "'g', substring(text, 1 + i, 40)))")).as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.g").as("g"))
    t("occ raw substring")(println(occS.count()))
    t("full spans op")(println(
      graft.pipeline.Dedup.exactSubstrSpans(docs, 40, 1).count()))
    t("spans stride 20")(println(
      graft.pipeline.Dedup.exactSubstrSpans(docs, 40, 20).count()))
    t("full clean op")(println(
      graft.pipeline.Dedup.exactSubstrClean(docs, 40, 1).count()))
    val plan = graft.pipeline.Dedup.exactSubstrSpans(docs, 40, 1)
      .queryExecution.optimizedPlan.toString
    println("substr_window_hashes occurrences in optimized plan: " +
      "substrwindowhashes".r.findAllIn(plan.toLowerCase).size)
  }

  /** Plan-time A/B for the zero-listing manifest index at `n` partition
    * dirs: first-read wall time (plan + count) with `#file` lists vs the
    * same manifest with the lists STRIPPED (parallel-listing fallback).
    * Local FS listing is ~free, so wall-clock UNDERSTATES the remote
    * win; the listing-call counts are the scale-honest metric (each is
    * a blocking RPC on HDFS/object stores). */
  private def planTimeProbe(spark: SparkSession, n: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.pipeline.Lakehouse
    val root = s"/tmp/graft_plantime_$n"
    val p0 = new org.apache.hadoop.fs.Path(root)
    val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p0, true)
    val df = spark.range(0, n.toLong * 4).select(col("id"),
      (col("id") % n).cast("int").as("p"))
    println(s"committing $n partitions…")
    val t0 = System.nanoTime()
    spark.conf.set("graft.lake.commitParallelism", "16")
    Lakehouse.commitSnapshot(spark, root,
      (0 until n).map(i => s"p=$i" -> df.filter(col("p") === i).coalesce(1)),
      statsCols = Seq("id"))
    println(f"commit: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def timeRead(tag: String): Unit = {
      // fresh caches: manifest cache keys on (path,mtime,len) — same
      // file, so warm; what we time is INDEX CONSTRUCTION + planning
      val t1 = System.nanoTime()
      val c = Lakehouse.readSnapshot(spark, root)
        .filter(col("id") >= 0L).count()
      println(f"$tag: first read ${(System.nanoTime() - t1) / 1e9}%.2f s " +
        f"($c rows)")
    }
    timeRead(s"with #file lists   ($n dirs)")
    // strip the #file lines → the pre-r18 manifest shape
    val snap = new org.apache.hadoop.fs.Path(root, "_graft_lake/snap-00000001")
    val in = fs.open(snap)
    val text = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    val stripped = text.linesIterator.filterNot(_.startsWith("#file\t"))
      .mkString("", "\n", "\n")
    fs.delete(snap, false)
    val out = fs.create(snap, true)
    out.write(stripped.getBytes("UTF-8")); out.close()
    timeRead(s"fallback listing   ($n dirs)")
    spark.conf.set("graft.lake.listParallelism", "1")
    timeRead(s"sequential listing ($n dirs)")
    spark.conf.unset("graft.lake.listParallelism")
  }

  /** Shuffle-bytes + wall A/B: single-pass stride-1 exact-substring vs
    * the winnowed two-pass, measured with a stage-metrics listener. */
  private def twoPassProbe(spark: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val shuffleW = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleW.addAndGet(
          e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    def run(tag: String)(f: => Long): Unit = {
      shuffleW.set(0)
      val t0 = System.nanoTime()
      val rows = f
      Thread.sleep(500) // let the listener bus drain stage events
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        f"shuffle ${shuffleW.get() / 1e6}%.1f MB, $rows rows")
    }
    run("warmup            ")(
      graft.pipeline.Dedup.exactSubstrSpans(docs, 40, 1).count())
    for (w <- Seq(40, 80)) {
      run(f"single-pass stride1 w=$w%-3d")(
        graft.pipeline.Dedup.exactSubstrSpans(docs, w, 1).count())
      run(f"two-pass winnowed   w=$w%-3d")(
        graft.pipeline.Dedup.exactSubstrSpansTwoPass(docs, w).count())
      // pass-1 survivor fraction — the knob that decides the 2-pass win
      val anchored = docs.repartition(col("doc_id")).select(col("doc_id"),
        explode(graft.functions.GraftFunctions.winnowed_window_hashes(
          col("text"), w, 8, 16)).as("g"))
      val hot = anchored.groupBy("g").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select("g")
      val surv = anchored.join(hot, Seq("g")).select("doc_id")
        .distinct().count()
      val withSpans = graft.pipeline.Dedup.exactSubstrSpans(docs, w, 1)
        .select("doc_id").distinct().count()
      println(s"w=$w: pass-1 survivors $surv of ${docs.count()} " +
        s"(true dup-span docs: $withSpans)")
    }
  }

  private def statsProbe(spark: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.pipeline.Lakehouse
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (col("doc_id") % 2).cast("int").as("p"))
    def half(p: Int) = docs.filter(col("p") === p)
      .repartitionByRange(16, col("doc_id"))
    def commit(root: String, stats: Seq[String]): Double = {
      val p0 = new org.apache.hadoop.fs.Path(root)
      p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p0, true)
      val t0 = System.nanoTime()
      Lakehouse.commitSnapshot(spark, root,
        Seq("p=0" -> half(0), "p=1" -> half(1)), statsCols = stats)
      (System.nanoTime() - t0) / 1e9
    }
    commit("/tmp/graft_statsprobe_warm", Nil) // JVM/codegen warmup
    val tPlain = commit("/tmp/graft_statsprobe_plain", Nil)
    val tStats = commit("/tmp/graft_statsprobe_stats", Seq("doc_id"))
    val hi = docs.agg(max(col("doc_id"))).head.getLong(0) / 10
    val full = Lakehouse.readSnapshot(spark, "/tmp/graft_statsprobe_stats")
    val pruned = Lakehouse.readSnapshot(spark, "/tmp/graft_statsprobe_stats",
      fileRanges = Seq(Lakehouse.ColRange("doc_id", Some(0L), Some(hi))))
    val t1 = System.nanoTime()
    val nFull = full.filter(col("doc_id") <= hi).count()
    val t2 = System.nanoTime()
    val nPruned = pruned.filter(col("doc_id") <= hi).count()
    val t3 = System.nanoTime()
    println(f"commit plain=${tPlain}%.2fs withStats=${tStats}%.2fs " +
      f"(overhead ${(tStats / tPlain - 1) * 100}%.0f%%)")
    println(s"files full=${full.inputFiles.length} " +
      s"pruned=${pruned.inputFiles.length}")
    println(f"scan full=${(t2 - t1) / 1e9}%.2fs pruned=${(t3 - t2) / 1e9}%.2fs " +
      f"rows $nFull%d == $nPruned%d")
  }
}
