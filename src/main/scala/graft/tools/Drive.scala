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
