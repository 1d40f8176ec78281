package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: point-lookup PLAN time on a 10³-partition bloom-sidecar lake —
  * the r18 verdict's weak, quantified. Three measured faces:
  * listParallelism=1 emulates the old per-dir sequential sidecar walk,
  * listParallelism=16 is the shipped parallel prefetch, and the warm
  * repeat is the byte-bounded cache (zero sidecar reads). Scratch
  * measurement main (not part of the library surface); results recorded
  * in SCALE.md. */
object BloomPlanAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = args.headOption.map(_.toInt).getOrElse(1000)
    val root = s"/tmp/graft_bloom_ab/lake$dirs"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root, "_graft_lake"))) {
      println(s"building a $dirs-partition bloom lake at $root …")
      val rows = spark.range(0, dirs * 50L, 1, 32)
        .select(col("id"),
          (col("id") % dirs).cast("int").as("p"),
          md5(col("id").cast("string")).as("v"))
      // one commit, every partition its own dir with a _bloom-v sidecar
      graft.pipeline.Lakehouse.commitSnapshot(spark, root,
        (0 until dirs).map(i => s"p=$i" ->
          rows.filter(col("p") === i).coalesce(1)),
        statsCols = Seq("id"), bloomCols = Seq("v"))
      println("built.")
    }
    val probe = "no-such-value-anywhere"
    def planOnce(label: String): Unit = {
      val t0 = System.nanoTime()
      // executedPlan forces FileIndex.listFiles (sidecar resolution)
      // without running the scan — pure plan-time cost
      val df = graft.pipeline.Lakehouse.readSnapshot(spark, root)
        .filter(col("v") === probe)
      val n = df.count() // includes execution; plan dominates at 0 rows
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label: $secs%.2f s  (rows=$n)")
    }
    spark.conf.set("graft.lake.listParallelism", "1")
    graft.pipeline.Lakehouse.bloomCache.clear()
    planOnce("sequential sidecar walk (par=1, cold)")
    spark.conf.set("graft.lake.listParallelism", "16")
    graft.pipeline.Lakehouse.bloomCache.clear()
    planOnce("parallel prefetch      (par=16, cold)")
    planOnce("warm repeat            (cache, 0 reads)")
    spark.stop()
  }
}
