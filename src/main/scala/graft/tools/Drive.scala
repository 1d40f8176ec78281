package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for driving the public API during development. Default run
  * smokes the driver contract (`SparkEntry.entry` must return rows); pass
  * `--plan <queryName>` to also dump a registered query's executed plan.
  * The data directory comes from arg 0 (default sf0.001). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
}
