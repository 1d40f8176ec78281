package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for driving the public API during development. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the driver's smoke contract: entry() on sf0.001 must return rows
    val e = graft.SparkEntry.entry(spark)
    e.explain("formatted")
    println("entry rows=" + e.count())
    spark.stop()
  }
}
