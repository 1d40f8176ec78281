package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for driving the public API during development. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val pairs = graft.pipeline.Dedup.simhashNearDups(docs)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGES " + (plan.split("ReusedExchange").length - 1))
    println("EXCHANGES " + (plan.split("Exchange").length - 1))
    println("SIMHASH_EXPRS " + (plan.split("simhashmd5|SimHashMd5").length - 1))
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("SimHashMd5") || l.contains("simhash"))
      .mkString("\n"))
  }
}
