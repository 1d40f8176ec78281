package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for driving the public API during development. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (name <- Seq("doc_boilerplate", "doc_repetition", "sparql_having_distinct")) {
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    graft.SparkEntry.queries("doc_boilerplate")(spark, dir).explain("formatted")
    spark.stop()
  }
}
