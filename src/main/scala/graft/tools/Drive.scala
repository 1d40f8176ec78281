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
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("doc_mixture_sample", "doc_filter_funnel", "doc_rarity")) {
      println(s"===== $q")
      println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan
        .toString.linesIterator.filter(s =>
          s.contains("ReadSchema") || s.contains("PushedFilters") ||
            s.contains("Exchange") || s.contains("Scan")).mkString("\n"))
    }
    spark.stop()
  }
}
