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
    for (q <- Seq("sparql_path_zeroorone", "sparql_path_nps")) {
      try {
        val rows = graft.SparkEntry.queries(q)(spark, d).collect()
        println(s"QUERY $q ${rows.length} rows")
        rows.take(6).foreach(r => println(s"ROW $q " + r.toSeq.mkString(" | ")))
      } catch { case e: Throwable =>
        println(s"FAIL $q ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
