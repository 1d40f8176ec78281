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
    val rows = graft.SparkEntry.queries("emb_knn_ivfpq")(spark, "/root/testdata/sf0.01")
      .collect()
    println("HITS " + rows.map(r => s"(${r.getLong(0)},${r.getLong(1)})").mkString(","))
    rows.foreach(r => println("ROW " + r.toSeq.mkString(" | ")))
    spark.stop()
  }
}
