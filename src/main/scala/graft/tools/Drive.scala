package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

object Drive {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[time] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    val sh = Dedup.withShingles(docs).select(col("doc_id"), col("shingles"))
    (1 to 3).foreach(i => time(s"sh$i")(noop(sh)))
    val bandsOnly = sh.withColumn("__bands",
      graft.functions.GraftFunctions.minhash_bands(col("shingles"), 32, 8))
      .select(col("doc_id"), col("__bands"))
    (1 to 3).foreach(i => time(s"bandsOnly$i")(noop(bandsOnly)))
    val bk = Dedup.lshBuckets(sh)
    (1 to 2).foreach(i => time(s"buckets$i")(noop(bk)))
    bk.explain("formatted")
    spark.stop()
  }
}
