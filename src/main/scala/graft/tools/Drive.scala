package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity}

object Drive {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[time] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    time("warmup")(noop(docs.select(md5(col("text")))))
    val sh = Dedup.withShingles(docs).select(col("doc_id"), col("shingles"))
    time("shingles")(noop(sh))
    val mh = Dedup.withMinhash(sh)
    time("minhash")(noop(mh))
    val bk = Dedup.lshBuckets(mh)
    time("buckets")(noop(bk))
    val cp = Dedup.candidatePairs(bk)
    println("pairs=" + time("candidatePairs")(cp.count()))
    time("verified")(noop(Dedup.verifiedNearDups(docs)))
    time("emb_top_pairs")(noop(Similarity.topSimilarPairs(emb)))
    spark.stop()
  }
}
