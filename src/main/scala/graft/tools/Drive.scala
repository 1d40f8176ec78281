package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // A/B: 500-term blocklist — Aho–Corasick single pass (native
    // expression) vs an OR-chain of contains() (one text rescan per term)
    val terms = (0 until 500).map(i => f"term$i%03dx") ++
      Seq("slow", "merge", "fingerprint")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label: median ${ts(2)}%.3f s (${ts.mkString(", ")})")
    }
    time("aho-corasick") {
      docs.select(sum(graft.functions.GraftFunctions.blocklist_terms(
        lower(col("text")), terms))).head()
    }
    // a left-nested 503-term OR-chain overflows the stack at PLAN time;
    // balance the tree so the comparison measures execution, not planning
    def balanced(cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cols.size == 1) cols.head
      else balanced(cols.grouped(2).map(g =>
        if (g.size == 2) g(0) + g(1) else g(0)).toSeq)
    time("or-chain sum") {
      docs.select(sum(balanced(terms.map(t =>
        when(lower(col("text")).contains(t), 1L).otherwise(0L))))).head()
    }
    spark.stop()
  }
}
