package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene pass that flags
  * corpus documents sharing verbatim k-grams with an evaluation/benchmark
  * suite, so test data never leaks into a training set.
  *
  * Scale shape: the benchmark side is small by construction (eval suites
  * are thousands of documents, the corpus is the 100 TB side), so its
  * distinct k-gram id set broadcasts; the corpus streams once, map-only,
  * through shingling ([[graft.functions.ShingleIds]], codegen'd 64-bit
  * gram ids — grams never shuffle as strings) and a broadcast semi-join,
  * then one aggregation keyed on doc_id. No corpus-side shuffle carries
  * more than (doc_id, gram_id) for the *matching* grams.
  */
object Decontaminate {

  /** Corpus documents sharing ≥1 distinct k-gram with the benchmark, with
    * the matched-gram count as contamination evidence.
    * Output: (doc_id, n_matched_grams). */
  def flagged(corpus: DataFrame, benchmark: DataFrame, k: Int = 5): DataFrame = {
    val corpusGrams = Dedup.withShingles(corpus, k)
      .select(col("doc_id"), explode(col("shingles")).as("g"))
    val benchGrams = Dedup.withShingles(benchmark, k)
      .select(explode(col("shingles")).as("g")).distinct()
    corpusGrams.join(broadcast(benchGrams), Seq("g"), "inner")
      .groupBy("doc_id")
      .agg(count_distinct(col("g")).as("n_matched_grams"))
  }
}
