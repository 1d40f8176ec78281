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

  /** The benchmark's distinct k-gram ids as a driver-side array — bounded
    * by construction (eval suites are small), for shipping into the
    * streaming filter as a literal. */
  def benchmarkGramIds(benchmark: DataFrame, k: Int = 5): Array[Long] =
    Dedup.withShingles(benchmark, k)
      .select(explode(col("shingles")).as("g")).distinct()
      .collect().map(_.getLong(0)).sorted

  /** Streaming face of [[flagged]]: drop documents sharing any verbatim
    * k-gram with the benchmark as they arrive. The gram-id set rides the
    * plan as a literal array, so the filter is STATELESS — works on
    * unbounded streams with zero state store, no watermark needed. */
  def decontaminatedStream(docs: DataFrame, benchGramIds: Array[Long],
                           k: Int = 5): DataFrame =
    docs.filter(size(array_intersect(
      graft.functions.GraftFunctions.shingle_ids(col("text"), k),
      typedLit(benchGramIds.toSeq))) === 0)
}
