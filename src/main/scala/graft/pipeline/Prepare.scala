package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call corpus preparation — the composition a training-data team
  * actually deploys, in the order that minimizes work at 100 TB:
  *
  *   1. quality funnel ([[TextAnalysis.filterFunnel]]) — map-only column
  *      predicates kill the junk tail FIRST, so nothing downstream pays
  *      for documents that were never going to ship;
  *   2. full dedup ([[Dedup.dedupCorpus]]) over the survivors — exact
  *      digest groupBy, then banded near-dup, then components;
  *   3. deterministic split ([[Mixture.splitAssign]]) — the keyed-coin
  *      map over what remains.
  *
  * Cheapest-first staging is the point: the funnel is a predicate scan,
  * dedup's expensive stage (shingle hashing + banding) sees only
  * funnel-surviving, exact-distinct text, and the split costs nothing.
  * Certify the result with [[Mixture.splitLeakage]] — after this call it
  * must be empty at the same threshold, since near-dup components were
  * collapsed before splitting.
  */
object Prepare {

  /** Returns (doc_id, source, split) for the prepared training corpus:
    * quality-passing, exact- and near-dup-free, deterministically split.
    * Every stage is individually oracle-gated; `doc_prepare_corpus`
    * gates the composition end-to-end (funnel rules + dedup closure +
    * split coin recomputed in one SQL chain). */
  def prepareCorpus(docs: DataFrame, valFrac: Double = 0.1,
                    testFrac: Double = 0.1, salt: String = "prep",
                    threshold: Double = 0.7): DataFrame = {
    val kept = docs.join(
      TextAnalysis.filterFunnel(docs).filter(col("keep")).select("doc_id"),
      Seq("doc_id"))
    val deduped = Dedup.dedupCorpus(kept, threshold)
    Mixture.splitAssign(deduped, valFrac, testFrac, salt)
  }

  /** Snapshot diff between two corpus versions — the incremental-curation
    * primitive: a recrawl is not a fresh corpus, it is yesterday's corpus
    * plus `added`, minus `removed`, with `changed` content at surviving
    * ids. One full-outer join on doc_id comparing content digests (md5
    * computed BEFORE the join so text never shuffles — the exact-dedup
    * discipline), emitting only the delta rows; `unchanged` mass stays
    * out of the output, which is what makes the diff affordable when the
    * overlap is 99% of 100 TB. Downstream, `added ∪ changed` is exactly
    * the set the incremental dedup stores ([[Dedup]]'s ingest gate) and
    * the derived-index appends ([[Search.appendToIndex]]) need to see.
    * Output: (doc_id, status ∈ {added, removed, changed}). */
  def corpusDiff(prev: DataFrame, next: DataFrame): DataFrame = {
    val a = prev.select(col("doc_id"), md5(col("text")).as("da"))
    val b = next.select(col("doc_id"), md5(col("text")).as("db"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("da").isNull, "added")
          .when(col("db").isNull, "removed")
          .when(col("da") =!= col("db"), "changed")
          .as("status"))
      .filter(col("status").isNotNull)
  }
}
