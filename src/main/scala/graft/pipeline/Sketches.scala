package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregations — the bounded-state summaries that stand
  * in for full group-bys at corpus scale.
  *
  * [[MisraGries]] is a typed Catalyst `Aggregator` (the §2.12 extension
  * surface for whole-aggregation semantics, as the codegen'd native
  * expressions are for scalars): per-partition summaries of at most k-1
  * counters, merged pairwise with the standard offset-decrement, giving
  * the classic guarantee that any token with true frequency > N/k is
  * PRESENT in the final summary (estimates undercount by at most N/k,
  * never overcount). That superset guarantee is what makes the two-pass
  * exact heavy-hitters design in [[Sketches.heavyHitters]] correct.
  */
object Sketches {

  /** Misra-Gries summary with at most `k - 1` counters. Both `reduce` and
    * `merge` maintain the invariant est(t) ≤ true(t) ≤ est(t) + N/k, so
    * the summary keys are a superset of every token with true freq > N/k. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, s"k must be >= 2, got $k")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1)
        case None if b.size < k - 1 => b.updated(tok, 1L)
        case None => // decrement all, drop zeros — the MG eviction step
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k - 1) sum
      else {
        // subtract the k-th largest count from everything: at most k-1
        // survive, and every entry lost at most what a sequence of MG
        // eviction steps would have cost it (Agarwal et al.'s mergeable
        // summaries construction)
        val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
        sum.view.mapValues(_ - d).filter(_._2 > 0).toMap
      }
    }

    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** [[MisraGries]] plus the exact element count N in the same buffer —
    * one pass yields both the candidate set and the N/k threshold, instead
    * of a separate full count() scan. */
  private final class MisraGriesWithN(k: Int)
      extends Aggregator[String, (Map[String, Long], Long), (Map[String, Long], Long)] {
    private val mg = new MisraGries(k)
    def zero: (Map[String, Long], Long) = (Map.empty, 0L)
    def reduce(b: (Map[String, Long], Long), t: String): (Map[String, Long], Long) =
      (mg.reduce(b._1, t), b._2 + 1)
    def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long)): (Map[String, Long], Long) =
      (mg.merge(a._1, b._1), a._2 + b._2)
    def finish(r: (Map[String, Long], Long)): (Map[String, Long], Long) = r
    def bufferEncoder: Encoder[(Map[String, Long], Long)] =
      Encoders.kryo[(Map[String, Long], Long)]
    def outputEncoder: Encoder[(Map[String, Long], Long)] =
      Encoders.kryo[(Map[String, Long], Long)]
  }

  /** Bounded "n smallest (sortKey, payload) pairs" summary — the
    * typed-Aggregator backbone of [[Mixture.capPerSource]] (sortKey =
    * doc_id) and [[Mixture.stratifiedSampleExact]] (sortKey = keyed
    * coin). The buffer holds at most 2n unsorted pairs and compacts
    * (sort, keep the n smallest) whenever it overflows, so per-row cost
    * is O(1) amortized and per-buffer state is O(n) regardless of group
    * size. Compaction only ever discards pairs provably outside the
    * group's n smallest, so every buffer is always a superset of its
    * stream's true answer — `merge` is just concat + compact
    * (order-insensitive, associative on the retained sets). Ordering is
    * on the full (sortKey, payload) tuple, so sortKey ties resolve
    * deterministically by payload. */
  final class BoundedMinPairs(n: Int)
      extends Aggregator[(String, Long, Long), Vector[(Long, Long)], Seq[(Long, Long)]] {
    require(n >= 1, s"cap must be >= 1, got $n")

    def zero: Vector[(Long, Long)] = Vector.empty

    private def compact(v: Vector[(Long, Long)]): Vector[(Long, Long)] =
      if (v.length <= 2 * n) v else v.sorted.take(n)

    def reduce(b: Vector[(Long, Long)], row: (String, Long, Long)): Vector[(Long, Long)] =
      compact(b :+ ((row._2, row._3)))

    def merge(a: Vector[(Long, Long)], b: Vector[(Long, Long)]): Vector[(Long, Long)] =
      compact(a ++ b)

    def finish(r: Vector[(Long, Long)]): Seq[(Long, Long)] = r.sorted.take(n)

    def bufferEncoder: Encoder[Vector[(Long, Long)]] =
      Encoders.kryo[Vector[(Long, Long)]]
    def outputEncoder: Encoder[Seq[(Long, Long)]] =
      Encoders.kryo[Seq[(Long, Long)]]
  }

  /** Exact corpus heavy hitters — every token with frequency > N/k, with
    * its exact count — WITHOUT a full-vocabulary group-by.
    *
    * Pass 1 folds the corpus into one bounded Misra-Gries summary
    * (≤ k-1 counters per partition, merged on the driver side of the
    * aggregation — KBs of state however large the corpus); its keys are
    * provably a superset of the true heavy hitters. Pass 2 counts ONLY
    * those ≤ k-1 candidate tokens exactly (broadcast-filtered scan, the
    * aggregation state is the candidate set, not the vocabulary) and
    * keeps the ones above the threshold. Output is integer-exact — the
    * sketch decides what to count, never what the counts are — which is
    * what makes a DuckDB full-group-by oracle possible on a sketch op.
    */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    // one pass: candidate summary AND the exact N ride the same buffer
    val (summary, n) = toks.as[String]
      .select(new MisraGriesWithN(k).toColumn).head()
    val candidates = summary.keys.toSeq
    toks.filter(col("tok").isin(candidates: _*))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .filter(col("freq") > lit(n) / lit(k.toLong))
      .orderBy(col("freq").desc, col("tok"))
  }

  /** Count-Min-Sketch frequency contract — the third sketch of the 100 TB
    * cardinality kit beside HLL ([[TextAnalysis.sketchStats]]) and
    * Misra-Gries ([[heavyHitters]]): one pass builds Spark's native
    * `count_min_sketch` aggregate (seeded — deterministic, and the merge
    * is cellwise addition so the sketch is partition-order independent),
    * then the exact top-n tokens are each queried against it driver-side
    * (the sketch is `d·⌈2/ε⌉` counters — KBs — so point queries are free).
    *
    * CMS error is one-sided: estimates NEVER undercount, and overcount by
    * at most ε·N with probability ≥ confidence. Both sides of that
    * contract are emitted per token (`cms_ge_ok`, `cms_bound_ok`) next to
    * the exact count — the oracle recomputes the exact counts and pins
    * both flags true, the same honest-contract shape as the ANN and HLL
    * rows. */
  def cmsHeavyHitters(docs: DataFrame, topN: Int = 20, eps: Double = 0.001,
                      confidence: Double = 0.99, seed: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val bytes = toks
      .select(count_min_sketch(col("tok"), lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val bound = math.ceil(eps * cms.totalCount()).toLong
    val top = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok")).limit(topN)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    top.toSeq.map { case (t, tf) =>
      val est = cms.estimateCount(t)
      (t, tf, est >= tf, est <= tf + bound)
    }.toDF("tok", "tf", "cms_ge_ok", "cms_bound_ok")
  }
}
