package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch range (band) join — the bounded-window theta-join Spark has no
  * native physical operator for.
  *
  * `left JOIN right ON keys AND right.ts ∈ [left.ts - window, left.ts)` is
  * a non-equi predicate: naively Spark plans the time condition as a
  * post-join filter over the key-only equi-join, so one hot key (a power
  * user at 100 TB: millions of events) builds a per-key cross product
  * before the filter drops almost all of it. Streaming gets this right
  * (watermarked interval joins bound state by time); this operator is the
  * batch analogue of that bound.
  *
  * The trick is band-bucket expansion (the "range join optimization" of
  * the big SQL engines): bucket both sides by `ts div window`. A right row
  * at time r only serves left rows in `(r, r + window]`, whose buckets are
  * `{band(r), band(r) + 1}` — so the right side is exploded to exactly
  * those two bands and the join becomes a plain equi-join on
  * `keys :+ band`, followed by the exact residual filter. Per-composite-key
  * fan-out is bounded by events-per-key-per-window (the data's real
  * density), not events-per-key; the planner sees an equi-join and keeps
  * every downstream freedom (AQE, broadcast, skew split).
  *
  * Band arithmetic is integer-only with floor semantics
  * (`(ts - pmod(ts, w)) div w`): the timestamps are epoch nanos ~1.7e18,
  * beyond double's 2^53 mantissa, so a float `floor(ts / w)` would corrupt
  * bucket boundaries — and pmod keeps pre-1970 timestamps flooring instead
  * of truncating toward zero.
  */
object BandJoin {

  private def band(tsCol: String, window: Long) =
    expr(s"(`$tsCol` - pmod(`$tsCol`, ${window}L)) div ${window}L")

  /** Trailing-window matches: every (left, right) pair sharing `keys` with
    * `right[rightTs] ∈ [left[leftTs] - window, left[leftTs])` (strictly
    * before the left event, at most `window` old — "what led up to this").
    * Timestamps and `window` share one integer unit (epoch nanos here).
    * Output: all left columns plus all right columns. */
  def trailing(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, window: Long): DataFrame = {
    require(window > 0, s"bad window=$window")
    val l = left.withColumn("__band", band(leftTs, window))
    val r = right
      .withColumn("__band",
        explode(array(band(rightTs, window),
          band(rightTs, window) + lit(1L))))
    l.join(r, keys :+ "__band")
      .filter(col(rightTs) < col(leftTs) &&
        col(rightTs) >= col(leftTs) - lit(window))
      .drop("__band")
  }
}
