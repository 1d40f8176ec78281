package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — how far each user got
  * through a required step sequence (view → click → purchase), with each
  * step strictly after the previous one in event time.
  *
  * Shape at scale: step k's survivor frame is built from a type-pruned
  * scan (the step filter pushes to parquet) joined to the previous
  * survivors — at most one row per user on the right, shrinking
  * monotonically with k — then min-aggregated per user. Everything keys
  * on user_id, so consecutive stages reuse one hash partitioning; no
  * window over the full event history, no per-user event sorting, state
  * is one timestamp per surviving user per stage.
  */
object Funnels {

  /** Per-user funnel depth: 0..steps.length, where depth ≥ k means the
    * user performed steps 1..k in order (strictly increasing event time,
    * earliest-completion semantics: each step matches its first
    * occurrence after the previous step's match). */
  def funnelDepth(events: DataFrame, steps: Seq[String],
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol)
    var acc = events.select(u).distinct()
    var depth: Column = lit(0)
    var prev: Option[DataFrame] = None
    steps.zipWithIndex.foreach { case (step, i) =>
      val hits = events.filter(col(typeCol) === step)
      val stage = prev match {
        case None =>
          hits.groupBy(userCol).agg(min(tsCol).as("__t"))
        case Some(p) =>
          hits.join(p.withColumnRenamed("__t", "__tprev"), Seq(userCol))
            .filter(col(tsCol) > col("__tprev"))
            .groupBy(userCol).agg(min(tsCol).as("__t"))
      }
      prev = Some(stage)
      acc = acc.join(stage.withColumnRenamed("__t", s"__t$i"), Seq(userCol), "left_outer")
      // survivor frames nest by construction (a user in stage k is in
      // stage k-1), so counting non-null flags IS the ordered depth
      depth = depth + when(col(s"__t$i").isNotNull, 1).otherwise(0)
    }
    acc.select(u, depth.cast("int").as("depth"))
  }

  /** Step-conversion report — the observability twin of [[funnelDepth]]:
    * one row per observed depth with how many users stopped exactly
    * there (`n_at_depth`) and how many reached AT LEAST that far
    * (`n_reached`, the classic funnel-bar number; conversion between
    * consecutive steps is `n_reached(k+1) / n_reached(k)`). The
    * cumulative window runs over the aggregated report — at most
    * `steps.length + 1` rows, so the unpartitioned window is a handful
    * of rows on one task, never the corpus. */
  def funnelReport(events: DataFrame, steps: Seq[String],
                   userCol: String = "user_id", typeCol: String = "event_type",
                   tsCol: String = "ts"): DataFrame = {
    val byDepth = funnelDepth(events, steps, userCol, typeCol, tsCol)
      .groupBy("depth").agg(count(lit(1)).cast("long").as("n_at_depth"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("depth").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    byDepth
      .withColumn("n_reached", sum("n_at_depth").over(w).cast("long"))
      .orderBy("depth")
  }

  /** Cohort retention: users bucketed by first-activity week, counted in
    * every later week they return. Output (cohort, offset_weeks,
    * n_users) — the classic retention triangle.
    *
    * Weeks are integer division of the raw event time by `bucketNanos`
    * (engine-portable: the oracle does the identical integer arithmetic,
    * no calendar/timezone functions to disagree on). Scale shape: the
    * (user, week) activity grid is deduplicated FIRST — one row per user
    * per active week, orders of magnitude smaller than the event stream —
    * and everything downstream (cohort min, self-join, count) runs on the
    * grid, keyed on user_id throughout. */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts",
                bucketNanos: Long = 7L * 86400L * 1000000000L): DataFrame = {
    // FLOOR division (not Spark's truncate-toward-zero `div`): pre-epoch
    // timestamps must bucket identically to the oracle's `//` and the
    // streaming twin's Math.floorDiv; pmod is non-negative, so
    // (x - pmod(x, b)) is an exact multiple of b at any sign
    val grid = events
      .select(col(userCol), expr(
        s"(($tsCol - pmod($tsCol, ${bucketNanos}L)) div ${bucketNanos}L)").as("wk"))
      .distinct()
    val cohorts = grid.groupBy(userCol).agg(min("wk").as("cohort"))
    grid.join(cohorts, userCol)
      .withColumn("offset_weeks", col("wk") - col("cohort"))
      .groupBy("cohort", "offset_weeks")
      .agg(count(lit(1)).cast("long").as("n_users"))
  }
}
