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
}
