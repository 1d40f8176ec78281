package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality / governance primitives — the checks a lake runs before a
  * corpus is allowed into a training mix: column profiles, key
  * uniqueness, referential integrity. Each is a single distributed
  * aggregation; only the one-row summary ever reaches the driver.
  */
object DataQuality {

  /** Per-column profile: non-null count, null count, distinct count, and
    * min/max rendered as strings AFTER the typed aggregation (min THEN
    * cast — casting first would compare "10" < "9" lexicographically).
    * One pass over the table computes every column's metrics in a single
    * aggregate row (multiple DISTINCTs expand to one shuffle each, still
    * one scan); the driver only reshapes that one row to tall form.
    * Output: (col_name, n, n_null, n_distinct, min_s, max_s). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      // coalesce: SUM over zero rows is NULL — an empty table must
      // profile as zeros, not NPE
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    import spark.implicits._
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      (c, r.getLong(5 * i), r.getLong(5 * i + 1), r.getLong(5 * i + 2),
        r.getString(5 * i + 3), r.getString(5 * i + 4))
    }.toDF("col_name", "n", "n_null", "n_distinct", "min_s", "max_s")
  }

  /** One-pass approximate profile — the shape a FULL-LAKE governance scan
    * needs: same tall output as [[profile]], but `n_distinct` comes from
    * `approx_count_distinct` (HyperLogLog++, relative sd `rsd`). The exact
    * form's N `countDistinct`s plan as an Expand that replicates every
    * input row (cols+1)× before the shuffle — at 100 TB that turns one
    * governance pass into five. Here every metric is a plain streaming
    * aggregate with a map-side partial: ONE scan, ONE one-row aggregate,
    * zero Expand (plan-audited). Error contract: `n_distinct` within
    * ~`rsd` relative standard error of the exact count (HLL++'s bound,
    * gate-checked by [[profileApproxContract]] the `sketchStats` way);
    * keep [[profile]] for small dimensions that need exactness.
    * Output: (col_name, n, n_null, n_distinct, min_s, max_s). */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.02): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = profileApproxAgg(df, cols, rsd).head()
    cols.zipWithIndex.map { case (c, i) =>
      (c, r.getLong(5 * i), r.getLong(5 * i + 1), r.getLong(5 * i + 2),
        r.getString(5 * i + 3), r.getString(5 * i + 4))
    }.toDF("col_name", "n", "n_null", "n_distinct", "min_s", "max_s")
  }

  /** The one-row wide aggregate behind [[profileApprox]] — exposed so the
    * plan audit can pin it Expand-free (the reshaping `.head()` above
    * hides the scan plan from the returned tall frame). */
  private[graft] def profileApproxAgg(df: DataFrame, cols: Seq[String],
                                      rsd: Double = 0.02): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"${c}__nulls"),
      approx_count_distinct(col(c), rsd).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** [[profileApprox]] under its error contract — the gate form (the
    * `sketchStats` pattern): exact counts/nulls/min/max stay in the
    * output; the sketched distinct count is replaced by `nd_ok`, true iff
    * it sits within max(5%·exact, 8) of the exact count. The exact pass
    * exists only to VERIFY the sketch in tests — production profiling
    * runs [[profileApprox]] alone, Expand-free.
    * Output: (col_name, n, n_null, nd_ok, min_s, max_s). */
  def profileApproxContract(df: DataFrame, cols: Seq[String],
                            rsd: Double = 0.02): DataFrame = {
    val approx = profileApprox(df, cols, rsd)
      .select(col("col_name"), col("n"), col("n_null"),
        col("n_distinct").as("nd_approx"), col("min_s"), col("max_s"))
    val exact = profile(df, cols)
      .select(col("col_name"), col("n_distinct").as("nd_exact"))
    approx.join(broadcast(exact), Seq("col_name"))
      .select(col("col_name"), col("n"), col("n_null"),
        (abs(col("nd_approx") - col("nd_exact")) <=
          greatest(col("nd_exact").cast("double") * 0.05, lit(8.0))).as("nd_ok"),
        col("min_s"), col("max_s"))
  }

  /** Primary-key uniqueness: (rows checked, rows carrying a duplicated
    * key). groupBy + one filter-aggregate — never a window. */
  def pkViolations(df: DataFrame, key: String): (Long, Long) = {
    val agg = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(sum("c").cast("long").as("n"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).cast("long").as("bad"))
      .head()
    (agg.getLong(0), agg.getLong(1))
  }

  /** Referential integrity: child rows whose foreign key has no parent.
    * Left-anti join ships only the key columns of the parent side. */
  def fkOrphans(child: DataFrame, fk: String,
                parent: DataFrame, pk: String): (Long, Long) = {
    val orphans = child.select(col(fk))
      .join(parent.select(col(pk).as(fk)), Seq(fk), "left_anti")
      .count()
    (child.count(), orphans)
  }

  /** The shared digest aggregate of [[manifest]]/[[partitionManifest]]:
    * order-independent XOR of 60-bit md5 prefixes — ONE definition so the
    * two manifests can never silently diverge. */
  private def xorDigestAgg(keyExpr: org.apache.spark.sql.Column) =
    coalesce(bit_xor(
      conv(substring(md5(keyExpr), 1, 15), 16, 10).cast("long")),
      lit(0L)).as("xor_digest")

  /** Content manifest for reproducibility pinning: per table, the row
    * count and an order-independent 60-bit XOR of per-row content
    * digests. XOR (not SUM) because it cannot overflow and needs no
    * modular arithmetic that engines wrap differently — the digest is
    * identical however the rows are partitioned, so two lakes agree iff
    * their contents do. `keyExpr` is the canonical per-row string (e.g.
    * `md5(text)`'s input) — keep it to columns with engine-stable string
    * renderings (strings, integers). Output: (table_name, n_rows,
    * xor_digest). */
  def manifest(tables: Seq[(String, DataFrame, org.apache.spark.sql.Column)])
              (implicit spark: SparkSession): DataFrame = {
    val frames = tables.map { case (name, df, keyExpr) =>
      df.agg(count(lit(1)).as("n_rows"), xorDigestAgg(keyExpr))
        .select(lit(name).as("table_name"), col("n_rows"), col("xor_digest"))
    }
    frames.reduce(_.unionByName(_))
  }

  /** [[manifest]] at partition granularity — the incremental-compute
    * planner's input: comparing two snapshots' partition manifests names
    * exactly the partitions whose content moved, so a recompute touches
    * those and nothing else (the partition-pruned twin of
    * [[Prepare.corpusDiff]]'s row-level delta).
    * Output: (part, n_rows, xor_digest). */
  def partitionManifest(df: DataFrame, partCol: String,
                        keyExpr: org.apache.spark.sql.Column): DataFrame =
    df.groupBy(col(partCol).as("part"))
      .agg(count(lit(1)).as("n_rows"), xorDigestAgg(keyExpr))

  /** Join-key skew report — the measurement behind the
    * [[graft.operators.SkewJoin]] decision: the k heaviest keys of a
    * column with their per-mille share of the table. A groupBy plus a
    * driver-side top-k of the (small) per-key count table; the text/rows
    * never move. Output: (key, cnt, share_milli). */
  def skewReport(df: DataFrame, key: String, k: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE scan of the table: total and top-k both read the (persisted)
    // per-key count table, never the rows again
    val counts = df.groupBy(col(key).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt")).persist()
    try {
      val total = counts.agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
      val top = counts.orderBy(col("cnt").desc, col("key")).limit(k)
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (total == 0) 0L else r.getLong(1) * 1000L / total))
      top.toSeq.toDF("key", "cnt", "share_milli")
    } finally counts.unpersist()
  }

  /** One-call integrity report over a set of declared checks.
    * Output: (check_name, n_checked, n_violations). */
  def integrityReport(checks: Seq[(String, () => (Long, Long))])
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    checks.map { case (name, f) =>
      val (n, bad) = f(); (name, n, bad)
    }.toDF("check_name", "n_checked", "n_violations")
  }
}
