package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout for multi-dimensional scan locality.
  *
  * A lake laid out by one key prunes range scans on that key only; a
  * corpus queried by BOTH (user, hour) or (source, length) boxes wants the
  * interleaved-bit Morton curve: sorting by the z-value places rows close
  * in EVERY interleaved dimension into the same files, so parquet
  * row-group/file min-max stats prune a 2-d box to a handful of files
  * instead of all of them — the `OPTIMIZE ZORDER BY` primitive of lakehouse
  * table formats, as a plain column expression plus a range-partitioned
  * sorted write.
  *
  * The z-value is a pure bit-shuffle Column expression (shift/and/or only
  * — whole-stage-codegen'd, no UDF), so it costs one projection at write
  * time and nothing at read time.
  */
object Zorder {

  /** Morton-interleave the low `bits` of two non-negative long columns:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Values are
    * first clamped into [0, 2^bits) by masking — callers quantize wider
    * domains (e.g. `ts div 3600e9` hours) down to the significant range
    * before interleaving. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of [1,31]")
    val mask = lit((1L << bits) - 1L)
    val am = a.bitwiseAND(mask)
    val bm = b.bitwiseAND(mask)
    (0 until bits).map { i =>
      val hi = shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val lo = shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i)
      hi.bitwiseOR(lo)
    }.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Write `df` z-ordered by (a, b) into `nFiles` range-partitioned,
    * internally sorted parquet files. Range partitioning by z gives each
    * file a tight, disjoint z interval, which is what makes file-level
    * min-max pruning effective for 2-d boxes. */
  def writeZordered(df: DataFrame, a: String, b: String, path: String,
                    nFiles: Int = 8, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(a), col(b), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
