package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time unit canonicalization.
  *
  * The lake has served `events.ts` as parquet TIMESTAMP(NANOS) (which Spark
  * reads as nano-epoch longs under `spark.sql.legacy.parquet.nanosAsLong`)
  * and, after a regeneration, as `timestamp[us]` (which Spark reads as
  * TIMESTAMP_NTZ or TIMESTAMP depending on `isAdjustedToUTC`). A real
  * pipeline meets second/milli/micro/nano epochs and timestamp columns
  * constantly, so every event-time consumer in this engine goes through ONE
  * canonical representation: **epoch-nanosecond longs** (the highest common
  * precision — lossless from every layout above).
  *
  * All entry points (`Bench`, `Verify`, tests) pin
  * `spark.sql.session.timeZone=UTC`, which makes the TIMESTAMP_NTZ→TIMESTAMP
  * cast the identity on wall-clock values and matches the DuckDB oracle's
  * naive-as-UTC `epoch_ns(ts)` semantics.
  */
object EventTime {

  /** Rewrite `colName` in place to epoch-nanosecond `LongType`, whatever the
    * lake's physical layout was. No-op (no extra projection) when the column
    * is already a long. */
  def toEpochNanos(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType => df
      case dt       => df.withColumn(colName, epochNanos(col(colName), dt))
    }

  /** Epoch-nanos expression for a column of the given type. Longs pass
    * through untouched (assumed already nano-epoch — the legacy
    * TIMESTAMP(NANOS) read path); 32-bit ints can only hold an epoch in
    * SECONDS (any finer unit overflows int range), so they scale by 1e9. */
  /** Sampled magnitude guard for lake readers whose long columns are
    * ASSUMED nano-epoch: a regeneration serving epoch seconds, millis, or
    * micros as long would otherwise be silently misread by 10⁹/10⁶/10³ —
    * the same silent-unit-drift class as the r10 timestamp regression, but
    * undetectable by the type dispatch above. A nonzero sampled value below
    * ~1.2e16 (|ns| of ~136 days around the epoch; modern seconds ≈ 1.7e9,
    * millis ≈ 1.7e12, micros ≈ 1.7e15 all sit far below it, genuine modern
    * nanos ≈ 1.7e18 far above) fails loudly like the unsupported-type
    * branch. Costs one `limit(sample)` scan, so it belongs at the lake
    * entry point, not inside the per-query no-op [[toEpochNanos]] path
    * (whose unit fixtures legitimately use small epochs). */
  def assertPlausibleNanos(df: DataFrame, colName: String = "ts",
                           sample: Int = 256): DataFrame = {
    if (df.schema(colName).dataType == LongType) {
      val floor = 12_000_000_000_000_000L
      val bad = df.select(col(colName)).filter(col(colName) =!= 0L)
        .limit(sample).collect().map(_.getLong(0)).find(v => math.abs(v) < floor)
      bad.foreach { v =>
        val unit = math.abs(v) match {
          case a if a < 1e11 => "SECONDS"
          case a if a < 1e14 => "MILLIS"
          case _             => "MICROS"
        }
        throw new IllegalStateException(
          s"event-time long column '$colName' sampled value $v is far below " +
            s"nano-epoch magnitude — the lake is likely serving epoch $unit " +
            "as long; wire the correct unit instead of trusting the " +
            "nanos-long assumption")
      }
    }
    df
  }

  def epochNanos(c: Column, dt: DataType): Column = dt match {
    case LongType    => c
    case IntegerType => c.cast(LongType) * lit(1000000000L)
    case TimestampType =>
      unix_micros(c) * lit(1000L)
    case _: TimestampNTZType =>
      // session tz is UTC at every entry point, so this cast is wall-clock
      // identity; micros is the NTZ physical precision — lossless.
      unix_micros(c.cast(TimestampType)) * lit(1000L)
    case DateType =>
      unix_date(c).cast(LongType) * lit(86400L * 1000000000L)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported event-time type $other (expected long epoch-nanos, " +
          "timestamp, timestamp_ntz, or date)")
  }
}
