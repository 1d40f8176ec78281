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
