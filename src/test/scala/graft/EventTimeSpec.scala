package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.EventTime

/** [[graft.sources.EventTime]] — event-time unit adaptivity. The lake has
  * historically served `events.ts` as TIMESTAMP(NANOS) (→ nano-epoch long
  * under the legacy read conf) and now serves `timestamp[us]` (→
  * TIMESTAMP_NTZ); every consumer goes through one canonical epoch-nanos
  * long representation, so both layouts — and plain timestamps and dates —
  * must normalize to identical values. */
class EventTimeSpec extends SparkTestBase {
  import spark.implicits._

  private val microEpochs = Seq(0L, 1L, 1700000000000000L, -86400000000L)

  test("long columns pass through untouched (nanos layout, no-op)") {
    val df = Seq(1L, 1700000000000000000L).toDF("ts")
    val out = EventTime.toEpochNanos(df, "ts")
    assert(out eq df, "long layout must not add a projection")
    assert(out.as[Long].collect().toSeq == Seq(1L, 1700000000000000000L))
  }

  test("timestamp_ntz (the regenerated lake's timestamp[us]) → epoch nanos") {
    val df = microEpochs.toDF("us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .select("ts", "us")
    assert(df.schema("ts").dataType.isInstanceOf[TimestampNTZType])
    val got = EventTime.toEpochNanos(df, "ts")
    assert(got.schema("ts").dataType == LongType)
    got.select("ts", "us").as[(Long, Long)].collect().foreach {
      case (nanos, us) => assert(nanos == us * 1000L, s"us=$us")
    }
  }

  test("timestamp (tz-adjusted layout) → epoch nanos") {
    val df = microEpochs.toDF("us")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("ts", "us")
    assert(df.schema("ts").dataType == TimestampType)
    EventTime.toEpochNanos(df, "ts").select("ts", "us").as[(Long, Long)]
      .collect().foreach { case (nanos, us) => assert(nanos == us * 1000L) }
  }

  test("date → midnight-UTC epoch nanos") {
    val df = Seq("1970-01-01", "2024-03-01").toDF("d")
      .withColumn("ts", to_date(col("d")))
    val got = EventTime.toEpochNanos(df, "ts")
      .select("d", "ts").as[(String, Long)].collect().toMap
    assert(got("1970-01-01") == 0L)
    assert(got("2024-03-01") % (86400L * 1000000000L) == 0L)
  }

  test("both lake layouts produce identical canonical events") {
    // the same five instants, served once as nano-longs and once as
    // timestamp[us]-style NTZ — downstream must not be able to tell
    val micros = Seq(1000000L, 1000059000L, 2000000000L, 7200000000L, 0L)
    val asLong = micros.map(_ * 1000L).zipWithIndex
      .map { case (ns, i) => (i.toLong, ns) }.toDF("event_id", "ts")
    val asNtz = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .select("event_id", "ts")
    val a = EventTime.toEpochNanos(asLong, "ts")
      .orderBy("event_id").as[(Long, Long)].collect().toSeq
    val b = EventTime.toEpochNanos(asNtz, "ts")
      .orderBy("event_id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("int columns are epoch SECONDS (the only unit 32 bits can hold)") {
    val df = Seq(0, 1, 1700000000).toDF("ts")
    val got = EventTime.toEpochNanos(df, "ts").as[Long].collect().toSeq.sorted
    assert(got == Seq(0L, 1000000000L, 1700000000000000000L))
  }

  test("lake-entry magnitude guard flags micros/millis/seconds served as long") {
    for ((v, unit) <- Seq(1700000000L -> "SECONDS", 1700000000000L -> "MILLIS",
                          1700000000000000L -> "MICROS")) {
      val e = intercept[IllegalStateException] {
        EventTime.assertPlausibleNanos(Seq(0L, v).toDF("ts"), "ts")
      }
      assert(e.getMessage.contains(unit), s"v=$v")
    }
    // genuine modern nanos (and the zero sentinel) pass untouched
    val ok = Seq(0L, 1700000000000000000L).toDF("ts")
    assert(EventTime.assertPlausibleNanos(ok, "ts") eq ok)
    // non-long layouts are the type dispatch's job, not the guard's
    val ntz = Seq(1L).toDF("us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
    assert(EventTime.assertPlausibleNanos(ntz, "ts") eq ntz)
  }

  test("unsupported types fail loudly, not with silent wrong arithmetic") {
    val df = Seq("not-a-time").toDF("ts")
    intercept[IllegalArgumentException] {
      EventTime.toEpochNanos(df, "ts")
    }
  }

  test("ntz round-trips through a real parquet file like the lake's") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evtime").toString
    val micros = Seq(59000L, 1700000000123456L)
    micros.map(us => Tuple1(LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)))
      .toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = spark.read.parquet(s"$dir/events.parquet")
    val got = EventTime.toEpochNanos(back, "ts")
      .as[Long].collect().toSeq.sorted
    assert(got == micros.map(_ * 1000L).sorted)
  }
}
