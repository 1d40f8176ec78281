package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming semantics via MemoryStream micro-batches. */
class StreamingSpec extends SparkTestBase {

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  test("watermarked hourly window counts, late row within watermark updates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(input.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update).start()
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 1.0),
      Event(3, ts(70), 2, "view", 1.0))
    q.processAllAvailable()
    input.addData(Event(4, ts(15), 3, "click", 1.0)) // late but inside watermark
    q.processAllAvailable()
    val rows = spark.table("hourly").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains((ts(0).getTime, "click", 3L))) // updated to 3 by late row
    assert(rows.contains((ts(60).getTime, "view", 1L)))
  }

  test("stream dedup by event_id") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupedEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "view", 1.0))
    q.processAllAvailable()
    val n = spark.table("dedup").count()
    q.stop()
    assert(n == 2)
  }

  test("stream near-dup filter drops identical-fingerprint re-posts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = EventStreams.nearDupFiltered(
        input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (1L, "spark shuffles keyed rows across the cluster", ts(0)),
      (2L, "spark shuffles keyed rows across the cluster", ts(1)), // mirror copy
      (3L, "an entirely different document body", ts(2)))
    q.processAllAvailable()
    input.addData( // same boilerplate again, still inside the watermark
      (4L, "spark shuffles keyed rows across the cluster", ts(3)))
    q.processAllAvailable()
    val kept = spark.table("neardup").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    assert(kept == Set(1L, 3L)) // one survivor per fingerprint
  }

  test("stream decontamination drops docs overlapping the benchmark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val grams = graft.pipeline.Decontaminate.benchmarkGramIds(bench, k = 5)
    assert(grams.nonEmpty)
    val input = MemoryStream[(Long, String)]
    val q = graft.pipeline.Decontaminate.decontaminatedStream(
        input.toDF().toDF("doc_id", "text"), grams, k = 5)
      .writeStream.format("memory").queryName("decontam")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (1L, "totally clean document with its own words entirely"),
      (2L, "quote: the quick brown fox jumps over the lazy dog end"), // leaked
      (3L, "short and clean"))
    q.processAllAvailable()
    val kept = spark.table("decontam").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    assert(kept == Set(1L, 3L))
  }

  test("stream-static join enriches events with a dimension table") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = input.toDF().join(dim, Seq("user_id"), "left_outer")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 9, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("enriched").collect()
      .map(r => r.getLong(0) -> Option(r.getString(r.fieldIndex("tier")))).toMap
    q.stop()
    assert(rows(1L).contains("gold") && rows(9L).isEmpty)
  }

  test("gap sessionization assigns new session after gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val sp = s
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "click", 1.0),
      Event(3, ts(100), 7, "click", 1.0)) // 90-minute gap ⇒ new session
    q.processAllAvailable()
    val rows = spark.table("sessions").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap // event_id -> session_id
    q.stop()
    assert(rows(1L) == rows(2L))
    assert(rows(3L) != rows(1L))
  }
  test("watermarked stream-stream interval join attributes purchases to clicks") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.clickPurchaseJoin(clicks.toDF(), purchases.toDF(),
        windowMinutes = 30)
      .writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append).start()
    clicks.addData(
      Event(10, ts(0), 1, "click", 1.0),   // in window for purchase @5
      Event(11, ts(50), 2, "click", 1.0))  // 50 > 20: out of window
    purchases.addData(
      Event(20, ts(5), 1, "purchase", 9.0),
      Event(21, ts(20), 2, "purchase", 9.0))
    q.processAllAvailable()
    val rows = spark.table("attributed").collect()
      .map(r => (r.getLong(r.fieldIndex("purchase_id")), r.getLong(r.fieldIndex("click_id"))))
    q.stop()
    assert(rows.toSet == Set((20L, 10L))) // purchase 21 has no in-window click
  }

  test("streaming funnel matches the batch depths across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Event]
    val q = graft.streaming.EventStreams.funnelProgress(
        input.toDS(), Seq("view", "click", "purchase"))(s)
      .writeStream.format("memory").queryName("funnel_progress")
      .outputMode(OutputMode.Append).start()
    // batch 1: user 1 views+clicks; user 2 clicks only (no view yet)
    input.addData(
      Event(1, ts(0), 1, "view", 0), Event(2, ts(1), 1, "click", 0),
      Event(3, ts(0), 2, "click", 0))
    q.processAllAvailable()
    // batch 2: user 1 purchases (completes); user 2 views then clicks
    input.addData(
      Event(4, ts(2), 1, "purchase", 9), Event(5, ts(3), 2, "view", 0),
      Event(6, ts(4), 2, "click", 0))
    q.processAllAvailable()
    q.stop()
    val depths = spark.table("funnel_progress")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("depth").as("depth"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the batch op over the full event set must agree
    val allEvents = Seq(
      (1L, "view", 0L), (1L, "click", 1L), (1L, "purchase", 2L),
      (2L, "click", 0L), (2L, "view", 3L), (2L, "click", 4L)
    ).map { case (u, t, m) => (u, t, ts(m.toInt)) }
      .toDF("user_id", "event_type", "ts")
    val batch = graft.pipeline.Funnels.funnelDepth(
        allEvents, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(depths == batch, s"stream $depths vs batch $batch")
    assert(depths == Map(1L -> 3, 2L -> 2))
  }

  test("streaming funnel replay over the events table matches batch depths") {
    implicit val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.sources.EventTime.toEpochNanos(
      spark.read.parquet(s"$sfDir/events.parquet"), "ts")
    val stream = EventStreams.funnelDepthsReplayed(
        ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.pipeline.Funnels.funnelDepth(
        ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stream.nonEmpty)
    assert(batch.filter(_._2 > 0) == stream,
      "replayed stream depths diverge from the batch funnel on the corpus")
  }

  test("streaming retention hits build the batch triangle across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val wkMs = 7L * 86400L * 1000L
    def at(week: Long, id: Long, user: Long) =
      Event(id, new Timestamp(week * wkMs + id), user, "view", 0)
    val input = MemoryStream[Event]
    val q = graft.streaming.EventStreams.retentionHits(input.toDS())(s)
      .writeStream.format("memory").queryName("retention_hits")
      .outputMode(OutputMode.Append).start()
    input.addData(at(10, 1, 1), at(10, 2, 1), at(10, 3, 2)) // cohort wk 10
    q.processAllAvailable()
    input.addData(at(11, 4, 1), at(12, 5, 2), at(11, 6, 3)) // returns + new user
    q.processAllAvailable()
    q.stop()
    val triangle = spark.table("retention_hits")
      .groupBy("cohort", "offset_weeks")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch twin over the same events (ms timestamps, ms bucket)
    val batchEvents = Seq((1L, 10L * wkMs + 1), (1L, 10L * wkMs + 2), (2L, 10L * wkMs + 3),
      (1L, 11L * wkMs + 4), (2L, 12L * wkMs + 5), (3L, 11L * wkMs + 6))
      .toDF("user_id", "ts")
    val batch = graft.pipeline.Funnels.retention(batchEvents, bucketNanos = wkMs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(triangle == batch, s"stream $triangle vs batch $batch")
    assert(triangle == Set((10L, 0L, 2L), (10L, 1L, 1L), (10L, 2L, 1L), (11L, 0L, 1L)))
  }

  test("stateless pipeline ops run unmodified on unbounded streams") {
    // splitAssign / mixtureSample / filterFunnel / redactPii are pure
    // column expressions, so the SAME function compiles over a streaming
    // source with zero state store and no watermark — the design property
    // that makes the batch pipeline a streaming ingest pipeline for free
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "text", "source")
    assert(docs.isStreaming)
    val q = graft.pipeline.Mixture.splitAssign(
        docs, valFrac = 0.1, testFrac = 0.1, salt = "s1")
      .writeStream.format("memory").queryName("stream_split")
      .outputMode(OutputMode.Append).start()
    val q2 = graft.pipeline.Mixture.mixtureSample(
        docs, Seq("a" -> 1.0), defaultRate = 0.0, salt = "m1")
      .writeStream.format("memory").queryName("stream_mix")
      .outputMode(OutputMode.Append).start()
    input.addData((1L, "some text here", "a"), (2L, "other text", "b"),
      (3L, "third doc", "a"))
    q.processAllAvailable(); q2.processAllAvailable()
    q.stop(); q2.stop()
    val split = spark.table("stream_split").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(split.keySet == Set(1L, 2L, 3L))
    // identical assignments to the batch run — determinism across modes
    val batch = graft.pipeline.Mixture.splitAssign(
        Seq((1L, "some text here", "a"), (2L, "other text", "b"),
          (3L, "third doc", "a")).toDF("doc_id", "text", "source"),
        valFrac = 0.1, testFrac = 0.1, salt = "s1")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(split == batch)
    // rate 1.0 keeps every "a" doc, default 0.0 drops the rest
    val mixed = spark.table("stream_mix").collect().map(_.getLong(0)).toSet
    assert(mixed == Set(1L, 3L))
  }

  test("streaming per-source cap: id-ordered replay reproduces the batch cap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source")
    val rows = docs.as[EventStreams.SourceDoc].collect().sortBy(_.doc_id)
    val input = MemoryStream[EventStreams.SourceDoc]
    val q = EventStreams.cappedPerSource(input.toDS(), n = 5)
      .writeStream.format("memory").queryName("stream_cap")
      .outputMode(OutputMode.Append).start()
    // replay as three in-order micro-batches (cross-batch state carries)
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
      input.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("stream_cap").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.pipeline.Mixture.capPerSource(docs, n = 5).collect()
      .map(r => (r.getLong(1), r.getString(0), r.getLong(2))).toSet
    assert(got == batch, s"stream/batch cap divergence: ${got.size} vs ${batch.size}")
  }

  test("streaming token budget: state crosses micro-batches, crossing doc admits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = s
    import EventStreams.TokenDoc
    // srcA budget 10: docs of 4+4 tokens arrive in batch 1 (cum 8 < 10),
    // doc 3 (5 tokens) arrives in batch 2 — pre-doc sum 8 < 10, so it is
    // ADMITTED (crossing doc), then doc 4 must be rejected (13 >= 10).
    // srcB has no budget: dropped entirely. srcC budget 0: nothing admits.
    val b1 = Seq(TokenDoc(1, "srcA", 4), TokenDoc(2, "srcA", 4),
      TokenDoc(50, "srcB", 2), TokenDoc(60, "srcC", 1))
    val b2 = Seq(TokenDoc(3, "srcA", 5), TokenDoc(4, "srcA", 1),
      TokenDoc(61, "srcC", 1))
    val input = MemoryStream[TokenDoc]
    val q = EventStreams.tokenBudgetAdmit(
        input.toDS(), Map("srcA" -> 10L, "srcC" -> 0L))
      .writeStream.format("memory").queryName("stream_tb")
      .outputMode(OutputMode.Append).start()
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_tb").collect()
      .map(r => r.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L),
      s"expected the crossing doc admitted and the rest closed, got $got")
  }

  test("streaming token budget replay matches the id-ordered-prefix window form") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val budgets = Seq("src0" -> 300L, "src1" -> 800L, "src2" -> 50L, "src3" -> 0L)
    val got = EventStreams.tokenBudgetReplayed(docs, budgets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // the batch expression of the same semantics: one window over doc_id
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bmap = budgets.toMap
    val bCol = bmap.foldLeft(org.apache.spark.sql.functions.lit(-1L)) {
      case (acc, (src, b)) => when(col("source") === src, lit(b)).otherwise(acc)
    }
    val want = docs
      .select(col("doc_id"), col("source"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .filter(col("source").isin(bmap.keys.toSeq: _*))
      .withColumn("cum", sum("n_tokens").over(w))
      .filter(col("cum") - col("n_tokens") < bCol)
      .select("source", "doc_id", "n_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"replay ${got.size} rows vs window form ${want.size}")
    assert(got.nonEmpty && got.size < docs.count(),
      "budget should bite: some docs admitted, some rejected")
  }

  test("file-source dedup replay equals MemoryStream replay equals batch") {
    // the r12 verdict's soft spot: every gate rode MemoryStream. Stage the
    // table as parquet drop files and replay through readStream — the
    // admitted set must be identical across BOTH sources and the batch
    // min-id-per-digest rule (the transport must not change an admission)
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaFiles = graft.streaming.EventStreams.dedupFileReplayed(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaMemory = graft.streaming.EventStreams.dedupReplayed(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val F = org.apache.spark.sql.functions
    val batch = docs
      .select(F.col("doc_id"), F.md5(F.col("text")).as("digest"))
      .groupBy("digest").agg(F.min("doc_id").as("doc_id"))
      .collect().map(r => (r.getLong(1), r.getString(0))).toSet
    assert(viaFiles == batch, "file-source replay must equal the batch keepers")
    assert(viaFiles == viaMemory, "both stream sources must agree")
    // sf0.001 docs are all-distinct, so also replay a corpus WITH real
    // duplicates (every text doubled under higher ids): the second copy
    // must lose to the first across micro-batch file boundaries
    val n = docs.count()
    val doubled = docs.select(F.col("doc_id"), F.col("text")).unionByName(
      docs.select((F.col("doc_id") + F.lit(n)).as("doc_id"), F.col("text")))
    val dupFiles = graft.streaming.EventStreams.dedupFileReplayed(doubled)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(dupFiles == batch,
      "duplicate copies in later drop files must all be rejected")
  }

  test("streaming CDC compaction: later batches overwrite, tombstones " +
    "survive, replay equals batch compactLog") {
    import spark.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    // key 1: I then U then D (tombstone wins); key 2: I then U (update
    // wins); key 3: I only — seqs interleave so every chunk boundary
    // crosses a key's generations
    val log = Seq(
      (1L, 10L, "I", 1.0, "I", 1L), (2L, 20L, "I", 2.0, "I", 2L),
      (3L, 30L, "I", 3.0, "I", 3L), (1L, 10L, "U", 1.5, "U", 4L),
      (2L, 20L, "U", 2.5, "U", 5L), (1L, 10L, "D", 1.5, "D", 6L))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "op", "seq")
    val replayed = EventStreams.cdcCompactReplayed(log, chunks = 3)
      .collect().map(r => (r.getLong(0), r.getString(4), r.getDouble(3)))
      .toSet
    assert(replayed === Set((1L, "D", 1.5), (2L, "U", 2.5), (3L, "I", 3.0)))
    val batch = graft.pipeline.Lakehouse
      .compactLog(log, Seq("o_orderkey"), "seq")
      .collect().map(r => (r.getLong(0), r.getString(4), r.getDouble(3)))
      .toSet
    assert(replayed === batch,
      "the streamed Complete table must equal the batch compaction")
  }

  test("streaming ER admission: micro-batched admits label exactly like " +
    "the one-shot clustering, with cross-batch edges found") {
    import spark.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val store = java.nio.file.Files.createTempDirectory("graft_er_stream")
      .toString + "/s"
    // chain 1~2~3 split across chunk boundaries (ids feed sorted, 2 per
    // chunk): the 2~3 and 3-side edges need batch x STORE joins
    val recs = Seq((1L, "kitten"), (2L, "sitten"), (3L, "sittin"),
      (4L, "xyz"), (5L, "mitten")).toDF("id", "name")
    val streamed = EventStreams.erAdmitReplayed(recs, store, "id", "name",
        maxDist = 1, qgram = 3, maxGramDf = 1 << 20, chunks = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = graft.pipeline.FuzzyJoin
      .entityClusters(recs, "id", "name", maxDist = 1, q = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === oneShot)
    assert(streamed(3L) == 1L && streamed(5L) == 1L && streamed(4L) == 4L)
  }
}
