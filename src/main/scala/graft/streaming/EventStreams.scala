package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension surface.
  *
  * The reference has no unbounded-stream ingest (SURVEY.md §2.11) — its
  * "streaming" is tuple-at-a-time pipelining of bounded federated results.
  * This module supplies the missing query features on Spark's native
  * engine: event-time windowed aggregation with watermarked late-data
  * handling, watermarked stream dedup, and custom sessionization state via
  * `flatMapGroupsWithState`. All transforms work identically on bounded
  * DataFrames (batch parity is what `q_events_hourly` oracle-checks).
  */
object EventStreams {

  /** Epoch-micros → Timestamp with sub-second precision (floor semantics
    * for pre-1970 instants) — shared by every replay harness. */
  private def tsOf(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Tumbling-window event counts with a watermark: late events beyond
    * `watermark` are dropped, on-time late events update their window. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour"), col("event_type"), col("cnt"))

  /** Watermarked exact stream dedup on event_id — the streaming face of
    * [[graft.pipeline.Dedup.exactGroups]]: state for ids older than the
    * watermark is dropped, bounding state size. */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Streaming near-duplicate filter — the in-flight face of
    * [[graft.pipeline.Dedup.simhashNearDups]] for arriving crawl shards:
    * each document's 64-bit SimHash fingerprint (the codegen'd
    * engine-portable [[graft.functions.GraftFunctions.simhash_md5]])
    * deduplicates within the watermark, so boilerplate re-posts and
    * mirror copies are dropped before they reach storage. Fingerprint
    * state older than the watermark is evicted — bounded state, unbounded
    * stream. Exact-fingerprint matching catches the hamming-0 core of the
    * batch operator's band search; the full banded candidate join stays a
    * batch concern (it needs corpus-wide buckets, not per-key state). */
  def nearDupFiltered(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("simhash",
        graft.functions.GraftFunctions.simhash_md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicates("simhash")

  final case class SourceDoc(doc_id: Long, source: String)
  final case class DocAdmit(doc_id: Long, source: String, rk: Long)

  /** Streaming face of [[graft.pipeline.Mixture.capPerSource]]: admit at
    * most `n` documents per source over the life of the stream. Keyed
    * state is ONE counter per source — bounded however long the stream
    * runs and however hot a head domain gets (the same no-skewed-window
    * contract as the batch op, met here by keyed state instead of a
    * bounded aggregator). Admission is first-n in stream order (each
    * micro-batch processes in doc_id order, so an id-ordered replay
    * reproduces the batch op's lowest-n exactly — spec-pinned); the
    * batch op is the reconciliation pass when arrival order must not
    * decide, the usual streaming-cap caveat. */
  def cappedPerSource(docs: Dataset[SourceDoc], n: Int)
                     (implicit spark: SparkSession): Dataset[DocAdmit] = {
    import spark.implicits._
    require(n >= 1, s"cap must be >= 1, got $n")
    docs.groupByKey(_.source).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (src: String, rows: Iterator[SourceDoc], state: GroupState[Long]) =>
        var admitted = state.getOption.getOrElse(0L)
        val out = scala.collection.mutable.ArrayBuffer.empty[DocAdmit]
        // sort WITHIN the micro-batch (bounded) so replay determinism does
        // not depend on shuffle order inside a batch
        rows.toSeq.sortBy(_.doc_id).foreach { d =>
          if (admitted < n) { admitted += 1; out += DocAdmit(d.doc_id, src, admitted) }
        }
        state.update(admitted)
        out.iterator
    }
  }

  final case class TokenDoc(doc_id: Long, source: String, n_tokens: Long)

  /** Streaming face of [[graft.pipeline.Mixture.mixtureByTokenBudget]]:
    * admit documents per source while the source's admitted-token sum is
    * still below its budget — the arrival-order prefix. The doc that
    * crosses the budget is admitted (overshoot ≤ one document's tokens,
    * the streaming analogue of the batch op's ≤ one coin-bucket
    * overshoot), then the source closes for the life of the stream.
    * Keyed state is ONE running sum per budgeted source — bounded
    * however long the stream runs. Documents from unbudgeted sources
    * are dropped, as in the batch op. Arrival order decides membership
    * here where the batch op's keyed coin does — the batch op is the
    * order-free reconciliation pass, the [[cappedPerSource]] caveat. */
  def tokenBudgetAdmit(docs: Dataset[TokenDoc], budgets: Map[String, Long])
                      (implicit spark: SparkSession): Dataset[TokenDoc] = {
    import spark.implicits._
    require(budgets.nonEmpty && budgets.forall(_._2 >= 0), s"bad budgets $budgets")
    // Column filter, not a typed lambda: stays inside codegen and can
    // push into the stream's scan
    docs.filter(col("source").isin(budgets.keys.toSeq: _*))
      .groupByKey(_.source).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[TokenDoc], state: GroupState[Long]) =>
          val budget = budgets(src)
          var cum = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[TokenDoc]
          // sort WITHIN the micro-batch (bounded) so replay determinism
          // does not depend on shuffle order inside a batch
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            if (cum < budget) { cum += d.n_tokens; out += d }
          }
          state.update(cum)
          out.iterator
      }
  }

  /** Replay a BOUNDED documents table through [[tokenBudgetAdmit]] as real
    * micro-batches (MemoryStream, id-ordered slices) — the batch-parity
    * verification harness, driven by the oracle gate
    * (`q_stream_token_budget`): an id-ordered replay's admitted set is
    * exactly the id-ordered prefix whose pre-doc running token sum is
    * below budget, which the oracle expresses as one SQL window. Same
    * caveat as [[funnelDepthsReplayed]]: MemoryStream is a driver-side
    * source, so this is a VERIFICATION tool, not a production op. */
  def tokenBudgetReplayed(docs: DataFrame, budgets: Seq[(String, Long)],
                          chunks: Int = 4)
                         (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = docs.select(col("doc_id"), col("source"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .collect()
      .map(r => TokenDoc(r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_.doc_id)
    val name = "graft_token_budget_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[TokenDoc]
    val q = tokenBudgetAdmit(input.toDS(), budgets.toMap)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name)
      .collect().map(r => TokenDoc(r.getLong(0), r.getString(1), r.getLong(2)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq).select(
      col("source"), col("doc_id"), col("n_tokens"))
  }

  /** Replay a BOUNDED documents table through [[cappedPerSource]] as real
    * micro-batches (MemoryStream, id-ordered slices) and return the final
    * admitted set — the batch-parity verification harness at table scale,
    * driven by the oracle gate (`q_stream_source_cap`): because the
    * slices replay in ascending doc_id order, the streaming first-n
    * admits must equal batch [[graft.pipeline.Mixture.capPerSource]]'s
    * lowest-n-ids row-for-row. Same caveat as [[funnelDepthsReplayed]]:
    * MemoryStream is a driver-side source, so this is a VERIFICATION
    * tool, not a production op. */
  def sourceCapReplayed(docs: DataFrame, n: Int, chunks: Int = 4)
                       (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = docs.select(col("doc_id"), col("source")).collect()
      .map(r => SourceDoc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id)
    val name = "graft_source_cap_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SourceDoc]
    val q = cappedPerSource(input.toDS(), n)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name)
      .collect().map(r => DocAdmit(r.getLong(0), r.getString(1), r.getLong(2)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq).select(
      col("source"), col("doc_id"), col("rk"))
  }

  final case class DigestDoc(doc_id: Long, digest: String)

  /** Streaming ingest dedup: admit a document iff its content digest has
    * not been seen earlier in the stream — first occurrence wins, exactly
    * the admission rule of the batch digest store
    * ([[graft.pipeline.Dedup]]'s incremental ingest gate), expressed as
    * keyed state so a continuously crawled corpus can dedup AT ingest
    * instead of in a nightly reconciliation pass. State is one entry per
    * DISTINCT digest — the irreducible memory of exact streaming dedup
    * (identical to `dropDuplicates` state); an unbounded deployment pairs
    * this with the persisted digest store for the long tail and keeps only
    * the hot window in stream state. Within a micro-batch the smallest
    * doc_id of a digest wins, so an id-ordered replay reproduces the batch
    * min-id-per-digest rule bit-for-bit. */
  def dedupAdmit(docs: Dataset[DigestDoc])
                (implicit spark: SparkSession): Dataset[DigestDoc] = {
    import spark.implicits._
    docs.groupByKey(_.digest).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (dig: String, rows: Iterator[DigestDoc], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          Iterator.single(rows.minBy(_.doc_id))
        }
    }
  }

  /** Replay a BOUNDED documents table through [[dedupAdmit]] as real
    * micro-batches (MemoryStream, id-ordered slices) — the batch-parity
    * verification harness driven by the oracle gate (`q_stream_dedup`):
    * an id-ordered replay's admitted set must equal the batch
    * min-doc_id-per-md5 keepers row-for-row. Same caveat as
    * [[funnelDepthsReplayed]]: MemoryStream is a driver-side source, so
    * this is a VERIFICATION tool, not a production op. */
  def dedupReplayed(docs: DataFrame, chunks: Int = 4)
                   (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.md5(col("text")).as("digest"))
      .collect().map(r => DigestDoc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id)
    val name = "graft_dedup_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DigestDoc]
    val q = dedupAdmit(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name)
      .collect().map(r => DigestDoc(r.getLong(0), r.getString(1)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq).select(col("doc_id"), col("digest"))
  }

  /** [[dedupReplayed]] over a REAL FILE SOURCE: the table is staged into
    * `chunks` id-ordered parquet drop files (strictly increasing
    * modification times, lexicographic names), then replayed with
    * `spark.readStream.parquet` + `maxFilesPerTrigger=1` — one genuine
    * file-discovery micro-batch per drop file — through the same
    * [[dedupAdmit]] operator. This is the production source class (a crawl
    * directory that accretes files), so the gate proves the operator runs
    * beyond the MemoryStream test harness; the admitted set must still
    * equal the batch min-doc_id-per-digest keepers byte-for-byte.
    * Verification machinery (bench-excluded), like its MemoryStream twin. */
  def dedupFileReplayed(docs: DataFrame, chunks: Int = 4)
                       (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val rows = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.md5(col("text")).as("digest"))
      .collect().map(r => DigestDoc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id)
    val drop = java.nio.file.Files.createTempDirectory("graft-drop")
    val per = math.max(1, (rows.length + chunks - 1) / chunks)
    rows.grouped(per).zipWithIndex.foreach { case (c, i) =>
      val stage = java.nio.file.Files.createTempDirectory("graft-stage")
      spark.createDataset(c.toSeq).coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written under $stage"))
      val target = drop.resolve(f"chunk-$i%05d.parquet")
      java.nio.file.Files.move(part, target)
      // the file source orders new files by modification time: pin a
      // strictly increasing clock so replay order IS doc_id order (the
      // admission rule is order-sensitive by design)
      target.toFile.setLastModified(1600000000000L + i * 60000L)
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("digest",
          org.apache.spark.sql.types.StringType, nullable = true))))
      .option("maxFilesPerTrigger", 1)
      .parquet(drop.toString)
      .as[DigestDoc]
    val name = "graft_dedup_file_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val q = dedupAdmit(stream)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(name)
      .collect().map(r => DigestDoc(r.getLong(0), r.getString(1)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq).select(col("doc_id"), col("digest"))
  }

  /** [[manifestReplayed]] over the same real-file-source staging as
    * [[dedupFileReplayed]]: drop files replayed through `readStream` into
    * the continuous XOR fingerprint under Complete output mode. The final
    * row must equal the batch manifest byte-for-byte — the second gate
    * proving a streaming operator on the production source class (this
    * one exercises the Complete-mode aggregate path where the dedup gate
    * exercises Append-mode keyed state). */
  def manifestFileReplayed(docs: DataFrame, chunks: Int = 4)
                          (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val drop = java.nio.file.Files.createTempDirectory("graft-drop-mf")
    val per = math.max(1, (rows.length + chunks - 1) / chunks)
    rows.grouped(per).zipWithIndex.foreach { case (c, i) =>
      val stage = java.nio.file.Files.createTempDirectory("graft-stage-mf")
      spark.createDataset(c.toSeq).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written under $stage"))
      val target = drop.resolve(f"chunk-$i%05d.parquet")
      java.nio.file.Files.move(part, target)
      target.toFile.setLastModified(1600000000000L + i * 60000L)
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true))))
      .option("maxFilesPerTrigger", 1)
      .parquet(drop.toString)
    val name = "graft_manifest_file_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val q = manifestStream(stream)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq).toDF("n_rows", "xor_digest")
  }

  /** Streaming face of [[graft.pipeline.DataQuality.manifest]]:
    * continuous lake fingerprinting. XOR is commutative, associative, and
    * self-inverse, so the content digest is a PERFECT streaming aggregate
    * — constant state (one long + one count), no watermark needed, and
    * the running value after any prefix equals the batch manifest of that
    * prefix. An ingest pipeline keeps this query running and gets a
    * content-addressable snapshot identity for free. */
  def manifestStream(docs: DataFrame): DataFrame =
    docs
      .select(conv(substring(md5(col("text")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(bit_xor(col("h")), lit(0L)).as("xor_digest"))

  /** Replay gate for [[manifestStream]] (`q_stream_manifest`): the table
    * streams through in id-ordered micro-batches under Complete output
    * mode; the final row must equal the batch manifest — byte identity of
    * incremental and recomputed fingerprints. MemoryStream — verification
    * machinery (bench-excluded), not a production op. */
  def manifestReplayed(docs: DataFrame, chunks: Int = 4)
                      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val name = "graft_manifest_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = manifestStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq).toDF("n_rows", "xor_digest")
  }

  /** Streaming ER admission replay gate (`q_stream_er`): micro-batches
    * of records admit into the PERSISTENT ER store
    * ([[graft.pipeline.FuzzyJoin.erAdmit]]) through `foreachBatch` — the
    * incremental-store path as a streaming CONSUMER, which is its
    * production shape (a record stream continuously joining existing
    * clusters, each batch paying one blocked batch×store join). After
    * the last batch, [[graft.pipeline.FuzzyJoin.erLabels]] must equal
    * the one-shot corpus run label-for-label (the same closure oracle as
    * `q_entity_resolution`, by the admit path's edge-completeness
    * argument). MemoryStream + driver feeding — verification machinery
    * (bench-excluded), not a production op. */
  def erAdmitReplayed(records: DataFrame, storeDir: String,
                      idCol: String, strCol: String,
                      maxDist: Int, qgram: Int, maxGramDf: Int,
                      chunks: Int = 3)
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = records.select(col(idCol), col(strCol))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = input.toDS().toDF(idCol, strCol).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        graft.pipeline.FuzzyJoin.erAdmit(batch.toDF(), storeDir,
          idCol, strCol, maxDist, qgram, maxGramDf)
      }
      .start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { c =>
        input.addData(c.toSeq); stream.processAllAvailable()
      }
    } finally stream.stop()
    graft.pipeline.FuzzyJoin.erLabels(spark, storeDir, idCol)
  }

  /** Streaming face of golden-record survivorship
    * ([[graft.pipeline.FuzzyJoin.goldenRecords]], the MDM pipeline's
    * last batch-only stage until r16): maintain per-(entity, attribute,
    * value) counts as ONE streaming aggregate — counts are a perfect
    * streaming shape (no watermark needed: an entity can always receive
    * more records; state is one row per distinct (entity, attr, value),
    * ≪ the record stream) — so survivorship UPDATES with admissions.
    * The k per-attribute max_by finishers run batch-side over the
    * maintained table
    * ([[graft.pipeline.FuzzyJoin.goldenFromCounts]]): Spark permits one
    * stateful aggregation per streaming query, and the finisher is a
    * cheap reference-data pass, the `spikeFlags` pattern. NULL values
    * keep their count rows — they carry the entity's existence for the
    * finisher's base set. Attributes must share one (string) type (the
    * unpivot's price; the typed general op stays batch). */
  def goldenCounts(records: DataFrame, entityCol: String,
                   valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "goldenCounts needs at least one attribute")
    require(valueCols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"attribute names must be plain identifiers, got $valueCols")
    val stacked = s"stack(${valueCols.size}, " +
      valueCols.map(c => s"'$c', $c").mkString(", ") + ") as (__attr, __value)"
    records.select(col(entityCol), expr(stacked))
      .groupBy(col(entityCol), col("__attr"), col("__value"))
      .agg(count(lit(1)).as("__n"))
  }

  /** Replay gate for streaming survivorship (`q_stream_golden`, the
    * 14th replay gate): the records table streams through
    * [[goldenCounts]] in id-ordered micro-batches under Complete output
    * mode; the finisher over the final counts table must equal batch
    * [[graft.pipeline.FuzzyJoin.goldenRecords]] row-for-row (it shares
    * `q_golden_records`' window-rank oracle verbatim — the aggregate is
    * order-free, so equality holds for ANY arrival order). MemoryStream
    * — verification machinery (bench-excluded), not a production op. */
  def goldenReplayed(records: DataFrame, chunks: Int = 4)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = records.select(col("entity"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val name = "graft_golden_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = goldenCounts(input.toDS().toDF("entity", "lang", "source"),
        "entity", Seq("lang", "source"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    // materialize the sink's rows before the finisher: the memory-sink
    // view hands out the SAME attribute ids on every reference, so the
    // finisher's self-joins would hit conflicting-reference analysis
    // errors reading it directly (and the harness collects anyway)
    val countRows = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    spark.catalog.dropTempView(name)
    val counts = spark.createDataset(countRows.toSeq)
      .toDF("entity", "__attr", "__value", "__n")
    val out = graft.pipeline.FuzzyJoin
      .goldenFromCounts(counts, "entity", Seq("lang", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    spark.createDataset(out.toSeq).toDF("entity", "lang", "source")
  }

  final case class CdcOp(o_orderkey: Long, o_custkey: Long,
                         o_orderstatus: String, o_totalprice: Double,
                         op: String, seq: Long)

  /** Streaming lake maintenance END TO END (15th replay gate,
    * `q_stream_cdc_snapshot`): a CDC op log consumed as seq-ordered
    * micro-batches through `foreachBatch` — each batch compacts to
    * last-op-per-key ([[graft.pipeline.Lakehouse.compactLog]]) and
    * applies to the snapshot lake partition-pruned and atomic
    * ([[graft.pipeline.Lakehouse.applyCdcSnapshot]]), so EVERY
    * intermediate state is a committed, time-travelable snapshot and a
    * crash between batches loses nothing committed. The final
    * `readSnapshot` must equal the batch
    * `applyCdc(target, compactLog(log))` row-for-row: seq-ordered
    * batches make the per-batch last-writer-wins fold equal the global
    * one. MemoryStream + driver feeding — verification machinery
    * (bench-excluded), not a production op. */
  def cdcSnapshotReplayed(target: DataFrame, log: DataFrame, root: String,
                          chunks: Int = 3)
                         (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pOf = (col("o_orderkey") % 4).cast("int")
    val base = target.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), pOf.as("p"))
    graft.pipeline.Lakehouse.commitSnapshot(spark, root,
      (0 to 3).map(i => s"p=$i" -> base.filter(col("p") === i)))
    val rows = log.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("op"), col("seq"))
      .collect().map(r => CdcOp(r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4), r.getLong(5)))
      .sortBy(c => (c.seq, c.o_orderkey))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[CdcOp]
    val stream = input.toDS().toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val compacted = graft.pipeline.Lakehouse.compactLog(
          batch.toDF().withColumn("p", pOf), Seq("o_orderkey"), "seq")
        graft.pipeline.Lakehouse.applyCdcSnapshot(spark, root, compacted,
          Seq("o_orderkey"), "p")
        ()
      }
      .start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { c =>
        input.addData(c.toSeq); stream.processAllAvailable()
      }
    } finally stream.stop()
    graft.pipeline.Lakehouse.readSnapshot(spark, root)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
  }

  /** Streaming changes-feed replication replay gate
    * (`q_stream_changes_feed`): the END-TO-END lake composition — the
    * CDC stream folds into per-batch snapshot commits (exactly
    * [[cdcSnapshotReplayed]]'s pipe) while a DOWNSTREAM consumer keeps a
    * replica in sync by reading ONLY
    * [[graft.pipeline.Lakehouse.snapshotChanges]] between the epoch it
    * last applied and the batch's committed id — it bootstraps from
    * epoch 1 and never reads the table again. The final replica must
    * equal the batch `applyCdc(target, compactLog(log))` row-for-row:
    * every change reaches the replica exactly once because the feed is
    * derived from immutable manifests between dense per-batch epochs
    * (an empty batch commits nothing and the feed sees nothing).
    * MemoryStream + driver feeding — verification machinery
    * (bench-excluded), not a production op. */
  def changesFeedReplayed(target: DataFrame, log: DataFrame, root: String,
                          replicaRoot: String, chunks: Int = 3)
                         (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pOf = (col("o_orderkey") % 4).cast("int")
    val base = target.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), pOf.as("p"))
    val bootId = graft.pipeline.Lakehouse.commitSnapshot(spark, root,
      (0 to 3).map(i => s"p=$i" -> base.filter(col("p") === i)))
    def repDir(g: Int) = s"$replicaRoot/r$g"
    var repGen = 1
    base.write.mode("overwrite").parquet(repDir(repGen))
    var lastSeen = bootId
    val valCols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "p")
    val rows = log.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("op"), col("seq"))
      .collect().map(r => CdcOp(r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4), r.getLong(5)))
      .sortBy(c => (c.seq, c.o_orderkey))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[CdcOp]
    val stream = input.toDS().toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val compacted = graft.pipeline.Lakehouse.compactLog(
          batch.toDF().withColumn("p", pOf), Seq("o_orderkey"), "seq")
        val nid = graft.pipeline.Lakehouse.applyCdcSnapshot(spark, root,
          compacted, Seq("o_orderkey"), "p")
        if (nid != lastSeen) { // an empty batch committed nothing
          val diff = graft.pipeline.Lakehouse.snapshotChanges(spark, root,
            lastSeen, nid, Seq("o_orderkey"))
          val ups = diff.filter(col("change_type") =!= "D")
            .select(col("o_orderkey") +:
              valCols.map(c => col(s"new_$c").as(c)): _*)
          val dels = diff.filter(col("change_type") === "D")
            .select("o_orderkey")
          val cur = spark.read.parquet(repDir(repGen))
          val next = graft.pipeline.Lakehouse.mergeUpsert(
            cur.join(dels, Seq("o_orderkey"), "left_anti"), ups,
            Seq("o_orderkey"))
          repGen += 1
          next.write.mode("overwrite").parquet(repDir(repGen))
          lastSeen = nid
        }
        ()
      }
      .start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { c =>
        input.addData(c.toSeq); stream.processAllAvailable()
      }
    } finally stream.stop()
    spark.read.parquet(repDir(repGen))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
  }

  /** LAKE AS A STREAMING SOURCE (17th replay gate, `q_stream_lake_feed`)
    * — the Delta-CDF-style composition the batch
    * [[graft.pipeline.Lakehouse.snapshotChanges]] feed was missing: a
    * Structured Streaming FILE source watches the lake's own manifest
    * lineage (`_graft_lake/snap-*`), so each committed snapshot file IS
    * the push signal — no poller, no side channel, checkpointed and
    * replayable like any file stream. Every discovered epoch n
    * contributes exactly `snapshotChanges(n-1, n)` (epoch 1 bootstraps
    * as the full snapshot read as inserts); snapshot ids are dense by
    * the commit protocol, so the per-epoch delta needs NO cross-batch
    * state — a restart re-deriving unseen epochs from the checkpoint is
    * trivially correct. Requires GC retention ≥ consumer lag (the
    * standard CDF contract: epoch n-1's manifest must still be kept
    * when n is consumed).
    *
    * The gate drives a multi-commit schedule (boot + per-chunk CDC
    * batches committed WHILE the stream runs) and maintains a replica
    * ONLY from the feed; the replica must equal the CDC fold's own
    * table row-for-row. MemoryStream-free — the source here is the
    * lake itself; driver feeding is verification machinery
    * (bench-excluded), not a production op. */
  def lakeFeedReplayed(target: DataFrame, log: DataFrame, root: String,
                       replicaRoot: String, chunks: Int = 3)
                      (implicit spark: SparkSession): DataFrame = {
    val pOf = (col("o_orderkey") % 4).cast("int")
    val base = target.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), pOf.as("p"))
    graft.pipeline.Lakehouse.commitSnapshot(spark, root,
      (0 to 3).map(i => s"p=$i" -> base.filter(col("p") === i)))
    def repDir(g: Int) = s"$replicaRoot/r$g"
    var repGen = 0 // no replica until the feed delivers epoch 1
    val valCols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "p")
    // the gate drives the PRODUCTION entry point — the public
    // changesStream delivers every epoch (bootstrap included) in the
    // uniform I/U/D shape; this harness only folds it into a replica
    val stream = graft.pipeline.Lakehouse.changesStream(spark, root,
      Seq("o_orderkey"), s"$replicaRoot/ckpt") { (_, diff) =>
      val ups = diff.filter(col("change_type") =!= "D")
        .select(col("o_orderkey") +:
          valCols.map(c => col(s"new_$c").as(c)): _*)
      val dels = diff.filter(col("change_type") === "D")
        .select("o_orderkey")
      val next =
        if (repGen == 0) ups
        else graft.pipeline.Lakehouse.mergeUpsert(
          spark.read.parquet(repDir(repGen))
            .join(dels, Seq("o_orderkey"), "left_anti"),
          ups, Seq("o_orderkey"))
      repGen += 1
      next.write.mode("overwrite").parquet(repDir(repGen))
    }
    try {
      stream.processAllAvailable() // deliver the bootstrap epoch
      val rows = log.orderBy(col("seq"), col("o_orderkey"))
      val n = rows.count()
      val per = math.max(1L, (n + chunks - 1) / chunks)
      // commit per-chunk CDC batches WHILE the stream runs — each commit
      // is one new snap file the source discovers on the next trigger
      val seqs = rows.select(col("seq")).collect().map(_.getLong(0))
      seqs.grouped(per.toInt).foreach { band =>
        val lo = band.min
        val hi = band.max
        val chunk = log.filter(col("seq") >= lo && col("seq") <= hi)
        val compacted = graft.pipeline.Lakehouse.compactLog(
          chunk.withColumn("p", pOf), Seq("o_orderkey"), "seq")
        graft.pipeline.Lakehouse.applyCdcSnapshot(spark, root, compacted,
          Seq("o_orderkey"), "p")
        stream.processAllAvailable()
      }
    } finally stream.stop()
    spark.read.parquet(repDir(repGen))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
  }

  /** Streaming CDC compaction replay gate (`q_stream_cdc_compact`): the
    * SAME declarative [[graft.pipeline.Lakehouse.compactLog]] plan runs
    * UNCHANGED on a stream — `max_by` is a perfect streaming aggregate
    * with one (seq, payload) state entry per key and no watermark (a key
    * can always change again) — so an op log consumed as micro-batches
    * compacts CONTINUOUSLY, and the Complete-mode table after the last
    * batch must equal the batch compaction row-for-row (incl. `D`
    * tombstones, which downstream [[graft.pipeline.Lakehouse.applyCdc]]
    * consumes). Chunks replay in (seq, key) order — later generations
    * arrive in later micro-batches, the realistic log-tail order — but
    * the aggregate is order-free, so equality holds for ANY arrival
    * order. MemoryStream — verification machinery (bench-excluded), not
    * a production op. */
  def cdcCompactReplayed(log: DataFrame, chunks: Int = 4)
                        (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = log.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("op"), col("seq"))
      .collect().map(r => CdcOp(r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4), r.getLong(5)))
      .sortBy(c => (c.seq, c.o_orderkey))
    val name = "graft_cdc_compact_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CdcOp]
    val q = graft.pipeline.Lakehouse
      .compactLog(input.toDS().toDF(), Seq("o_orderkey"), "seq")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq).toDF("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice", "op")
  }

  /** Streaming face of the batch anomaly gate (`q_events_anomaly`): the
    * watermarked hourly-count stream joins a PRECOMPUTED per-type median
    * table (stream-static and broadcast — medians come from the batch
    * histogram op and refresh out-of-band, the standard reference-data
    * pattern) and every closed window emits its spike flag. State is the
    * windowed aggregation's, bounded by the watermark; the join adds
    * none. */
  def spikeFlags(events: DataFrame, medians: DataFrame,
                 watermark: String = "2 hours"): DataFrame =
    hourlyCounts(events, watermark)
      .join(broadcast(medians), Seq("event_type"))
      .select(col("event_type"), col("hour"), col("cnt"),
        (col("cnt") >= col("med") * lit(2L)).as("is_spike"))

  /** Event-time replay gate for [[spikeFlags]] (`q_stream_anomaly`): the
    * bounded table streams through real micro-batches in event-time order
    * with a flush sentinel 4 h past the last event, so the 2 h watermark
    * closes every real window and append mode emits each flag exactly
    * once; the oracle recomputes flags batch-side. MemoryStream is a
    * driver-side source — VERIFICATION machinery (bench-excluded), not a
    * production op. */
  def spikeFlagsReplayed(events: DataFrame, medians: DataFrame,
                         chunks: Int = 4)
                        (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val real = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .collect()
      .map(r => (Math.floorDiv(r.getLong(1), 1000L), r.getLong(0), r.getLong(2), r.getString(3)))
      .sortBy(e => (e._1, e._2))
      .map { case (us, id, user, tpe) => Event(id, tsOf(us), user, tpe, 0.0) }
    val flushUs = Math.floorDiv(events.agg(max(col("ts"))).head().getLong(0),
      1000L) + 4L * 3600000000L
    val evs = real :+ Event(-1L, tsOf(flushUs), -1L, "__flush", 0.0)
    val name = "graft_anomaly_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = spikeFlags(input.toDS().toDF(), medians)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val per = math.max(1, (evs.length + chunks - 1) / chunks)
      evs.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    // the sentinel's own window never emits: it is younger than the final
    // watermark, and an inner join to the medians would drop it anyway
    val out = spark.table(name)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getBoolean(3)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq)
      .toDF("event_type", "hour", "cnt", "is_spike")
  }

  /** Watermarked stream-stream interval join: attribute each purchase to a
    * click by the same user within the preceding `windowMinutes`. Both sides
    * carry watermarks and the join condition bounds event-time distance, so
    * Spark can evict state for rows past the watermark — the unbounded twin
    * of the reference's dependent-join batching (§2.3) and of the batch
    * as-of query (`q_asof_attribution`). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        windowMinutes: Int = 30,
                        watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Event-time replay gate for [[clickPurchaseJoin]] (`q_stream_interval`):
    * both sides fed as MemoryStreams in global event-time order, so every
    * click a purchase needs is still in join state when the purchase
    * arrives (the watermark trails by an hour — more than the 30-minute
    * match window) and the inner interval join emits the complete pair
    * set; the oracle states the same predicate as one SQL inequality
    * join over the batch table. MemoryStream is driver-side —
    * VERIFICATION machinery (bench-excluded), not a production op. */
  def intervalJoinReplayed(events: DataFrame, windowMinutes: Int = 30,
                           chunks: Int = 4)
                          (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .collect()
      .map(r => (Math.floorDiv(r.getLong(1), 1000L), r.getLong(0), r.getLong(2), r.getString(3)))
      .sortBy(e => (e._1, e._2))
      .map { case (us, id, user, tpe) => Event(id, tsOf(us), user, tpe, 0.0) }
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val purchases = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val name = "graft_interval_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val q = clickPurchaseJoin(clicks.toDS().toDF(), purchases.toDS().toDF(),
        windowMinutes)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val per = math.max(1, (evs.length + chunks - 1) / chunks)
      evs.grouped(per).foreach { c =>
        clicks.addData(c.filter(_.event_type == "click").toSeq)
        purchases.addData(c.filter(_.event_type == "purchase").toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val out = spark.table(name)
      .select(col("user_id"), col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq).toDF("user_id", "purchase_id", "click_id")
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(sessionId: Long, lastTs: Long, count: Long)
  final case class SessionAssignment(user_id: Long, event_id: Long,
                                     session_id: Long, events_in_session: Long)

  final case class FunnelState(depth: Int, lastTs: Long)
  final case class FunnelProgress(user_id: Long, depth: Int)

  /** Streaming face of [[graft.pipeline.Funnels.funnelDepth]]: per-user
    * keyed state is (depth, timestamp of the last matched step) — two
    * fields per active user, however long the stream runs. Each batch's
    * events process in event-time order; an event advances the funnel iff
    * it is the next required step strictly after the last match
    * (earliest-completion, like the batch op). Emits a row whenever a
    * user's depth grows. In-order delivery reproduces the batch depths
    * exactly (spec-pinned); an event arriving after a later-step match
    * has already consumed its slot cannot retro-match — the usual
    * streaming-funnel caveat, the batch op is the reconciliation. */
  def funnelProgress(events: Dataset[Event], steps: Seq[String])
                    (implicit spark: SparkSession): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    // full microsecond precision (Spark's timestamp resolution) —
    // Timestamp.getTime truncates to millis, which would let two
    // sub-millisecond-apart steps violate the strict > the batch op and
    // oracle apply
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[Event], state: GroupState[FunnelState]) => {
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelProgress]
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (st.depth < steps.length &&
                e.event_type == steps(st.depth) && micros(e.ts) > st.lastTs) {
              st = FunnelState(st.depth + 1, micros(e.ts))
              out += FunnelProgress(user, st.depth)
            }
          }
          state.update(st)
          out.iterator
        })
  }

  /** Replay a BOUNDED event table through [[funnelProgress]] as real
    * micro-batches (MemoryStream, `chunks` in-order slices) and return
    * each user's final depth — the batch-parity verification harness at
    * table scale, driven by the oracle gate (`q_stream_funnel`): batch
    * [[graft.pipeline.Funnels.funnelDepth]] restricted to progressing
    * users must match row-for-row. Collects the events to the driver to
    * feed the stream (MemoryStream is a driver-side source), so this is
    * a VERIFICATION tool, not a production op — production streams read
    * `readStream` sources and never materialize history. `tsCol` is
    * nanosecond epoch longs (the events table's layout); feeding
    * truncates to Spark's microsecond timestamp resolution, which is
    * exact parity territory whenever distinct event times differ by
    * ≥ 1 µs (the synthetic tables' minimum gap is ~59 ms). */
  def funnelDepthsReplayed(events: DataFrame, steps: Seq[String],
                           chunks: Int = 4)
                          (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .collect()
      .map(r => (Math.floorDiv(r.getLong(1), 1000L), r.getLong(0), r.getLong(2), r.getString(3)))
      .sortBy(e => (e._1, e._2))
      .map { case (us, id, user, tpe) => Event(id, tsOf(us), user, tpe, 0.0) }
    val name = "graft_funnel_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = funnelProgress(input.toDS(), steps)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val per = math.max(1, (evs.length + chunks - 1) / chunks)
      evs.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name).groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("depth").as("depth"))
      .collect().map(r => FunnelProgress(r.getLong(0), r.getInt(1)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq).toDF("user_id", "depth")
  }

  final case class RetentionState(cohort: Long, seen: Set[Long])
  final case class RetentionHit(user_id: Long, cohort: Long, offset_weeks: Long)

  /** Streaming face of [[graft.pipeline.Funnels.retention]]: per-user
    * state is (cohort week, set of weeks already reported) — bounded by
    * the user's active weeks, not their event count. Emits one row the
    * first time a user is seen in a week; a downstream streaming
    * `groupBy(cohort, offset_weeks).count` is the live retention
    * triangle. Caveat shared with any incremental cohort system: events
    * arriving BEFORE the user's current cohort week re-anchor the cohort
    * in batch but cannot retroactively do so in-stream; in-order arrival
    * reproduces the batch triangle exactly (spec-pinned). */
  def retentionHits(events: Dataset[Event],
                    bucketMillis: Long = 7L * 86400L * 1000L)
                   (implicit spark: SparkSession): Dataset[RetentionHit] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[Event], state: GroupState[RetentionState]) => {
          val weeks = it.map(e => Math.floorDiv(e.ts.getTime, bucketMillis))
            .toSeq.sorted
          var st = state.getOption.getOrElse(
            RetentionState(weeks.headOption.getOrElse(0L), Set.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[RetentionHit]
          weeks.foreach { wk =>
            if (!st.seen.contains(wk)) {
              st = st.copy(seen = st.seen + wk)
              out += RetentionHit(user, st.cohort, wk - st.cohort)
            }
          }
          state.update(st)
          out.iterator
        })
  }

  /** Replay a BOUNDED event table through [[retentionHits]] in event-time
    * order and aggregate the hits into the retention triangle — the
    * batch-parity harness for keyed cohort state, driven by the oracle
    * gate (`q_stream_retention`): in-order arrival anchors each user's
    * cohort at their true first week, so the streamed triangle equals the
    * batch [[graft.pipeline.Funnels.retention]] exactly (ms-truncated
    * bucketing is exact: floor(floor(ns/10⁶)/wkMs) = floor(ns/wkNs)).
    * Same caveat as [[funnelDepthsReplayed]]: MemoryStream is driver-side
    * — a VERIFICATION tool, not a production op. */
  def retentionReplayed(events: DataFrame, chunks: Int = 4)
                       (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .collect()
      .map(r => (Math.floorDiv(r.getLong(1), 1000L), r.getLong(0), r.getLong(2), r.getString(3)))
      .sortBy(e => (e._1, e._2))
      .map { case (us, id, user, tpe) => Event(id, tsOf(us), user, tpe, 0.0) }
    val name = "graft_retention_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = retentionHits(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val per = math.max(1, (evs.length + chunks - 1) / chunks)
      evs.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name)
      .groupBy("cohort", "offset_weeks")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).cast("long").as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq)
      .toDF("cohort", "offset_weeks", "n_users")
  }

  /** Gap-based sessionization with explicit keyed state
    * (`flatMapGroupsWithState`): a new session starts when the gap to the
    * previous event exceeds `gapMinutes`. Per-user state is one small
    * record; timeout evicts idle users. Full microsecond precision
    * (Spark's timestamp resolution) so an in-order replay agrees with the
    * batch window form at every boundary — the strictly-greater-than-gap
    * rule is the same on both sides. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30)
                (implicit spark: SparkSession): Dataset[SessionAssignment] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          val out = it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).map { e =>
            val t = micros(e.ts)
            st =
              if (st.lastTs == Long.MinValue || t - st.lastTs <= gapUs)
                st.copy(lastTs = t, count = st.count + 1)
              else SessionState(st.sessionId + 1, t, 1L)
            SessionAssignment(user, e.event_id, st.sessionId, st.count)
          }
          state.update(st)
          out.iterator
        })
  }

  /** Replay a BOUNDED event table through [[sessionize]] as real
    * micro-batches in event-time order — the batch-parity verification
    * harness for stateful sessionization, driven by the oracle gate
    * (`q_stream_sessions`): an in-order replay's assignments must equal
    * the batch window form (`q_sessions`) row-for-row, sessions spanning
    * micro-batch boundaries included. Same caveat as
    * [[funnelDepthsReplayed]]: MemoryStream is a driver-side source —
    * a VERIFICATION tool, not a production op. */
  def sessionsReplayed(events: DataFrame, gapMinutes: Int = 30,
                       chunks: Int = 4)
                      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .collect()
      .map(r => (Math.floorDiv(r.getLong(1), 1000L), r.getLong(0), r.getLong(2), r.getString(3)))
      .sortBy(e => (e._1, e._2))
      .map { case (us, id, user, tpe) => Event(id, tsOf(us), user, tpe, 0.0) }
    val name = "graft_sessions_replay_" +
      java.util.UUID.randomUUID().toString.filter(_ != '-')
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMinutes)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      val per = math.max(1, (evs.length + chunks - 1) / chunks)
      evs.grouped(per).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.dropTempView(name)
    spark.createDataset(out.toSeq.sortBy(t => (t._1, t._2)))
      .toDF("user_id", "event_id", "session_id")
  }
}
