package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** Round-8 operators: exact stratified sampling, dedup/search
  * compositions. */
class Round8Spec extends SparkTestBase {

  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  // ---- stratifiedSampleExact ------------------------------------------------

  test("stratifiedSampleExact equals the window-form reference, no Window node") {
    val n = 5
    val got = Mixture.stratifiedSampleExact(docs, n, salt = "s8")
    val coin = conv(substring(
      md5(concat(lit("s8"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val want = docs
      .withColumn("b", coin)
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("source").orderBy("b", "doc_id")).cast("long"))
      .filter(col("rk") <= n)
      .select("source", "doc_id", "rk")
    assert(got.collect().map(_.toSeq).toSet == want.collect().map(_.toSeq).toSet)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"stratifiedSampleExact must not window:\n$plan")
  }

  test("stratifiedSampleExact is seed-stable and nested in n") {
    val a = Mixture.stratifiedSampleExact(docs, 6, "seedA").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val a2 = Mixture.stratifiedSampleExact(docs, 6, "seedA").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == a2, "same salt must reproduce the same sample")
    // nesting: the n=3 sample is exactly the rk<=3 prefix of the n=6 one
    val small = Mixture.stratifiedSampleExact(docs, 3, "seedA").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(small == a.filter(_._3 <= 3), "smaller n must be a prefix sample")
    // a different salt draws a genuinely different sample
    val b = Mixture.stratifiedSampleExact(docs, 6, "seedB").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a != b, "different salts should draw different samples")
  }

  // ---- dedupCorpusWithContainment -------------------------------------------

  test("dedupCorpusWithContainment removes quoted-subset docs plain dedupCorpus keeps") {
    val s = spark
    import s.implicits._
    val quote = (1 to 12).map(i => s"q$i").mkString(" ") // 12 tokens, 5 8-grams
    val bigA = s"intro text here $quote and a very long unrelated tail " +
      (1 to 60).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, bigA, "src0"),            // container: keeps (min id of component)
      (2L, quote, "src0"),           // contained verbatim — low Jaccard vs A
      (3L, "completely different text about nothing shared", "src1"),
      (4L, "completely different text about nothing shared", "src1") // exact dup of 3
    ).toDF("doc_id", "text", "source")
    val plain = Dedup.dedupCorpus(df).select("doc_id").collect().map(_.getLong(0)).toSet
    val full = Dedup.dedupCorpusWithContainment(df)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(plain == Set(1L, 2L, 3L), s"plain dedup should keep the quote doc: $plain")
    assert(full == Set(1L, 3L), s"containment edge must fold doc 2 into doc 1: $full")
  }

  test("addToTermIndex: append-then-probe equals the full-corpus index") {
    val first = docs.filter(col("doc_id") < 300)
    val rest = docs.filter(col("doc_id") >= 300)
    // per-RUN unique identity string -> fresh table + path every run (a
    // fixed identity would re-register the PREVIOUS run's already-appended
    // layout from its marker — exactly the cross-JVM reuse materialize
    // provides — and 'before' would start at the full corpus)
    val ident = sfDir + "#inc-" + java.util.UUID.randomUUID().toString.take(8)
    val idx = Search.buildTermIndex(spark, first, ident, buckets = 4)
    val before = Search.indexedKeywordStats(idx, Seq("join", "stream"))
      .collect().map(_.toSeq).toSet
    val idx2 = Search.addToTermIndex(spark, rest, ident, buckets = 4)
    val after = Search.indexedKeywordStats(idx2, Seq("join", "stream"))
      .collect().map(_.toSeq).toSet
    val full = Search.keywordStats(docs, Seq("join", "stream"))
      .collect().map(_.toSeq).toSet
    assert(after == full, "appended index must serve corpus-consistent stats")
    assert(before != after, "the append must actually change the index")
    // idempotence: replaying the same batch must change nothing (the
    // anti-join admit discipline — a retry cannot double-count tf rows)
    val again = Search.addToTermIndex(spark, rest, ident, buckets = 4)
    val replayed = Search.indexedKeywordStats(again, Seq("join", "stream"))
      .collect().map(_.toSeq).toSet
    assert(replayed == full, "a replayed append must be a no-op")
    // probe over the appended layout still prunes buckets and stays
    // Exchange-free — the spec lives in table metadata, not file counts
    val plan = Search.indexedKeywordStats(idx2, Seq("join", "stream"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount") &&
      !plan.contains("Exchange hashpartitioning"), plan)
  }

  test("sampleExact: global n-sample is seed-stable, nested, and coin-ordered") {
    val a = Mixture.sampleExact(docs, 10, "gs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.size == 10 && a.map(_._2) == (1L to 10L).toSet)
    val a2 = Mixture.sampleExact(docs, 10, "gs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == a2)
    val small = Mixture.sampleExact(docs, 4, "gs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(small == a.filter(_._2 <= 4))
  }

  test("mixtureByTokenBudget: prefix semantics, budget reach, short-source keep-all") {
    val budgets = Seq("src0" -> 700L, "src1" -> 100000L)
    val got = Mixture.mixtureByTokenBudget(docs, budgets, "tbs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = got.groupBy(_._2)
    // only budgeted sources appear
    assert(bySrc.keySet == Set("src0", "src1"))
    // a budget beyond the source total keeps the whole source
    val allSrc1 = docs.filter(col("source") === "src1").count()
    assert(bySrc("src1").length == allSrc1)
    // the kept set reaches the budget (or is the whole source), and is a
    // COIN-ORDER PREFIX: every kept doc's coin bucket <= every dropped one's
    val keptTokens = bySrc("src0").map(_._3).sum
    assert(keptTokens >= 700L, s"budget not reached: $keptTokens")
    val coin = conv(substring(
      md5(concat(lit("tbs"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val src0 = docs.filter(col("source") === "src0")
      .select(col("doc_id"), (coin / lit(1L << 22)).cast("int").as("cb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val keptIds = bySrc("src0").map(_._1).toSet
    val maxKept = keptIds.map(src0).max
    val droppedBuckets = src0.filterNot { case (id, _) => keptIds(id) }.values
    assert(droppedBuckets.forall(_ > maxKept),
      "kept set must be a coin-bucket prefix")
  }

  test("topTerms: per-doc ranking matches a brute-force recomputation") {
    val got = TextAnalysis.topTerms(docs, k = 2, maxDf = 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // brute force on the driver
    val toks = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty))
    val tf = toks.flatMap { case (id, ws) => ws.map(w => (id, w)) }
      .groupBy(identity).map { case ((id, w), xs) => (id, w, xs.length.toLong) }.toSeq
    val dfm = tf.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val want = tf.map { case (id, w, n) => (id, w, n, dfm(w)) }
      .filter(_._4 <= 20)
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(t => (-t._3, t._4, t._2)).take(2).zipWithIndex
          .map { case ((id, w, n, d), i) => (id, w, n, d, (i + 1).toLong) }
      }.toSet
    assert(got.toSet == want)
  }

  test("bounded-aggregator ops plan a partial aggregate below the shuffle") {
    // the skew-immunity contract: map tasks fold rows into <=2n-pair
    // buffers per stratum BEFORE the exchange, so the shuffle carries
    // merged buffers, never the corpus (plan order in toString is final
    // agg, Exchange, partial agg)
    for (df <- Seq(Mixture.capPerSource(docs, 5),
                   Mixture.stratifiedSampleExact(docs, 5, "pp"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert("(?s)ObjectHashAggregate.*Exchange.*ObjectHashAggregate".r
        .findFirstIn(plan).isDefined,
        s"expected a partial ObjectHashAggregate below the exchange:\n$plan")
    }
  }

  // ---- prepareCorpus --------------------------------------------------------

  test("prepareCorpus: funnel rejects and dup components are gone, splits match") {
    val out = Prepare.prepareCorpus(docs, valFrac = 0.2, testFrac = 0.2,
      salt = "p8").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ids = out.map(_._1).toSet
    // stage parity: funnel-keep set
    val keep = TextAnalysis.filterFunnel(docs).filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(keep), "prepared corpus must pass the funnel")
    // dedup parity over the funnel survivors
    val kept = docs.join(
      TextAnalysis.filterFunnel(docs).filter(col("keep")).select("doc_id"),
      Seq("doc_id"))
    val dedupIds = Dedup.dedupCorpus(kept).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == dedupIds, "prepared ids must be the dedup survivors")
    // split parity with the standalone op
    val splits = Mixture.splitAssign(kept, 0.2, 0.2, "p8").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.forall { case (id, _, sp) => splits(id) == sp })
    // and the certification loop closes: no cross-split near-dups remain
    val leak = Mixture.splitLeakage(
      docs.join(spark.createDataset(ids.toSeq)(org.apache.spark.sql.Encoders.scalaLong)
        .toDF("doc_id"), Seq("doc_id")),
      0.2, 0.2, "p8")
    assert(leak.isEmpty, "prepared corpus must have no cross-split near-dups")
  }

  // ---- splitLeakage ---------------------------------------------------------

  test("splitLeakage reports exactly the near-dup pairs that straddle splits") {
    val got = Mixture.splitLeakage(docs, valFrac = 0.3, testFrac = 0.3,
      salt = "leak1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    // reference: all verified pairs × independent split assignment
    val splits = Mixture.splitAssign(docs, 0.3, 0.3, "leak1").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = Dedup.verifiedNearDups(docs, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = pairs.map { case (a, b) => (a, b, splits(a), splits(b)) }
      .filter(t => t._3 != t._4).toSet
    assert(got.toSet == want)
    assert(got.forall(t => t._3 != t._4))
    // the fixture must actually exercise the check at this sf
    assert(got.nonEmpty, "expected at least one straddling near-dup pair")
  }

  // ---- term index × bucketing -----------------------------------------------

  test("term index probe: bucket-pruned scan, Exchange-free df aggregation, scan parity") {
    val idx = Search.buildTermIndex(spark, docs, sfDir, buckets = 8)
    val probe = Search.indexedKeywordStats(idx, Seq("join", "stream", "dup"))
    val plan = probe.queryExecution.executedPlan.toString
    // bucket pruning: only the query terms' buckets are read
    assert(plan.contains("SelectedBucketsCount"),
      s"index probe must prune buckets:\n$plan")
    // the df groupBy(term) inherits the scan's HashPartitioning(term):
    // no shuffle anywhere in the probe (the df join side is broadcast)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"index probe must not re-shuffle:\n$plan")
    val viaIndex = probe.collect().map(_.toSeq).toSet
    val viaScan = Search.keywordStats(docs, Seq("join", "stream", "dup"))
      .collect().map(_.toSeq).toSet
    assert(viaIndex == viaScan, "index-served stats must equal scan-served stats")
  }

  test("stratifiedSampleExact caps every stratum at n with dense ranks") {
    val got = Mixture.stratifiedSampleExact(docs, 4, "s8c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = got.groupBy(_._1)
    assert(bySrc.values.forall(_.length <= 4))
    bySrc.foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"ranks not dense for $src")
    }
  }
}
