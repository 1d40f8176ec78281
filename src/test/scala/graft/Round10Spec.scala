package graft

import graft.pipeline.{Decontaminate, Mixture, Similarity, Sketches}

/** Round-12 session-3 operators: SQ8 scalar-quantized kNN, temperature
  * source mixture. */
class Round10Spec extends SparkTestBase {

  lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // ---- quantizeSq8 ---------------------------------------------------------

  test("quantizeSq8: codes bounded, reconstruction within one scale unit") {
    val v = Array(0.9, -0.3, 0.0, 0.45, -0.9, 1e-9)
    val (q, s) = Similarity.quantizeSq8(v)
    assert(s == 0.9 / 127.0)
    assert(q.forall(c => c >= -127 && c <= 127))
    // floor quantization: v_i/scale - 1 < q_i <= v_i/scale, so the
    // reconstruction q_i*scale sits within one scale unit below v_i
    v.indices.foreach { i =>
      assert(q(i) * s <= v(i) + 1e-12, s"i=$i")
      assert(q(i) * s > v(i) - s - 1e-12, s"i=$i")
    }
    // max-magnitude positive component hits +127 exactly; zero stays zero
    assert(q(0) == 127)
    assert(q(2) == 0)
  }

  test("quantizeSq8: zero vector quantizes to scale 0, all-zero codes") {
    val (q, s) = Similarity.quantizeSq8(Array(0.0, 0.0, 0.0))
    assert(s == 0.0)
    assert(q.forall(_ == 0))
  }

  // ---- sq8TopK -------------------------------------------------------------

  test("sq8TopK with a corpus-wide rerank window equals exact brute force") {
    val n = emb.count().toInt
    val got = Similarity.sq8TopK(emb, k = 5, numQueries = 3, rerank = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(emb, k = 5, numQueries = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  // ---- temperatureMixture --------------------------------------------------

  test("temperatureMixture: isqrt quotas, head capping, ledger consistency") {
    import spark.implicits._
    // skewed corpus: one head source (1600 docs), one mid (100), one tail (4)
    val docs = (
      (0 until 1600).map(i => (i.toLong, "head")) ++
      (0 until 100).map(i => (2000L + i, "mid")) ++
      (0 until 4).map(i => (3000L + i, "tail"))
    ).toDF("doc_id", "source")
    // budget larger than sqrt-share allows for the tail → tail clamps at n
    val ledger = Mixture.temperatureMixture(docs, totalBudget = 200L, salt = "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // weights are integer square roots
    assert(ledger("head")._2 == 40 && ledger("mid")._2 == 10 && ledger("tail")._2 == 2)
    // quotas: floor(200*w/52), tail clamped at n=4
    assert(ledger("head")._3 == 200L * 40 / 52)
    assert(ledger("mid")._3 == 200L * 10 / 52)
    assert(ledger("tail")._3 == 4)
    // tail threshold is 2^32 → every tail doc kept, deterministically
    assert(ledger("tail")._4 == 4)
    // raw share of head is 94%; sqrt temperature caps it at ~77% of budget
    assert(ledger("head")._3.toDouble / 200 < 0.80)
    // kept counts are binomial around quota: sanity bounds only
    assert(ledger("head")._4 > 0 && ledger("head")._4 <= 1600)
  }

  test("temperatureMixture is deterministic and salt-sensitive") {
    import spark.implicits._
    val docs = (0 until 300).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
    val a = Mixture.temperatureMixture(docs, 100L, "saltA").collect().toSeq
    val b = Mixture.temperatureMixture(docs, 100L, "saltA").collect().toSeq
    assert(a.map(_.toString).sorted == b.map(_.toString).sorted)
    val c = Mixture.temperatureMixture(docs, 100L, "saltB")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val aKept = a.map(r => r.getString(0) -> r.getLong(4)).toMap
    // same quotas, different coin draw: at least one source's kept differs
    assert(c != aKept)
  }

  // ---- bloom decontamination ----------------------------------------------

  test("bloomContract: contaminated docs always flagged, output deterministic") {
    import spark.implicits._
    val bench = Seq((0L, "secret eval question alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "clean text with nothing shared here at all today"),
      (11L, "prefix words then secret eval question alpha beta more"), // 5-gram hit
      (12L, "another totally clean document with its own words"),
      (13L, "short doc")
    ).toDF("doc_id", "text")
    val got = Decontaminate.bloomContract(corpus, bench, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(10L, 11L, 12L, 13L))
    assert(got(11L)._1, "planted 5-gram overlap must be contaminated")
    assert(!got(10L)._1 && !got(12L)._1 && !got(13L)._1)
    // the no-false-negative invariant holds for every row
    assert(got.values.forall(_._2))
    val again = Decontaminate.bloomContract(corpus, bench, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(again == got)
  }

  test("bloomContract: realized overblocking bounded on the sf0.001 corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter("doc_id >= 25")
    val bench = docs.filter("doc_id < 25")
    assert(Decontaminate.bloomContract(corpus, bench, k = 5)
      .collect().forall(_.getBoolean(2)))
    // the FP rate is invisible in the gated output by design (a false
    // positive still satisfies the contract); pin the realized count here
    // by rebuilding the same filter and flags directly. At gramFpp=1e-4
    // and ~50 grams/doc the per-doc FP rate is ~0.5% — the naive 1%
    // setting overblocked 171 of these 475 docs (36%), which is what
    // drove the per-gram-budget default
    val benchGrams = graft.pipeline.Dedup.withShingles(bench, 5)
      .select(org.apache.spark.sql.functions.explode($"shingles").as("g")).distinct()
    val bloom = benchGrams.stat.bloomFilter("g", math.max(benchGrams.count(), 1L), 1e-4)
    val bc = spark.sparkContext.broadcast(bloom)
    val flagged = graft.pipeline.Dedup.withShingles(corpus, 5)
      .select($"doc_id", $"shingles").as[(Long, Seq[Long])]
      .map { case (id, gs) => (id, gs.exists(bc.value.mightContainLong)) }
      .filter(_._2).map(_._1).collect().toSet
    val contaminated = Decontaminate.flagged(corpus, bench, 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(contaminated.subsetOf(flagged), "no false negatives, ever")
    val fp = (flagged -- contaminated).size
    // fpp=0.01 over ~hundreds of clean docs: allow slack but catch a
    // hashing regression that flags a meaningful corpus fraction
    assert(fp <= 10, s"realized FP count $fp exceeds sanity budget")
  }

  // ---- CMS heavy hitters ---------------------------------------------------

  test("cmsHeavyHitters: exact counts, one-sided error flags, top-set parity") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple banana banana cherry"),
      (2L, "apple banana date date date date"),
      (3L, "cherry cherry elderberry")
    ).toDF("doc_id", "text")
    val got = Sketches.cmsHeavyHitters(docs, topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.map(x => (x._1, x._2)).toSet == Set(("apple", 4L), ("date", 4L), ("banana", 3L)))
    assert(got.forall(_._3), "CMS must never undercount")
    assert(got.forall(_._4), "CMS overcount must stay within eps*N")
  }

  // ---- streaming ingest dedup ---------------------------------------------

  test("dedupAdmit: in-batch min-id wins, cross-batch duplicates rejected") {
    implicit val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "alpha"), // 3 duplicates 1 in-batch
      (10L, "gamma"), (11L, "beta")               // 11 duplicates 2 across batches
    ).toDF("doc_id", "text")
    val got = graft.streaming.EventStreams.dedupReplayed(docs, chunks = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val want = docs.groupBy(org.apache.spark.sql.functions.md5($"text").as("d"))
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("id"))
      .collect().map(r => (r.getLong(1), r.getString(0))).toMap
    assert(got == want)
    assert(got.keySet == Set(1L, 2L, 10L))
  }

  test("sq8TopK at default rerank keeps every per-query result set at k") {
    val rows = Similarity.sq8TopK(emb, k = 5, numQueries = 3, rerank = 4).collect()
    assert(rows.length == 15)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach(g => assert(g.map(_.getInt(2)).sorted.toSeq == (1 to 5)))
  }
}
