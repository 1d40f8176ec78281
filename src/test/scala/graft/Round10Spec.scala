package graft

import graft.pipeline.{Mixture, Similarity}

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
