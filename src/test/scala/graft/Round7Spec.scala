package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** Round-7 second-tranche operators: per-source caps, duplicated-span
  * annotation, BM25 retrieval, SemDeDup. */
class Round7Spec extends SparkTestBase {

  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // ---- capPerSource ---------------------------------------------------------

  test("capPerSource equals the window-form reference, without a Window node") {
    val n = 7
    val got = Mixture.capPerSource(docs, n)
    val want = docs
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("source").orderBy("doc_id")).cast("long"))
      .filter(col("rk") <= n)
      .select("source", "doc_id", "rk")
    assert(got.collect().map(_.toSeq).toSet == want.collect().map(_.toSeq).toSet)
    // the scale contract: bounded aggregation, not a skew-unsplittable window
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"capPerSource must not window:\n$plan")
  }

  test("capPerSource truncates: no source exceeds n, ranks are 1..n") {
    val got = Mixture.capPerSource(docs, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = got.groupBy(_._1)
    assert(bySrc.values.forall(_.length <= 3))
    bySrc.foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"ranks not dense for $src")
      // rank order must follow id order
      assert(rows.sortBy(_._3).map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    }
  }

  // ---- dupSpans -------------------------------------------------------------

  test("dupSpans: planted cross-document 8-token span is counted positionally") {
    val s = spark
    import s.implicits._
    val shared = "a b c d e f g h i j" // 10 tokens => three 8-windows inside
    val df = Seq(
      (1L, s"u1 u2 $shared"),
      (2L, s"v1 $shared v2"),
      (3L, (1 to 12).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpans(df, k = 8, minDf = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((5L, 3L, true)))  // 12 tokens -> 5 windows, 3 shared
    assert(got(2L) == ((5L, 3L, true)))
    assert(got(3L) == ((5L, 0L, false)))
  }

  test("dupSpans: short documents contribute one truncated window") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "only three tokens"), (2L, "only three tokens"),
      (3L, "something else entirely")).toDF("doc_id", "text")
    val got = Dedup.dupSpans(df, k = 8, minDf = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1L, 1L)) && got(2L) == ((1L, 1L)))
    assert(got(3L) == ((1L, 0L)))
  }

  test("containmentPairs: planted quotation found in both directions " +
    "where it clears tau, missed by symmetric Jaccard") {
    val s = spark
    import s.implicits._
    val quoted = (1 to 12).map(i => s"q$i").mkString(" ") // 12 tokens
    val host = s"${(1 to 30).map(i => s"h$i").mkString(" ")} $quoted"
    val df = Seq(
      (1L, host),              // 42 tokens, contains doc 2 verbatim
      (2L, quoted),            // fully contained in doc 1
      (3L, (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, tau = 0.9, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // doc 2 has 5 distinct 8-grams, all shared with doc 1 => (1, 2) qualifies
    assert(got.contains((1L, 2L)), s"containment (1,2) missing: $got")
    assert(got((1L, 2L)) == ((5L, 5L)))
    // the reverse direction fails tau: 5 shared of doc 1's 35 grams
    assert(!got.contains((2L, 1L)))
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // symmetric 8-gram Jaccard would score 5/35 — the asymmetric op is
    // the only dedup mode that can catch this pair
    assert(5.0 / 35.0 < 0.5)
  }

  // ---- BM25 -----------------------------------------------------------------

  test("keywordStats: exact tf/df/dl on a hand fixture") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x x y z"), (2L, "x a b c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = Search.keywordStats(df, Seq("x", "y")).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      (1L, "x") -> ((2L, 2L, 4L)),
      (1L, "y") -> ((1L, 1L, 4L)),
      (2L, "x") -> ((1L, 2L, 4L))))
  }

  test("bm25: scores match the hand-computed Okapi formula") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x x y z"), (2L, "x a b c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = Search.bm25(df, Seq("x", "y")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    val n = 3.0; val avgdl = 4.0
    def idf(dfc: Double) = math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
    def w(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(math.abs(got((1L, "x")) - idf(2) * w(2, 4)) < 1e-12)
    assert(math.abs(got((1L, "y")) - idf(1) * w(1, 4)) < 1e-12)
    assert(math.abs(got((2L, "x")) - idf(2) * w(1, 4)) < 1e-12)
  }

  test("bm25TopK: two matched terms beat one, ties break on doc_id") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x x y z"), (2L, "x a b c"), (3L, "a b c d"),
      (4L, "x a b c")).toDF("doc_id", "text")
    val got = Search.bm25TopK(df, Seq("x", "y"), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.head == ((1L, 2L))) // doc 1 matches both terms
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L)) // 2 before 4: id tiebreak
  }

  // ---- SemDeDup -------------------------------------------------------------

  test("semDedup removals are justified by exact pairs and deterministic") {
    val tau = 0.3
    val exact = Similarity.thresholdPairs(emb, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.semDedup(emb, tau = tau, cells = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.nonEmpty, "expected at least one within-cell removal")
    got.foreach { case (vid, kept, simOk) =>
      assert(kept < vid, s"justifier must be lower-id: $kept !< $vid")
      assert(simOk)
      assert(exact.contains((kept, vid)),
        s"removal ($vid by $kept) has no exact >=tau pair")
    }
    val again = Similarity.semDedup(emb, tau = tau, cells = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("semDedup with one cell at small scale removes every duplicate " +
    "thresholdPairs knows about") {
    val tau = 0.3
    val exact = Similarity.thresholdPairs(emb, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val removable = exact.map(_._2) // any high id with a lower partner
    val removed = Similarity.semDedup(emb, tau = tau, cells = 1).collect()
      .map(_.getLong(0)).toSet
    assert(removed == removable,
      s"one-cell semDedup must equal exact keep-lowest: $removed vs $removable")
  }
}
