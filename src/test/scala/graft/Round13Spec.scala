package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Round-13 gates: the bounded-heap per-query top-k that replaced every
  * `q_id` window in [[Similarity]] (r12 verdict ask #1) must be provably
  * equivalent to the window form it replaced — the Round9Spec
  * heap ≡ window precedent applied to the kNN surface.
  */
class Round13Spec extends SparkTestBase {
  import org.apache.spark.sql.expressions.Window

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("topKPerQuery equals the row_number window on ties and skew") {
    import spark.implicits._
    // adversarial scored set: duplicate scores (tie-break must fall to
    // vec_id ASC), a query with fewer than k candidates, scores of both
    // signs and zero, and a skewed query carrying most of the rows
    val rnd = new scala.util.Random(13)
    val rows = (0 until 2000).map { i =>
      val q = if (i % 10 < 7) 0L else (i % 3).toLong + 1L // q=0 skewed
      val score = rnd.nextInt(40) / 8.0 - 2.0             // many exact ties
      (q, i.toLong, score)
    } ++ Seq((9L, 42L, 0.5), (9L, 43L, 0.5)) // sub-k query, tied pair
    val scored = rows.toDF("q_id", "vec_id", "score").repartition(7)
    val k = 5
    val got = Similarity.topKPerQuery(scored, "score", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == want, "heap + narrow merge must equal the window reference")
  }

  test("bruteForceTopK matches an independent window re-ranking of cosines") {
    import spark.implicits._
    // end-to-end: the production path (heap) vs a from-scratch window
    // reference built with Spark SQL vector arithmetic on the same table
    val k = 5
    val got = Similarity.bruteForceTopK(emb, k = k, numQueries = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val e = emb.select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    def norm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(c, lit(0.0d), (acc, x) => acc + x * x))
    def dotc(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val scored = q.crossJoin(e).filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        dotc(col("qe").cast("array<double>"), col("embedding").cast("array<double>")) /
          (norm(col("qe").cast("array<double>")) *
            norm(col("embedding").cast("array<double>"))))
    val want = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)),
      "heap hit set must equal the window reference hit set")
    assert(got == want, "ranks must agree, ties broken by vec_id ASC")
  }

  test("profileApprox matches the exact profile on everything but n_distinct") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val exact = graft.pipeline.DataQuality.profile(orders, cols)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val approx = graft.pipeline.DataQuality.profileApprox(orders, cols)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(exact.keySet == approx.keySet)
    for (c <- cols) {
      val (en, enull, end, emin, emax) = exact(c)
      val (an, anull, and, amin, amax) = approx(c)
      assert((en, enull, emin, emax) == ((an, anull, amin, amax)),
        s"$c: non-sketched metrics must be exact")
      assert(math.abs(and - end) <= math.max(end * 0.05, 8.0),
        s"$c: HLL distinct $and strayed beyond 5% of exact $end")
    }
    // the gate form must flag every column OK on this lake
    val contract = graft.pipeline.DataQuality.profileApproxContract(orders, cols)
      .collect()
    assert(contract.length == cols.length && contract.forall(_.getBoolean(3)),
      "nd_ok must hold on every profiled column")
  }

  test("importanceResample prefers target-distribution docs, deterministically") {
    import spark.implicits._
    // two disjoint-vocabulary cohorts; the target speaks cohort A's
    // language — DSIR weights must put every selected doc in cohort A
    // (log-weight gap ~14 nats dwarfs the Gumbel noise on these coins)
    val target = (0 until 20)
      .map(i => (1000L + i, "alpha beta gamma delta")).toDF("doc_id", "text")
    val raw = ((0 until 30).map(i =>
      (i.toLong, "alpha beta gamma delta alpha beta")) ++
      (30 until 60).map(i =>
        (i.toLong, "zulu yankee xray whisky victor uniform")))
      .toDF("doc_id", "text")
    val sel = graft.pipeline.Mixture.importanceResample(raw, target, n = 20)
      .collect()
    assert(sel.length == 20)
    assert(sel.forall(_.getLong(0) < 30),
      s"selected a non-target-like doc: ${sel.map(_.getLong(0)).mkString(",")}")
    // cohort A log-weights strictly dominate cohort B's
    val all = graft.pipeline.Mixture.importanceResample(raw, target, n = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minA = (0 until 30).map(i => all(i.toLong)).min
    val maxB = (30 until 60).map(i => all(i.toLong)).max
    assert(minA > maxB, s"cohort separation violated: minA=$minA maxB=$maxB")
    // keyed coins: bit-identical reruns
    val again = graft.pipeline.Mixture.importanceResample(raw, target, n = 20)
      .collect()
    assert(sel.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("blocklist automaton matches the naive contains semantics exactly") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    // adversarial term set: shared prefixes, one term inside another, a
    // term that only appears via a failure-link transition
    val terms = Seq("ab", "abc", "bc", "zz", "cab")
    val texts = Seq("", "a", "abc", "xxabcx", "bcab", "zzz", "aabbcc",
      "cabcab", "abab", "the quick abca zz")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("n", GraftFunctions.blocklist_terms(col("text"), terms))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = terms.count(t.contains(_)).toLong
      assert(got(i.toLong) == want, s"text '$t': got ${got(i.toLong)} want $want")
    }
    // large generated blocklist: the single pass must still agree with
    // the per-term scan (and the automaton cache must not cross-talk
    // between different blocklists)
    val big = (0 until 500).map(i => f"term$i%03dx")
    val hay = "say term007x and term499x but never term500x"
    val n = Seq((0L, hay)).toDF("doc_id", "text")
      .select(GraftFunctions.blocklist_terms(col("text"), big))
      .collect()(0).getLong(0)
    assert(n == 2L)
  }

  test("topKPerQuery emits nothing for absent queries, all rows for sub-k ones") {
    import spark.implicits._
    val scored = Seq((1L, 10L, 0.9), (1L, 11L, 0.8)).toDF("q_id", "vec_id", "s")
    val out = Similarity.topKPerQuery(scored, "s", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == Set((1L, 10L, 1), (1L, 11L, 2)))
  }
}
