package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.FuzzyJoin

/** Blocked edit-distance join: exact recall vs the brute-force truth
  * (within the declared df-cap contract), boundary coverage between the
  * gram and length-band blocking regimes, and the no-cross-join plan. */
class FuzzyJoinSpec extends SparkTestBase {

  /** Deterministic zoo crossing every blocking regime at q=3, k=1
    * (minLong = 6): empties, sub-gram shorts, boundary straddles, long
    * near-dups, and non-matches. */
  private val strings = Seq(
    "", "b", "ab", "abc", "abcd", "abd", "xyz",
    "kitten", "sitten", "sittin", "mitten",
    "abcdef", "abcde", "bcdef",
    "Customer#0001", "Custmer#0001", "Customer#0002")

  private def df(tag: String): DataFrame = {
    import spark.implicits._
    strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "str")
  }

  private def brute(k: Int): Set[(Long, Long, Int)] = {
    val withId = strings.zipWithIndex
    (for {
      (a, i) <- withId
      (b, j) <- withId
      d = levenshteinRef(a, b) if d <= k
    } yield (i.toLong, j.toLong, d)).toSet
  }

  /** Reference DP edit distance (spec-local oracle). */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("blocked join finds exactly the brute-force pairs (k=1 and k=2)") {
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.join(df("l"), df("r"), "id", "str",
          maxDist = k, q = 3, maxGramDf = 1 << 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === brute(k), s"k=$k")
    }
  }

  test("gram/band boundary straddle: len 6 vs its len-5 deletion is found") {
    import spark.implicits._
    val l = Seq((1L, "abcdef")).toDF("id", "str") // len 6 = q*(k+1): gram side
    val r = Seq((2L, "abcde"), (3L, "bcdef")).toDF("id", "str") // len 5: short
    val got = FuzzyJoin.join(l, r, "id", "str", maxDist = 1)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L)))
  }

  test("df cap is the declared contract: a pair whose ONLY shared gram is " +
    "boilerplate is dropped under the cap and restored without it") {
    import spark.implicits._
    // 300 left strings "aaaaaaNNN": every one of them carries the gram
    // "aaa" (df 300); the probe "aaaaaab00" is one substitution from the
    // three left strings "aaaaaaX00" but shares ONLY "aaa" with each
    // (the edit sits between the prefix and the digits and destroys
    // every straddling gram)
    val l = (0 until 300).map(i => (i.toLong, f"aaaaaa$i%03d")).toDF("id", "str")
    val r = Seq((9001L, "aaaaaab00")).toDF("id", "str")
    val capped = FuzzyJoin.join(l, r, "id", "str", maxDist = 1, q = 3,
        maxGramDf = 16)
      .collect()
    assert(capped.isEmpty,
      "every shared gram is above the cap — the declared drop")
    val full = FuzzyJoin.join(l, r, "id", "str", maxDist = 1, q = 3,
        maxGramDf = 1 << 20)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(full === Set((0L, 9001L), (100L, 9001L), (200L, 9001L)))
  }

  test("entityClusters: transitive match-graph merge, equal strings " +
    "cluster, singletons keep their id") {
    import spark.implicits._
    val recs = Seq(
      (1L, "kitten"), (2L, "sitten"), (3L, "sittin"), // dist-1 chain:
      (4L, "xyz"),                                    // 1~2~3 one entity
      (5L, "same"), (6L, "same"))                     // dist-0 duplicates
      .toDF("id", "str")
    val got = FuzzyJoin.entityClusters(recs, "id", "str", maxDist = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // kitten~sittin is dist 2, but the chain through sitten merges them
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L))
  }

  test("entityClustersMulti: an exact key merges ACROSS fuzzy clusters, " +
    "null keys match nothing, string ids ride the CC kernel") {
    import spark.implicits._
    val recs = Seq(
      // two fuzzy clusters far apart in name space...
      ("r1", "kitten", Some("k1")), ("r2", "sitten", None),
      ("r5", "zzzzzz", Some("k1")), ("r6", "zzzzzy", None),
      // ...nulls never merge
      ("r8", "aaaa", None), ("r9", "bbbb", None))
      .toDF("id", "str", "xk")
    val multi = FuzzyJoin.entityClustersMulti(recs, "id", "str",
        exactCols = Seq("xk"), maxDist = 1, q = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the shared k1 fuses {r1,r2} with {r5,r6}; min id r1 labels all four
    assert(multi === Map("r1" -> "r1", "r2" -> "r1", "r5" -> "r1",
      "r6" -> "r1", "r8" -> "r8", "r9" -> "r9"))
    // without the exact pass the same records stay two clusters
    val fuzzyOnly = FuzzyJoin.entityClusters(recs, "id", "str", maxDist = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fuzzyOnly("r5") == "r5" && fuzzyOnly("r6") == "r5")
  }

  test("incremental ER store: batch-wise admits label exactly like the " +
    "one-shot run; re-admitting a batch is a no-op") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_er")
      .toString + "/s"
    val all = Seq((1L, "kitten"), (2L, "sitten"), (3L, "sittin"),
      (4L, "xyz"), (5L, "mitten"))
      .toDF("id", "str")
    val b1 = all.filter(col("id") <= 2)
    val b2 = all.filter(col("id") > 2)
    FuzzyJoin.erAdmit(b1, store, "id", "str", maxDist = 1, q = 3)
    FuzzyJoin.erAdmit(b2, store, "id", "str", maxDist = 1, q = 3)
    def labels = FuzzyJoin.erLabels(spark, store, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = FuzzyJoin.entityClusters(all, "id", "str", maxDist = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === oneShot)
    // cross-batch edge proof: sittin (b2) reaches kitten (b1) via sitten
    assert(labels(3L) == 1L && labels(5L) == 1L)
    // idempotent replay: known ids drop, store content unchanged
    FuzzyJoin.erAdmit(b2, store, "id", "str", maxDist = 1, q = 3)
    assert(labels === oneShot)
    assert(spark.read.parquet(s"$store/records").count() == 5L)
  }

  test("cosineJoin: hand-computed integer weights match exactly, the " +
    "threshold is inclusive, disjoint token sets never pair") {
    import spark.implicits._
    val l = Seq((1L, "aa bb")).toDF("id", "name")
    val r = Seq((2L, "aa cc"), (3L, "dd ee")).toDF("id", "name")
    // N=3 records; df: aa=2,bb=1,cc=1,dd=1,ee=1; w: aa=3000/2=1500,
    // rest=3000. norms: 1500²+3000² = 11_250_000 each for ids 1,2;
    // dot(1,2) = 1500² = 2_250_000 → cos² = dot²/(nl·nr) = 0.04 ⇒
    // cosine 0.2 exactly: τ=200 passes on the inclusive boundary
    val at200 = FuzzyJoin.cosineJoin(l, r, "id", "name", tauMilli = 200)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toList
    assert(at200 === List((1L, 2L, 2250000L, 11250000L, 11250000L)))
    // …and τ=201 excludes it; the disjoint (1,3) pair never appears
    assert(FuzzyJoin.cosineJoin(l, r, "id", "name", tauMilli = 201)
      .count() == 0L)
  }

  test("cosineJoin: word order and duplicate tokens are irrelevant " +
    "(the property edit distance lacks); df-capped blocking is the " +
    "declared contract and the verify dot stays exact") {
    import spark.implicits._
    val l = Seq((1L, "Acme Corp Ltd"), (4L, "zz qq")).toDF("id", "name")
    val r = Seq((2L, "ltd acme ACME corp"), (5L, "zz pp")).toDF("id", "name")
    val got = FuzzyJoin.cosineJoin(l, r, "id", "name", tauMilli = 999)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toList
    assert(got === List((1L, 2L))) // identical token SETS: cosine = 1
    // cap at df 1: every shared token (acme/corp/ltd df=2, zz df=2) is
    // above the cap — declared drop; lifting the cap restores both pairs
    assert(FuzzyJoin.cosineJoin(l, r, "id", "name", tauMilli = 100,
      maxTokenDf = 1L).count() == 0L)
    val lifted = FuzzyJoin.cosineJoin(l, r, "id", "name", tauMilli = 100)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(lifted.contains((1L, 2L)) && lifted.contains((4L, 5L)))
  }

  test("entityClustersCosine: reordered-token names cluster transitively, " +
    "below-threshold and disjoint records keep their own id") {
    import spark.implicits._
    val recs = Seq(
      (1L, "acme corp ltd"), (2L, "ltd acme corp"),   // cosine 1: cluster
      (3L, "acme corp gmbh"),                          // 2 of 3 tokens vs 1
      (4L, "zz qq"))                                   // disjoint
      .toDF("id", "name")
    // τ=999: only the exact token-set pair merges
    val tight = FuzzyJoin.entityClustersCosine(recs, "id", "name",
        tauMilli = 999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tight === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
    // idf is doing its job on the 2-of-3 sharer: the SHARED tokens
    // (acme/corp, df 3) downweight while the DISTINGUISHING ones
    // (ltd/gmbh, df 1) dominate the norms — cosine lands at ~0.29, far
    // below the naive 2/3 token overlap, so τ=500 still keeps record 3
    // out and only a deliberately loose τ merges it transitively
    val mid = FuzzyJoin.entityClustersCosine(recs, "id", "name",
        tauMilli = 500)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mid === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
    val loose = FuzzyJoin.entityClustersCosine(recs, "id", "name",
        tauMilli = 250)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("goldenRecords: majority value wins per attribute, ties break to " +
    "the largest, nulls carry no vote, all-null attributes stay null") {
    import spark.implicits._
    val recs = Seq(
      (10L, Some("en"), Some("a")), (10L, Some("en"), Some("b")),
      (10L, Some("fr"), Some("b")),              // en wins 2-1; a/b tie -> b
      (20L, None, Some("x")), (20L, None, Some("x")),
      (20L, Some("de"), None),                   // de from its only vote
      (30L, None, None))                         // all null: stays null
      .toDF("entity", "lang", "source")
    val got = FuzzyJoin.goldenRecords(recs, "entity", Seq("lang", "source"))
      .orderBy("entity").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)))).toList
    assert(got === List(
      (10L, Some("en"), Some("b")),
      (20L, Some("de"), Some("x")),
      (30L, None, None)))
  }

  test("cosineJoinWithStats: the df cap's recall trade is SURFACED — " +
    "every excluded token lands in cappedTokens with its df, and a " +
    "non-binding cap reports nothing") {
    import spark.implicits._
    val l = Seq((1L, "Acme Corp Ltd"), (4L, "zz qq")).toDF("id", "name")
    val r = Seq((2L, "ltd acme ACME corp"), (5L, "zz pp")).toDF("id", "name")
    val capped = FuzzyJoin.cosineJoinWithStats(l, r, "id", "name",
      tauMilli = 100, maxTokenDf = 1L)
    assert(capped.pairs.count() == 0L) // every shared token is over-cap
    val listed = capped.cappedTokens.collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // the tokens whose exclusion DROPPED candidates are all reported
    assert(listed === Map("acme" -> 2L, "corp" -> 2L, "ltd" -> 2L,
      "zz" -> 2L))
    // default (low-thousands) cap: nothing excluded, nothing reported
    val open = FuzzyJoin.cosineJoinWithStats(l, r, "id", "name",
      tauMilli = 100)
    assert(open.cappedTokens.count() == 0L && open.pairs.count() == 2L)
  }

  test("cosineJoin: a DECIMAL(38) overflow of the exact threshold test " +
    "FAILS LOUDLY instead of silently dropping the pair") {
    import spark.implicits._
    // w saturates at 10⁶ once N ≥ 1000·df: 1998 one-token fillers push
    // N to 2000, two records share 10⁴ df-2 tokens → dot = 10⁴·10¹² =
    // 10¹⁶ and dot²·10⁶ = 10³⁸ — one digit past DECIMAL(38,0). Spark
    // nulls the product; the guard must turn that null into an error.
    val big = (0 until 10000).map("t" + _).mkString(" ")
    val recs = (Seq((1L, big), (2L, big)) ++
      (3L to 2000L).map(i => (i, s"f$i"))).toDF("id", "name")
    val e = intercept[Exception] {
      FuzzyJoin.cosineJoin(recs, recs, "id", "name", tauMilli = 800)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // two loud paths, both acceptable: under ANSI mode (Spark 4's
    // default) the engine throws NUMERIC_VALUE_OUT_OF_RANGE at the
    // overflowing multiply; with ANSI off the product nulls and the
    // operator's own guard raises. Either way the pair cannot vanish.
    assert(messages(e).exists(m => m.contains("DECIMAL(38) overflow") ||
      m.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      m.contains("cannot be represented as Decimal")),
      messages(e).mkString(" | "))
  }

  test("plan: candidate generation is equi-joins, never a cross join") {
    val plan = FuzzyJoin.join(df("l"), df("r"), "id", "str", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("levenshtein"), "verify must be the native expr")
  }

  test("plan: cosineJoin is pure hash equi-joins — the scalar N is a " +
    "literal, never a per-consumer 1-row cross join") {
    val plan = FuzzyJoin.cosineJoin(df("l"), df("r"), "id", "str")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
