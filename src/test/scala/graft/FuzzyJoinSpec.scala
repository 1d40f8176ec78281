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

  test("plan: candidate generation is equi-joins, never a cross join") {
    val plan = FuzzyJoin.join(df("l"), df("r"), "id", "str", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("levenshtein"), "verify must be the native expr")
  }
}
