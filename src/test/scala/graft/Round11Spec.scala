package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** Round-12 session-4 operators: semantic decontamination (embedding-space
  * benchmark overlap), RANGE-frame rolling aggregation, exact histogram
  * quantiles, salted-join parity. */
class Round11Spec extends SparkTestBase {

  // ---- semanticDecontaminate ----------------------------------------------

  private def embDf(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("semanticDecontaminate flags hits, counts them, picks argmax justifier") {
    // bench 10 = x-axis, bench 20 = y-axis
    val bench = embDf(
      10L -> Array(1f, 0f, 0f),
      20L -> Array(0f, 1f, 0f))
    val corpus = embDf(
      1L -> Array(2f, 0f, 0f),       // cosine 1.0 with bench 10 only
      2L -> Array(0f, 0f, 3f),       // orthogonal to both — clean
      3L -> Array(1f, 0.8f, 0f),     // hits both; x-axis closer → best 10
      4L -> Array(0.1f, 0.1f, 5f))   // cosine ~0.02 each — below tau
    val got = Similarity.semanticDecontaminate(corpus, bench, tau = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 10L), (3L, 2L, 10L)))
  }

  test("semanticDecontaminate breaks exact cosine ties to the lowest bench id") {
    val bench = embDf(
      30L -> Array(1f, 0f),
      20L -> Array(0f, 1f))
    // the diagonal is bit-for-bit equidistant from both axes
    val corpus = embDf(5L -> Array(1f, 1f))
    val got = Similarity.semanticDecontaminate(corpus, bench, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 2L, 20L)))
  }

  // ---- Zorder -------------------------------------------------------------

  test("zValue interleaves bits: unit cases and monotone locality") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (65535L, 65535L))
      .toDF("a", "b")
      .select(graft.sources.Zorder.zValue(col("a"), col("b")).as("z"))
    val got = df.as[Long].collect().toSeq
    // a-bit i → position 2i+1, b-bit i → 2i
    assert(got == Seq(0L, 2L, 1L, 15L, (1L << 32) - 1))
  }

  test("one z-ordered layout bounds slab scans on BOTH dimensions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // 64×64 grid, one row per cell; 16 files → 256 cells each
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong * 64 + y, x.toLong, y.toLong)))
      .toDF("id", "x", "y")
    graft.sources.Zorder.writeZordered(grid, "x", "y", s"$dir/z",
      nFiles = 16, bits = 6)
    // 1-d baseline: range-partitioned + sorted by x only
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/xsorted")
    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()
    val slabX = col("x").between(8, 15)  // 1/8 of rows, all y
    val slabY = col("y").between(8, 15)  // 1/8 of rows, all x
    // x-sorted layout: perfect on its key, useless on the other — every
    // x-stripe file holds all y values
    assert(filesTouched(s"$dir/xsorted", slabX) <= 3)
    assert(filesTouched(s"$dir/xsorted", slabY) >= 15,
      "x-sorted layout should scatter a y slab over every file")
    // z-order: either slab is 8 aligned Morton quads — bounded on BOTH
    // dims with one layout (≤ half the files, never all of them)
    assert(filesTouched(s"$dir/z", slabX) <= 8,
      "z layout must bound an x slab")
    assert(filesTouched(s"$dir/z", slabY) <= 8,
      "z layout must bound a y slab")
  }

  // ---- Partitioned --------------------------------------------------------

  test("partitionBy(lang) layout prunes non-matching partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.sources.Partitioned.writePartitioned(docs, "lang", s"$dir/docs")
    val back = spark.read.parquet(s"$dir/docs")
    val filtered = back.filter(col("lang") === "en")
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"lang filter must prune partitions, not scan rows:\n$plan")
    // pruning is real: the filtered scan touches only the en directory
    val touched = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(touched.nonEmpty && touched.forall(_.contains("lang=en")),
      s"scan escaped the en partition: ${touched.mkString(",")}")
    // and the round trip preserves cardinality
    assert(back.count() == docs.count())
  }

  // ---- applyDiff ----------------------------------------------------------

  test("applyDiff round-trips a corpusDiff: merge(prev, batch) == next") {
    import spark.implicits._
    val prev = Seq((1L, "a", "s0"), (2L, "b", "s0"), (3L, "c", "s1"))
      .toDF("doc_id", "text", "source")
    val next = Seq((2L, "b", "s0"), (3L, "c2", "s1"), (4L, "d", "s2"))
      .toDF("doc_id", "text", "source")
    val diff = graft.pipeline.Prepare.corpusDiff(prev, next)
    val upserts = next.join(
      diff.filter(col("status").isin("added", "changed")).select("doc_id"),
      Seq("doc_id"))
    val deletes = diff.filter(col("status") === "removed").select("doc_id")
    val merged = graft.pipeline.Prepare.applyDiff(prev, upserts, deletes)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(merged == Set((2L, "b", "s0"), (3L, "c2", "s1"), (4L, "d", "s2")))
  }

  test("applyDiff: deletes stage first, so delete+upsert of one id inserts") {
    import spark.implicits._
    val prev = Seq((1L, "old")).toDF("doc_id", "text")
    val up = Seq((1L, "new")).toDF("doc_id", "text")
    val del = Seq(Tuple1(1L)).toDF("doc_id")
    val got = graft.pipeline.Prepare.applyDiff(prev, up, del)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "new")))
  }

  test("applyDiff rejects a batch with duplicate keys like SQL MERGE") {
    import spark.implicits._
    val prev = Seq((1L, "a")).toDF("doc_id", "text")
    val dupBatch = Seq((2L, "x"), (2L, "y")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Prepare.applyDiff(prev, dupBatch,
        Seq.empty[Tuple1[Long]].toDF("doc_id"))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("profile of an empty table reports zeros, not an NPE") {
    import spark.implicits._
    val empty = Seq((1L, "x")).toDF("k", "s").filter(lit(false))
    val got = graft.pipeline.DataQuality.profile(empty, Seq("k", "s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(("k", 0L, 0L, 0L), ("s", 0L, 0L, 0L)))
  }

  test("applyDiff: an upsert writing NULL wins over the snapshot value") {
    import spark.implicits._
    val prev = Seq((1L, Some("old"))).toDF("doc_id", "text")
    val up = Seq((1L, None: Option[String])).toDF("doc_id", "text")
    val got = graft.pipeline.Prepare.applyDiff(prev, up,
      Seq.empty[Tuple1[Long]].toDF("doc_id"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, None)))
  }

  // ---- sentences ----------------------------------------------------------

  test("sentences: byte offsets reconstruct positions, empties keep ordinals") {
    import spark.implicits._
    //           0123456789ab
    val docs = Seq((1L, "ab. . cd. ef")).toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis.sentences(docs)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSet
    // parts: ["ab", "", "cd", "ef"] — the empty fragment holds ordinal 1
    // and contributes 2 delimiter bytes to later offsets but is not emitted
    assert(got == Set((0L, "ab", 0L), (2L, "cd", 6L), (3L, "ef", 10L)))
    // offsets index the original bytes
    val text = "ab. . cd. ef"
    got.foreach { case (_, s, off) =>
      assert(text.substring(off.toInt, off.toInt + s.length) == s)
    }
  }

  // ---- qualityMixtureSample -----------------------------------------------

  test("qualityMixtureSample: rate-1 stratum kept whole, rate-0 dropped") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val strata = (0L until 100L)
      .map(i => (i, if (i < 40) "head" else if (i < 80) "middle" else "tail"))
      .toDF("doc_id", "bucket")
    val kept = graft.pipeline.Mixture.qualityMixtureSample(
      docs, strata, Seq("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.0),
      defaultRate = 0.0, salt = "qspec")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val byBucket = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byBucket.getOrElse("head", 0) == 40, s"head must survive whole: $byBucket")
    assert(!byBucket.contains("tail"), s"rate-0 tail must vanish: $byBucket")
    val mid = byBucket.getOrElse("middle", 0)
    assert(mid > 5 && mid < 35, s"middle ~half expected, got $mid/40")
    // determinism: a second evaluation returns the identical membership
    val again = graft.pipeline.Mixture.qualityMixtureSample(
      docs, strata, Seq("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.0),
      defaultRate = 0.0, salt = "qspec")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(kept.toSet == again.toSet)
  }

  test("MAD anomaly: a constant series flags only genuine outliers") {
    import spark.implicits._
    // 48 flat hours at 10 events + one 50-event spike: med=10, MAD=0 →
    // threshold 10, only the spike trips
    val t0 = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val rows = (0 until 48).flatMap { h =>
      val n = if (h == 7) 50 else 10
      (0 until n).map(i => (h.toLong * 100 + i,
        java.sql.Timestamp.from(t0.plusSeconds(h * 3600L + i)), 1L, "view",
        1.0, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_mad").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_events_mad")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(5)))
    assert(got.count(_._3) == 1 && got.find(_._3).get._2 == 50L,
      s"exactly the spike hour must flag: ${got.filter(_._3).toSeq}")
  }

  // ---- first vs last touch ------------------------------------------------

  test("first-touch and as-of attribution bracket a click sequence") {
    import spark.implicits._
    val t0 = java.time.Instant.parse("2024-03-01T00:00:00Z")
    def ts(m: Long) = java.sql.Timestamp.from(t0.plusSeconds(m * 60))
    val dir = java.nio.file.Files.createTempDirectory("graft_touch").toString
    Seq(
      (1L, ts(0), 5L, "click", 0.0, "{}"),
      (2L, ts(10), 5L, "click", 0.0, "{}"),
      (3L, ts(20), 5L, "purchase", 9.0, "{}"),
      (4L, ts(30), 5L, "click", 0.0, "{}"),
      (5L, ts(40), 5L, "purchase", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def run(q: String) = SparkEntry.queries(q)(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // first purchase: first=1, last=2; second purchase: first=1, last=4
    assert(run("q_first_touch") == Map(3L -> 1L, 5L -> 1L))
    assert(run("q_asof_attribution") == Map(3L -> 2L, 5L -> 4L))
  }

  // ---- rrfFuse ------------------------------------------------------------

  test("rrfFuse: both-arm docs outrank single-arm, missing arm adds zero") {
    import spark.implicits._
    val lex = Seq((10L, 1), (20L, 2)).toDF("doc_id", "rank")
    val sem = Seq((20L, 1), (30L, 2)).toDF("doc_id", "rank")
    val got = graft.pipeline.Search.rrfFuse(lex, sem, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // 20: 1000000/62 + 1000000/61 = 16129+16393 = 32522
    // 10: 1000000/61 = 16393 ; 30: 1000000/62 = 16129
    assert(got.toSeq == Seq((20L, 32522L), (10L, 16393L), (30L, 16129L)))
  }

  // ---- manifest / skew report ---------------------------------------------

  test("manifest digest is partition-invariant and content-sensitive") {
    import spark.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "t")
    def digestOf(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = graft.pipeline.DataQuality.manifest(Seq(("t", df, col("t")))).head()
      (r.getLong(1), r.getLong(2))
    }
    // same content, different physical layout → identical digest
    assert(digestOf(a) == digestOf(a.repartition(7)))
    // one changed row → different digest, same count
    val b = Seq((1L, "x"), (2L, "y"), (3L, "Z")).toDF("id", "t")
    assert(digestOf(a)._1 == digestOf(b)._1 && digestOf(a)._2 != digestOf(b)._2)
    // empty table digests to the defined zero
    assert(digestOf(a.filter(lit(false))) == (0L, 0L))
  }

  test("skewReport surfaces the hot key with its per-mille share") {
    import spark.implicits._
    val df = (Seq.fill(900)(7L) ++ (101L to 200L)).toDF("k")
    val top = graft.pipeline.DataQuality.skewReport(df, "k", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.head == ("7", 900L, 900L))
    assert(top(1)._2 == 1L && top(1)._3 == 1L)
  }

  // ---- randomized laws ----------------------------------------------------

  test("zValue is a bijection on 16-bit pairs (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41) // fixed seed
    val pairs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.sources.Zorder.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      // independent inverse: gather odd bits → a, even bits → b
      var (ra, rb) = (0L, 0L)
      (0 until 16).foreach { i =>
        ra |= ((z >> (2 * i + 1)) & 1L) << i
        rb |= ((z >> (2 * i)) & 1L) << i
      }
      assert((ra, rb) == (a, b), s"z=$z decoded to ($ra,$rb), not ($a,$b)")
    }
  }

  test("applyDiff round-trip law holds on randomized snapshots") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val ids = (0L until 60L)
      val prevRows = ids.filter(_ => rnd.nextDouble() < 0.8)
        .map(i => (i, s"t$i"))
      val nextRows = ids.filter(_ => rnd.nextDouble() < 0.8)
        .map(i => (i, if (rnd.nextDouble() < 0.3) s"t$i'" else s"t$i"))
      val prev = prevRows.toDF("doc_id", "text")
      val next = nextRows.toDF("doc_id", "text")
      val diff = graft.pipeline.Prepare.corpusDiff(prev, next)
      val upserts = next.join(
        diff.filter(col("status").isin("added", "changed")).select("doc_id"),
        Seq("doc_id"))
      val deletes = diff.filter(col("status") === "removed").select("doc_id")
      val merged = graft.pipeline.Prepare.applyDiff(prev, upserts, deletes)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(merged == nextRows.toSet)
    }
  }

  test("lengthQuantiles agrees with a driver-side type-1 reference (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(400)(
      (s"s${rnd.nextInt(3)}", (rnd.nextInt(50) + 1).toLong))
      .zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v) }
    val got = graft.pipeline.TextAnalysis.lengthQuantiles(
      rows.toDF("doc_id", "source", "n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for {
      (src, group) <- rows.groupBy(_._2)
      pm <- Seq(250, 500, 750, 900, 990)
    } {
      val sorted = group.map(_._3).sorted
      // type-1: smallest v with rank >= ceil(pm*n/1000)
      val target = (pm.toLong * sorted.length + 999) / 1000
      val want = sorted((target - 1).toInt)
      assert(got((src, pm.toLong)) == want,
        s"$src pm=$pm: got ${got((src, pm.toLong))}, want $want")
    }
  }

  // ---- DataQuality --------------------------------------------------------

  test("profile: typed min/max, nulls and distincts on a known fixture") {
    import spark.implicits._
    val df = Seq((Some(9L), "b"), (Some(10L), "a"), (None, "a"))
      .toDF("k", "s")
    val got = graft.pipeline.DataQuality.profile(df, Seq("k", "s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSet
    // min is typed BEFORE the render: 9 < 10, not "10" < "9"
    assert(got == Set(
      ("k", 2L, 1L, 2L, "9", "10"),
      ("s", 3L, 0L, 2L, "a", "b")))
  }

  test("integrity checks count dup-key rows and FK orphans") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 2L).toDF("id")       // key 2 duplicated
    val child = Seq(1L, 1L, 3L).toDF("pid")       // 3 is an orphan
    val (n, dup) = graft.pipeline.DataQuality.pkViolations(parent, "id")
    assert((n, dup) == (3L, 2L))
    val (cn, orph) = graft.pipeline.DataQuality.fkOrphans(
      child, "pid", parent, "id")
    assert((cn, orph) == (3L, 1L))
  }

  // ---- compressionRatio ---------------------------------------------------

  test("compressionRatio separates boilerplate from high-entropy junk") {
    import spark.implicits._
    val template = "click here to subscribe now " * 200         // ~5.6 kB
    val junk = (0 until 200).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"j$i".getBytes).map("%02x".format(_)).mkString).mkString(" ")
    val prose = "The quick brown fox jumps over the lazy dog. " +
      "A different sentence follows with new words each time. " * 40
    val got = graft.pipeline.TextAnalysis.compressionRatio(
      Seq((1L, template), (2L, junk), (3L, prose)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // raw_bytes is the UTF-8 length; deflate output is non-empty
    assert(got(1)._1 == template.length && got.values.forall(_._2 > 0))
    // template compresses >10×; hex junk <3×; both separate from prose
    assert(got(1)._3 > 10000, s"template ratio ${got(1)._3}")
    assert(got(2)._3 < 3000, s"junk ratio ${got(2)._3}")
    assert(got(2)._3 < got(3)._3 && got(3)._3 < got(1)._3,
      s"ordering junk < prose < template violated: $got")
  }

  // ---- lengthQuantiles ----------------------------------------------------

  test("lengthQuantiles: type-1 inverse CDF on hand-computable histograms") {
    import spark.implicits._
    val docs = (Seq(1L, 2L, 3L, 4L).map(v => ("a", v)) ++
      Seq(5L, 5L, 5L, 9L).map(v => ("b", v)))
      .zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v) }
      .toDF("doc_id", "source", "n_chars")
    val got = graft.pipeline.TextAnalysis.lengthQuantiles(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // a: n=4 → targets ceil(p*4/1000) = 1,2,3,4,4 ; b: cum(5)=3, cum(9)=4
    assert(got == Set(
      ("a", 250L, 1L), ("a", 500L, 2L), ("a", 750L, 3L),
      ("a", 900L, 4L), ("a", 990L, 4L),
      ("b", 250L, 5L), ("b", 500L, 5L), ("b", 750L, 5L),
      ("b", 900L, 9L), ("b", 990L, 9L)))
  }

  // ---- q_rolling_24h frame edge -------------------------------------------

  test("rolling 24h range frame includes the exact edge, excludes edge+1us") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_roll").toString
    val t0 = java.time.Instant.parse("2024-03-01T00:00:00Z")
    def ts(plusUs: Long) = java.sql.Timestamp.from(t0.plusNanos(plusUs * 1000L))
    Seq(
      (0L, ts(0L), 7L, "view", 10.5, "{}"),
      (1L, ts(86400L * 1000000L), 7L, "view", 1.2, "{}"),
      (2L, ts(86400L * 1000000L + 1L), 7L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_rolling_24h")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // e1's frame [t1-24h, t1] still holds e0 (inclusive edge); e2's frame
    // [t0+1us, t2] has dropped it
    assert(got.toSeq == Seq((0L, 1L, 10L), (1L, 2L, 11L), (2L, 2L, 3L)))
  }

  test("semanticDecontaminate refuses an unbroadcastable benchmark side") {
    val bench = embDf((1L to 5L).map(i => i -> Array(1f, 0f)): _*)
    val corpus = embDf(100L -> Array(1f, 0f))
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(corpus, bench, tau = 0.5, maxBenchmark = 4)
    }
    assert(e.getMessage.contains("maxBenchmark"))
  }
}
