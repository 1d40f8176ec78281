package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Lakehouse

/** Round-20: the lake-backed maintained aggregate (the r19 verdict's
  * one weak) — state persisted as a bucket-partitioned snapshot lake
  * whose per-epoch commit touches ONLY changed-group buckets, with the
  * last-folded-epoch watermark riding the same manifest CAS
  * (crash-safe exactly-once, snapshot-isolated readers) — plus the
  * per-snapshot `#prop` manifest surface it rides on, the epoch-gap
  * and eager-schema guards, and the DecimalType sum-stability fix. */
class Round20Spec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_r20_$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    d
  }

  private def fsOf(d: String) = new org.apache.hadoop.fs.Path(d)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def docs(ids: Seq[Long], lang: Long => String,
                   len: Long => Long) =
    ids.map(i => (i, lang(i), len(i))).toDF("id", "lang", "len")
      .withColumn("p", (col("id") % 2).cast("int"))

  // ---- per-snapshot #prop lines -------------------------------------------

  test("snapshot props: committed atomically with the manifest, read " +
    "back verbatim (inline AND sharded manifests), per-snapshot (a " +
    "fresh commit carries none), and carried by rollback's verbatim " +
    "manifest copy") {
    val root = freshDir("props")
    val base = docs(1L to 8L, i => if (i % 2 == 0) "en" else "de", _ * 10)
    Lakehouse.commitSnapshot(spark, root,
      (0 to 1).map(i => s"p=$i" -> base.filter(col("p") === i)),
      props = Map("who" -> "r20", "k v" -> "a\tb"))
    assert(Lakehouse.snapshotProps(spark, root) ==
      Map("who" -> "r20", "k v" -> "a\tb"),
      "props must round-trip, URL-escaping included")
    // a fresh commit carries NO props unless passed — per-snapshot facts
    Lakehouse.deleteSnapshot(spark, root, col("id") === 1L)
    assert(Lakehouse.snapshotProps(spark, root).isEmpty)
    assert(Lakehouse.snapshotProps(spark, root, Some(1)) ==
      Map("who" -> "r20", "k v" -> "a\tb"),
      "older snapshots keep their own props")
    // rollback copies the manifest verbatim — props included
    Lakehouse.rollbackSnapshot(spark, root, 1)
    assert(Lakehouse.snapshotProps(spark, root)("who") == "r20")
    // SHARDED manifests keep props in the ROOT snap file (shards are
    // content-addressed per-rel blocks; a per-snapshot fact inside one
    // would break cross-epoch shard reuse)
    spark.conf.set("graft.lake.manifestShardLines", "2")
    try {
      Lakehouse.commitSnapshot(spark, root,
        Seq("p=0" -> base.filter(col("p") === 0)),
        props = Map("sharded" -> "yes"))
      assert(Lakehouse.snapshotProps(spark, root) == Map("sharded" -> "yes"))
    } finally spark.conf.unset("graft.lake.manifestShardLines")
  }

  // ---- lake-backed maintained aggregate -----------------------------------

  test("ivmFold writes ONLY the buckets containing changed groups: an " +
    "epoch touching one group leaves every other bucket's manifest " +
    "entry byte-identical (carried, zero data IO), and the watermark " +
    "prop advances in the same commit") {
    val root = freshDir("ivmbkt")
    val tableDir = freshDir("ivmbkttbl")
    // many groups so buckets are well populated
    val base = docs(1L to 200L, i => s"g${i % 40}", _ * 10)
    Lakehouse.commitSnapshot(spark, root,
      (0 to 1).map(i => s"p=$i" -> base.filter(col("p") === i)))
    spark.conf.set("graft.lake.ivm.stateBuckets", "8")
    try {
      val q = Lakehouse.maintainAggregate(spark, root, Seq("id"),
        Seq("lang"), Seq("len"), tableDir, freshDir("ivmbktck"))
      try {
        q.processAllAvailable() // bootstrap: every bucket written
        val m1 = Lakehouse.currentManifest(spark, tableDir)
        val wm1 = Lakehouse.snapshotProps(spark, tableDir)(
          Lakehouse.IvmEpochProp)
        assert(wm1 == "1")
        // epoch 2 changes exactly ONE group ("g7": ids 7,47,87,127,167)
        Lakehouse.mergeSnapshot(spark, root,
          base.filter(col("lang") === "g7")
            .withColumn("len", col("len") + 1L), Seq("id"), "p")
        q.processAllAvailable()
        val m2 = Lakehouse.currentManifest(spark, tableDir)
        assert(Lakehouse.snapshotProps(spark, tableDir)(
          Lakehouse.IvmEpochProp) == "2",
          "the watermark must ride the fold's own commit")
        val rewritten = m2.keySet.filter(rel => m1.get(rel) != m2.get(rel))
        assert(rewritten.size == 1,
          s"one changed group must rewrite exactly its ONE hash bucket, " +
            s"got $rewritten")
        assert((m2.keySet -- rewritten).forall(rel => m1(rel) == m2(rel)),
          "untouched buckets must carry over byte-free")
        // and the maintained table equals the full recompute
        val got = Lakehouse.readAggregate(spark, tableDir)
          .orderBy("lang").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        val want = Lakehouse.readSnapshot(spark, root).groupBy("lang")
          .agg(count(lit(1)).as("n_rows"), sum(col("len")).as("sum_len"))
          .select("lang", "n_rows", "sum_len").orderBy("lang").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got == want)
      } finally q.stop()
    } finally spark.conf.unset("graft.lake.ivm.stateBuckets")
  }

  test("readAggregate is snapshot-isolated under a concurrent " +
    "maintainer: a frame resolved before several further folds still " +
    "materializes its OWN epoch's content (default retention keeps " +
    "the generations alive), and state history is time-travelable") {
    val root = freshDir("ivmrdr")
    val tableDir = freshDir("ivmrdrtbl")
    val base = docs(1L to 40L, i => s"g${i % 5}", _ * 10)
    Lakehouse.commitSnapshot(spark, root,
      (0 to 1).map(i => s"p=$i" -> base.filter(col("p") === i)))
    val q = Lakehouse.maintainAggregate(spark, root, Seq("id"),
      Seq("lang"), Seq("len"), tableDir, freshDir("ivmrdrck"))
    try {
      q.processAllAvailable()
      // resolve the reader BEFORE further folds, snapshot its expected
      // content lazily (the plan pins epoch-1 generation files)
      val reader = Lakehouse.readAggregate(spark, tableDir)
      val expected = reader.orderBy("lang").collect().toSeq
      // five more epochs, each rewriting buckets (every group changes)
      (1 to 5).foreach { e =>
        Lakehouse.mergeSnapshot(spark, root,
          base.withColumn("len", col("len") + lit(e.toLong)),
          Seq("id"), "p")
        q.processAllAvailable()
      }
      assert(reader.orderBy("lang").collect().toSeq == expected,
        "a resolved reader must keep serving its own epoch's files")
      // the state's own history is a lake: time travel reaches the
      // bootstrap fold
      val t1 = Lakehouse.readSnapshot(spark, tableDir, asOf = Some(1))
        .drop(Lakehouse.IvmBucketCol).orderBy("lang").collect().toSeq
      assert(t1 == expected)
    } finally q.stop()
  }

  test("ivmFold guards: a GAPPED non-bootstrap epoch fails loudly " +
    "(folding over it would silently drop the missing epochs' " +
    "deltas), a replayed epoch folds nothing twice, and a FOREIGN " +
    "commit to the state lake (watermark lost) is refused") {
    val root = freshDir("ivmgap")
    val tableDir = freshDir("ivmgaptbl")
    val base = docs(1L to 10L, i => s"g${i % 3}", _ * 10)
    Lakehouse.commitSnapshot(spark, root,
      (0 to 1).map(i => s"p=$i" -> base.filter(col("p") === i)))
    val q = Lakehouse.maintainAggregate(spark, root, Seq("id"),
      Seq("lang"), Seq("len"), tableDir, freshDir("ivmgapck"))
    try q.processAllAvailable() finally q.stop() // watermark 1
    def diffOf(e: Int) =
      Lakehouse.snapshotChanges(spark, root, e - 1, e, Seq("id"))
    Lakehouse.mergeSnapshot(spark, root,
      base.filter(col("id") === 1L).withColumn("len", lit(99L)),
      Seq("id"), "p") // epoch 2
    Lakehouse.deleteSnapshot(spark, root, col("id") === 2L) // epoch 3
    // a gapped delivery (epoch 3 after watermark 1) must throw, naming
    // the missing range — NOT fold a plausibly-shaped wrong table
    val gap = intercept[IllegalStateException] {
      Lakehouse.ivmFold(spark, tableDir, Seq("lang"), Seq("len"),
        3, isBootstrap = false, diffOf(3), 16)
    }
    assert(gap.getMessage.contains("2..2"),
      s"the gap guard must name the missing epochs: ${gap.getMessage}")
    // dense delivery folds; an at-least-once REPLAY of epoch 2 is a
    // no-op (the watermark rode epoch 2's own commit)
    Lakehouse.ivmFold(spark, tableDir, Seq("lang"), Seq("len"),
      2, isBootstrap = false, diffOf(2), 16)
    val m2 = Lakehouse.currentManifest(spark, tableDir)
    Lakehouse.ivmFold(spark, tableDir, Seq("lang"), Seq("len"),
      2, isBootstrap = false, diffOf(2), 16)
    assert(Lakehouse.currentManifest(spark, tableDir) == m2,
      "a replayed epoch must not commit anything")
    Lakehouse.ivmFold(spark, tableDir, Seq("lang"), Seq("len"),
      3, isBootstrap = false, diffOf(3), 16)
    val got = Lakehouse.readAggregate(spark, tableDir)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Lakehouse.readSnapshot(spark, root).groupBy("lang")
      .agg(count(lit(1)).as("n_rows"), sum(col("len")).as("sum_len"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // a commit to the state lake that did NOT come from the maintainer
    // drops the watermark — the next fold must refuse to guess
    Lakehouse.commitSnapshot(spark, tableDir,
      Seq("bucket=0" -> Lakehouse.readSnapshot(spark, tableDir)
        .filter(col(Lakehouse.IvmBucketCol) === 0L)))
    Lakehouse.deleteSnapshot(spark, root, col("id") === 3L) // epoch 4
    val foreign = intercept[IllegalStateException] {
      Lakehouse.ivmFold(spark, tableDir, Seq("lang"), Seq("len"),
        4, isBootstrap = false, diffOf(4), 16)
    }
    assert(foreign.getMessage.contains("outside maintainAggregate"),
      s"wrong foreign-commit failure: ${foreign.getMessage}")
  }

  test("maintainAggregate eager schema validation: a typo'd group or " +
    "sum column fails SYNCHRONOUSLY naming the column, and a " +
    "non-numeric sum column is refused — never an AnalysisException " +
    "inside the stream thread on the first epoch") {
    val root = freshDir("ivmschema")
    val base = docs(1L to 6L, i => s"g$i", _ * 10)
    Lakehouse.commitSnapshot(spark, root,
      (0 to 1).map(i => s"p=$i" -> base.filter(col("p") === i)))
    val typo = intercept[IllegalArgumentException] {
      Lakehouse.maintainAggregate(spark, root, Seq("id"),
        Seq("langg"), Seq("len"), freshDir("ivmsx1"), freshDir("ivmsc1"))
    }
    assert(typo.getMessage.contains("langg"),
      s"must name the missing column: ${typo.getMessage}")
    val typoSum = intercept[IllegalArgumentException] {
      Lakehouse.maintainAggregate(spark, root, Seq("id"),
        Seq("lang"), Seq("lenn"), freshDir("ivmsx2"), freshDir("ivmsc2"))
    }
    assert(typoSum.getMessage.contains("lenn"))
    val nonNum = intercept[IllegalArgumentException] {
      Lakehouse.maintainAggregate(spark, root, Seq("id"),
        Seq("p"), Seq("lang"), freshDir("ivmsx3"), freshDir("ivmsc3"))
    }
    assert(nonNum.getMessage.contains("numeric"),
      s"non-numeric sum must be refused: ${nonNum.getMessage}")
  }

  test("applyAggregateDelta keeps sum types STABLE across folds: a " +
    "DecimalType sum column does not widen precision epoch-over-epoch " +
    "(the drift that NULLs every sum at the precision-38 cap), and " +
    "values still match the full recompute") {
    val gc = Seq("lang")
    val sc = Seq("amt")
    val v1 = Seq((1L, "en", "10.50"), (2L, "en", "20.25"), (3L, "de", "30.00"))
      .toDF("id", "lang", "amt0")
      .select(col("id"), col("lang"),
        col("amt0").cast("decimal(10,2)").as("amt"))
    def boot(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), lit("I").as("change_type"),
        lit(null).cast("string").as("old_lang"), col("lang").as("new_lang"),
        lit(null).cast("decimal(10,2)").as("old_amt"),
        col("amt").as("new_amt"))
    var agg = Lakehouse.applyAggregateDelta(
      Lakehouse.emptyAggregate(v1, gc, sc),
      Lakehouse.aggregateDelta(boot(v1), gc, sc), gc, sc)
    val stable = agg.schema("sum_amt").dataType
    assert(stable == org.apache.spark.sql.types.DecimalType(20, 2),
      s"the stable type is Spark's own sum widening, got $stable")
    // ten more folds, each adding one row — pre-fix every fold widened
    // precision by one notch
    (4L to 13L).foreach { i =>
      val d = Seq((i, "en", "1.00")).toDF("id", "lang", "amt0")
        .select(col("id"), col("lang"),
          col("amt0").cast("decimal(10,2)").as("amt"))
      agg = Lakehouse.applyAggregateDelta(agg,
        Lakehouse.aggregateDelta(boot(d), gc, sc), gc, sc)
      assert(agg.schema("sum_amt").dataType == stable,
        s"fold $i drifted the sum type to ${agg.schema("sum_amt").dataType}")
    }
    val en = agg.filter(col("lang") === "en")
      .select("sum_amt").head().getDecimal(0)
    assert(en == new java.math.BigDecimal("40.75"),
      s"decimal sum value drifted: $en")
  }

  test("maintainAggregate refuses a pre-r20 t<epoch> tableDir and a " +
    "changed bucket count — both would silently corrupt the fold") {
    val root = freshDir("ivmprov")
    val base = docs(1L to 6L, i => s"g$i", _ * 10)
    Lakehouse.commitSnapshot(spark, root,
      (0 to 1).map(i => s"p=$i" -> base.filter(col("p") === i)))
    // simulate a pre-r20 provenance file (two fields, no bucket count)
    val oldTbl = freshDir("ivmprovold")
    val fs = fsOf(oldTbl)
    fs.mkdirs(new org.apache.hadoop.fs.Path(oldTbl))
    val out = fs.create(
      new org.apache.hadoop.fs.Path(oldTbl, "_lake"), true)
    try out.write(s"${fs.makeQualified(new org.apache.hadoop.fs.Path(
      root))}\t\n".getBytes("UTF-8")) finally out.close()
    val legacy = intercept[IllegalArgumentException] {
      Lakehouse.maintainAggregate(spark, root, Seq("id"),
        Seq("lang"), Seq("len"), oldTbl, freshDir("ivmprovck0"))
    }
    assert(legacy.getMessage.contains("pre-r20"),
      s"wrong legacy-layout failure: ${legacy.getMessage}")
    // a live table pins its bucket count
    val tbl = freshDir("ivmprovtbl")
    val q = Lakehouse.maintainAggregate(spark, root, Seq("id"),
      Seq("lang"), Seq("len"), tbl, freshDir("ivmprovck1"))
    try q.processAllAvailable() finally q.stop()
    spark.conf.set("graft.lake.ivm.stateBuckets", "4")
    try {
      val rebucket = intercept[IllegalArgumentException] {
        Lakehouse.maintainAggregate(spark, root, Seq("id"),
          Seq("lang"), Seq("len"), tbl, freshDir("ivmprovck2"))
      }
      assert(rebucket.getMessage.contains("stateBuckets"),
        s"wrong bucket-count failure: ${rebucket.getMessage}")
    } finally spark.conf.unset("graft.lake.ivm.stateBuckets")
  }
}
