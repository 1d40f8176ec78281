package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade sweep for the lake-backed maintained aggregate (the r19
  * verdict's weak, rebuilt in r20): per-epoch fold cost must track
  * CHANGED groups, not total group cardinality, once the table is laid
  * out by the at-scale recipe — a NUMERIC group key, the source lake
  * range-partitioned on it with stats recorded (so the diff reads only
  * changed partitions and the MIN/MAX recompute's isin envelope prunes
  * to the affected groups' files), and `stateBuckets` sized so one
  * bucket's groups stay executor-friendly. The sweep holds the CHANGED
  * work constant (8 groups, all resident in one source partition of
  * fixed size) and scales everything else 10×:
  *
  *   IvmStateAb 20000 64     — base: 20k groups, 80k rows, 8 partitions
  *   IvmStateAb 200000 640   — 10× groups/rows/partitions, buckets
  *                             scaled with them (the scaladoc's sizing
  *                             rule): per-epoch fold should stay ~flat
  *   IvmStateAb 200000 64    — 10× groups on the UNSCALED bucket
  *                             layout: each rewrite carries 10× the
  *                             groups, the regime the rule exists for
  *   IvmStateAb 200000 640 4 8 0   — GC off (keep=0): isolates the
  *                             fold from the O(buckets) GC walk
  *
  * MIN/MAX maintenance is ON (each epoch raises the touched groups'
  * values, so stored maxima leave and the affected-group recompute
  * runs — the full-feature cost, not the cheap additive path).
  * Bootstrap is reported separately: it writes EVERY bucket (one write
  * job each, `graft.lake.commitParallelism` wide) — a one-time O(total
  * groups) cost by definition. Scratch measurement main; results
  * recorded in SCALE.md. */
object IvmStateAb {
  def main(args: Array[String]): Unit = {
    val g = args.headOption.map(_.toInt).getOrElse(20000)
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val epochs = args.lift(2).map(_.toInt).getOrElse(4)
    val changedGroups = args.lift(3).map(_.toInt).getOrElse(8)
    val keep = args.lift(4).map(_.toInt).getOrElse(10)
    val rowsPerGroup = 4L
    val groupsPerPart = 2500 // fixed partition size as the lake grows
    val parts = math.max(1, g / groupsPerPart)
    require(changedGroups <= groupsPerPart,
      "changed groups must fit one source partition (the constant-work " +
        "contract of the sweep)")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.lake.commitParallelism", "32")
    spark.conf.set("graft.lake.ivm.keepSnapshots", keep.toString)
    val L = graft.pipeline.Lakehouse
    val dir = s"/tmp/graft_ivm_ab/g${g}_b${buckets}_k$keep"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val root = s"$dir/lake"
    val tableDir = s"$dir/agg"
    // numeric group key; groups range-partitioned so one group's rows
    // live in exactly one partition and file stats on `grp` are
    // range-prunable — the layout a user maintaining per-group extrema
    // at 10⁷ groups would choose
    val base = spark.range(0, g * rowsPerGroup, 1, 32)
      .select(col("id"), (col("id") % g).as("grp"),
        (col("id") * 10).as("len"),
        ((col("id") % g) / groupsPerPart).cast("int").as("p"))
    L.commitSnapshot(spark, root,
      (0 until parts).map(i => s"p=$i" -> base.filter(col("p") === i)),
      statsCols = Seq("grp", "len"))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val mm = Seq("len")
    val boot = L.readSnapshot(spark, root)
      .select(col("id"), lit("I").as("change_type"),
        lit(null).cast("long").as("old_grp"), col("grp").as("new_grp"),
        lit(null).cast("long").as("old_len"), col("len").as("new_len"))
    val (_, bootSec) = time {
      L.ivmFold(spark, root, "", tableDir, Seq("grp"), Seq("len"),
        mm, mm, 1, isBootstrap = true, boot, buckets)
    }
    println(f"groups=$g buckets=$buckets parts=$parts keep=$keep " +
      f"bootstrap: $bootSec%.2f s")
    val epochSecs = (1 to epochs).map { e =>
      // touch a FIXED set of groups (0..changedGroups-1), all resident
      // in source partition p=0: the diff reads ONE fixed-size
      // partition, the fold rewrites ≤changedGroups state buckets, and
      // the recompute's [0, changedGroups) envelope prunes to p=0's
      // files — constant work while the lake grows 10×
      val src = base.filter(col("grp") < changedGroups)
        .withColumn("len", col("len") + lit(e.toLong))
      L.mergeSnapshot(spark, root, src, Seq("id"), "p")
      val before = L.currentManifest(spark, tableDir)
      val diff = L.snapshotChanges(spark, root, e, e + 1, Seq("id"))
      val (_, sec) = time {
        L.ivmFold(spark, root, "", tableDir, Seq("grp"), Seq("len"),
          mm, mm, e + 1, isBootstrap = false, diff, buckets)
      }
      val after = L.currentManifest(spark, tableDir)
      val rewrote = after.keySet.count(rel =>
        before.get(rel) != after.get(rel))
      println(f"epoch ${e + 1}: fold $sec%.2f s, rewrote $rewrote of " +
        s"${after.size} buckets ($changedGroups groups changed)")
      sec
    }
    val med = epochSecs.sorted.apply(epochSecs.size / 2)
    println(f"""{"groups":$g,"buckets":$buckets,"parts":$parts,"keep":$keep,"changed_groups":$changedGroups,"bootstrap_sec":$bootSec%.2f,"median_epoch_sec":$med%.2f}""")
    spark.stop()
  }
}
