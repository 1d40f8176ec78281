package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the `noop` sink so the
  * full plan executes (a bare `count()` would let Catalyst prune the
  * projections that are the whole point of the text/pipeline operators). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, shuffle machinery, parquet reader) so the
    // first measured query doesn't absorb JVM/session init
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    // …and the heavy pipeline code paths (MinHash/SimHash native exprs,
    // similarity loops) on 64-row samples: JIT + codegen warmup, not result
    // warmup — the measured queries still scan the full tables cold
    try {
      val docSample = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
      // the full dedup composition (exact groupBy + LSH + containment
      // index + components + union-find) — its first cold run otherwise
      // pays ~10 s of JIT/codegen that lands in whichever measured query
      // hits the path first
      graft.pipeline.Dedup.dedupCorpusWithContainment(docSample)
        .write.format("noop").mode("overwrite").save()
      graft.pipeline.Dedup.simhashNearDups(docSample)
        .write.format("noop").mode("overwrite").save()
      // the funnel→dedup→split composition adds its own code paths
      // (filter funnel, split assign) on top of the dedup family
      graft.pipeline.Prepare.prepareCorpus(docSample)
        .write.format("noop").mode("overwrite").save()
      val embSample = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
      graft.pipeline.Similarity.bruteForceTopK(embSample, k = 2, numQueries = 1)
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup skipped: ${e.getMessage}")
    }
    // median-of-3 per query: run-to-run noise on a shared box swings single
    // runs 2-3× (round-2's driver bench read ~2× high under machine load);
    // the median of three passes is robust to one loaded run. Raw per-run
    // numbers are emitted alongside for forensics.
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // fixed machine-calibration workload, measured like a query (median of
    // nRuns): a deterministic CPU-bound aggregation whose cost depends on
    // the BOX, not the engine or the data. Cross-round totals divide by
    // this to separate engine regressions from host drift — round 8 found
    // the same commit measuring 2× slower than round 6 on every query
    // after a VM reboot (isolated q1_agg 1.0 s vs 0.49 s, uniformly),
    // which only a same-run calibration constant can prove.
    val calib = (1 to nRuns).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 2000000000L, 1, numPartitions = cpus.toInt)
        .selectExpr("sum(id * 3 + (id & 7))").head()
      (System.nanoTime() - t0) / 1e9
    }.sorted.apply(nRuns / 2)
    // optional comma-separated subset for targeted regression hunts
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // an explicit SPARK_GRAFT_BENCH_ONLY naming an excluded query wins —
    // the exclusion protects the default suite totals, not targeted hunts
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.exists(_.contains(name)) || !SparkEntry.benchExcluded.contains(name) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        // outside the timer: drop blocks the finished run left behind
        // (result-lifecycle localCheckpoints are freed only by GC-driven
        // ContextCleaner otherwise, and its periodic GC is 30 min — longer
        // than the whole bench; round 4's path_closure 4.4× regression was
        // ~150 prior runs' leaked blocks evicting the live frontier). The
        // engine keeps no intentional cross-query persisted RDDs: catalogs
        // memoize driver-side objects, table reads are lazy.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        // heavy runs also get the cleaner's GC trigger BETWEEN runs (still
        // outside the timer): a multi-stage composition leaves dozens of
        // shuffles + broadcasts whose cleanup is reference-triggered, and
        // with gc only per query GROUP, run 2 and 3 of the same heavy
        // query pay rising eviction/GC tax — round-8's driver bench
        // measured doc_prepare_corpus growing monotonically [2.9 → 6.7 →
        // 13.5 s] across its three runs. Sub-second queries skip it (a
        // full GC costs more than they do).
        if (t > 2.0) System.gc()
        t
      }
      // also outside the timer: give ContextCleaner its GC trigger. Shuffle
      // files and broadcast state are reclaimed only when their driver-side
      // objects are collected; the cleaner's own periodic GC is 30 min —
      // longer than the bench — so without this, 100+ queries × 3 runs of
      // shuffle state pile onto disk and heap and later queries pay rising
      // GC/eviction tax (run times DECLINING within a query is the tell).
      System.gc()
      (name, times.sorted.apply(nRuns / 2), times)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, ts) =>
      "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // raw per-run forensics go to a file — inlining them made the summary
    // line so long the driver's tail window clipped it (round-3 BENCH JSON
    // arrived unparseable)
    val rawPath = java.nio.file.Paths.get("target", "bench_raw_runs.json")
    java.nio.file.Files.createDirectories(rawPath.getParent)
    java.nio.file.Files.write(rawPath,
      s"""{"runs":$nRuns,"sf":"$sfDir","raw":$raw}""".getBytes("UTF-8"))
    // the full per-query median map ALSO outgrew the tail window at 92
    // queries (round-6 BENCH lost "total" + 11 medians off the line's
    // head — the window keeps the END of output, clipping the FRONT of
    // one long line), so the complete summary lands in its own small
    // file and the line that prints LAST carries only the scalars plus a
    // pointer: it parses at any suite size
    val fullSummary =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$nRuns,"n_queries":${results.size},"calib_sec":$calib%.3f,"queries":$qs,"sf":"$sfDir"}"""
    val summaryPath = java.nio.file.Paths.get("target", "bench_summary.json")
    java.nio.file.Files.write(summaryPath, fullSummary.getBytes("UTF-8"))
    spark.stop()
    // the FINAL line additionally carries a per-query map the driver's
    // comparator can parse (r20 PERF had per_query={} because only this
    // line survives the tail window intact). The window is ~2000 chars
    // and the FULL 214-row map is ~6 KB — a long final line gets its
    // HEAD clipped and stops parsing (the round-3 incident) — so the
    // inline map holds the most expensive rows up to a byte budget
    // (they are the rows a per-query comparison is about) and the
    // complete map stays in bench_summary.json. Existing fields are
    // unchanged (additions only).
    val byCost = results.sortBy { case (_, v, _) => -v }
      .map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
    val budget = 1400 // chars for the inline map; line stays < 1700
    val topQs = byCost.foldLeft((List.empty[String], 0)) {
      case ((acc, used), e) =>
        if (used + e.length + 1 <= budget) (e :: acc, used + e.length + 1)
        else (acc, budget + 1) // budget exhausted: keep the top prefix only
    }._1.reverse.mkString("{", ",", "}")
    // full line first (human-readable / greppable), compact line last
    println(fullSummary)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$nRuns,"n_queries":${results.size},"calib_sec":$calib%.3f,"sf":"$sfDir","queries":$topQs,"n_queries_inline":${if (byCost.isEmpty) 0 else topQs.count(_ == ':')},"queries_file":"target/bench_summary.json"}""")
  }
}
