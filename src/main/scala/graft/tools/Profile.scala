package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): for each named
  * registered query, dump `.explain("formatted")` to
  * `<outDir>/<query>_<suffix>.txt` and time the noop-sink execution
  * (median of `SPARK_GRAFT_BENCH_RUNS`, default 3) with a listener
  * summarizing stages, shuffled bytes, and spilled bytes — the plan-shape
  * facts (Exchange count, join strategy) land in the dumped plan, the
  * empirical facts on stdout.
  *
  * Usage: runMain graft.tools.Profile <outDir> <suffix> <query>[,query...]
  * Session config mirrors Bench exactly so numbers are comparable.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Profile <outDir> <suffix> <q1,q2,...>")
    val (outDir, suffix) = (args(0), args(1))
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    // same warmup as Bench: session machinery + the heavy pipeline paths
    spark.range(1000000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    try {
      val docSample = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
      graft.pipeline.Dedup.dedupCorpusWithContainment(docSample)
        .write.format("noop").mode("overwrite").save()
      graft.pipeline.Dedup.simhashNearDups(docSample)
        .write.format("noop").mode("overwrite").save()
      graft.pipeline.Prepare.prepareCorpus(docSample)
        .write.format("noop").mode("overwrite").save()
      val embSample = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
      graft.pipeline.Similarity.bruteForceTopK(embSample, k = 2, numQueries = 1)
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[profile] warmup skipped: ${e.getMessage}")
    }

    // listener: stages + shuffle/spill totals per measured window
    val nJobs = new java.util.concurrent.atomic.AtomicLong
    val nStages = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    val gcTimeMs = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        nJobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        nStages.incrementAndGet()
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
          taskTimeMs.addAndGet(m.executorRunTime)
          gcTimeMs.addAndGet(m.jvmGCTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val rows = mutable.ArrayBuffer[String]()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // plan dump (fresh frame — explain must not absorb run-state)
      val planTxt =
        try {
          val df = fn(spark, sfDir)
          val sw = new java.io.StringWriter
          val out = new java.io.PrintWriter(sw)
          out.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          out.flush()
          sw.toString
        } catch { case e: Throwable => s"explain failed: ${e.getMessage}" }
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        planTxt.getBytes(StandardCharsets.UTF_8))
      val times = (1 to nRuns).map { _ =>
        nJobs.set(0); nStages.set(0); shufRead.set(0); shufWrite.set(0)
        spill.set(0); taskTimeMs.set(0); gcTimeMs.set(0)
        spark.sparkContext.setJobDescription(s"profile: $name")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[profile] $name failed: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        if (t > 2.0) System.gc()
        t
      }
      // wait for straggler stage-completed events before reading counters
      Thread.sleep(200)
      System.gc()
      val med = times.sorted.apply(nRuns / 2)
      val line = f"$name%-36s med=$med%7.3f s  runs=[${times.map(t => f"$t%.3f").mkString(",")}]  " +
        f"lastRun: jobs=${nJobs.get}%3d stages=${nStages.get}%4d " +
        f"taskTime=${taskTimeMs.get / 1000.0}%8.1f s " +
        f"gc=${gcTimeMs.get / 1000.0}%6.1f s " +
        f"shufR=${shufRead.get / 1048576.0}%8.2f MB shufW=${shufWrite.get / 1048576.0}%8.2f MB " +
        f"spill=${spill.get / 1048576.0}%6.1f MB"
      println(line)
      rows += line
    }
    println("== summary ==")
    rows.foreach(println)
    spark.stop()
  }
}
