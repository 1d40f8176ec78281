package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.{Experiment, Graft, TpchCatalog}

/** CLI query runner — the `run_query.py` / `runExperiment.py` surface of
  * the reference (parse → decompose → plan → execute with `dt`/`pt`/
  * `t1`/`tn` + answer-trace metrics), over a parquet lake dir.
  *
  * Usage: runMain graft.tools.RunQuery <sfDir> <queryFile> [--autogen]
  *
  * `--autogen` probes the lake for the catalog ([[graft.mapping.CatalogGen]],
  * the `create_rdfmts.py` path) instead of using the declared one.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunQuery <sfDir> <queryFile> [--autogen]")
    val (sfDir, queryFile) = (args(0), args(1))
    val autogen = args.contains("--autogen")
    val query = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(queryFile)),
      java.nio.charset.StandardCharsets.UTF_8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g =
      if (autogen) Graft.overProbedParquetDir(sfDir,
        graft.SparkEntry.autogenTables, graft.SparkEntry.autogenAliases)(spark)
      else Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)
    val m = Experiment.run(g, query)
    val trace = m.trace.map { case (t, c) => f"[$t%.3f,$c]" }.mkString(",")
    println(
      f"""{"dt":${m.dt}%.3f,"pt":${m.pt}%.3f,"t1":${m.t1}%.3f,"tn":${m.tn}%.3f,"c1":${m.c1},"cn":${m.cn},"trace":[$trace]}""")
    spark.stop()
  }
}
