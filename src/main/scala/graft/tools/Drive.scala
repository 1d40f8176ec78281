package graft.tools

import org.apache.spark.sql.SparkSession
import graft.api.{Graft, TpchCatalog}

/** Manual end-to-end driver (see .claude/skills/verify): runs a SPARQL
  * query through the public API and prints rows + the formatted plan.
  *
  *   sbt "runMain graft.tools.Drive [sfDir] [sparqlFile]"
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val query = args.lift(1)
      .map(p => new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
      .getOrElse(
        """PREFIX g: <urn:g:>
          |SELECT ?ent ?ename ?nname WHERE {
          |  ?ent g:name ?ename ; g:nation ?n .
          |  ?n g:name ?nname ; g:region ?r .
          |  ?r g:name "ASIA" .
          |} ORDER BY ?ent""".stripMargin)
    implicit val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // audit both catalogs: hand-written and probed
    val tables = List("customer", "orders", "lineitem", "part", "supplier",
      "nation", "region", "documents")
      .map(t => t -> spark.read.parquet(s"$sfDir/$t.parquet")).toMap
    val auto = graft.mapping.CatalogGen.fromTables(tables,
      graft.mapping.CatalogGen.GenOptions(aliases = Map(
        "customer" -> "cust", "supplier" -> "supp",
        "lineitem" -> "line", "documents" -> "doc")))
    for ((label, g) <- List(
        "hand-written" -> Graft.overParquetDir(TpchCatalog.catalog, sfDir),
        "probed" -> new Graft(auto, tables))) {
      println(s"==== $label catalog ====")
      val df = g.sparql(query)
      df.show(5, truncate = false)
      df.explain("formatted")
    }
    spark.stop()
  }
}
