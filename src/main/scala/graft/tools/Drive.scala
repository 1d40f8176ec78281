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
          |SELECT ?cname ?odate ?qty WHERE {
          |  ?c a g:Customer ; g:name ?cname ; g:mktsegment "BUILDING" .
          |  ?o g:customer ?c ; g:orderdate ?odate .
          |  OPTIONAL { ?l g:order ?o ; g:quantity ?qty . FILTER (?qty > 45) }
          |} ORDER BY ?cname ?odate LIMIT 8""".stripMargin)
    implicit val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Graft.overParquetDir(TpchCatalog.catalog, sfDir).sparql(query)
    df.show(20, truncate = false)
    df.explain("formatted")
    spark.stop()
  }
}
