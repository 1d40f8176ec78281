package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for driving the public API during development. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.api.Graft.overParquetDir(
      graft.api.TpchCatalog.catalog, "/root/testdata/sf0.01")(spark)
    val df = g.sparql(
      """PREFIX g: <urn:g:> PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT ?u ?d ?l ?now WHERE {
        |  ?r a g:Region ; g:name ?n .
        |  BIND (IRI(CONCAT("urn:g:x:", ?n)) AS ?u)
        |  BIND (STRDT("5", xsd:string) AS ?d)
        |  BIND (STRLANG("chat", "fr") AS ?l)
        |  BIND (NOW() AS ?now) }""".stripMargin)
    df.collect().foreach(r => println("ROW " + r.toSeq.mkString(" | ")))
    spark.stop()
  }
}
