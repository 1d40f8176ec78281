package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for driving the public API during development. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    val g = graft.api.Graft.overParquetDir(
      graft.api.TpchCatalog.catalog, "/root/testdata/sf0.01")
    val q = """PREFIX g: <urn:g:>
      |SELECT ?sname WHERE {
      |  ?s a g:Supplier ; g:name ?sname ; g:nation [ g:name "NATION_3" ] .
      |} ORDER BY ?sname""".stripMargin
    println(graft.parser.SparqlParser.parseUnsafe(q).pattern)
    val df = g.sparql(q)
    println("rows=" + df.count())
    val q2 = """PREFIX g: <urn:g:>
      |SELECT ?sname WHERE {
      |  ?s a g:Supplier ; g:name ?sname ; g:nation ?b . ?b g:name "NATION_3" .
      |} ORDER BY ?sname""".stripMargin
    println("explicit-var rows=" + g.sparql(q2).count())
    spark.stop()
  }
}
