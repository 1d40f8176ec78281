package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for driving the public API during development. */
object Drive {
  def main(args: Array[String]): Unit = {
    sys.props("graft.debug.bgp") = "1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    val dir = "/root/testdata/sf0.01"
    val tables = List("customer", "orders", "lineitem")
      .map(t => t -> spark.read.parquet(s"$dir/$t.parquet")).toMap
    val cat = graft.mapping.CatalogGen.fromTables(tables,
      graft.mapping.CatalogGen.GenOptions(aliases = Map(
        "customer" -> "cust", "lineitem" -> "line")))
    cat.molecules.foreach(m => println(s"MOL ${m.rdfType} card=${m.cardinality}"))
    val g = new graft.api.Graft(cat, tables)
    val df = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?l ?cname ?qty WHERE {
        |  ?l g:order ?o ; g:quantity ?qty .
        |  ?o g:customer ?c .
        |  ?c a g:Customer ; g:name ?cname ; g:mktsegment "BUILDING" .
        |}""".stripMargin)
    df.queryExecution.optimizedPlan.collectLeaves()
      .foreach(l => println("LEAF " + l.toString.take(60)))
    spark.stop()
  }
}
