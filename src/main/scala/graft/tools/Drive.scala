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
    val dir = "/root/testdata/sf0.01"
    val names = List("customer", "orders", "lineitem", "part", "supplier",
      "nation", "region", "documents")
    val tables = names.map(t => t -> spark.read.parquet(s"$dir/$t.parquet")).toMap
    val cat = graft.mapping.CatalogGen.fromTables(tables,
      graft.mapping.CatalogGen.GenOptions(aliases = Map(
        "customer" -> "cust", "supplier" -> "supp",
        "lineitem" -> "line", "documents" -> "doc")))
    val g = new graft.api.Graft(cat, tables)(spark)
    val q = """PREFIX g: <urn:g:>
      |SELECT ?l ?cname ?qty WHERE {
      |  ?c a g:Customer ; g:name ?cname ; g:mktsegment "BUILDING" .
      |  ?o g:customer ?c .
      |  ?l g:order ?o ; g:quantity ?qty .
      |} ORDER BY ?l""".stripMargin
    val df = g.sparql(q)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println("rows=" + df.count())
    println(f"exec ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
