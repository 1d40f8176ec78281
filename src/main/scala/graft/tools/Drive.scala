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
    implicit val sp: SparkSession = spark
    val inner = graft.api.Graft.overParquetDir(
      graft.mapping.Catalog(graft.api.TpchCatalog.catalog.molecules.filter(m =>
        Set("urn:g:Customer", "urn:g:Nation", "urn:g:Region").contains(m.rdfType))),
      "/root/testdata/sf0.001")
    val server = new graft.api.GraftServer(inner)
    val port = server.start()
    try {
      val t0 = System.nanoTime()
      val g = graft.api.Graft.overSparqlEndpoint(s"http://127.0.0.1:$port/sparql")
      println(f"probe time: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      g.catalog.molecules.foreach(m => println(
        s"molecule ${m.rdfType} table=${m.table} card=${m.cardinality} " +
          s"bcast=${m.broadcastHint} preds=${m.predicates.keySet.toList.sorted}"))
      val t1 = System.nanoTime()
      val df = g.sparql(
        """PREFIX g: <urn:g:>
          |SELECT ?rname (COUNT(?c) AS ?ncust) WHERE {
          |  ?c a g:Customer ; g:nation ?n .
          |  ?n a g:Nation ; g:region ?r .
          |  ?r a g:Region ; g:name ?rname .
          |} GROUP BY ?rname ORDER BY ?rname""".stripMargin)
      df.show(10, false)
      println(f"query time: ${(System.nanoTime() - t1) / 1e9}%.1fs")
      df.printSchema()
    } finally server.stop()
    spark.stop()
  }
}
