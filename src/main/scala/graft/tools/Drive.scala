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
    implicit val s: SparkSession = spark
    val g = graft.api.Graft.overParquetDir(
      graft.api.TpchCatalog.catalog, "/root/testdata/sf0.01")
    val server = new graft.api.GraftServer(g)
    val port = server.start()

    // bind join over real loopback HTTP: remote side should land in a
    // LocalRelation and broadcast; local side unshuffled for this join
    val fed = g.sparql(
      s"""PREFIX g: <urn:g:>
         |SELECT ?r ?rn WHERE {
         |  ?n g:region ?r .
         |  SERVICE <http://127.0.0.1:$port/sparql> { ?r g:name ?rn }
         |} ORDER BY ?r ?rn""".stripMargin)
    println(s"rows=${fed.count()} requests=${server.queriesServed.get()}")
    fed.explain("formatted")

    // SILENT full fetch: pinned at compile, swept at next idle compile
    val silent = g.sparql(
      s"""PREFIX g: <urn:g:> SELECT ?n WHERE {
         |  SERVICE SILENT <http://127.0.0.1:$port/sparql> { ?n a g:Nation } }""".stripMargin)
    println(s"silent rows=${silent.count()} cached=" +
      spark.sparkContext.getRDDStorageInfo.count(_.isCached))
    g.sparql("PREFIX g: <urn:g:> ASK { ?r a g:Region }")
    Thread.sleep(1000)
    println("after idle compile cached=" +
      spark.sparkContext.getRDDStorageInfo.count(_.isCached))

    server.stop()
    spark.stop()
  }
}
