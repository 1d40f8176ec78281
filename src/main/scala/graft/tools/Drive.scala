package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for driving the public API during development. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    val g = graft.api.Graft.overParquetDir(
      graft.api.TpchCatalog.catalog, "/root/testdata/sf0.1")
    val queries = Map(
      "scan_filter" -> """PREFIX g: <urn:g:>
        |SELECT ?c ?name ?bal WHERE {
        |  ?c a g:Customer ; g:name ?name ; g:acctbal ?bal .
        |  FILTER (?bal > 5000) } ORDER BY ?c""".stripMargin,
      "join_chain" -> """PREFIX g: <urn:g:>
        |SELECT ?l ?cname ?qty WHERE {
        |  ?c a g:Customer ; g:name ?cname ; g:mktsegment "BUILDING" .
        |  ?o g:customer ?c .
        |  ?l g:order ?o ; g:quantity ?qty . } ORDER BY ?l""".stripMargin)
    for ((name, q) <- queries; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = g.sparql(q)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"$name run$i compile=${(t1 - t0) / 1e3}%.0fus exec=${(t2 - t1) / 1e6}%.0fms")
    }
    spark.stop()
  }
}
