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
    val correlated = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?c WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  FILTER EXISTS { ?o g:customer ?c ; g:totalprice ?tp .
        |                  FILTER (?tp > ?b * 40) } }""".stripMargin)
    val optCond = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?c ?o WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  OPTIONAL { ?o g:customer ?c ; g:totalprice ?tp .
        |             FILTER (?tp > ?b * 40) } }""".stripMargin)
    for ((n, df) <- Seq("correlated-exists" -> correlated, "optional-cond" -> optCond)) {
      val joins = df.queryExecution.executedPlan.toString.linesIterator
        .filter(s => s.contains("Join") || s.contains("CartesianProduct"))
        .map(_.trim.take(110)).mkString("\n")
      println(s"===== $n\n$joins")
    }
    spark.stop()
  }
}
