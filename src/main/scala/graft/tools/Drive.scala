package graft.tools
import org.apache.spark.sql.SparkSession
import graft.api.{Graft, TpchCatalog}

/** Scratch driver for manual end-to-end verification. */
object Drive {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = Graft.overParquetDir(TpchCatalog.catalog, "/root/testdata/sf0.001")
    val df = g.sparql("""
      PREFIX g: <urn:g:>
      SELECT ?cname ?odate ?qty WHERE {
        ?c a g:Customer ; g:name ?cname ; g:mktsegment "BUILDING" .
        ?o g:customer ?c ; g:orderdate ?odate .
        OPTIONAL { ?l g:order ?o ; g:quantity ?qty . FILTER(?qty > 45) }
      } ORDER BY ?cname ?odate LIMIT 8""")
    df.show(8, truncate = false)
    df.explain("formatted")
    try g.sparql("SELECT ?x WHERE { ?x oops")
    catch { case e: Exception => println("PARSE-ERR: " + e.getMessage.take(120)) }
    try g.sparql("PREFIX g: <urn:g:> SELECT ?x WHERE { ?x g:nonexistent ?y }").show()
    catch { case e: Exception => println("DECOMP-ERR: " + e.getMessage.take(120)) }
    println("unbound-filter rows = " +
      g.sparql("PREFIX g: <urn:g:> SELECT ?n WHERE { ?c g:name ?n . FILTER(?zz > 5) }").count())
    spark.stop()
  }
}
