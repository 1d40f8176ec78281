package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

import graft.compiler.Compiler
import graft.mapping.Catalog
import graft.parser.SparqlParser

/** Public entry point — the Spark-native `Ontario(config).sparql(query)`
  * (cf. `/root/reference/run_query.py:1-60`): parse → decompose/source-select
  * → compile to one lazy DataFrame. One shared SparkSession (the reference
  * boots a fresh SparkSession per query, `sparql2spark.py:103-112` — an
  * anti-pattern this rebuild eliminates).
  */
final class Graft(val catalog: Catalog, tableLoader: String => DataFrame)
                 (implicit spark: SparkSession) {

  private val cache = TrieMap[String, DataFrame]()
  private val compiler = new Compiler(catalog, t => cache.getOrElseUpdate(t, tableLoader(t)))

  /** Execute a SPARQL query, returning the lazy result DataFrame. */
  def sparql(query: String): DataFrame =
    compiler.compile(SparqlParser.parseUnsafe(query))

  /** Compile an already-parsed query (the [[Experiment]] metrics path
    * times parse and compile separately). */
  def compile(q: graft.algebra.Query): DataFrame = compiler.compile(q)
}

object Graft {
  /** All molecule tables backed by `<dir>/<table>.parquet`. */
  def overParquetDir(catalog: Catalog, dir: String)(implicit spark: SparkSession): Graft =
    new Graft(catalog, t => spark.read.parquet(s"$dir/$t.parquet"))
}
