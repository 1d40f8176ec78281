package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source registry: the Spark-native equivalent of the reference's wrapper
  * zoo (`/root/reference/ontario/wrappers/` — SPARKWrapper CSV/TSV/JSON,
  * SPARKXMLWrapper, LOCAL_* flat-file clients). One shared SparkSession and
  * `spark.read.<format>` replace per-query SparkSession boots and JSON
  * round-trips (`sparql2spark.py:103-176`). A JDBC spec covers the
  * MySQL/Postgres wrappers when a database is reachable.
  */
sealed trait SourceSpec {
  def load(spark: SparkSession): DataFrame
}

final case class ParquetSource(path: String) extends SourceSpec {
  def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** CSV/TSV with header + schema inference, as the reference configures
  * (`sparql2spark.py:129-136` inferSchema=True, header). */
final case class CsvSource(path: String, delimiter: String = ",") extends SourceSpec {
  def load(spark: SparkSession): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .option("delimiter", delimiter).csv(path)
}

final case class JsonSource(path: String) extends SourceSpec {
  def load(spark: SparkSession): DataFrame = spark.read.json(path)
}

/** XML via Spark 4's built-in XML source; `rowTag` plays the RML iterator
  * role (`sparql2sparksql.py:33-150`). */
final case class XmlSource(path: String, rowTag: String) extends SourceSpec {
  def load(spark: SparkSession): DataFrame =
    spark.read.option("rowTag", rowTag).format("xml").load(path)
}

/** JDBC (MySQL/Postgres wrapper equivalent) — predicate pushdown comes from
  * the JDBC source itself. */
final case class JdbcSource(url: String, table: String,
                            props: Map[String, String] = Map.empty) extends SourceSpec {
  def load(spark: SparkSession): DataFrame = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p)
  }
}

/** Remote-endpoint-style paged source — the RDFStore SPARQL-endpoint
  * wrapper's fetch protocol (`/root/reference/ontario/wrappers/triplestore/
  * __init__.py:52-119` contactSourceAux): request pages of `pageSize` rows
  * with LIMIT/OFFSET until a short page signals exhaustion, then hand the
  * accumulated rows to Spark. `fetchPage(offset, limit)` abstracts the
  * transport (HTTP + application/sparql-results+json in the reference;
  * unavailable in this zero-egress environment, injected in tests). The
  * client-side accumulation matches the reference exactly — a remote
  * endpoint's result set is bounded by the endpoint, not by the lake. */
final case class PagedEndpointSource(
    schema: org.apache.spark.sql.types.StructType,
    fetchPage: (Long, Int) => Seq[org.apache.spark.sql.Row],
    pageSize: Int = 10000) extends SourceSpec {
  def load(spark: SparkSession): DataFrame = {
    val all = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    var offset = 0L
    var last = pageSize
    while (last == pageSize) {
      val page = fetchPage(offset, pageSize)
      all ++= page
      last = page.size
      offset += pageSize
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(all.toSeq, math.max(1, all.size / 5000)), schema)
  }
}

object Sources {
  /** Table-loader function for [[graft.api.Graft]] over mixed formats. */
  def registry(specs: Map[String, SourceSpec])(implicit spark: SparkSession)
  : String => DataFrame =
    name => specs.getOrElse(name,
      throw new IllegalArgumentException(s"unregistered table '$name'")).load(spark)
}
