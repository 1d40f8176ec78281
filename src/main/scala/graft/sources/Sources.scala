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

/** ORC — Spark's other built-in columnar source: evidence for the
  * Drill-subsumption claim (SURVEY §2.1) that every native file format
  * federates identically (pushdown/pruning included), not just the
  * formats the reference's wrapper zoo happened to enumerate. */
final case class OrcSource(path: String) extends SourceSpec {
  def load(spark: SparkSession): DataFrame = spark.read.orc(path)
}

/** A snapshot-managed lake ([[graft.pipeline.Lakehouse.commitSnapshot]])
  * as an engine table: the reference's whole point is querying data where
  * it lives, and a mutable lake's "where it lives" is the current
  * manifest — never the raw directory tree (hidden generations, crash
  * relics, half-committed sweeps). Reads through
  * [[graft.pipeline.Lakehouse.readSnapshot]]: one multi-root scan of
  * exactly the committed data dirs under the committed schema, with
  * `asOf` exposing file-level time travel to SPARQL queries — the probed
  * catalog and every query see one consistent epoch even while writers
  * commit. */
final case class SnapshotSource(root: String,
                                asOf: Option[Int] = None,
                                tag: Option[String] = None,
                                branch: String = "")
  extends SourceSpec {
  require(asOf.isEmpty || tag.isEmpty,
    s"SnapshotSource($root): pin EITHER asOf or tag, not both")
  require(branch.isEmpty || tag.isEmpty,
    s"SnapshotSource($root): a tag names a MAIN epoch — pin EITHER " +
      "branch or tag, not both")
  /** The epoch this source reads: the pinned id, the tag's id resolved
    * NOW (tags are immutable, so this is stable until deleteTag), or
    * None = the lineage's current snapshot. */
  def epoch(spark: SparkSession): Option[Int] =
    tag.map(graft.pipeline.Lakehouse.tagSnapshotId(spark, root, _))
      .orElse(asOf)
  def load(spark: SparkSession): DataFrame =
    graft.pipeline.Lakehouse.readSnapshot(spark, root, epoch(spark),
      branch = branch)
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
  * __init__.py:52-119` contactSourceAux: LIMIT/OFFSET pages until a short
  * page signals exhaustion). `fetchPage(offset, limit)` abstracts the
  * transport (HTTP + application/sparql-results+json in the reference;
  * unavailable in this zero-egress environment, injected in tests).
  *
  * Unlike the reference — which accumulates every page in client memory
  * before processing — the fetch is distributed: the driver sizes the
  * result with O(log N) single-row probes (`LIMIT 1 OFFSET k`, galloping +
  * binary search — protocol-legal against any LIMIT/OFFSET endpoint), then
  * each partition pulls exactly one page at compute time, executor-side.
  * Driver memory is bounded by one probe row; a large endpoint result never
  * transits the driver at all. `fetchPage` must therefore be serializable
  * (a transport handle should be constructed inside the closure, not
  * captured). Pages are assumed stable across the probe/fetch window — the
  * same snapshot assumption the reference's sequential paging makes. */
final case class PagedEndpointSource(
    schema: org.apache.spark.sql.types.StructType,
    fetchPage: (Long, Int) => Seq[org.apache.spark.sql.Row],
    pageSize: Int = 10000,
    /** Result size HINT from the caller — an RDF-MT cardinality probed at
      * catalog time ([[graft.mapping.EndpointCatalogGen]]) — skips the
      * sizing probes. It sizes the page PLAN only, never truncates: a
      * probed concept cardinality counts subjects, while the fetch query
      * can return more solution rows than subjects (one per subject-value
      * combination under a multi-valued predicate), so the tail partition
      * keeps paging past the planned end until a short page proves
      * exhaustion — the same stop condition the reference's sequential
      * paging uses (`triplestore/__init__.py:52-119`). */
    knownTotal: Option[Long] = None) extends SourceSpec {
  def load(spark: SparkSession): DataFrame = {
    def exists(off: Long): Boolean = fetchPage(off, 1).nonEmpty
    val totalRows = knownTotal.getOrElse {
      if (!exists(0L)) 0L
      else {
        var hi = 1L
        while (exists(hi)) hi *= 2 // gallop: first absent offset is in (hi/2, hi]
        var lo = hi / 2            // exists(lo) holds
        while (lo + 1 < hi) {
          val mid = lo + (hi - lo) / 2
          if (exists(mid)) lo = mid else hi = mid
        }
        hi // offsets 0..hi-1 exist
      }
    }
    if (totalRows == 0L && knownTotal.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val nPages = math.max(1L, (totalRows + pageSize - 1) / pageSize).toInt
    val (fp, ps) = (fetchPage, pageSize)
    val tailed = knownTotal.isDefined // hint may undercount: tail-probe
    val rdd = spark.sparkContext.parallelize(0 until nPages, nPages)
      .flatMap { p =>
        if (p < nPages - 1 || !tailed) fp(p.toLong * ps, ps)
        else {
          // tail partition: page until a short page, not until the hint
          val buf = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
          var off = p.toLong * ps
          var n = ps
          while (n == ps) {
            val page = fp(off, ps)
            buf ++= page
            n = page.size
            off += ps
          }
          buf
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}

object Sources {
  /** Table-loader function for [[graft.api.Graft]] over mixed formats. */
  def registry(specs: Map[String, SourceSpec])(implicit spark: SparkSession)
  : String => DataFrame =
    name => specs.getOrElse(name,
      throw new IllegalArgumentException(s"unregistered table '$name'")).load(spark)
}
