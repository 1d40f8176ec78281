package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** DataSource V2 scan for a COMPLETE query shipped to a SPARQL endpoint —
  * the execution side of [[graft.compiler.QueryShip]] (single-endpoint
  * whole-query dispatch, the query-granularity form of the reference's
  * per-star wrapper queries, `ontario/wrappers/triplestore/__init__.py:
  * 125-186`). Three modes, all lazy (no HTTP until an action) and all
  * executor-side (result rows never transit the driver):
  *
  *  - `paged`: `query` must end in a total ORDER BY; the page plan is sized
  *    by ONE remote execution of `countQuery` (exact — unlike a concept
  *    scan there is no probed-cardinality hint for an arbitrary query).
  *    Pages are grouped into at most `maxPartitions` contiguous RANGES,
  *    each partition walking its range sequentially and the last keeping
  *    on until a short page proves exhaustion (snapshot-drift guard,
  *    `triplestore/__init__.py:52-119` parity). The cap bounds how many
  *    concurrent requests one scan can hold against the endpoint — at
  *    cluster scale a thousand page-tasks hammering one SPARQL server is
  *    a denial of service, not parallelism (and in a same-process
  *    loopback federation it would starve the server of executor slots).
  *  - `single`: the query carries its own LIMIT — one verbatim fetch in one
  *    partition, preserving the query's requested order.
  *  - `ask`: one W3C boolean-document fetch → a 1-row boolean frame.
  */
class SparqlQuerySource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "SparqlQuerySource needs an explicit schema (the locally-compiled " +
        "one) — pass it with spark.read.schema(...)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SparqlQueryTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] class SparqlQueryTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String =
    s"sparql-query@${options.get("endpoint")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new SparqlQueryScan(
      options.get("endpoint"),
      options.get("query"),
      Option(options.get("countQuery")),
      options.get("mode"),
      tableSchema,
      Option(options.get("pageSize")).map(_.toInt).getOrElse(10000),
      Option(options.get("maxPartitions")).map(_.toInt).getOrElse(32))
}

/** One contiguous page range: offsets `[startOffset, endOffset)` in steps
  * of the page size; `endOffset < 0` ⇒ open-ended (the tail range, paging
  * until a short page). */
private[sources] final case class SparqlPageRange(
    startOffset: Long, endOffset: Long) extends InputPartition

private[sources] class SparqlQueryScan(
    endpoint: String, query: String, countQuery: Option[String],
    mode: String, schema: StructType, pageSize: Int, maxPartitions: Int)
  extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"sparql-query@$endpoint mode=$mode [${query.take(500)}]"

  // one sizing COUNT per Scan INSTANCE, not per physical-plan copy — AQE
  // re-instantiates BatchScanExec around the same Scan, and each copy asks
  // for the partition plan again
  private lazy val partitions: Array[InputPartition] = mode match {
    case "single" | "ask" =>
      Array(SparqlPageRange(0L, -1L))
    case "paged" =>
      val cSchema = StructType(Seq(StructField("count", LongType)))
      val total = SparqlHttp.select(endpoint, countQuery.getOrElse(
          throw new IllegalArgumentException("paged mode needs countQuery")),
          cSchema)
        .headOption.map(_.getLong(0)).getOrElse(0L)
      val nPages = math.max(1L, (total + pageSize - 1) / pageSize)
      val nParts = math.min(nPages, math.max(1, maxPartitions)).toInt
      val pagesPer = (nPages + nParts - 1) / nParts
      (0 until nParts).map { i =>
        val start = i * pagesPer * pageSize
        val end = if (i == nParts - 1) -1L // tail: page until short page
                  else (i + 1) * pagesPer * pageSize
        SparqlPageRange(start, end): InputPartition
      }.toArray
    case other =>
      throw new IllegalArgumentException(s"unknown ship mode: $other")
  }

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def createReaderFactory(): PartitionReaderFactory = mode match {
    case "paged" => new PageRangeReaderFactory(endpoint, query, schema, pageSize)
    case _       => new OneShotReaderFactory(endpoint, query, schema, mode == "ask")
  }
}

/** Walks one page range sequentially; an open-ended range stops at the
  * first short page. */
private[sources] class PageRangeReaderFactory(
    endpoint: String, queryThunk: () => String, schema: StructType,
    pageSize: Int)
  extends PartitionReaderFactory {

  def this(endpoint: String, query: String, schema: StructType,
           pageSize: Int) = this(endpoint, () => query, schema, pageSize)

  // resolved ONCE at factory construction ON THE DRIVER would be too
  // early: SupportsRuntimeFiltering.filter() may arrive after the factory
  // exists, so the query text resolves at reader creation (executor side,
  // after the runtime-filtered partition plan shipped)
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SparqlPageRange]
    val query = queryThunk()
    new PartitionReader[InternalRow] {
      private val toInternal =
        ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
      private var off = p.startOffset
      private var page: Iterator[Row] = Iterator.empty
      private var lastSize = pageSize
      private var started = false

      private def inRange: Boolean = p.endOffset < 0 || off < p.endOffset

      private def fetch(): Unit = {
        val rows = SparqlHttp.select(endpoint,
          s"$query LIMIT $pageSize OFFSET $off", schema)
        lastSize = rows.size
        off += pageSize
        page = rows.iterator
      }

      override def next(): Boolean = {
        if (!started) { fetch(); started = true }
        while (!page.hasNext && lastSize == pageSize && inRange) fetch()
        page.hasNext
      }

      override def get(): InternalRow = toInternal(page.next()).copy()
      override def close(): Unit = ()
    }
  }
}

/** Fetches the query verbatim, once, on the (single) executor task. */
private[sources] class OneShotReaderFactory(
    endpoint: String, query: String, schema: StructType, ask: Boolean)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val toInternal =
        ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
      private lazy val rows: Iterator[Row] =
        if (ask) Iterator(Row(SparqlHttp.ask(endpoint, query)))
        else SparqlHttp.select(endpoint, query, schema).iterator
      override def next(): Boolean = rows.hasNext
      override def get(): InternalRow = toInternal(rows.next()).copy()
      override def close(): Unit = ()
    }
}
