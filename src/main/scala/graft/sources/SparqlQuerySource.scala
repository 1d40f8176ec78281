package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** DataSource V2 scan for a COMPLETE query shipped to a SPARQL endpoint —
  * the execution side of [[graft.compiler.QueryShip]] (single-endpoint
  * whole-query dispatch and exclusive-group dispatch, the coarse-grained
  * forms of the reference's per-star wrapper queries,
  * `ontario/wrappers/triplestore/__init__.py:125-186`). Three modes, all
  * lazy (no HTTP until an action) and all executor-side (result rows never
  * transit the driver):
  *
  *  - `paged`: the query ships as (sel, body, order) PARTS — assembled as
  *    `SELECT sel WHERE { body } ORDER BY order` — so runtime bound-join
  *    filters ([[SupportsRuntimeFiltering]], the FedX bound join) can
  *    inject into the pattern: when a selective broadcast build joins this
  *    scan, the build's join-key values arrive as a SPARQL IN and only
  *    matching rows transit. The page plan is sized by one remote COUNT
  *    over the same (filtered) body. Pages group into at most
  *    `maxPartitions` contiguous RANGES, each walked sequentially, the
  *    last open-ended until a short page proves exhaustion
  *    (`triplestore/__init__.py:52-119` parity) — the cap bounds the
  *    concurrent requests one scan holds against the endpoint.
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
      Option(options.get("query")),
      Option(options.get("sel")),
      Option(options.get("body")),
      Option(options.get("order")),
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
    endpoint: String, verbatim: Option[String],
    sel: Option[String], body: Option[String], order: Option[String],
    mode: String, schema: StructType, pageSize: Int, maxPartitions: Int)
  extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with Serializable {

  /** Bound-join cap, as on the concept scans: wider INs stop reducing
    * transfer — keep the full scan, the join above re-checks. Shared
    * with the route model (one source of truth). */
  private val MaxBoundKeys = graft.compiler.RoutePlanner.BindKeyCap

  private val types: Map[String, DataType] =
    schema.fields.map(f => f.name -> f.dataType).toMap

  @volatile private var runtimeFilters: Seq[String] = Nil

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (mode == "paged" && body.isDefined)
      schema.fieldNames.map(org.apache.spark.sql.connector.expressions.Expressions.column)
    else Array.empty

  override def filter(fs: Array[Filter]): Unit =
    if (mode == "paged" && body.isDefined)
      runtimeFilters = fs.toSeq.filter {
        case In(_, vs) => vs.length <= MaxBoundKeys
        case _         => true
      }.flatMap(f => SparqlEndpointSource.toSparql(f, types))

  private def filteredBody: String =
    body.getOrElse(throw new IllegalArgumentException(
      "paged mode needs sel/body/order parts")) +
      runtimeFilters.map(f => s" FILTER ($f)").mkString

  private def pagedQuery: String =
    s"SELECT ${sel.get} WHERE { $filteredBody } ORDER BY ${order.get}"

  private def countQuery: String =
    s"SELECT (COUNT(*) AS ?count) WHERE { $filteredBody }"

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = {
    val q = verbatim.getOrElse(s"SELECT ${sel.getOrElse("")} WHERE { ${body.getOrElse("")} }")
    s"sparql-query@$endpoint mode=$mode [${q.take(500)}]"
  }

  // one sizing COUNT per Scan INSTANCE and runtime-filter STATE — AQE
  // re-instantiates BatchScanExec around the same Scan (each copy asks
  // again), and the bound-join filter callback can arrive after a copy
  // already sized the unfiltered scan
  @volatile private var cachedPartitions: Array[InputPartition] = null
  @volatile private var cachedFor: Seq[String] = null

  override def planInputPartitions(): Array[InputPartition] = synchronized {
    if (cachedPartitions == null || cachedFor != runtimeFilters) {
      cachedPartitions = computePartitions()
      cachedFor = runtimeFilters
    }
    cachedPartitions
  }

  private def computePartitions(): Array[InputPartition] = mode match {
    case "single" | "ask" =>
      Array(SparqlPageRange(0L, -1L))
    case "paged" =>
      val cSchema = StructType(Seq(StructField("count", LongType)))
      val total = SparqlHttp.select(endpoint, countQuery, cSchema)
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

  override def createReaderFactory(): PartitionReaderFactory = mode match {
    // query text resolves at READER creation: bound-join keys may arrive
    // after the factory exists; task serialization captures post-filter
    // state
    case "paged" => new PageRangeReaderFactory(endpoint, () => pagedQuery,
      schema, pageSize)
    case _ => new OneShotReaderFactory(endpoint, verbatim.get, schema,
      mode == "ask")
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
