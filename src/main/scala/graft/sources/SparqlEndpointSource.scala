package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for a SPARQL-endpoint-backed concept table —
  * the scan side of the reference's triple-store wrapper
  * (`/root/reference/ontario/wrappers/triplestore/__init__.py`), built the
  * Spark-native way: instead of fetching the whole concept and filtering
  * in the engine, the scan participates in Catalyst planning, so
  *
  *  - **column pruning** drops unused predicates from the remote query
  *    (one OPTIONAL clause per surviving column — a 2-column projection
  *    of an 8-predicate concept ships 2 vars over the wire, matching the
  *    reference's per-star instantiation, which also only asks for the
  *    star's own predicates: `sparqltosql.py` builds the wrapper query
  *    from the star, never the whole molecule);
  *  - **filter pushdown** translates Catalyst predicates into SPARQL
  *    `FILTER` clauses evaluated by the endpoint, so selective queries
  *    transfer matching rows only. Translated filters are ALSO re-checked
  *    by Spark after the scan (they are reported back as residuals):
  *    pushdown is a transfer optimization, never a correctness bet on a
  *    remote engine's filter semantics.
  *
  * Paging follows the probed-cardinality plan of [[PagedEndpointSource]]:
  * `cardinality` sizes the page plan, each page is an independent
  * LIMIT/OFFSET query pulled executor-side (nothing transits the driver),
  * the tail partition pages until a short page proves exhaustion. When
  * filters are pushed the cardinality hint no longer bounds the result, so
  * the plan is sized by one remote `COUNT(*)` over the exact filtered
  * solution set instead. Usage (what [[graft.mapping.EndpointCatalogGen]]
  * binds for every probed concept):
  *
  * {{{
  * spark.read.format("graft.sources.SparqlEndpointSource")
  *   .schema(schema)                      // "s" + one field per predicate
  *   .option("endpoint", url)
  *   .option("type", conceptIri)
  *   .option("cols", SparqlEndpointSource.encodeCols(predCols))
  *   .option("pageSize", "10000")
  *   .option("cardinality", probedCard.toString)
  *   .load()
  * }}}
  */
class SparqlEndpointSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "SparqlEndpointSource needs an explicit schema (the probed one) — " +
        "pass it with spark.read.schema(...)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SparqlEndpointTable(schema,
      new CaseInsensitiveStringMap(properties))
}

object SparqlEndpointSource {
  /** (predicate IRI, column) pairs → one option string. IRIs cannot
    * contain whitespace, so space/newline separators are unambiguous. */
  def encodeCols(cols: Seq[(String, String)]): String =
    cols.map { case (p, c) => s"$p $c" }.mkString("\n")

  def decodeCols(s: String): List[(String, String)] =
    if (s.isEmpty) Nil
    else s.split('\n').toList.map { line =>
      val i = line.indexOf(' ')
      (line.substring(0, i), line.substring(i + 1))
    }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Render one side of a comparison: string columns compare by lexical
    * form (`STR(?c)` — IRl subjects and plain literals alike), numerics
    * and booleans natively. */
  private def ref(c: String, types: Map[String, DataType]): Option[String] =
    types.get(c).collect {
      case StringType => s"STR(?$c)"
      case LongType | IntegerType | DoubleType | FloatType | BooleanType =>
        s"?$c"
      // Date/Timestamp literals are not translated (typed-literal
      // comparison dialects vary) — those filters stay Spark-side only
    }

  private def lit(v: Any): Option[String] = v match {
    case s: String => Some(quote(s))
    case d: Double => Option.when(java.lang.Double.isFinite(d))(d.toString)
    case f: Float  => Option.when(java.lang.Float.isFinite(f))(f.toString)
    case _: Long | _: Int | _: Short | _: Byte => Some(v.toString)
    case b: Boolean => Some(b.toString)
    case _ => None
  }

  /** Catalyst [[Filter]] → SPARQL FILTER body, None when untranslatable.
    * Unbound-variable semantics line up by construction: a SPARQL
    * comparison on an unbound var is an error, errors are falsy in EBV and
    * propagate through `&&`/`||` exactly as SQL three-valued NULL logic
    * does through AND/OR, so the endpoint never drops a row Spark would
    * keep. `IsNotNull`/`IsNull` map to `BOUND`. */
  private[graft] def toSparql(f: Filter,
                                types: Map[String, DataType]): Option[String] = {
    def cmp(c: String, v: Any, op: String): Option[String] =
      for { r <- ref(c, types); l <- lit(v) } yield s"$r $op $l"
    f match {
      case EqualTo(c, v)            => cmp(c, v, "=")
      case GreaterThan(c, v)        => cmp(c, v, ">")
      case GreaterThanOrEqual(c, v) => cmp(c, v, ">=")
      case LessThan(c, v)           => cmp(c, v, "<")
      case LessThanOrEqual(c, v)    => cmp(c, v, "<=")
      case In(c, vs) if vs.nonEmpty =>
        val ls = vs.toList.map(lit)
        if (ls.forall(_.isDefined))
          ref(c, types).map(r => s"$r IN (${ls.map(_.get).mkString(", ")})")
        else None
      case IsNotNull(c) if types.contains(c) => Some(s"BOUND(?$c)")
      case IsNull(c) if types.contains(c)    => Some(s"!BOUND(?$c)")
      case StringContains(c, v) if types.get(c).contains(StringType) =>
        Some(s"CONTAINS(STR(?$c), ${quote(v)})")
      case StringStartsWith(c, v) if types.get(c).contains(StringType) =>
        Some(s"STRSTARTS(STR(?$c), ${quote(v)})")
      case StringEndsWith(c, v) if types.get(c).contains(StringType) =>
        Some(s"STRENDS(STR(?$c), ${quote(v)})")
      case And(l, r) =>
        for { a <- toSparql(l, types); b <- toSparql(r, types) }
          yield s"($a && $b)"
      case Or(l, r) =>
        for { a <- toSparql(l, types); b <- toSparql(r, types) }
          yield s"($a || $b)"
      case Not(inner) => toSparql(inner, types).map(s => s"!($s)")
      case _ => None
    }
  }

  /** The remote query for a pruned/filtered scan: subject pattern + one
    * OPTIONAL per surviving predicate column + translated FILTERs, totally
    * ordered over the projected vars for stable LIMIT/OFFSET paging
    * (duplicate solutions are interchangeable across a page boundary, so
    * ordering by every projected var suffices). A column referenced only
    * by a pushed filter keeps its pattern clause (a FILTER over a var with
    * no pattern would error every row) without joining the projection. */
  private[graft] def buildQuery(tpe: String, cols: List[(String, String)],
                                  required: Seq[String],
                                  filters: Seq[String],
                                  filterCols: Set[String] = Set.empty): String = {
    val vars = if (required.isEmpty) Seq("s") else required
    val kept = cols.filter { case (_, c) =>
      required.contains(c) || filterCols.contains(c)
    }
    // injection guard: tpe/preds are catalog-probed IRIs — data from the
    // endpoint spliced back into query text; a crafted 'IRI' carrying
    // '>' or whitespace must fail loudly, never reach the wire
    s"SELECT ${vars.map("?" + _).mkString(" ")} WHERE { ?s a " +
      s"${SparqlHttp.angled(tpe)} . " +
      kept.map { case (p, c) =>
        s"OPTIONAL { ?s ${SparqlHttp.angled(p)} ?$c } " }.mkString +
      filters.map(f => s"FILTER ($f) ").mkString +
      s"} ORDER BY ${vars.map("?" + _).mkString(" ")}"
  }
}

private[sources] class SparqlEndpointTable(
    tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  private val endpoint = options.get("endpoint")
  private val tpe = options.get("type")

  override def name(): String = s"sparql:$tpe@$endpoint"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new SparqlScanBuilder(tableSchema, endpoint, tpe,
      SparqlEndpointSource.decodeCols(options.get("cols")),
      Option(options.get("pageSize")).map(_.toInt).getOrElse(10000),
      Option(options.get("cardinality")).map(_.toLong),
      Option(options.get("maxPartitions")).map(_.toInt).getOrElse(32))
}

private[sources] class SparqlScanBuilder(
    fullSchema: StructType, endpoint: String, tpe: String,
    cols: List[(String, String)], pageSize: Int, cardinality: Option[Long],
    maxPartitions: Int)
  extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private val types: Map[String, DataType] =
    fullSchema.fields.map(f => f.name -> f.dataType).toMap

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var sparqlFilters: Seq[String] = Nil
  private var filterCols: Set[String] = Set.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val translated = filters.map(f =>
      f -> SparqlEndpointSource.toSparql(f, types))
    pushed = translated.collect { case (f, Some(_)) => f }
    sparqlFilters = translated.collect { case (_, Some(s)) => s }.toSeq
    filterCols = pushed.flatMap(_.references).toSet
    // every filter is re-evaluated by Spark post-scan: pushdown reduces
    // transfer, the engine keeps authority over the semantics
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SparqlScan(endpoint, tpe, cols, required, sparqlFilters, filterCols,
      pageSize, cardinality, maxPartitions, types)
}

private[sources] class SparqlScan(
    endpoint: String, tpe: String, cols: List[(String, String)],
    required: StructType, filters: Seq[String], filterCols: Set[String],
    pageSize: Int, cardinality: Option[Long],
    maxPartitions: Int = 32,
    types: Map[String, DataType] = Map.empty)
  extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with Serializable {

  /** Bound-join cap: a runtime IN wider than this stops reducing transfer
    * and starts bloating the remote query — beyond it, keep the full scan
    * (the shuffled join is the right plan, as the reference's
    * NestedHashJoinFilter maxKeys guard also concludes). Shared with the
    * route model so the cost estimate and the runtime never disagree
    * about when a bound join applies. */
  private val MaxBoundKeys = graft.compiler.RoutePlanner.BindKeyCap

  // Runtime bound join (FedX §5.3; the reference's NestedHashJoinFilter
  // ships disjunctive key filters to its wrappers): Spark's dynamic
  // pruning hands the BUILD side's join-key values to the scan at runtime
  // as In()/EqualTo() — translated, they become a remote FILTER, so only
  // matching rows ever transit the wire. Advisory by contract: the join
  // above re-checks, an untranslatable filter just keeps the full scan.
  @volatile private var runtimeFilters: Seq[String] = Nil
  @volatile private var runtimeFilterCols: Set[String] = Set.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fieldNames.map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(fs: Array[Filter]): Unit = {
    val ok = fs.toSeq.filter {
      case In(_, vs) => vs.length <= MaxBoundKeys
      case _         => true
    }
    val translated = ok.map(f => f -> SparqlEndpointSource.toSparql(f, types))
    runtimeFilters = translated.flatMap(_._2)
    runtimeFilterCols = translated.collect { case (f, Some(_)) => f }
      .flatMap(_.references).toSet
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val f = if (filters.isEmpty) "" else s", pushed: [${filters.mkString(" && ")}]"
    s"sparql:$tpe@$endpoint cols=[${required.fieldNames.mkString(",")}]$f"
  }

  private def allFilters: Seq[String] = filters ++ runtimeFilters

  private def baseQuery: String = SparqlEndpointSource.buildQuery(
    tpe, cols, required.fieldNames.toSeq, allFilters,
    filterCols ++ runtimeFilterCols)

  // one sizing COUNT per Scan INSTANCE, not per physical-plan copy (AQE
  // re-instantiates BatchScanExec around the same Scan and asks again);
  // keyed by the runtime-filter state — SupportsRuntimeFiltering.filter
  // arrives AFTER planning copies may already have sized the unfiltered
  // scan
  @volatile private var cachedPartitions: Array[InputPartition] = null
  @volatile private var cachedFor: Seq[String] = null

  override def planInputPartitions(): Array[InputPartition] = synchronized {
    if (cachedPartitions == null || cachedFor != allFilters) {
      cachedPartitions = computePartitions()
      cachedFor = allFilters
    }
    cachedPartitions
  }

  private def computePartitions(): Array[InputPartition] = {
    // unfiltered scans ride the probed cardinality (zero planning
    // queries; the hint may undercount solution rows under multi-valued
    // predicates, which the tail partition's keep-paging covers). A
    // pushed filter invalidates the hint, so the plan is sized by one
    // exact COUNT over the same solution set instead.
    val total: Long =
      if (allFilters.isEmpty && cardinality.isDefined) cardinality.get
      else {
        val cSchema = StructType(Seq(StructField("count", LongType)))
        val kept = cols.filter { case (_, c) =>
          required.fieldNames.contains(c) || filterCols.contains(c) ||
            runtimeFilterCols.contains(c) }
        val countQ = "SELECT (COUNT(*) AS ?count) WHERE { ?s a " +
          s"${SparqlHttp.angled(tpe)} . " +
          kept.map { case (p, c) =>
            s"OPTIONAL { ?s ${SparqlHttp.angled(p)} ?$c } " }.mkString +
          allFilters.map(f => s"FILTER ($f) ").mkString + "}"
        SparqlHttp.select(endpoint, countQ, cSchema)
          .headOption.map(_.getLong(0)).getOrElse(0L)
      }
    // pages group into at most maxPartitions contiguous ranges, each
    // walked sequentially ([[SparqlPageRange]]): the cap bounds how many
    // concurrent requests one scan holds against the endpoint — the tail
    // range stays open-ended, so a hint undercount (multi-valued
    // predicates) still pages until a short page proves exhaustion
    val nPages = math.max(1L, (total + pageSize - 1) / pageSize)
    val nParts = math.min(nPages, math.max(1, maxPartitions)).toInt
    val pagesPer = (nPages + nParts - 1) / nParts
    (0 until nParts).map { i =>
      val start = i * pagesPer * pageSize
      val end = if (i == nParts - 1) -1L else (i + 1) * pagesPer * pageSize
      SparqlPageRange(start, end): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // query text resolves at READER creation: the factory may be built
    // before SupportsRuntimeFiltering.filter() delivers the bound-join
    // keys, and task serialization captures this scan's state afterwards
    new PageRangeReaderFactory(endpoint, () => baseQuery, required, pageSize)
}
