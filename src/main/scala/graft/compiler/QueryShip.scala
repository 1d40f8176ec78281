package graft.compiler

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

import graft.algebra._

/** Whole-query dispatch to a single SPARQL endpoint — the query-granularity
  * "exclusive group" of federated mediators (FedX §5.2; the reference ships
  * per-star wrapper queries to its triple-store sources,
  * `ontario/wrappers/triplestore/__init__.py:125-186` — when EVERY star of a
  * query lives on one endpoint, shipping the whole query is the same move
  * one level up). The win is transfer: a GROUP BY over a remote concept
  * ships group rows instead of instance rows; a multi-star join ships joined
  * results instead of each star's bindings; a property-path closure runs at
  * the store instead of driving a paged fixpoint over the wire.
  *
  * Correctness stance: shipping trusts the remote engine's SPARQL 1.1
  * semantics for the WHOLE query, so it is opt-in
  * ([[graft.mapping.EndpointCatalogGen.EndpointOptions.shipWholeQuery]]) —
  * the default path keeps the local compiler authoritative and pushes only
  * column pruning + translatable FILTERs into the scans
  * ([[graft.sources.SparqlEndpointSource]]).
  *
  * The result schema comes from the LOCAL compile of the same query (lazy —
  * schema only, no job), so shipped and local plans agree column-for-column;
  * [[schemaProxy]] strips property-path closures first because the local
  * closure compiler is an eager fixpoint while its output columns are
  * strings either way.
  */
object QueryShip {

  /** `maxPartitions` caps how many concurrent page-tasks one shipped scan
    * holds against the endpoint (politeness at scale; in a same-process
    * loopback federation it also keeps executor slots free for the
    * server's own jobs). `auto = true` makes dispatch a PER-QUERY
    * cost decision ([[RoutePlanner]]) instead of ship-everything. */
  final case class Config(endpoint: String, pageSize: Int = 10000,
                          maxPartitions: Int = 32, auto: Boolean = false)

  /** Exclusive-group dispatch knobs — endpoint-less because the target
    * comes from each group's own molecules (a federation ships different
    * groups to different endpoints). `auto = true` cost-gates each group
    * with [[RoutePlanner]]'s transfer model (the whole-query decision's
    * per-group twin): a group ships only when its joined-rows estimate
    * clearly beats the bind-join-aware per-concept transfer. */
  final case class GroupShip(pageSize: Int = 10000, maxPartitions: Int = 32,
                             auto: Boolean = false)

  /** Ship one exclusive star group — a CONNECTED set of BGP stars whose
    * every candidate molecule lives on `endpoint` — as a single remote
    * subquery (FedX §5.2 exclusive groups at star-group granularity; the
    * reference ships per-star wrapper queries, `ontario/wrappers/
    * triplestore/__init__.py:125-186` — grouping moves the joins BETWEEN
    * those stars to the endpoint too, so per-star bindings never transit).
    * `filters` are the enclosing FILTER conjuncts scoped to the group's
    * vars; the caller re-applies them locally after the scan. Paging rides
    * the total ORDER BY over every projected var. */
  def shipGroup(endpoint: String, triples: List[TriplePattern],
                filters: List[Expr], schema: StructType, cfg: GroupShip)
               (implicit spark: SparkSession): DataFrame =
    shipPattern(endpoint, Pattern.Bgp(triples), filters, schema, cfg)

  /** Ship any renderable pattern as a paged SELECT of `schema`'s vars —
    * the generic wire half of [[shipGroup]] and of shipped-CONSTRUCT
    * WHERE clauses ([[Compiler.compileConstructShipped]]). */
  def shipPattern(endpoint: String, p: Pattern, filters: List[Expr],
                  schema: StructType, cfg: GroupShip)
                 (implicit spark: SparkSession): DataFrame = {
    val vars = schema.fieldNames.toSeq
    val body = SparqlText.pattern(p) +
      filters.map(f => s" FILTER (${SparqlText.expr(f)})").mkString
    val sel = vars.map("?" + _).mkString(" ")
    loadPaged(schema, sel, body, sel,
      Config(endpoint, cfg.pageSize, cfg.maxPartitions))
  }

  /** Can `q` be shipped verbatim? SELECT/ASK only (CONSTRUCT/DESCRIBE
    * return graphs — a different response media type), every pattern node
    * serializable by [[SparqlText]], no SERVICE (its IRI routes elsewhere
    * by definition), and an ORDER BY either bounded by LIMIT (single-shot)
    * or keyed on projected vars only (re-imposable outside the paging
    * wrapper — SPARQL lets unbounded ORDER BY reference non-projected
    * vars, but a paging wrapper cannot see them). */
  def shippable(q: Query, cfg: Config): Boolean =
    (q.form == SelectForm || q.form == AskForm) &&
      patternOk(q.pattern) &&
      (q.form == AskForm || projectedVars(q).nonEmpty) &&
      orderOk(q, cfg)

  private def projectedVars(q: Query): Set[String] =
    if (q.projection.isEmpty) q.pattern.vars else q.projection.map(_.alias).toSet

  private def bounded(q: Query, cfg: Config): Boolean =
    q.limit.exists(_ + q.offset.getOrElse(0L) <= cfg.pageSize)

  private def orderKeysProjected(q: Query): Boolean =
    q.orderBy.forall(k => Expr.vars(k.expr).subsetOf(projectedVars(q)))

  private def orderOk(q: Query, cfg: Config): Boolean =
    q.orderBy.isEmpty || bounded(q, cfg) || orderKeysProjected(q)

  /** Pattern-level shippability (no SERVICE, SELECT-form subqueries
    * only) — also the gate for shipped-CONSTRUCT WHERE clauses. */
  def patternShippable(p: Pattern): Boolean = patternOk(p)

  private def patternOk(p: Pattern): Boolean = p match {
    case _: Pattern.Service        => false
    case Pattern.SubSelect(sq)     => sq.form == SelectForm && patternOk(sq.pattern)
    case Pattern.Join(l, r)        => patternOk(l) && patternOk(r)
    case Pattern.Union(l, r)       => patternOk(l) && patternOk(r)
    case Pattern.LeftJoin(l, r, _) => patternOk(l) && patternOk(r)
    case Pattern.Filter(_, p0)     => patternOk(p0)
    case Pattern.Minus(l, r)       => patternOk(l) && patternOk(r)
    case Pattern.Exists(l, r, _)   => patternOk(l) && patternOk(r)
    case Pattern.Extend(p0, _, _)  => patternOk(p0)
    case _: Pattern.Bgp            => true
    case _: Pattern.Values         => true
    case _: Pattern.Path           => true
  }

  /** `q` with property-path closures widened to their inner path: the
    * SCHEMA-equivalent query (path endpoints bind as strings regardless)
    * whose local compile is lazy — the closure compiler is an eager
    * semi-naive fixpoint the schema probe must not pay. */
  def schemaProxy(q: Query): Query = q.copy(pattern = proxyPat(q.pattern))

  private def proxyPat(p: Pattern): Pattern = p match {
    case Pattern.Path(s, ast, o)      => Pattern.Path(s, deClosure(ast), o)
    case Pattern.Join(l, r)           => Pattern.Join(proxyPat(l), proxyPat(r))
    case Pattern.Union(l, r)          => Pattern.Union(proxyPat(l), proxyPat(r))
    case Pattern.LeftJoin(l, r, c)    => Pattern.LeftJoin(proxyPat(l), proxyPat(r), c)
    case Pattern.Filter(e, p0)        => Pattern.Filter(e, proxyPat(p0))
    case Pattern.Minus(l, r)          => Pattern.Minus(proxyPat(l), proxyPat(r))
    case Pattern.Exists(l, r, pos)    => Pattern.Exists(proxyPat(l), proxyPat(r), pos)
    case Pattern.Extend(p0, v, e)     => Pattern.Extend(proxyPat(p0), v, e)
    case Pattern.SubSelect(sq)        => Pattern.SubSelect(schemaProxy(sq))
    case leaf                         => leaf
  }

  private def deClosure(a: PathAst): PathAst = a match {
    case PathAst.Closure(p, _) => deClosure(p)
    case PathAst.ZeroOrOne(p)  => deClosure(p)
    case PathAst.Seq2(l, r)    => PathAst.Seq2(deClosure(l), deClosure(r))
    case PathAst.Alt(l, r)     => PathAst.Alt(deClosure(l), deClosure(r))
    case PathAst.Inv(p)        => PathAst.Inv(deClosure(p))
    case leaf                  => leaf
  }

  private val askSchema = StructType(Seq(StructField("ask", BooleanType,
    nullable = false)))

  /** Ship `q` to the endpoint as one of three [[graft.sources
    * .SparqlQuerySource]] modes. `localSchema` is evaluated only for
    * SELECT (ASK's schema is fixed), and only once. */
  def ship(q: Query, cfg: Config, localSchema: => StructType)
          (implicit spark: SparkSession): DataFrame = {
    if (q.form == AskForm)
      return load(askSchema, "ask", SparqlText.query(q), None, cfg)
    val schema = localSchema
    // SELECT * renders with the explicit var list so the paging wrapper
    // can re-project / re-order it
    val explicit =
      if (q.projection.nonEmpty) q
      else q.copy(projection = schema.fieldNames.toList.map(n => ProjVar(Var(n))))
    if (bounded(q, cfg))
      // the query bounds its own result: one verbatim fetch, order kept
      return load(schema, "single", SparqlText.query(explicit), None, cfg)
    // unbounded: page a wrapper with a TOTAL order — the query's own keys
    // first (when projected, which orderOk guaranteed for this branch) so
    // the requested order survives, then every projected var as tiebreak
    // so LIMIT/OFFSET page boundaries are stable
    val inner0 =
      if (q.limit.isEmpty && q.offset.isEmpty) explicit.copy(orderBy = Nil)
      else explicit // its LIMIT/OFFSET need the inner ORDER BY
    val inner = SparqlText.query(inner0)
    val vars = schema.fieldNames.toSeq
    val keys = (if (orderKeysProjected(q)) q.orderBy.map(SparqlText.orderKey)
                else Nil) ++ vars.map("?" + _)
    val sel = vars.map("?" + _).mkString(" ")
    loadPaged(schema, sel, s"{ $inner }", keys.mkString(" "), cfg)
  }

  private def load(schema: StructType, mode: String, query: String,
                   countQuery: Option[String], cfg: Config)
                  (implicit spark: SparkSession): DataFrame =
    spark.read
      .format("graft.sources.SparqlQuerySource")
      .schema(schema)
      .option("endpoint", cfg.endpoint)
      .option("query", query)
      .option("mode", mode)
      .option("pageSize", cfg.pageSize.toString)
      .option("maxPartitions", cfg.maxPartitions.toString)
      .load()

  /** Paged dispatch ships as (sel, body, order) PARTS so the scan can
    * inject runtime bound-join filters into the pattern
    * ([[graft.sources.SparqlQuerySource]]). */
  private def loadPaged(schema: StructType, sel: String, body: String,
                        order: String, cfg: Config)
                       (implicit spark: SparkSession): DataFrame =
    spark.read
      .format("graft.sources.SparqlQuerySource")
      .schema(schema)
      .option("endpoint", cfg.endpoint)
      .option("sel", sel)
      .option("body", body)
      .option("order", order)
      .option("mode", "paged")
      .option("pageSize", cfg.pageSize.toString)
      .option("maxPartitions", cfg.maxPartitions.toString)
      .load()
}
