package graft.algebra

/** SPARQL algebra ADT.
  *
  * Mirrors the reference's parsed `Query` structure
  * (`/root/reference/ontario/sparql/parser/services.py:7-24` — Query(prefs,
  * args, body, distinct, order_by, limit, offset, qtype) with body a nested
  * UnionBlock/JoinBlock of Triple|Filter|Optional) re-expressed as an
  * immutable Scala ADT. Extends the reference's grammar with SPARQL 1.1
  * aggregates (GROUP BY / HAVING / aggregate projections), which the
  * reference omits entirely (SURVEY.md §2.7).
  */
sealed trait Term
final case class Var(name: String) extends Term
final case class Iri(value: String) extends Term
/** Literal with optional datatype IRI and language tag.
  * Bare numerals are tagged xsd:integer / xsd:decimal / xsd:double by the
  * parser, as in SPARQL 1.1 §4.1.2. */
final case class Lit(lex: String, datatype: Option[String] = None,
                     lang: Option[String] = None) extends Term

object Terms {
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val XsdInt = "http://www.w3.org/2001/XMLSchema#integer"
  val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"
  val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"
  val XsdDateTime = "http://www.w3.org/2001/XMLSchema#dateTime"
  val XsdString = "http://www.w3.org/2001/XMLSchema#string"

  /** N-Triples literal escaping for compile-time constant lexical forms. */
  def escapeNt(lex: String): String =
    lex.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
}

final case class TriplePattern(s: Term, p: Term, o: Term) {
  def vars: Set[String] = Set(s, p, o).collect { case Var(n) => n }
}

/** FILTER / expression tree. Builtin call names are lower-cased. */
sealed trait Expr
object Expr {
  final case class TermRef(t: Term) extends Expr
  final case class Cmp(op: String, l: Expr, r: Expr) extends Expr
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Call(name: String, args: List[Expr]) extends Expr

  def vars(e: Expr): Set[String] = e match {
    case TermRef(Var(n)) => Set(n)
    case TermRef(_)      => Set.empty
    case Cmp(_, l, r)    => vars(l) ++ vars(r)
    case Arith(_, l, r)  => vars(l) ++ vars(r)
    case And(l, r)       => vars(l) ++ vars(r)
    case Or(l, r)        => vars(l) ++ vars(r)
    case Not(x)          => vars(x)
    case Call(_, args)   => args.flatMap(vars).toSet
  }
}

/** SPARQL 1.1 property-path expression tree. Pure sequences/inverses are
  * desugared to fresh-variable triple chains at parse time; expressions
  * containing alternation or closure survive as a [[Pattern.Path]] node for
  * the compiler's iterative expansion. */
sealed trait PathAst
object PathAst {
  final case class Link(p: Iri) extends PathAst
  final case class Seq2(l: PathAst, r: PathAst) extends PathAst
  final case class Alt(l: PathAst, r: PathAst) extends PathAst
  final case class Inv(p: PathAst) extends PathAst
  /** `+` (includeZero=false) / `*` (includeZero=true). */
  final case class Closure(p: PathAst, includeZero: Boolean) extends PathAst
  /** `?` — zero-or-one step. */
  final case class ZeroOrOne(p: PathAst) extends PathAst
  /** Negated property set `!(p1|^p2|…)`: any forward edge whose predicate
    * is not in `fwd`, plus any inverted edge whose predicate is not in
    * `inv`; either side participates only when the query listed members of
    * that direction (W3C §9.1 NPS semantics). */
  final case class Nps(fwd: List[String], inv: List[String]) extends PathAst

  /** Flatten to directed (iri, inverted) steps when the path is a pure
    * sequence/inverse tree — the desugar-to-triples fast path. */
  def toSteps(ast: PathAst): Option[List[(Iri, Boolean)]] = ast match {
    case Link(p)    => Some(List((p, false)))
    case Inv(x)     => toSteps(x).map(_.reverse.map { case (p, inv) => (p, !inv) })
    case Seq2(l, r) => for (a <- toSteps(l); b <- toSteps(r)) yield a ::: b
    case _          => None
  }
}

/** Graph patterns — the reference nests UnionBlock[JoinBlock[...]]
  * (`services.py`), here a plain binary algebra. */
sealed trait Pattern {
  def vars: Set[String] = this match {
    case Pattern.Bgp(ts)            => ts.flatMap(_.vars).toSet
    case Pattern.Join(l, r)         => l.vars ++ r.vars
    case Pattern.Union(l, r)        => l.vars ++ r.vars
    case Pattern.LeftJoin(l, r, _)  => l.vars ++ r.vars
    case Pattern.Filter(_, p)       => p.vars
    case Pattern.Minus(l, _)        => l.vars
    case Pattern.Exists(l, _, _)    => l.vars
    case Pattern.Values(vs, _)      => vs.map(_.name).toSet
    case Pattern.Extend(p, v, _)    => p.vars + v.name
    case Pattern.Path(s, _, o)      => Set(s, o).collect { case Var(n) => n }
    case Pattern.SubSelect(q)       =>
      if (q.projection.isEmpty) q.pattern.vars else q.projection.map(_.alias).toSet
    case Pattern.Service(_, p, _)   => p.vars
  }
}
object Pattern {
  final case class Bgp(triples: List[TriplePattern]) extends Pattern
  final case class Join(l: Pattern, r: Pattern) extends Pattern
  final case class Union(l: Pattern, r: Pattern) extends Pattern
  final case class LeftJoin(l: Pattern, r: Pattern, cond: Option[Expr]) extends Pattern
  final case class Filter(expr: Expr, p: Pattern) extends Pattern
  /** SPARQL 1.1 MINUS (extension — the reference grammar has no MINUS
    * token, SURVEY.md §2.5). */
  final case class Minus(l: Pattern, r: Pattern) extends Pattern
  /** FILTER EXISTS / FILTER NOT EXISTS (SPARQL 1.1 extension). */
  final case class Exists(l: Pattern, r: Pattern, positive: Boolean) extends Pattern
  /** VALUES inline data (SPARQL 1.1 extension); None = UNDEF. */
  final case class Values(vs: List[Var], rows: List[List[Option[Term]]]) extends Pattern
  /** BIND(expr AS ?v) (SPARQL 1.1 extension). */
  final case class Extend(p: Pattern, v: Var, expr: Expr) extends Pattern {
    override def toString: String = s"Extend($p, $v)"
  }
  /** Property path with alternation/closure (SPARQL 1.1 extension —
    * sequences and inverses desugar to triples before reaching here). */
  final case class Path(s: Term, path: PathAst, o: Term) extends Pattern
  /** `{ SELECT … }` subquery nested in a group pattern (SPARQL 1.1
    * extension); joins with its siblings on the projected variables. */
  final case class SubSelect(q: Query) extends Pattern
  /** SPARQL 1.1 `SERVICE [SILENT] <iri> { … }` — the inner pattern is
    * evaluated against only the molecules of the named source (the explicit
    * form of the source selection the reference performs transparently).
    * SILENT turns any failure into the unit solution. */
  final case class Service(iri: String, p: Pattern, silent: Boolean) extends Pattern
}

sealed trait QueryForm
case object SelectForm extends QueryForm
case object AskForm extends QueryForm
case object ConstructForm extends QueryForm
/** DESCRIBE (SPARQL extension over the reference grammar): emit all triples
  * about a resource / each binding of a variable, N-Triples-formatted. */
case object DescribeForm extends QueryForm

/** SELECT-clause item: a bare var, or an (expression AS ?alias), where the
  * expression may be an aggregate (SPARQL 1.1 extension over the reference). */
sealed trait ProjItem { def alias: String }
final case class ProjVar(v: Var) extends ProjItem { def alias: String = v.name }
final case class ProjAgg(func: String, arg: Option[Expr], distinct: Boolean,
                         as: Var, separator: String = " ") extends ProjItem {
  def alias: String = as.name
}
final case class ProjExpr(expr: Expr, as: Var) extends ProjItem {
  def alias: String = as.name
}

final case class OrderKey(expr: Expr, asc: Boolean)

final case class Query(
    form: QueryForm,
    projection: List[ProjItem],       // empty ⇒ SELECT *
    distinct: Boolean,
    pattern: Pattern,
    groupBy: List[Var] = Nil,
    having: Option[Expr] = None,
    template: List[TriplePattern] = Nil, // CONSTRUCT template
    orderBy: List[OrderKey] = Nil,
    limit: Option[Long] = None,
    offset: Option[Long] = None) {
  def hasAggregates: Boolean =
    groupBy.nonEmpty || projection.exists {
      case _: ProjAgg      => true
      // SELECT (SUM(?x)+1 AS ?y) with no GROUP BY: §18.2.4.3 implicit
      // grouping — an agg call nested in a projection expression
      case ProjExpr(e, _)  => Query.containsAgg(e)
      case _               => false
    }
}

object Query {
  def containsAgg(e: Expr): Boolean = e match {
    case Expr.Call(n, args) =>
      n.startsWith("agg:") || n.startsWith("aggd:") || args.exists(containsAgg)
    case Expr.Cmp(_, l, r)   => containsAgg(l) || containsAgg(r)
    case Expr.Arith(_, l, r) => containsAgg(l) || containsAgg(r)
    case Expr.And(l, r)      => containsAgg(l) || containsAgg(r)
    case Expr.Or(l, r)       => containsAgg(l) || containsAgg(r)
    case Expr.Not(x)         => containsAgg(x)
    case _                   => false
  }
}
