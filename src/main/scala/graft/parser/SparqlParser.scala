package graft.parser

import scala.util.parsing.combinator.RegexParsers
import graft.algebra._

/** Recursive-descent SPARQL parser (subset + SPARQL 1.1 aggregate extension).
  *
  * Covers the reference grammar's surface (PLY lex/yacc at
  * `/root/reference/ontario/sparql/parser/queryParser.py:96-213`):
  * SELECT/ASK/CONSTRUCT, DISTINCT, prefixed names, `a`, predicate-object
  * lists (`;` / `,`), UNION, OPTIONAL, FILTER with the builtin set of
  * `queryParser.py:10-43`, typed/lang literals, ORDER BY, LIMIT, OFFSET —
  * plus GROUP BY / HAVING / aggregates, which the reference parses no
  * grammar for (SURVEY.md §2.7).
  *
  * One instance per parse (the prefix map is populated while parsing the
  * prologue).
  */
class SparqlParser extends RegexParsers {
  override val whiteSpace = """(\s|#[^\n]*)+""".r

  private var prefixes = Map[String, String](
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "xsd" -> "http://www.w3.org/2001/XMLSchema#")

  private def kw(s: String): Parser[String] =
    ("""(?i)""" + java.util.regex.Pattern.quote(s) + """\b""").r ^^ (_ => s.toUpperCase)

  // ---- terms -------------------------------------------------------------
  def iriRef: Parser[String] = "<" ~> """[^<>\s{}|^`\\]*""".r <~ ">"
  def pnameNs: Parser[String] = """[A-Za-z][A-Za-z0-9_-]*""".r
  def pname: Parser[String] =
    """[A-Za-z][A-Za-z0-9_-]*:[A-Za-z0-9_.\-]*""".r ^? (Function.unlift { s =>
      val i = s.indexOf(':')
      prefixes.get(s.substring(0, i)).map(_ + s.substring(i + 1))
    }, s => s"unknown prefix in '$s'")
  def iri: Parser[Iri] = (iriRef | pname) ^^ Iri.apply

  def variable: Parser[Var] = """[?$]([A-Za-z_][A-Za-z0-9_]*)""".r ^^ (s => Var(s.tail))

  private def unescape(s: String): String =
    s.replace("\\\\", "\u0000").replace("\\\"", "\"").replace("\\'", "'")
      .replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r")
      .replace("\u0000", "\\")

  def stringLit: Parser[String] =
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ (s => unescape(s.substring(1, s.length - 1))) |
    ("'" + """([^'\\]|\\.)*""" + "'").r ^^ (s => unescape(s.substring(1, s.length - 1)))

  def rdfLiteral: Parser[Lit] =
    stringLit ~ opt("^^" ~> iri | "@" ~> """[A-Za-z]+(-[A-Za-z0-9]+)*""".r) ^^ {
      case s ~ Some(Iri(dt))    => Lit(s, datatype = Some(dt))
      case s ~ Some(lang: String) => Lit(s, lang = Some(lang))
      case s ~ _                => Lit(s)
    }

  def numericLit: Parser[Lit] =
    """[+-]?(\d+\.\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+)""".r ^^ (
      s => Lit(s, Some(if (s.exists(c => c == 'e' || c == 'E')) Terms.XsdDouble
                       else Terms.XsdDecimal))) |
    """[+-]?\d+""".r ^^ (s => Lit(s, Some(Terms.XsdInt)))

  def booleanLit: Parser[Lit] =
    (kw("true") | kw("false")) ^^ (s => Lit(s.toLowerCase, Some(Terms.XsdBoolean)))

  def literal: Parser[Lit] = numericLit | booleanLit | rdfLiteral

  def graphTerm: Parser[Term] = variable | iri | literal

  // ---- triples -----------------------------------------------------------
  def verb: Parser[Term] = """a\b""".r ^^ (_ => Iri(Terms.RdfType)) | variable | iri

  /** Property paths (SPARQL 1.1 extension over the reference): sequence
    * `p1/p2`, inverse `^p`, alternation `p1|p2`, closure `p+`/`p*`,
    * zero-or-one `p?`, negated property sets `!(p1|^p2|…)`, grouped `(…)`.
    * Pure sequence/inverse paths desugar to fresh-variable triple chains;
    * the rest survive as [[Pattern.Path]] nodes. */
  private var freshCounter = 0
  private def fresh(): Var = { freshCounter += 1; Var(s"__path_$freshCounter") }

  private def pathIri: Parser[Iri] =
    """a\b""".r ^^ (_ => Iri(Terms.RdfType)) | iri

  /** One member of a negated property set: `iri` or `^iri`. */
  private def npsMember: Parser[(Iri, Boolean)] =
    opt("^") ~ pathIri ^^ { case inv ~ i => (i, inv.isDefined) }

  private def pathPrimary: Parser[PathAst] =
    "(" ~> pathAlt <~ ")" |
    "^" ~> pathPrimary ^^ (PathAst.Inv(_)) |
    "!" ~> ("(" ~> rep1sep(npsMember, "|") <~ ")" | npsMember ^^ (List(_))) ^^ { ms =>
      PathAst.Nps(
        ms.collect { case (Iri(u), false) => u },
        ms.collect { case (Iri(u), true) => u })
    } |
    pathIri ^^ (PathAst.Link(_))

  /** `?` must not swallow the sigil of a following variable (`?s :p ?o`). */
  private val zeroOrOneTok = """\?(?![A-Za-z0-9_])""".r

  private def pathPostfix: Parser[PathAst] =
    pathPrimary ~ opt("+" | "*" | zeroOrOneTok) ^^ {
      case p ~ Some("+") => PathAst.Closure(p, includeZero = false)
      case p ~ Some("*") => PathAst.Closure(p, includeZero = true)
      case p ~ Some("?") => PathAst.ZeroOrOne(p)
      case p ~ _         => p
    }

  private def pathSeq: Parser[PathAst] =
    rep1sep(pathPostfix, "/") ^^ (_.reduceLeft(PathAst.Seq2.apply))

  private def pathAlt: Parser[PathAst] =
    rep1sep(pathSeq, "|") ^^ (_.reduceLeft(PathAst.Alt.apply))

  /** Predicate position: a variable (varpred probe) or a path. */
  private sealed trait Pred
  private case class VarPred(v: Var) extends Pred
  private case class PathPred(p: PathAst) extends Pred

  private def pred: Parser[Pred] =
    variable ^^ (VarPred(_)) | pathAlt ^^ (PathPred(_))

  /** Expand `s (step1/step2/…) o` into chained triples over fresh vars. */
  private def expandSteps(s: Term, steps: List[(Iri, Boolean)], o: Term): List[TriplePattern] = {
    val n = steps.size
    val nodes: List[Term] = s :: List.tabulate(n - 1)(_ => fresh()) ::: List(o)
    steps.lazyZip(nodes.init).lazyZip(nodes.tail).map {
      case ((p, false), a, b) => TriplePattern(a, p, b)
      case ((p, true), a, b)  => TriplePattern(b, p, a)
    }
  }

  // ---- blank nodes (W3C: non-selectable variables scoped to the query) ---
  private var bnodeCounter = 0
  // labels desugar under an 'l' marker, anonymous `[]` nodes under '0':
  // the two image sets are disjoint whatever the label, so the ASCII
  // portion of W3C's BLANK_NODE_LABEL first-char set (PN_CHARS_U |
  // digit — `_:0a`, `_:_x`; non-ASCII PN_CHARS letters stay out of
  // scope with the rest of the parser's ASCII name grammar) parses
  // without a fresh-node collision, and the label→variable map stays
  // injective (a bare prefix adds nothing a label could forge)
  private def freshBnode(): Var = { bnodeCounter += 1; Var(s"__bn_0$bnodeCounter") }
  private def bnodeLabel: Parser[Var] =
    """_:[A-Za-z0-9_][A-Za-z0-9_]*""".r ^^ (s => Var("__bn_l" + s.drop(2)))

  /** A subject/object node: a plain term, a labelled/anonymous blank node
    * (desugared to a hidden `__bn_*` variable), or a blank-node property
    * list `[ p o ; … ]` which stands for a fresh node and carries its
    * rooted auxiliary triples (returned functionally — no parser state to
    * go stale under backtracking; nests per the grammar). */
  private def node: Parser[(Term, List[(Term, Pred, Term)])] =
    "[" ~> "]" ^^ (_ => (freshBnode(): Term, Nil)) |
    "[" ~> propertyList <~ "]" ^^ { case (pairs, aux) =>
      val b = freshBnode()
      (b: Term, pairs.map { case (p, o) => (b: Term, p, o) } ++ aux)
    } |
    bnodeLabel ^^ (v => (v: Term, Nil)) |
    graphTerm ^^ ((_, Nil))

  private def expandRooted(rooted: List[(Term, Pred, Term)])
      : (List[TriplePattern], List[Pattern.Path]) = {
    val (triples, paths) = rooted.map {
      case (s, VarPred(v), o)  => Left(List(TriplePattern(s, v, o)))
      case (s, PathPred(p), o) => PathAst.toSteps(p) match {
        case Some(steps) => Left(expandSteps(s, steps, o))
        case None        => Right(Pattern.Path(s, p, o))
      }
    }.partitionMap(identity)
    (triples.flatten, paths)
  }

  def triplesSameSubject: Parser[(List[TriplePattern], List[Pattern.Path])] =
    node ~ opt(propertyList) ^? (Function.unlift {
      case (s, aux) ~ Some((pairs, aux2)) =>
        Some(expandRooted(pairs.map { case (p, o) => (s, p, o) } ++ aux ++ aux2))
      case (_, aux) ~ None if aux.nonEmpty =>
        Some(expandRooted(aux)) // bare `[ p o ]` triple
      case _ => None
    }, _ => "a bare term is not a triple")

  /** Predicate-object pairs plus the auxiliary triples their blank-node
    * property-list objects expand into. */
  private def propertyList: Parser[(List[(Pred, Term)], List[(Term, Pred, Term)])] =
    rep1sep(pred ~ rep1sep(node, ","), ";") ^^ { items =>
      (items.flatMap { case v ~ os => os.map(o => (v, o._1)) },
        items.flatMap { case _ ~ os => os.flatMap(_._2) })
    }

  /** Triples with closure-free paths only (CONSTRUCT template position). */
  def triplesTemplate: Parser[List[TriplePattern]] =
    triplesSameSubject ^? (Function.unlift {
      case (ts, Nil) => Some(ts)
      case _         => None
    }, _ => "alternation/closure paths are not allowed in a CONSTRUCT template")

  def triplesBlock: Parser[Pattern] =
    rep1sep(triplesSameSubject, ".") <~ opt(".") ^^ { parts =>
      val bgp = Pattern.Bgp(parts.flatMap(_._1))
      val paths = parts.flatMap(_._2)
      // paths join onto the BGP (shared-var equi-join in the compiler)
      paths.foldLeft(if (bgp.triples.isEmpty && paths.nonEmpty)
          paths.head: Pattern else bgp: Pattern) {
        case (acc, p) if acc eq p => acc
        case (acc, p)             => Pattern.Join(acc, p)
      }
    }

  // ---- group graph pattern ------------------------------------------------
  private sealed trait GgpItem
  private case class TriplesItem(bgp: Pattern.Bgp) extends GgpItem
  private case class OptionalItem(p: Pattern, cond: Option[Expr]) extends GgpItem
  private case class GroupItem(p: Pattern) extends GgpItem
  private case class FilterItem(e: Expr) extends GgpItem
  private case class MinusItem(p: Pattern) extends GgpItem
  private case class ExistsItem(p: Pattern, positive: Boolean) extends GgpItem
  private case class ValuesItem(p: Pattern.Values) extends GgpItem
  private case class BindItem(v: Var, e: Expr) extends GgpItem
  private case class SubqueryItem(q: Query) extends GgpItem

  private def groupItems: Parser[List[GgpItem]] = "{" ~> rep(ggpItem) <~ "}"

  def groupGraphPattern: Parser[Pattern] = groupItems ^^ combine

  private def ggpItem: Parser[GgpItem] =
    // W3C §18.2.2.6: FILTERs at the OPTIONAL group's own level become the
    // LeftJoin *condition* (they may reference outer vars; a failing
    // condition keeps the left row null-padded instead of dropping it).
    // Filters inside nested `{ }` groups scope to their group and stay put
    // — which is why the split happens here, on this level's items, not by
    // unwrapping the combined pattern (indistinguishable after combine).
    kw("OPTIONAL") ~> groupItems ^^ { items =>
      val fs = items.collect { case FilterItem(e) => e }
      OptionalItem(combine(items.filterNot(_.isInstanceOf[FilterItem])),
        fs.reduceOption(Expr.And.apply))
    } |
    kw("MINUS") ~> groupGraphPattern ^^ MinusItem.apply |
    kw("SERVICE") ~> opt(kw("SILENT")) ~ iri ~ groupGraphPattern ^^ {
      case s ~ Iri(u) ~ p => GroupItem(Pattern.Service(u, p, s.isDefined))
    } |
    kw("FILTER") ~> kw("NOT") ~> kw("EXISTS") ~> groupGraphPattern ^^ (ExistsItem(_, positive = false)) |
    kw("FILTER") ~> kw("EXISTS") ~> groupGraphPattern ^^ (ExistsItem(_, positive = true)) |
    kw("FILTER") ~> constraint ^^ FilterItem.apply |
    kw("BIND") ~> ("(" ~> expression ~ (kw("AS") ~> variable) <~ ")") ^^ {
      case e ~ v => BindItem(v, e)
    } |
    valuesClause ^^ ValuesItem.apply |
    // SPARQL 1.1 subquery — but not when it is the first branch of a UNION
    // (the guard lets unionGroup see the whole `{ SELECT … } UNION { … }`)
    ("{" ~> selectQuery <~ "}") <~ not(kw("UNION")) ^^ SubqueryItem.apply |
    unionGroup ^^ GroupItem.apply |
    triplesBlock <~ opt(".") ^^ {
      case b: Pattern.Bgp => TriplesItem(b)
      case p              => GroupItem(p) // block carrying closure paths
    }

  private def undefOr(p: Parser[Term]): Parser[Option[Term]] =
    kw("UNDEF") ^^ (_ => None) | p ^^ (Some(_))

  def valuesClause: Parser[Pattern.Values] =
    kw("VALUES") ~> (
      variable ~ ("{" ~> rep(undefOr(iri | literal)) <~ "}") ^^ {
        case v ~ vals => Pattern.Values(List(v), vals.map(List(_)))
      } |
      ("(" ~> rep1(variable) <~ ")") ~
        ("{" ~> rep("(" ~> rep1(undefOr(iri | literal)) <~ ")") <~ "}") ^^ {
        case vs ~ rows => Pattern.Values(vs, rows)
      })

  /** A UNION branch may itself be a subquery (SPARQL 1.1 allows
    * `{ SELECT … } UNION { … }`). */
  private def unionBranch: Parser[Pattern] =
    "{" ~> selectQuery <~ "}" ^^ (q => Pattern.SubSelect(q): Pattern) |
    groupGraphPattern

  private def unionGroup: Parser[Pattern] =
    rep1sep(unionBranch, kw("UNION")) ^^ (_.reduceLeft(Pattern.Union.apply))

  /** Sequential combination like the reference's JoinBlock: triples merge
    * into one BGP, OPTIONAL left-joins onto what precedes it, FILTERs apply
    * to the whole group (SPARQL semantics). */
  private def combine(items: List[GgpItem]): Pattern = {
    var acc: Option[Pattern] = None
    var filters = List.empty[Expr]
    items.foreach {
      case TriplesItem(bgp) =>
        acc = Some(acc match {
          case Some(Pattern.Bgp(ts)) => Pattern.Bgp(ts ++ bgp.triples)
          case Some(p)               => Pattern.Join(p, bgp)
          case None                  => bgp
        })
      case GroupItem(p) =>
        acc = Some(acc.fold(p)(l => Pattern.Join(l, p)))
      case ValuesItem(p) =>
        acc = Some(acc.fold(p: Pattern)(l => Pattern.Join(l, p)))
      case OptionalItem(p, cond) =>
        acc = Some(Pattern.LeftJoin(acc.getOrElse(Pattern.Bgp(Nil)), p, cond))
      case MinusItem(p) =>
        acc = Some(Pattern.Minus(acc.getOrElse(Pattern.Bgp(Nil)), p))
      case ExistsItem(p, pos) =>
        acc = Some(Pattern.Exists(acc.getOrElse(Pattern.Bgp(Nil)), p, pos))
      case BindItem(v, e) =>
        acc = Some(Pattern.Extend(acc.getOrElse(Pattern.Bgp(Nil)), v, e))
      case SubqueryItem(q) =>
        val p = Pattern.SubSelect(q)
        acc = Some(acc.fold(p: Pattern)(l => Pattern.Join(l, p)))
      case FilterItem(e) => filters ::= e
    }
    val base = acc.getOrElse(Pattern.Bgp(Nil))
    filters.foldLeft(base)((p, f) => Pattern.Filter(f, p))
  }

  // ---- expressions ---------------------------------------------------------
  def constraint: Parser[Expr] = "(" ~> expression <~ ")" | builtinCall

  def expression: Parser[Expr] = orExpr

  def orExpr: Parser[Expr] = rep1sep(andExpr, "||") ^^ (_.reduceLeft(Expr.Or.apply))
  def andExpr: Parser[Expr] = rep1sep(notExpr, "&&") ^^ (_.reduceLeft(Expr.And.apply))
  def notExpr: Parser[Expr] =
    "!" ~> notExpr ^^ Expr.Not.apply | relExpr

  private sealed trait RelTail
  private case class CmpTail(op: String, r: Expr) extends RelTail
  private case class InTail(items: List[Expr], negated: Boolean) extends RelTail

  def relExpr: Parser[Expr] =
    addExpr ~ opt(
      ("<=" | ">=" | "!=" | "=" | "<" | ">") ~ addExpr ^^ {
        case op ~ r => CmpTail(op, r): RelTail
      } |
      kw("NOT") ~> kw("IN") ~> ("(" ~> repsep(expression, ",") <~ ")") ^^ (
        InTail(_, negated = true): RelTail) |
      kw("IN") ~> ("(" ~> repsep(expression, ",") <~ ")") ^^ (
        InTail(_, negated = false): RelTail)
    ) ^^ {
      case l ~ Some(CmpTail(op, r))      => Expr.Cmp(op, l, r)
      case l ~ Some(InTail(items, neg)) =>
        val in = Expr.Call("in", l :: items)
        if (neg) Expr.Not(in) else in
      case l ~ None => l
    }

  def addExpr: Parser[Expr] =
    mulExpr ~ rep(("+" | "-") ~ mulExpr) ^^ { case h ~ t =>
      t.foldLeft(h) { case (l, op ~ r) => Expr.Arith(op, l, r) }
    }
  def mulExpr: Parser[Expr] =
    unaryExpr ~ rep(("*" | "/") ~ unaryExpr) ^^ { case h ~ t =>
      t.foldLeft(h) { case (l, op ~ r) => Expr.Arith(op, l, r) }
    }
  def unaryExpr: Parser[Expr] =
    "-" ~> primaryExpr ^^ (e => Expr.Arith("*", Expr.TermRef(Lit("-1", Some(Terms.XsdInt))), e)) |
    "+" ~> primaryExpr | primaryExpr

  private val builtinNames = List(
    "BOUND", "REGEX", "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC",
    "LANGMATCHES", "SAMETERM", "STRSTARTS", "STRENDS", "STRBEFORE",
    "STRAFTER", "STRDT", "STRLANG", "CONTAINS", "STRLEN", "UCASE", "LCASE",
    "CONCAT", "SUBSTR",
    "REPLACE", "ENCODE_FOR_URI", "MD5", "SHA1", "SHA256", "SHA384", "SHA512",
    "ABS", "ROUND", "CEIL", "FLOOR", "YEAR", "MONTH", "DAY", "HOURS",
    "MINUTES", "SECONDS", "TIMEZONE", "TZ", "STRUUID", "STR", "LANG",
    "DATATYPE", "COALESCE", "IF", "IRI", "URI", "NOW", "UUID", "BNODE",
    "RAND")

  def builtinCall: Parser[Expr] =
    builtinNames.map(n => kw(n) ~ ("(" ~> repsep(expression, ",") <~ ")") ^^ {
      case name ~ args => Expr.Call(name.toLowerCase, args): Expr
    }).reduceLeft(_ | _) |
    // xsd casts: xsd:integer(?x) etc., prefixed or as a full IRI call
    // (W3C `iriOrFunction` — the form SparqlText serializes, so a SERVICE
    // body with casts round-trips through any endpoint running this engine)
    ((pname | iriRef) <~ "(") ~ repsep(expression, ",") <~ ")" ^^ {
      case fn ~ args => Expr.Call(fn, args)
    }

  /** Aggregate call inside an expression (HAVING position): encoded as
    * Call("agg:<fn>", args) — "aggd:<fn>" for DISTINCT aggregates — and
    * rewritten to a hidden aggregate column by the compiler. */
  def aggExpr: Parser[Expr] =
    aggFunc ~ ("(" ~> opt(kw("DISTINCT"))) ~
      (("*" ^^ (_ => Nil) | expression ^^ (List(_))) <~ ")") ^^ {
      case fn ~ d ~ args =>
        Expr.Call(s"${if (d.isDefined) "aggd" else "agg"}:$fn", args)
    }

  def primaryExpr: Parser[Expr] =
    "(" ~> expression <~ ")" |
    aggExpr |
    builtinCall |
    (variable | literal) ^^ (t => Expr.TermRef(t): Expr) |
    iri ^^ (t => Expr.TermRef(t): Expr)

  // ---- query forms ---------------------------------------------------------
  def prologue: Parser[Unit] =
    rep(kw("PREFIX") ~> (pnameNs <~ ":") ~ iriRef ^^ { case ns ~ i =>
      prefixes += ns -> i
    }) ^^ (_ => ())

  def aggFunc: Parser[String] =
    (kw("COUNT") | kw("SUM") | kw("AVG") | kw("MIN") | kw("MAX") |
      kw("SAMPLE") | kw("GROUP_CONCAT")) ^^ (_.toLowerCase)

  def aggregate: Parser[Var => ProjAgg] =
    aggFunc ~ ("(" ~> opt(kw("DISTINCT"))) ~ ("*" ^^ (_ => None) | expression ^^ (Some(_))) ~
      (opt(";" ~> kw("SEPARATOR") ~> "=" ~> stringLit) <~ ")") ^^ {
      case f ~ d ~ arg ~ sep =>
        (v: Var) => ProjAgg(f, arg, d.isDefined, v, sep.getOrElse(" "))
    }

  def projItem: Parser[ProjItem] =
    variable ^^ (ProjVar(_): ProjItem) |
    "(" ~> aggregate ~ (kw("AS") ~> variable) <~ ")" ^^ { case mk ~ v => mk(v): ProjItem } |
    "(" ~> expression ~ (kw("AS") ~> variable) <~ ")" ^^ { case e ~ v => ProjExpr(e, v): ProjItem }

  /** W3C GroupCondition (§18.2.4.1): a bare variable, `(expr AS ?v)`,
    * a bare parenthesized `(expr)`, or a builtin/function call — the
    * expression forms desugar to Extend(pattern, v, expr) + grouping on
    * v, with a hidden `__grp_*` variable generated when no alias was
    * given (the spec's translation does the same with a fresh var). */
  private var grpCounter = 0
  private def groupCondition: Parser[Either[Var, (Expr, Var)]] =
    variable ^^ (Left(_): Either[Var, (Expr, Var)]) |
    "(" ~> expression ~ opt(kw("AS") ~> variable) <~ ")" ^^ {
      case e ~ Some(v) => Right((e, v)): Either[Var, (Expr, Var)]
      case e ~ None =>
        grpCounter += 1
        Right((e, Var(s"__grp_$grpCounter"))): Either[Var, (Expr, Var)]
    } |
    builtinCall ^^ { e =>
      grpCounter += 1
      Right((e, Var(s"__grp_$grpCounter"))): Either[Var, (Expr, Var)]
    }

  def selectQuery: Parser[Query] =
    kw("SELECT") ~> opt(kw("DISTINCT") | kw("REDUCED")) ~
      ("*" ^^ (_ => Nil) | rep1(projItem)) ~
      (opt(kw("WHERE")) ~> groupGraphPattern) ~
      opt(kw("GROUP") ~> kw("BY") ~> rep1(groupCondition)) ~
      opt(kw("HAVING") ~> constraint) ~
      opt(orderClause) ~ modifiers ^^ {
      case d ~ proj ~ pat ~ gb ~ hav ~ ord ~ ((lim, off)) =>
        val conds = gb.getOrElse(Nil)
        val pat2 = conds.foldLeft(pat) {
          case (p, Right((e, v))) => Pattern.Extend(p, v, e)
          case (p, Left(_))       => p
        }
        Query(SelectForm, proj, d.contains("DISTINCT"), pat2,
          groupBy = conds.map { case Left(v) => v; case Right((_, v)) => v },
          having = hav,
          orderBy = ord.getOrElse(Nil), limit = lim, offset = off)
    }

  def askQuery: Parser[Query] =
    kw("ASK") ~> groupGraphPattern ^^ (p => Query(AskForm, Nil, distinct = false, p))

  /** DESCRIBE <iri> | DESCRIBE ?v WHERE { … }: desugars to a variable-
    * predicate probe (joined to the WHERE pattern for the variable form);
    * the probe triple rides in `template` for the compiler's formatter. */
  def describeQuery: Parser[Query] =
    kw("DESCRIBE") ~> (iri | variable) ~ opt(opt(kw("WHERE")) ~> groupGraphPattern) ^^ {
      case (subject: Term) ~ where =>
        val probe = TriplePattern(subject, Var("__dp"), Var("__do"))
        val pat = where match {
          case Some(p) => Pattern.Join(p, Pattern.Bgp(List(probe)))
          case None    => Pattern.Bgp(List(probe))
        }
        Query(DescribeForm, Nil, distinct = false, pat, template = List(probe))
    }

  def constructQuery: Parser[Query] =
    kw("CONSTRUCT") ~> ("{" ~> rep1sep(triplesTemplate, ".") <~ opt(".") <~ "}") ~
      (kw("WHERE") ~> groupGraphPattern) ~ modifiers ^^ {
      case tmpl ~ pat ~ ((lim, off)) =>
        Query(ConstructForm, Nil, distinct = false, pat, template = tmpl.flatten,
          limit = lim, offset = off)
    } |
    // W3C shorthand: CONSTRUCT WHERE { tpl } — the pattern IS the template
    kw("CONSTRUCT") ~> kw("WHERE") ~>
      ("{" ~> rep1sep(triplesTemplate, ".") <~ opt(".") <~ "}") ~ modifiers ^^ {
      case tmpl ~ ((lim, off)) =>
        val ts = tmpl.flatten
        Query(ConstructForm, Nil, distinct = false, Pattern.Bgp(ts), template = ts,
          limit = lim, offset = off)
    }

  def orderClause: Parser[List[OrderKey]] =
    kw("ORDER") ~> kw("BY") ~> rep1(
      kw("ASC") ~> "(" ~> expression <~ ")" ^^ (OrderKey(_, asc = true)) |
      kw("DESC") ~> "(" ~> expression <~ ")" ^^ (OrderKey(_, asc = false)) |
      variable ^^ (v => OrderKey(Expr.TermRef(v), asc = true)))

  def modifiers: Parser[(Option[Long], Option[Long])] =
    opt(kw("LIMIT") ~> """\d+""".r) ~ opt(kw("OFFSET") ~> """\d+""".r) ^^ {
      case l ~ o => (l.map(_.toLong), o.map(_.toLong))
    } // LIMIT-before-OFFSET order, as the reference grammar fixes it

  def query: Parser[Query] =
    prologue ~> (selectQuery | askQuery | constructQuery | describeQuery)
}

object SparqlParser {
  def parse(text: String): Either[String, Query] = {
    val p = new SparqlParser
    p.parseAll(p.query, text) match {
      case p.Success(q, _) => Right(q)
      case f: p.NoSuccess  => Left(s"${f.msg} at ${f.next.pos}")
    }
  }

  /** Parse or throw — for internal fixtures known to be valid. */
  def parseUnsafe(text: String): Query =
    parse(text).fold(e => throw new IllegalArgumentException(s"SPARQL parse error: $e"), identity)
}
