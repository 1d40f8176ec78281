package graft.compiler

import graft.algebra._

/** Algebra → SPARQL surface-text serialization, for shipping a SERVICE
  * block's inner pattern to a remote endpoint (the dispatch half of W3C
  * SPARQL 1.1 Federated Query — the reference instead re-assembles wrapper
  * query strings per star, `ontario/wrappers/triplestore/__init__.py:125-186`).
  * IRIs are emitted in full `<…>` form so no prefix context travels.
  *
  * Covers the pattern/expression surface a SERVICE body can carry through
  * our own parser: BGPs, property paths, FILTER / OPTIONAL / UNION / BIND /
  * VALUES and the compiled expression grammar. Anything else throws — under
  * SERVICE SILENT that degrades to the unit solution per §4. */
object SparqlText {

  /** A full SELECT over `vars`, totally ordered for stable LIMIT/OFFSET
    * paging (each page is an independent execution at the endpoint). */
  def selectQuery(vars: Seq[String], p: Pattern): String =
    s"SELECT ${vars.map("?" + _).mkString(" ")} WHERE { ${pattern(p)} }" +
      s" ORDER BY ${vars.map("?" + _).mkString(" ")}"

  def pattern(p: Pattern): String = p match {
    case Pattern.Bgp(ts)       => ts.map(triple).mkString(" ")
    case Pattern.Join(l, r)    => s"${pattern(l)} ${pattern(r)}"
    case Pattern.Filter(e, p0) => s"${pattern(p0)} FILTER (${expr(e)})"
    case Pattern.LeftJoin(l, r, cond) =>
      val f = cond.fold("")(e => s" FILTER (${expr(e)})")
      s"${pattern(l)} OPTIONAL { ${pattern(r)}$f }"
    case Pattern.Union(l, r)   => s"{ ${pattern(l)} } UNION { ${pattern(r)} }"
    case Pattern.Extend(p0, v, e) => s"${pattern(p0)} BIND (${expr(e)} AS ?${v.name})"
    case Pattern.Minus(l, r)   => s"${pattern(l)} MINUS { ${pattern(r)} }"
    case Pattern.Exists(l, r, pos) =>
      s"${pattern(l)} FILTER (${if (pos) "" else "NOT "}EXISTS { ${pattern(r)} })"
    case Pattern.Values(vs, rows) =>
      val hdr = vs.map("?" + _.name).mkString("(", " ", ")")
      val body = rows.map(_.map(_.fold("UNDEF")(term)).mkString("(", " ", ")"))
        .mkString(" ")
      s"VALUES $hdr { $body }"
    case Pattern.Path(s, ast, o) => s"${term(s)} ${path(ast)} ${term(o)} ."
    case other => throw new UnsupportedOperationException(
      s"cannot serialize pattern for SERVICE dispatch: ${other.getClass.getSimpleName}")
  }

  def triple(tp: TriplePattern): String =
    s"${term(tp.s)} ${term(tp.p)} ${term(tp.o)} ."

  def term(t: Term): String = t match {
    case Var(n) => s"?$n"
    case Iri(u) => s"<$u>"
    case Lit(lex, dt, lang) =>
      val q = "\"" + Terms.escapeNt(lex) + "\""
      (dt, lang) match {
        // bare numerals round-trip as numerals (the parser tags them)
        case (Some(Terms.XsdInt), _) if lex.matches("[+-]?\\d+")         => lex
        case (Some(Terms.XsdDecimal | Terms.XsdDouble), _)
          if lex.matches("[+-]?\\d*\\.?\\d+([eE][+-]?\\d+)?")            => lex
        case (Some(Terms.XsdBoolean), _) if lex == "true" || lex == "false" => lex
        case (Some(d), _)  => s"$q^^<$d>"
        case (_, Some(l))  => s"$q@$l"
        case _             => q
      }
  }

  def path(ast: PathAst): String = ast match {
    case PathAst.Link(Iri(p))   => s"<$p>"
    case PathAst.Seq2(l, r)     => s"${path(l)}/${path(r)}"
    case PathAst.Alt(l, r)      => s"(${path(l)}|${path(r)})"
    case PathAst.Inv(p)         => s"^${path(p)}"
    case PathAst.Closure(p, z)  => s"(${path(p)})${if (z) "*" else "+"}"
    case PathAst.ZeroOrOne(p)   => s"(${path(p)})?"
    case PathAst.Nps(fwd, inv)  =>
      val members = fwd.map(u => s"<$u>") ++ inv.map(u => s"^<$u>")
      s"!(${members.mkString("|")})"
  }

  /** VALUES block for dependent-join dispatch: lexical key values from the
    * local side become remote terms by shape — IRI scheme ⇒ `<…>`, numeral
    * ⇒ bare (typed comparison at the endpoint), else quoted literal. Null
    * keys are dropped by the caller (they cannot join). */
  def valuesBlock(vars: Seq[String], rows: Seq[Seq[String]]): String = {
    def termOf(lex: String): String =
      if (lex.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) s"<$lex>"
      else if (lex.matches("[+-]?\\d+") ||
               lex.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?")) lex
      else "\"" + Terms.escapeNt(lex) + "\""
    val hdr = vars.map("?" + _).mkString("(", " ", ")")
    val body = rows.map(_.map(termOf).mkString("(", " ", ")")).mkString(" ")
    s"VALUES $hdr { $body }"
  }

  def expr(e: Expr): String = e match {
    case Expr.TermRef(t)       => term(t)
    case Expr.Cmp(op, l, r)    => s"(${expr(l)} $op ${expr(r)})"
    case Expr.Arith(op, l, r)  => s"(${expr(l)} $op ${expr(r)})"
    case Expr.And(l, r)        => s"(${expr(l)} && ${expr(r)})"
    case Expr.Or(l, r)         => s"(${expr(l)} || ${expr(r)})"
    case Expr.Not(x)           => s"(!${expr(x)})"
    case Expr.Call("in", subj :: items) =>
      s"(${expr(subj)} IN (${items.map(expr).mkString(", ")}))"
    case Expr.Call(name, args) =>
      // IRI-named calls (ExprCompiler's xsd cast names are full IRIs) must
      // serialize as <iri>(args) — uppercasing a bare IRI is invalid SPARQL
      val fn = if (name.contains(":")) s"<$name>" else name.toUpperCase
      s"$fn(${args.map(expr).mkString(", ")})"
  }
}
