package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algebra._
import graft.parser.SparqlParser
import graft.mapping.Template

class ParserSpec extends AnyFunSuite {

  test("simple select with prefixes, star pattern, filter") {
    val q = SparqlParser.parseUnsafe(
      """PREFIX g: <urn:g:>
        |SELECT ?name ?bal WHERE {
        |  ?c a g:Customer ; g:name ?name ; g:acctbal ?bal .
        |  FILTER (?bal > 100)
        |}""".stripMargin)
    assert(q.form == SelectForm)
    assert(q.projection.map(_.alias) == List("name", "bal"))
    q.pattern match {
      case Pattern.Filter(Expr.Cmp(">", _, _), Pattern.Bgp(ts)) =>
        assert(ts.size == 3)
        assert(ts.head.p == Iri(Terms.RdfType))
      case other => fail(s"unexpected pattern $other")
    }
  }

  test("union of two groups") {
    val q = SparqlParser.parseUnsafe(
      """PREFIX g: <urn:g:>
        |SELECT ?n WHERE { { ?c g:name ?n } UNION { ?s g:name ?n } }""".stripMargin)
    q.pattern match {
      case Pattern.Union(_, _) => ()
      case other => fail(s"expected Union, got $other")
    }
  }

  test("optional attaches as left join") {
    val q = SparqlParser.parseUnsafe(
      """PREFIX g: <urn:g:>
        |SELECT ?c ?d WHERE { ?c g:name ?n OPTIONAL { ?c g:acctbal ?d } }""".stripMargin)
    q.pattern match {
      case Pattern.LeftJoin(Pattern.Bgp(_), Pattern.Bgp(_), None) => ()
      case other => fail(s"expected LeftJoin, got $other")
    }
  }

  test("modifiers: distinct, order by, limit, offset") {
    val q = SparqlParser.parseUnsafe(
      """PREFIX g: <urn:g:>
        |SELECT DISTINCT ?n WHERE { ?c g:name ?n }
        |ORDER BY DESC(?n) LIMIT 10 OFFSET 5""".stripMargin)
    assert(q.distinct)
    assert(q.orderBy == List(OrderKey(Expr.TermRef(Var("n")), asc = false)))
    assert(q.limit.contains(10L) && q.offset.contains(5L))
  }

  test("aggregates with group by / having (SPARQL 1.1 extension)") {
    val q = SparqlParser.parseUnsafe(
      """PREFIX g: <urn:g:>
        |SELECT ?flag (SUM(?qty) AS ?total) (COUNT(*) AS ?n) WHERE {
        |  ?l g:returnflag ?flag ; g:quantity ?qty .
        |} GROUP BY ?flag HAVING (?n > 2) ORDER BY ?flag""".stripMargin)
    assert(q.hasAggregates)
    assert(q.groupBy == List(Var("flag")))
    assert(q.projection.collect { case a: ProjAgg => a.func } == List("sum", "count"))
    assert(q.having.isDefined)
  }

  test("ask and construct") {
    assert(SparqlParser.parseUnsafe(
      "PREFIX g: <urn:g:> ASK { ?c g:name ?n }").form == AskForm)
    val c = SparqlParser.parseUnsafe(
      """PREFIX g: <urn:g:>
        |CONSTRUCT { ?c g:label ?n } WHERE { ?c g:name ?n }""".stripMargin)
    assert(c.form == ConstructForm && c.template.size == 1)
  }

  test("typed and lang literals, boolean, negative numbers") {
    val q = SparqlParser.parseUnsafe(
      """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT ?x WHERE { ?x <urn:p> "v"^^xsd:integer ; <urn:q> "hi"@en ; <urn:r> -3.5 }
        |""".stripMargin)
    val objs = (q.pattern: @unchecked) match { case Pattern.Bgp(ts) => ts.map(_.o) }
    assert(objs.contains(Lit("v", Some(Terms.XsdInt))))
    assert(objs.contains(Lit("hi", lang = Some("en"))))
    assert(objs.contains(Lit("-3.5", Some(Terms.XsdDecimal))))
  }

  test("filter builtins parse") {
    val q = SparqlParser.parseUnsafe(
      """PREFIX g: <urn:g:>
        |SELECT ?n WHERE { ?c g:name ?n .
        |  FILTER (REGEX(?n, "a.*b", "i") && CONTAINS(UCASE(?n), "X") || !BOUND(?n))
        |}""".stripMargin)
    assert(q.pattern.isInstanceOf[Pattern.Filter])
  }
}

class TemplateSpec extends AnyFunSuite {
  test("parse and invert single-column template") {
    val t = Template("urn:g:cust:{c_custkey}")
    assert(t.columns == List("c_custkey"))
    assert(t.invert("urn:g:cust:42") == Some(List("c_custkey" -> "42")))
    assert(t.invert("urn:g:part:42") == None)
  }

  test("multi-column template with separator") {
    val t = Template("urn:g:line:{l_orderkey}_{l_linenumber}")
    assert(t.columns == List("l_orderkey", "l_linenumber"))
    assert(t.invert("urn:g:line:19_2") ==
      Some(List("l_orderkey" -> "19", "l_linenumber" -> "2")))
  }

  test("signatures distinguish literal prefixes") {
    assert(Template("urn:g:cust:{a}").signature == Template("urn:g:cust:{b}").signature)
    assert(Template("urn:g:cust:{a}").signature != Template("urn:g:part:{a}").signature)
  }
}
