package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algebra._
import graft.api.TpchCatalog
import graft.sources.DocStoreTranslators._

/** Star → Mongo-pipeline / Cypher translation (the reference's
  * `sparql2mongo.py` / `sparql2cypher.py` wrapper logic; transport is out of
  * scope in the zero-egress container, as with PagedEndpointSource). */
class TranslatorsSpec extends AnyFunSuite {
  private val G = "urn:g:"
  private val cat = TpchCatalog.catalog
  private val customer = cat.byType(s"${G}Customer").head

  private def t(s: Term, p: String, o: Term) = TriplePattern(s, Iri(G + p), o)

  test("mongo: constant object becomes $match, variable object $project + guards") {
    val star = List(
      TriplePattern(Var("c"), Iri(Terms.RdfType), Iri(s"${G}Customer")),
      t(Var("c"), "mktsegment", Lit("BUILDING")),
      t(Var("c"), "name", Var("n")))
    val p = toMongoPipeline(Var("c"), star, customer)
    assert(p.contains(""""c_mktsegment": "BUILDING""""))
    assert(p.contains(""""n": "$c_name""""))
    assert(p.contains(""""__k_c_0": "$c_custkey"""")) // subject keys projected
    assert(p.contains(""""c_name": {"$exists": true, "$ne": null}"""))
    assert(p.startsWith("""[{"$match":""") && p.contains(""""$project":"""))
  }

  test("mongo: constant subject inverts the URI template; paging appended") {
    val p = toMongoPipeline(Iri(s"${G}cust:42"),
      List(t(Iri(s"${G}cust:42"), "acctbal", Var("b"))), customer,
      limit = Some(10), offset = Some(5))
    assert(p.contains(""""c_custkey": "42""""))
    assert(p.contains(""""$skip": 5""") && p.contains(""""$limit": 10"""))
    assert(p.indexOf("$skip") < p.indexOf("$limit")) // skip before limit
  }

  test("mongo: template-valued predicate inverts constants / projects keys") {
    val konst = toMongoPipeline(Var("c"),
      List(t(Var("c"), "nation", Iri(s"${G}nation:7"))), customer)
    assert(konst.contains(""""c_nationkey": "7""""))
    val varo = toMongoPipeline(Var("c"),
      List(t(Var("c"), "nation", Var("nat"))), customer)
    assert(varo.contains(""""__k_nat_0": "$c_nationkey""""))
  }

  test("cypher: label from class, WHERE equalities, RETURN aliases") {
    val star = List(
      TriplePattern(Var("c"), Iri(Terms.RdfType), Iri(s"${G}Customer")),
      t(Var("c"), "mktsegment", Lit("BUILDING")),
      t(Var("c"), "name", Var("n")))
    val cy = toCypher(Var("c"), star, customer, cat)
    assert(cy.startsWith("MATCH (n:Customer)"))
    assert(cy.contains("""n.c_mktsegment = "BUILDING""""))
    assert(cy.contains("RETURN") && cy.contains("n.c_name AS n"))
    assert(cy.contains("n.c_custkey AS __k_c_0"))
  }

  test("cypher: template link to another molecule becomes a relationship") {
    val cy = toCypher(Var("c"),
      List(t(Var("c"), "nation", Var("nat"))), customer, cat)
    assert(cy.contains("(n)-[:nation]->(m1:"))
    assert(cy.contains("m1.") && cy.contains("AS __k_nat_0"))
  }

  test("cypher: constant subject + paging") {
    val cy = toCypher(Iri(s"${G}cust:42"),
      List(t(Iri(s"${G}cust:42"), "acctbal", Var("b"))), customer, cat,
      limit = Some(3), offset = Some(1))
    assert(cy.contains("""n.c_custkey = "42""""))
    assert(cy.endsWith("SKIP 1 LIMIT 3"))
  }
}
