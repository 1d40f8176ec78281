package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DiscoveryTranslators._

/** Golden specs for the store-discovery query generation — the probe half
  * of RDF-MT catalog creation against live SPARQL/Mongo/Neo4j stores
  * (`ontario/rdfmt/__init__.py` parity; transport is out of scope in the
  * zero-egress container, as with DocStoreTranslators). */
class DiscoverySpec extends AnyFunSuite {

  private val G = "urn:g:"
  private val RDFS = "http://www.w3.org/2000/01/rdf-schema#"

  test("sparql: typed concepts with optional English labels, paged") {
    assert(sparqlTypedConcepts ==
      "SELECT DISTINCT ?t ?label WHERE { ?s a ?t . " +
        s"OPTIONAL { ?t <${RDFS}label> ?label " +
        "FILTER langMatches(lang(?label), \"EN\") } }")
    assert(sparqlPaged(sparqlTypedConcepts, 100, 200).endsWith(" LIMIT 100 OFFSET 200"))
  }

  test("sparql: predicates / ranges / subclasses of a concept") {
    assert(sparqlPredicates(s"${G}Customer") ==
      s"SELECT DISTINCT ?p ?label WHERE { ?s a <${G}Customer> . ?s ?p ?pt . " +
        s"OPTIONAL { ?p <${RDFS}label> ?label " +
        "FILTER langMatches(lang(?label), \"EN\") } }")
    assert(sparqlRdfsRanges(s"${G}nation") ==
      s"SELECT DISTINCT ?range WHERE { <${G}nation> <${RDFS}range> ?range }")
    assert(sparqlInstanceRange(s"${G}Customer", s"${G}nation") ==
      s"SELECT DISTINCT ?r WHERE { ?s a <${G}Customer> . " +
        s"?s <${G}nation> ?pt . ?pt a ?r }")
    assert(sparqlSubclasses(s"${G}Customer") ==
      s"SELECT DISTINCT ?subc WHERE { <${G}Customer> <${RDFS}subClassOf> ?subc }")
  }

  test("sparql: cardinality at all four granularities") {
    assert(sparqlCardinality() ==
      "SELECT (COUNT(*) AS ?count) WHERE { ?s ?p ?o }")
    assert(sparqlCardinality(Some(s"${G}Customer")) ==
      s"SELECT (COUNT(?s) AS ?count) WHERE { ?s a <${G}Customer> }")
    assert(sparqlCardinality(Some(s"${G}Customer"), Some(s"${G}name")) ==
      s"SELECT (COUNT(?s) AS ?count) WHERE { ?s a <${G}Customer> . ?s <${G}name> ?o }")
    assert(sparqlCardinality(Some(s"${G}Customer"), Some(s"${G}nation"),
      Some(s"${G}Nation")) ==
      s"SELECT (COUNT(?s) AS ?count) WHERE { ?s a <${G}Customer> . " +
        s"?s <${G}nation> ?o . ?o a <${G}Nation> }")
    assert(sparqlCardinality(Some(s"${G}Customer"), Some(s"${G}acctbal"),
      Some("http://www.w3.org/2001/XMLSchema#decimal"), rangeIsDatatype = true) ==
      s"SELECT (COUNT(?s) AS ?count) WHERE { ?s a <${G}Customer> . " +
        s"?s <${G}acctbal> ?o . " +
        "FILTER(datatype(?o) = <http://www.w3.org/2001/XMLSchema#decimal>) }")
    // spaces in IRIs are sanitized as the reference does
    assert(sparqlCardinality(Some("urn:g:Bad Type")).contains("<urn:g:Bad_Type>"))
  }

  test("mongo: bounded sampled field harvest and cardinalities") {
    val p = mongoFieldHarvest(500)
    assert(p.startsWith("""[{"$sample": {"size": 500}}"""))
    assert(p.contains(""""$objectToArray": "$$ROOT""""))
    assert(p.contains(""""$group": {"_id": "$kv.k""""))
    assert(mongoCardinality() == """[{"$count": "count"}]""")
    assert(mongoCardinality(Some("c_name")) ==
      """[{"$match": {"c_name": {"$exists": true, "$ne": null}}}, {"$count": "count"}]""")
  }

  test("cypher: labels / keys / rel types / ranges / cardinalities") {
    assert(cypherLabels == "MATCH (n) UNWIND labels(n) AS t RETURN DISTINCT t")
    assert(cypherPredicates("Customer") ==
      "MATCH (n:`Customer`) UNWIND keys(n) AS p RETURN DISTINCT p")
    assert(cypherRelTypes("Customer") ==
      "MATCH (n:`Customer`)-[r]->() RETURN DISTINCT type(r) AS p")
    assert(cypherInstanceRange("Customer", "NATION") ==
      "MATCH (n:`Customer`)-[r:`NATION`]->(m) UNWIND labels(m) AS range RETURN DISTINCT range")
    assert(cypherCardinality("Customer") ==
      "MATCH (n:`Customer`) RETURN count(n) AS count")
    assert(cypherCardinality("Customer", Some("c_name")) ==
      "MATCH (n:`Customer`) WHERE n.`c_name` IS NOT NULL RETURN count(n) AS count")
  }
}
