package graft

import graft.api.{Graft, TpchCatalog}
import graft.mapping._

/** RDF-MT catalog auto-generation (create_rdfmts.py parity): probe the
  * fixture parquet, reconstruct the molecule list, and answer the reference
  * workload queries identically to the hand-written catalog. */
class CatalogGenSpec extends SparkTestBase {

  private val tableNames = List("customer", "orders", "lineitem", "part",
    "supplier", "nation", "region", "documents")

  private lazy val tables = tableNames
    .map(t => t -> spark.read.parquet(s"$sfDir/$t.parquet")).toMap

  // vocabulary config (the reference reads these from config.json templates);
  // everything structural — keys, links, cardinalities, hints — is probed
  private val opts = CatalogGen.GenOptions(
    prefix = "urn:g:",
    aliases = Map("customer" -> "cust", "supplier" -> "supp",
      "lineitem" -> "line", "documents" -> "doc"))

  private lazy val generated: Catalog = CatalogGen.fromTables(tables, opts)

  private def mol(c: Catalog, t: String): Molecule =
    c.molecules.find(_.table == t).get

  test("sidecar cache round-trips the probed catalog exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat").resolve("cat.json")
    val fp = CatalogCache.fingerprint(tableNames.map(t => s"$sfDir/$t.parquet"))
    CatalogCache.save(tmp, fp, generated)
    val loaded = CatalogCache.load(tmp, fp)
    assert(loaded.contains(generated)) // case-class equality: every field
  }

  test("stale or corrupt sidecars re-probe instead of serving old state") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat").resolve("cat.json")
    val fp = CatalogCache.fingerprint(tableNames.map(t => s"$sfDir/$t.parquet"))
    CatalogCache.save(tmp, fp, generated)
    // a rewritten lake changes the fingerprint ⇒ cache miss
    assert(CatalogCache.load(tmp, fp + "x").isEmpty)
    var probes = 0
    val fresh = CatalogCache.cached(tmp, fp + "x") { probes += 1; generated }
    assert(probes == 1 && fresh == generated)
    // ...and the re-probe refreshed the sidecar under the new fingerprint
    assert(CatalogCache.load(tmp, fp + "x").contains(generated))
    // corrupt JSON ⇒ silent miss, not a crash
    java.nio.file.Files.write(tmp, "not json".getBytes)
    assert(CatalogCache.load(tmp, fp).isEmpty)
  }

  test("probed molecules match the hand-written catalog structurally") {
    assert(generated.molecules.map(_.table).toSet == tableNames.toSet)
    TpchCatalog.catalog.molecules.foreach { exp =>
      val got = mol(generated, exp.table)
      assert(got.rdfType == exp.rdfType, s"${exp.table}: class")
      assert(got.subject == exp.subject, s"${exp.table}: subject template")
      // langColumn sidecars are mapping knowledge probing cannot recover;
      // compare predicate → term map modulo that annotation
      def strip(p: Map[String, TermMap]) = p.view.mapValues {
        case RefMap(c, _) => RefMap(c)
        case other        => other
      }.toMap
      assert(strip(got.predicates) == strip(exp.predicates),
        s"${exp.table}: predicates\n${got.predicates}\nvs\n${exp.predicates}")
    }
  }

  test("cardinalities are probed and dimensions get broadcast hints") {
    assert(mol(generated, "nation").cardinality == 25)
    assert(mol(generated, "region").cardinality == 5)
    assert(mol(generated, "nation").broadcastHint)
    assert(mol(generated, "region").broadcastHint)
    assert(!mol(generated, "lineitem").broadcastHint)
    assert(mol(generated, "lineitem").cardinality ==
      tables("lineitem").count())
  }

  test("foreign keys are discovered by containment, not name accident") {
    // customer.c_nationkey → nation, not region (suffix mismatch) and not
    // supplier (containment holds only for the true parent domain + suffix)
    val cust = mol(generated, "customer")
    assert(cust.predicates("urn:g:nation") ==
      TemplateMap(Template("urn:g:nation:{c_nationkey}")))
    val line = mol(generated, "lineitem")
    assert(line.predicates("urn:g:order") ==
      TemplateMap(Template("urn:g:order:{l_orderkey}")))
    assert(line.predicates("urn:g:part") ==
      TemplateMap(Template("urn:g:part:{l_partkey}")))
    assert(line.predicates("urn:g:supplier") ==
      TemplateMap(Template("urn:g:supp:{l_suppkey}")))
  }

  test("the generated catalog answers the workload like the hand-written one") {
    val gGen = new Graft(generated, t => tables(t))(spark)
    val gRef = new Graft(TpchCatalog.catalog, t => tables(t))(spark)
    val joinChain =
      """PREFIX g: <urn:g:>
        |SELECT ?l ?cname ?qty WHERE {
        |  ?c a g:Customer ; g:name ?cname ; g:mktsegment "BUILDING" .
        |  ?o g:customer ?c .
        |  ?l g:order ?o ; g:quantity ?qty .
        |} ORDER BY ?l""".stripMargin
    val prunedChain =
      """PREFIX g: <urn:g:>
        |SELECT ?ent ?ename ?nname WHERE {
        |  ?ent g:name ?ename ; g:nation ?n .
        |  ?n g:name ?nname ; g:region ?r .
        |  ?r g:name "ASIA" .
        |} ORDER BY ?ent""".stripMargin
    for (q <- List(joinChain, prunedChain)) {
      val got = gGen.sparql(q).collect().map(_.toSeq).toSeq
      val exp = gRef.sparql(q).collect().map(_.toSeq).toSeq
      assert(got.nonEmpty && got == exp)
    }
  }

  test("endpoint discovery probes a live server into a working catalog") {
    // the create_rdfmts.py triple-store path end-to-end: GraftServer serves
    // a scoped catalog; EndpointCatalogGen discovers concepts, predicates,
    // cardinalities and datatypes over the WIRE (DiscoveryTranslators text
    // through SparqlHttp); the probed catalog then answers a federated
    // 3-star join through paged HTTP fetches
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val inner = Graft.overParquetDir(Catalog(
      TpchCatalog.catalog.molecules.filter(m =>
        Set("urn:g:Customer", "urn:g:Nation", "urn:g:Region")
          .contains(m.rdfType))), sfDir)
    val server = new graft.api.GraftServer(inner)
    val port = server.start()
    try {
      val probed = EndpointCatalogGen.probe(s"http://127.0.0.1:$port/sparql")
      // structure: all three concepts discovered, with exact cardinalities
      // and dimension-size broadcast hints (sf0.001: 150/25/5 rows)
      val byType = probed.catalog.molecules.map(m => m.rdfType -> m).toMap
      assert(byType.keySet ==
        Set("urn:g:Customer", "urn:g:Nation", "urn:g:Region"))
      assert(byType("urn:g:Nation").cardinality == 25L)
      assert(byType("urn:g:Region").cardinality == 5L)
      assert(byType("urn:g:Customer").cardinality ==
        spark.read.parquet(s"$sfDir/customer.parquet").count())
      assert(probed.catalog.molecules.forall(_.broadcastHint))
      // predicate discovery matches the served molecules (minus rdf:type)
      assert(byType("urn:g:Customer").predicates.keySet ==
        TpchCatalog.catalog.molecules.find(_.rdfType == "urn:g:Customer")
          .get.predicates.keySet)
      // inter-concept link discovery over the wire (create_inter_ds_links
      // parity): exactly the two real links, no false positives from
      // literal-valued predicates
      assert(probed.links == Map(
        ("urn:g:Customer", "urn:g:nation") -> List("urn:g:Nation"),
        ("urn:g:Nation", "urn:g:region") -> List("urn:g:Region")))
      // datatype sniffing: acctbal is numeric, name is string
      val cust = probed.loaders(byType("urn:g:Customer").table)()
      assert(cust.schema("acctbal").dataType ==
        org.apache.spark.sql.types.DoubleType)
      assert(cust.schema("name").dataType ==
        org.apache.spark.sql.types.StringType)
      // the probed catalog answers a federated join identically to the
      // relational truth
      val g = new Graft(probed.catalog, probed.loader)
      val got = g.sparql(
        """PREFIX g: <urn:g:>
          |SELECT ?rname (COUNT(?c) AS ?ncust) WHERE {
          |  ?c a g:Customer ; g:nation ?n .
          |  ?n a g:Nation ; g:region ?r .
          |  ?r a g:Region ; g:name ?rname .
          |} GROUP BY ?rname ORDER BY ?rname""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val want = spark.read.parquet(s"$sfDir/customer.parquet")
        .join(spark.read.parquet(s"$sfDir/nation.parquet"),
          org.apache.spark.sql.functions.col("c_nationkey") ===
            org.apache.spark.sql.functions.col("n_nationkey"))
        .join(spark.read.parquet(s"$sfDir/region.parquet"),
          org.apache.spark.sql.functions.col("n_regionkey") ===
            org.apache.spark.sql.functions.col("r_regionkey"))
        .groupBy("r_name").count()
        .orderBy("r_name")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == want && got.nonEmpty)
      // OPTIONAL over the probed catalog: every nation row survives; the
      // empty-bag path (a predicate no endpoint concept serves) pads
      // unbound rather than failing — both semantics on the wire catalog
      val opt = g.sparql(
        """PREFIX g: <urn:g:>
          |SELECT ?n ?rn ?ghost WHERE {
          |  ?n a g:Nation .
          |  OPTIONAL { ?n g:region ?r . ?r a g:Region ; g:name ?rn }
          |  OPTIONAL { ?n g:nosuch ?ghost }
          |} ORDER BY ?n""".stripMargin).collect()
      assert(opt.length == 25)
      assert(opt.forall(r => !r.isNullAt(1)), "every nation has a region name")
      assert(opt.forall(_.isNullAt(2)), "unserved predicate pads unbound")
    } finally server.stop()
  }

  test("unanswerable group-scoped patterns follow empty-bag semantics") {
    // the engine change that unblocks the discovery protocol: OPTIONAL over
    // a predicate no molecule serves pads unbound (W3C semantics) instead
    // of failing the query; UNION drops the dead branch; NOT EXISTS keeps
    // all rows; EXISTS keeps none; a REQUIRED unmatched star stays loud
    val g = Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)
    val opt = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?r ?x WHERE { ?r a g:Region .
        |  OPTIONAL { ?r g:nosuchpred ?x } } ORDER BY ?r""".stripMargin).collect()
    assert(opt.length == 5 && opt.forall(_.isNullAt(1)))
    val uni = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?n WHERE {
        |  { ?r a g:Region ; g:name ?n } UNION { ?r g:ghost ?n }
        |} ORDER BY ?n""".stripMargin).collect()
    assert(uni.length == 5)
    val notEx = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?r WHERE { ?r a g:Region .
        |  FILTER NOT EXISTS { ?r g:ghost ?x } } ORDER BY ?r""".stripMargin).collect()
    assert(notEx.length == 5)
    val ex = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?r WHERE { ?r a g:Region .
        |  FILTER EXISTS { ?r g:ghost ?x } }""".stripMargin).collect()
    assert(ex.isEmpty)
    val minus = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?r WHERE { ?r a g:Region .
        |  MINUS { ?r g:ghost ?x } } ORDER BY ?r""".stripMargin).collect()
    assert(minus.length == 5)
    intercept[graft.decomposer.NoSourceException] {
      g.sparql("PREFIX g: <urn:g:> SELECT ?x WHERE { ?x g:nosuchpred ?y }")
    }
    // join-link pruning to zero is PROVABLY EMPTY, not unanswerable:
    // customer.nation builds urn:g:nation:{...} URIs, Region subjects are
    // urn:g:region:{...} — no row can join, so the count is 0, not an
    // error (the wire link-discovery probes depend on this)
    val provablyEmpty = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT (COUNT(?s) AS ?count) WHERE {
        |  ?s a g:Customer . ?s g:nation ?o . ?o a g:Region }""".stripMargin)
      .collect()
    assert(provablyEmpty.length == 1 && provablyEmpty(0).getLong(0) == 0L)
  }
}
