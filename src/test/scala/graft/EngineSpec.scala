package graft

import org.apache.spark.sql.functions._
import graft.api.{Graft, TpchCatalog}

/** End-to-end SPARQL engine correctness against direct DataFrame
  * equivalents on the sf0.001 test tables. */
class EngineSpec extends SparkTestBase {

  lazy val g: Graft = Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)
  def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

  test("F1 scan + numeric filter (single star)") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?name ?bal WHERE {
        |  ?c a g:Customer ; g:name ?name ; g:acctbal ?bal .
        |  FILTER (?bal > 5000)
        |}""".stripMargin)
    val want = t("customer").filter(col("c_acctbal") > 5000)
      .select(col("c_name").as("name"), col("c_acctbal").as("bal"))
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("F2 union of two stars (SQ1 shape)") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?n WHERE {
        |  { ?c a g:Customer ; g:name ?n } UNION { ?s a g:Supplier ; g:name ?n }
        |}""".stripMargin)
    val want = t("customer").select(col("c_name").as("n"))
      .unionByName(t("supplier").select(col("s_name").as("n")))
    assert(got.count() == want.count())
  }

  test("F3 single star, many predicates + constant object") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?name ?bal WHERE {
        |  ?c a g:Customer ; g:name ?name ; g:acctbal ?bal ;
        |     g:mktsegment "BUILDING" .
        |}""".stripMargin)
    val want = t("customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_name").as("name"), col("c_acctbal").as("bal"))
    assert(got.count() == want.count() && got.count() > 0)
  }

  test("F4 cross-star join chain customer→orders→lineitem") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?cname ?qty WHERE {
        |  ?c a g:Customer ; g:name ?cname .
        |  ?o g:customer ?c .
        |  ?l g:order ?o ; g:quantity ?qty .
        |}""".stripMargin)
    val want = t("customer")
      .join(t("orders"), col("o_custkey") === col("c_custkey"))
      .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
    assert(got.count() == want.count() && got.count() > 0)
    // scale check: the join must run on raw keys, not concat'd URI strings
    val plan = got.queryExecution.optimizedPlan.toString
    assert(!plan.contains("concat") ||
      !plan.linesIterator.exists(l => l.contains("Join") && l.contains("concat")),
      s"URI-string join leaked into plan:\n$plan")
  }

  test("F5 optional (left outer) with inner filter") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?cname ?odate WHERE {
        |  ?c a g:Customer ; g:name ?cname .
        |  OPTIONAL { ?o g:customer ?c ; g:orderdate ?odate ;
        |                g:totalprice ?tp . FILTER (?tp > 100000) }
        |}""".stripMargin)
    val orders = t("orders").filter(col("o_totalprice") > 100000)
    val want = t("customer").join(orders, col("o_custkey") === col("c_custkey"), "left_outer")
    assert(got.count() == want.count())
    assert(got.filter(col("odate").isNull).count() ==
      want.filter(col("o_orderdate").isNull).count())
  }

  test("F6 distinct + order + limit + offset") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT DISTINCT ?seg WHERE { ?c g:mktsegment ?seg }
        |ORDER BY ?seg LIMIT 3 OFFSET 1""".stripMargin)
    val want = t("customer").select(col("c_mktsegment")).distinct()
      .orderBy("c_mktsegment").collect().map(_.getString(0)).slice(1, 4)
    assert(got.collect().map(_.getString(0)).toSeq == want.toSeq)
  }

  test("F7 residual theta filter joins two stars (CQ9 shape)") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?c ?s WHERE {
        |  ?c a g:Customer ; g:nation ?n1 .
        |  ?s a g:Supplier ; g:nation ?n2 .
        |  FILTER (STR(?n1) = STR(?n2))
        |}""".stripMargin)
    val want = t("customer").join(t("supplier"),
      col("c_nationkey") === col("s_nationkey"))
    assert(got.count() == want.count())
  }

  test("F8 ask") {
    val yes = g.sparql("""PREFIX g: <urn:g:> ASK { ?c g:mktsegment "BUILDING" }""")
    val no = g.sparql("""PREFIX g: <urn:g:> ASK { ?c g:mktsegment "NO_SUCH" }""")
    assert(yes.collect()(0).getBoolean(0))
    assert(!no.collect()(0).getBoolean(0))
  }

  test("F8b construct emits term strings") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |CONSTRUCT { ?c g:label ?name } WHERE {
        |  ?c a g:Customer ; g:name ?name }""".stripMargin)
    val rows = got.limit(5).collect()
    assert(rows.forall(r => r.getString(0).startsWith("<urn:g:cust:")))
    assert(rows.forall(r => r.getString(1) == "<urn:g:label>"))
    assert(rows.forall(r => r.getString(2).startsWith("\"")))
  }

  test("F9 order by desc with real sort (reference gap)") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?name ?bal WHERE { ?c g:name ?name ; g:acctbal ?bal }
        |ORDER BY DESC(?bal) LIMIT 5""".stripMargin)
    // customers ∪ suppliers both have name+acctbal ⇒ union of molecules
    val want = t("customer").select(col("c_name").as("name"), col("c_acctbal").as("bal"))
      .unionByName(t("supplier").select(col("s_name").as("name"), col("s_acctbal").as("bal")))
      .orderBy(col("bal").desc).limit(5)
    assert(got.collect().map(_.getDouble(1)).toSeq ==
      want.collect().map(_.getDouble(1)).toSeq)
  }

  test("F10 rdf:type variable enumerates molecule") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT DISTINCT ?t WHERE { ?r a ?t ; g:name ?n . ?r g:region ?reg }""".stripMargin)
    assert(got.collect().map(_.getString(0)).toSet == Set("urn:g:Nation"))
  }

  test("aggregates: group by + sum + count (SPARQL 1.1 extension)") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?flag (SUM(?qty) AS ?total) (COUNT(*) AS ?n) WHERE {
        |  ?l a g:Lineitem ; g:returnflag ?flag ; g:quantity ?qty .
        |} GROUP BY ?flag ORDER BY ?flag""".stripMargin)
    val want = t("lineitem").groupBy(col("l_returnflag"))
      .agg(sum("l_quantity"), count(lit(1))).orderBy("l_returnflag")
    val g1 = got.collect(); val w1 = want.collect()
    assert(g1.map(_.getString(0)).toSeq == w1.map(_.getString(0)).toSeq)
    assert(g1.map(_.getLong(2)).toSeq == w1.map(_.getLong(2)).toSeq)
  }

  test("link pruning drops unrelated molecules for untyped chains") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?ent ?ename ?nname WHERE {
        |  ?ent g:name ?ename ; g:nation ?n .
        |  ?n g:name ?nname ; g:region ?r .
        |  ?r g:name "ASIA" .
        |}""".stripMargin)
    // ?ent: {name, nation} ⇒ customer ∪ supplier; ?r: {name} matches every
    // molecule until g:region's template signature prunes it to Region
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("part.parquet") && !plan.contains("orders.parquet") &&
      !plan.contains("lineitem.parquet"), s"pruning failed:\n$plan")
    val nat = t("nation").join(t("region").filter(col("r_name") === "ASIA"),
      col("n_regionkey") === col("r_regionkey"))
    val want = t("customer").join(nat, col("c_nationkey") === col("n_nationkey")).count() +
      t("supplier").join(nat, col("s_nationkey") === col("n_nationkey")).count()
    assert(got.count() == want)
  }

  test("order by non-projected variable sorts before projection") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?name WHERE { ?c g:name ?name ; g:acctbal ?bal . ?c a g:Customer }
        |ORDER BY DESC(?bal) LIMIT 3""".stripMargin)
    val want = t("customer").orderBy(col("c_acctbal").desc).limit(3)
      .select(col("c_name")).collect().map(_.getString(0))
    assert(got.collect().map(_.getString(0)).toSeq == want.toSeq)
  }

  test("minus, exists, values operators") {
    val minus = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?c WHERE { ?c a g:Customer .
        |  MINUS { ?o g:customer ?c ; g:totalprice ?tp . FILTER (?tp > 200000) } }""".stripMargin)
    val exists = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?c WHERE { ?c a g:Customer .
        |  FILTER EXISTS { ?o g:customer ?c ; g:totalprice ?tp . FILTER (?tp > 200000) } }""".stripMargin)
    val total = t("customer").count()
    assert(minus.count() + exists.count() == total)
    val values = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?c ?seg WHERE { ?c g:mktsegment ?seg .
        |  VALUES ?seg { "BUILDING" "MACHINERY" } }""".stripMargin)
    assert(values.count() ==
      t("customer").filter(col("c_mktsegment").isin("BUILDING", "MACHINERY")).count())
  }

  test("lang metadata: LANG()/LANGMATCHES over mapped lang column") {
    val got = g.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?d WHERE { ?d a g:Document ; g:text ?txt .
        |  FILTER (LANGMATCHES(LANG(?txt), "en")) }""".stripMargin)
    val want = t("documents").filter(lower(col("lang")) === "en")
    assert(got.count() == want.count() && got.count() > 0)
  }

  test("multi-source star unions per-source molecules (federation)") {
    import graft.mapping._
    val G = "urn:g:"
    val tmp = java.nio.file.Files.createTempDirectory("graft-fed").toString
    val cust = t("customer")
    cust.filter(col("c_custkey") % 2 === 0).write.mode("overwrite").parquet(s"$tmp/custA.parquet")
    cust.filter(col("c_custkey") % 2 === 1).write.mode("overwrite").parquet(s"$tmp/custB.parquet")
    def mol(tab: String, src: String) = Molecule(
      rdfType = s"${G}Customer", table = tab,
      subject = Template(s"${G}cust:{c_custkey}"),
      predicates = Map(s"${G}name" -> RefMap("c_name"),
        s"${G}mktsegment" -> RefMap("c_mktsegment")),
      source = src)
    val cat = Catalog(List(mol("custA", "srcA"), mol("custB", "srcB")))
    val fed = new Graft(cat, tab => spark.read.parquet(s"$tmp/$tab.parquet"))(spark)
    val got = fed.sparql(
      """PREFIX g: <urn:g:>
        |SELECT ?c ?n WHERE { ?c a g:Customer ; g:name ?n ; g:mktsegment "BUILDING" }""".stripMargin)
    val want = cust.filter(col("c_mktsegment") === "BUILDING")
    assert(got.count() == want.count() && got.count() > 0)
  }

  test("driver smoke gate: SparkEntry.entry returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val qs = graft.SparkEntry.queries.keySet
    val orphans = graft.SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("constant IRI subject inverts template to key equality") {
    val custkey = t("customer").select(min("c_custkey")).collect()(0).getLong(0)
    val got = g.sparql(
      s"""PREFIX g: <urn:g:>
         |SELECT ?name WHERE { <urn:g:cust:$custkey> g:name ?name ; g:acctbal ?b }
         |""".stripMargin)
    val want = t("customer").filter(col("c_custkey") === custkey)
    assert(got.count() == want.count())
    val pushed = got.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && got.count() == 1)
  }

  test("explain reports the decomposition and the formatted physical plan") {
    // the reference CLI's primary output (run_query.py): decomposition
    // with selected sources, then the operator plan, then timings
    val report = g.explain(
      """PREFIX g: <urn:g:>
        |SELECT ?cname ?total WHERE {
        |  ?c a g:Customer ; g:name ?cname .
        |  ?o g:customer ?c ; g:totalprice ?total .
        |}""".stripMargin)
    assert(report.contains("Decomposition (2 stars"), report.take(300))
    assert(report.contains("star 0: ?c") && report.contains("star 1: ?o"))
    assert(report.contains("customer@") && report.contains("orders@"))
    assert(report.contains("== Physical Plan =="))
    assert(report.contains("PushedFilters"), "formatted plan should show scans")
  }
}
