package graft

import org.apache.spark.sql.functions._
import graft.api.{Graft, TpchCatalog}

/** Cross-cutting SPARQL semantics invariants (the ScalaCheck-style laws of
  * FIXTURES.md: join/union counts, OPTIONAL ⊇ inner, DISTINCT idempotence,
  * EBV corner cases per Xfilter.py:203-243). */
class SemanticsSpec extends SparkTestBase {

  lazy val g: Graft = Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)

  private def n(q: String): Long = g.sparql(q).count()

  test("OPTIONAL is a superset of the inner join, padded to left cardinality") {
    val left = n("PREFIX g: <urn:g:> SELECT ?c WHERE { ?c a g:Customer }")
    val inner = n(
      """PREFIX g: <urn:g:> SELECT ?c ?o WHERE {
        |  ?c a g:Customer . ?o g:customer ?c }""".stripMargin)
    val opt = n(
      """PREFIX g: <urn:g:> SELECT ?c ?o WHERE {
        |  ?c a g:Customer . OPTIONAL { ?o g:customer ?c } }""".stripMargin)
    assert(opt >= inner && opt >= left)
    val unmatched = n(
      """PREFIX g: <urn:g:> SELECT ?c WHERE {
        |  ?c a g:Customer . OPTIONAL { ?o g:customer ?c } FILTER (!BOUND(?o)) }""".stripMargin)
    assert(inner + unmatched == opt)
  }

  test("UNION count is the sum of branches (bag semantics)") {
    val a = n("PREFIX g: <urn:g:> SELECT ?x WHERE { ?x a g:Customer }")
    val b = n("PREFIX g: <urn:g:> SELECT ?x WHERE { ?x a g:Supplier }")
    val u = n(
      """PREFIX g: <urn:g:> SELECT ?x WHERE {
        |  { ?x a g:Customer } UNION { ?x a g:Supplier } }""".stripMargin)
    assert(u == a + b)
  }

  test("DISTINCT is idempotent and join order is irrelevant") {
    val q1 = g.sparql(
      """PREFIX g: <urn:g:> SELECT DISTINCT ?seg WHERE { ?c g:mktsegment ?seg }""")
    assert(q1.count() == q1.distinct().count())
    val ab = n(
      """PREFIX g: <urn:g:> SELECT ?c ?o WHERE {
        |  ?c a g:Customer . ?o g:customer ?c }""".stripMargin)
    val ba = n(
      """PREFIX g: <urn:g:> SELECT ?c ?o WHERE {
        |  ?o g:customer ?c . ?c a g:Customer }""".stripMargin)
    assert(ab == ba)
  }

  test("EBV: type-mismatch comparisons are errors ⇒ false, not crashes") {
    // string column compared to a number: Spark casts, non-numeric ⇒ null ⇒ dropped
    assert(n(
      """PREFIX g: <urn:g:> SELECT ?n WHERE {
        |  ?c a g:Customer ; g:name ?n . FILTER (?n > 5) }""".stripMargin) == 0)
    // numeric-string promotion works ("100" compared against acctbal)
    val cnt = n(
      """PREFIX g: <urn:g:> SELECT ?b WHERE {
        |  ?c a g:Customer ; g:acctbal ?b . FILTER (?b > "100") }""".stripMargin)
    val want = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_acctbal") > 100).count()
    assert(cnt == want)
  }

  test("EBV: bare variable filter coerces by type") {
    // numeric: non-zero ⇒ true
    val nonZero = n(
      """PREFIX g: <urn:g:> SELECT ?b WHERE {
        |  ?c a g:Customer ; g:acctbal ?b . FILTER (?b) }""".stripMargin)
    val want = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_acctbal") =!= 0).count()
    assert(nonZero == want)
    // string: non-empty ⇒ true
    val nonEmpty = n(
      """PREFIX g: <urn:g:> SELECT ?s WHERE {
        |  ?c a g:Customer ; g:mktsegment ?s . FILTER (?s) }""".stripMargin)
    assert(nonEmpty == spark.read.parquet(s"$sfDir/customer.parquet").count())
  }

  test("arithmetic and boolean connectives in FILTER") {
    val cnt = n(
      """PREFIX g: <urn:g:> SELECT ?b WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  FILTER (?b * 2 > 1000 && !(?b < 0) || ?b = 0) }""".stripMargin)
    val df = spark.read.parquet(s"$sfDir/customer.parquet")
    val want = df.filter((col("c_acctbal") * 2 > 1000 && !(col("c_acctbal") < 0)) ||
      col("c_acctbal") === 0).count()
    assert(cnt == want)
  }
  test("property path: alternation without closure unions the edge sets") {
    val alt = n("""PREFIX g: <urn:g:>
      SELECT ?x ?y WHERE { ?x (g:nation|g:region) ?y }""")
    val nation = n("PREFIX g: <urn:g:> SELECT ?x ?y WHERE { ?x g:nation ?y }")
    val region = n("PREFIX g: <urn:g:> SELECT ?x ?y WHERE { ?x g:region ?y }")
    assert(alt == nation + region)
  }

  test("property path: + closure adds exactly the two-hop pairs here") {
    val plus = n("""PREFIX g: <urn:g:>
      SELECT ?x ?y WHERE { ?x (g:nation|g:region)+ ?y }""")
    val oneHop = n("""PREFIX g: <urn:g:>
      SELECT ?x ?y WHERE { ?x (g:nation|g:region) ?y }""")
    val twoHop = n("""PREFIX g: <urn:g:>
      SELECT ?x ?y WHERE { ?x g:nation/g:region ?y }""")
    assert(plus == oneHop + twoHop) // chain depth 2: nothing deeper exists
  }

  test("property path: * adds zero-length pairs over the edge-graph nodes") {
    val star = n("""PREFIX g: <urn:g:>
      SELECT ?x ?y WHERE { ?x (g:region)* ?y }""")
    val plus = n("""PREFIX g: <urn:g:>
      SELECT ?x ?y WHERE { ?x (g:region)+ ?y }""")
    // nodes = 25 nations + 5 regions; each contributes one (v,v) pair
    assert(star == plus + 30)
  }

  test("property path: constant endpoint filters the closure") {
    val df = g.sparql("""PREFIX g: <urn:g:>
      SELECT ?x WHERE { ?x (g:nation|g:region)+ <urn:g:region:0> }""")
    assert(df.columns.toSeq == Seq("x"))
    val rows = df.collect().map(_.getString(0))
    assert(rows.exists(_.startsWith("urn:g:nation:")))
    assert(rows.exists(_.startsWith("urn:g:cust:")))
  }

  test("varpred probe joined with constant-predicate star triples") {
    val df = g.sparql("""PREFIX g: <urn:g:>
      SELECT ?c ?p ?o WHERE { ?c a g:Customer ; g:mktsegment "BUILDING" ; ?p ?o }""")
    val perCust = df.groupBy("c").count().select("count").distinct().collect()
    assert(perCust.map(_.getLong(0)).toSet == Set(5L)) // 4 predicates + rdf:type
    val building = n("""PREFIX g: <urn:g:>
      SELECT ?c WHERE { ?c a g:Customer ; g:mktsegment "BUILDING" }""")
    assert(df.count() == building * 5)
  }

  // ---- W3C conformance edges (round 5): the reference never executes
  // these (no sort operator, filter scope handled per-wrapper), so the
  // engine owns the spec semantics outright.

  test("OPTIONAL filter referencing an outer var keeps rejected rows unmatched") {
    // W3C §18.2.2.6 / §18.5 LeftJoin(Ω1, Ω2, F): F joins the merged
    // bindings; a customer whose every order fails F must still appear,
    // null-padded — a post-join filter would drop it instead.
    val df = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?c ?o WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  OPTIONAL { ?o g:customer ?c ; g:totalprice ?tp . FILTER (?tp > ?b * 40) }
        |}""".stripMargin)
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val pairs = cust.join(ord, col("c_custkey") === col("o_custkey"))
      .filter(col("o_totalprice") > col("c_acctbal") * 40)
    val matchedCust = pairs.select("c_custkey").distinct().count()
    val nCust = cust.count()
    // every customer appears; matched ones once per surviving order,
    // filter-rejected and orderless ones exactly once with null ?o
    assert(df.select("c").distinct().count() == nCust)
    assert(df.filter(col("o").isNull).count() == nCust - matchedCust)
    assert(df.count() == pairs.count() + (nCust - matchedCust))
    // the condition really bites: some customer has orders but none passing
    val withOrders = ord.select(col("o_custkey")).distinct().count()
    assert(matchedCust < withOrders)
  }

  test("OPTIONAL filter over inner vars only pads failures (fast path)") {
    val df = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?c ?o WHERE {
        |  ?c a g:Customer .
        |  OPTIONAL { ?o g:customer ?c ; g:totalprice ?tp . FILTER (?tp > 150000) }
        |}""".stripMargin)
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 150000)
    val matchedCust = ord.select("o_custkey").distinct()
      .join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(df.select("c").distinct().count() == cust.count())
    assert(df.filter(col("o").isNull).count() == cust.count() - matchedCust)
  }

  test("FILTER in a nested group inside OPTIONAL scopes to that group") {
    // bottom-up semantics: inside `{ ?o g:customer ?c . FILTER(?b > 0) }`
    // the var ?b is unbound ⇒ type error ⇒ false ⇒ the nested group is
    // empty ⇒ every customer surfaces unmatched. Hoisting the filter to
    // the LeftJoin condition (the top-level treatment) would instead let
    // positive-balance customers match — the two placements must differ.
    val nested = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?c ?o WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  OPTIONAL { { ?o g:customer ?c . FILTER (?b > 0) } }
        |}""".stripMargin)
    val nCust = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(nested.count() == nCust)
    assert(nested.filter(col("o").isNotNull).count() == 0)
    val hoisted = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?c ?o WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  OPTIONAL { ?o g:customer ?c . FILTER (?b > 0) }
        |}""".stripMargin)
    assert(hoisted.filter(col("o").isNotNull).count() > 0)
  }

  test("UNION preserves duplicate solutions across identical branches") {
    val once = n("PREFIX g: <urn:g:> SELECT ?x WHERE { ?x a g:Region }")
    val twice = n(
      """PREFIX g: <urn:g:> SELECT ?x WHERE {
        |  { ?x a g:Region } UNION { ?x a g:Region } }""".stripMargin)
    assert(twice == 2 * once && once > 0)
  }

  test("ORDER BY ranks term kinds: IRIs before literals, unbound first") {
    // a var bound to IRIs in one UNION branch and plain literals in the
    // other: §15.1 orders IRI < literal regardless of codepoints
    val df = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?k WHERE {
        |  { ?r a g:Region . BIND (STR(?r) AS ?k) }
        |  UNION { ?r a g:Region ; g:name ?n . BIND (STR(?n) AS ?k) }
        |} ORDER BY ?k""".stripMargin)
    val ks = df.collect().map(_.getString(0)).toSeq
    val (iris, lits) = ks.partition(_.startsWith("urn:"))
    assert(iris.nonEmpty && lits.nonEmpty)
    assert(ks == iris ++ lits, s"IRIs must sort before literals: $ks")
    // unbound (OPTIONAL miss) sorts first ASC, last DESC
    val asc = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?nm WHERE {
        |  ?n a g:Nation . OPTIONAL { ?c g:nation ?n ; g:name ?nm .
        |    FILTER (CONTAINS(?nm, "0000001")) }
        |} ORDER BY ?nm""".stripMargin).collect().map(_.getString(0))
    assert(asc.takeWhile(_ == null).nonEmpty && asc.dropWhile(_ == null).forall(_ != null))
    val desc = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?nm WHERE {
        |  ?n a g:Nation . OPTIONAL { ?c g:nation ?n ; g:name ?nm .
        |    FILTER (CONTAINS(?nm, "0000001")) }
        |} ORDER BY DESC(?nm)""".stripMargin).collect().map(_.getString(0))
    assert(desc.reverse.takeWhile(_ == null).nonEmpty &&
      desc.reverse.dropWhile(_ == null).forall(_ != null))
  }

  test("ORDER BY on a numeric var sorts numerically, not lexically") {
    val keys = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?b WHERE { ?c a g:Customer ; g:acctbal ?b }
        |ORDER BY ?b""".stripMargin)
      .collect().map(_.getDouble(0)).toSeq
    assert(keys == keys.sorted)
    // negatives exist, so a lexical sort ("-1…" < "-9…") would misorder
    assert(keys.head < 0 && keys.last > 0)
  }

  test("correlated FILTER EXISTS joins the probe on the outer bindings") {
    // §18.6 substitution: the probe's filter sees the outer solution —
    // customers with at least one order priced above 40× their balance
    val semi = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?c WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  FILTER EXISTS { ?o g:customer ?c ; g:totalprice ?tp .
        |                  FILTER (?tp > ?b * 40) } }""".stripMargin)
    val anti = g.sparql(
      """PREFIX g: <urn:g:> SELECT ?c WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  FILTER NOT EXISTS { ?o g:customer ?c ; g:totalprice ?tp .
        |                      FILTER (?tp > ?b * 40) } }""".stripMargin)
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val want = cust.join(ord, col("c_custkey") === col("o_custkey"))
      .filter(col("o_totalprice") > col("c_acctbal") * 40)
      .select("c_custkey").distinct().count()
    assert(semi.count() == want && want > 0)
    assert(anti.count() == cust.count() - want)
    // without correlation the same filter would be an unbound-var error
    // (false for every probe row) ⇒ EXISTS would keep nobody
    assert(semi.count() < cust.count())
  }

  test("MINUS does NOT substitute outer bindings (EXISTS/MINUS asymmetry)") {
    // §8.3.3: unlike EXISTS, MINUS evaluates its pattern without the outer
    // solution — a filter referencing an outer var is an unbound-var error
    // (false), the MINUS side is empty, and nothing is removed
    val minus = n(
      """PREFIX g: <urn:g:> SELECT ?c WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  MINUS { ?o g:customer ?c . FILTER (?b > -999999) } }""".stripMargin)
    val all = n("PREFIX g: <urn:g:> SELECT ?c WHERE { ?c a g:Customer }")
    assert(minus == all)
    // the same shape under NOT EXISTS is correlated: the filter is
    // always true there, so customers WITH orders are removed
    val notEx = n(
      """PREFIX g: <urn:g:> SELECT ?c WHERE {
        |  ?c a g:Customer ; g:acctbal ?b .
        |  FILTER NOT EXISTS { ?o g:customer ?c . FILTER (?b > -999999) } }""".stripMargin)
    assert(notEx < all)
  }

  test("term constructors IRI/STRDT/STRLANG and query-constant NOW()") {
    val df = g.sparql(
      """PREFIX g: <urn:g:> PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT ?u ?d ?l ?now WHERE {
        |  ?r a g:Region ; g:name ?n .
        |  BIND (IRI(CONCAT("urn:g:x:", ?n)) AS ?u)
        |  BIND (STRDT("5", xsd:string) AS ?d)
        |  BIND (STRLANG("chat", "fr") AS ?l)
        |  BIND (NOW() AS ?now) }""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getString(0).startsWith("urn:g:x:")))
    assert(rows.map(_.getString(0)).distinct.length == 5)
    assert(rows.forall(r => r.getString(1) == "5" && r.getString(2) == "chat"))
    // §17.4.5.1: one NOW() value for the whole query
    assert(rows.map(_.getTimestamp(3)).distinct.length == 1)
  }

  test("HAVING accepts DISTINCT aggregates") {
    val df = g.sparql("""PREFIX g: <urn:g:>
      SELECT ?o (COUNT(DISTINCT ?p) AS ?np) WHERE {
        ?l a g:Lineitem ; g:order ?o ; g:part ?p .
      } GROUP BY ?o HAVING (COUNT(DISTINCT ?p) > 5)""")
    assert(df.collect().forall(_.getLong(1) > 5))
  }

  test("COALESCE falls through an OPTIONAL-unbound var (§17.4.1.5)") {
    // customers without a matching order: ?tp is unbound, COALESCE must
    // yield the fallback instead of erroring or binding null
    val rows = g.sparql("""PREFIX g: <urn:g:>
      SELECT ?c (COALESCE(?tp, -1) AS ?price) WHERE {
        ?c a g:Customer .
        OPTIONAL { ?o g:customer ?c ; g:totalprice ?tp . FILTER (?tp > 1e18) }
      }""").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.isNullAt(1)))
    assert(rows.forall(_.getAs[Any]("price").toString.toDouble == -1.0))
  }

  test("GROUP_CONCAT default separator is a single space (§18.5.1.7)") {
    val got = g.sparql("""PREFIX g: <urn:g:>
      SELECT (GROUP_CONCAT(?n) AS ?all) WHERE { ?r a g:Region ; g:name ?n }""")
      .collect()(0).getString(0)
    val custom = g.sparql("""PREFIX g: <urn:g:>
      SELECT (GROUP_CONCAT(?n; SEPARATOR="|") AS ?all) WHERE {
        ?r a g:Region ; g:name ?n }""").collect()(0).getString(0)
    assert(custom.split("\\|").length == 5, custom)
    // identical contents, the default separator being the single space
    // (region names may themselves contain spaces, so compare via the
    // unambiguous custom-separator form)
    assert(got == custom.replace("|", " "), s"$got vs $custom")
  }

  test("BOUND distinguishes OPTIONAL hits from misses (§17.4.1.1)") {
    val rows = g.sparql("""PREFIX g: <urn:g:>
      SELECT ?c (IF(BOUND(?tp), 1, 0) AS ?hit) WHERE {
        ?c a g:Customer ; g:mktsegment "BUILDING" .
        OPTIONAL { ?o g:customer ?c ; g:totalprice ?tp . FILTER (?tp > 400000) }
      }""").collect().map(_.getAs[Number](1).intValue())
    assert(rows.toSet == Set(0, 1), "fixture has both matched and unmatched customers")
  }
}
