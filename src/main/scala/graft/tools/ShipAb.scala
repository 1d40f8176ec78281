package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.{Graft, GraftServer, TpchCatalog}
import graft.mapping.{Catalog, EndpointCatalogGen}

/** A/B measurement for endpoint query dispatch (SCALE.md evidence):
  * the same query answered over a loopback SPARQL endpoint with
  * (a) per-concept DSv2 scans + local compute vs (b) whole-query dispatch
  * ([[graft.compiler.QueryShip]]). Reports wall time AND the two honest
  * transfer metrics a shared-host loopback can give: queries served by the
  * endpoint and rows serialized over the wire (the server counts both).
  *
  * Usage: runMain graft.tools.ShipAb [sfDir] — defaults to sf0.1.
  */
object ShipAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // customer/orders only: both are row-keyed (unique subject templates)
    // in the synthetic lake, so the row-view truth and the triple view
    // agree and local-vs-shipped answers are comparable (lineitem's
    // subject template collides — see Probed.subjectCollisions — which
    // makes its star answers semantics-dependent, not a fair A/B)
    val types = Set("urn:g:Customer", "urn:g:Order")
    val inner = Graft.overParquetDir(Catalog(
      TpchCatalog.catalog.molecules.filter(m => types.contains(m.rdfType))),
      sfDir)
    val server = new GraftServer(inner)
    val port = server.start()
    val url = s"http://127.0.0.1:$port/sparql"

    val agg =
      """PREFIX g: <urn:g:>
        |SELECT ?pri (COUNT(*) AS ?cnt) (SUM(?tp) AS ?sum_tp) WHERE {
        |  ?o a g:Order ; g:orderpriority ?pri ; g:totalprice ?tp .
        |} GROUP BY ?pri ORDER BY ?pri""".stripMargin
    val join =
      """PREFIX g: <urn:g:>
        |SELECT ?o ?cname ?tp WHERE {
        |  ?c a g:Customer ; g:name ?cname ; g:mktsegment "BUILDING" .
        |  ?o g:customer ?c ; g:totalprice ?tp .
        |} ORDER BY ?o""".stripMargin
    val topk =
      """PREFIX g: <urn:g:>
        |SELECT ?o ?tp WHERE {
        |  ?o a g:Order ; g:totalprice ?tp .
        |} ORDER BY DESC(?tp) ?o LIMIT 20""".stripMargin

    // maxPartitions=4 leaves loopback slots free under local[8] — a
    // deployed endpoint brings its own compute, the cap is harness honesty
    def grafts() = (
      Graft.overSparqlEndpoint(url,
        EndpointCatalogGen.EndpointOptions(maxPartitions = 4)),
      Graft.overSparqlEndpoint(url,
        EndpointCatalogGen.EndpointOptions(maxPartitions = 4,
          shipWholeQuery = true)))
    val (local, shipped) = grafts()

    def run(name: String, g: Graft, q: String): Unit = {
      // one warm compile pass so probe costs never pollute the timing
      val df = g.sparql(q)
      val t0 = System.nanoTime()
      val q0 = server.queriesServed.get()
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-14s rows=$n%-8d wall=$dt%6.2fs endpointQueries=${server.queriesServed.get() - q0}")
    }

    for ((qn, q) <- Seq("agg" -> agg, "join" -> join, "topk" -> topk)) {
      run(s"$qn/local", local, q)
      run(s"$qn/shipped", shipped, q)
    }

    // ---- the COST-BASED router's own picks (RoutePlanner, r15) ------------
    // each query runs under shipPolicy=Auto and reports which route the
    // transfer estimates chose — the flip (agg/topk ship, the selective
    // join stays local) is the measured counterpart of the A/B above
    val auto = Graft.overSparqlEndpoint(url,
      EndpointCatalogGen.EndpointOptions(maxPartitions = 4,
        shipPolicy = EndpointCatalogGen.ShipPolicy.Auto))
    for ((qn, q) <- Seq("agg" -> agg, "join" -> join, "topk" -> topk)) {
      run(s"$qn/auto", auto, q)
      val route = auto.explain(q).linesIterator
        .find(_.startsWith("Dispatch:")).getOrElse("Dispatch: ?")
      println(s"  $qn/auto picked: ${route.stripPrefix("Dispatch: ")}")
    }
    // ---- bind-join window A/B: the reference's fixed 20 vs adaptive -------
    // a LOCAL selective build (BUILDING customers) bind-joins a SERVICE
    // star (their orders): every distinct key travels as a VALUES
    // constant either way, so the ONLY difference is how many remote
    // round trips carry them — the fixed window pays ceil(n/20), the
    // adaptive one batches at the page-filling width (one request per
    // ~2500 keys). endpointQueries is the honest loopback metric.
    val custLocal = Graft.overParquetDir(Catalog(
      TpchCatalog.catalog.molecules.filter(_.rdfType == "urn:g:Customer")),
      sfDir)
    val bindQ =
      s"""PREFIX g: <urn:g:>
         |SELECT ?c ?o ?tp WHERE {
         |  ?c a g:Customer ; g:mktsegment "BUILDING" .
         |  SERVICE <$url> { ?o g:customer ?c ; g:totalprice ?tp }
         |} ORDER BY ?o""".stripMargin
    // 4 concurrent fetches leave loopback slots free under local[8] —
    // the same harness-honesty cap as maxPartitions above. The SERVICE
    // fetch runs at COMPILE time (the bind join materializes its
    // LocalRelation), so this runner times sparql()+count together,
    // unlike `run` above whose warm pass would absorb the fetch.
    spark.conf.set("graft.service.bindJoin.maxConcurrentFetch", "4")
    for (w <- Seq("20", "auto")) {
      spark.conf.set("graft.service.bindJoin.window", w)
      val t0 = System.nanoTime()
      val q0 = server.queriesServed.get()
      val n = custLocal.sparql(bindQ).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"bind/win=$w%-6s rows=$n%-8d wall=$dt%6.2fs " +
        s"endpointQueries=${server.queriesServed.get() - q0}")
    }
    spark.conf.unset("graft.service.bindJoin.window")
    spark.conf.unset("graft.service.bindJoin.maxConcurrentFetch")
    server.stop()

    // ---- federation: exclusive-PATTERN dispatch (OPTIONAL / UNION) --------
    // customer on A; nation+region on B. The B-exclusive OPTIONAL/UNION
    // ships whole under the pattern rung; per-concept otherwise. B's
    // request counter is the transfer metric.
    def scoped(ts: Set[String]) = Graft.overParquetDir(Catalog(
      TpchCatalog.catalog.molecules.filter(m => ts.contains(m.rdfType))),
      sfDir)
    val srvA = new GraftServer(scoped(Set("urn:g:Customer")))
    val srvB = new GraftServer(scoped(Set("urn:g:Nation", "urn:g:Region")))
    val pa = srvA.start(); val pb = srvB.start()
    val eps = Seq(s"http://127.0.0.1:$pa/sparql", s"http://127.0.0.1:$pb/sparql")
    val fedLocal = Graft.overSparqlEndpoints(eps,
      EndpointCatalogGen.EndpointOptions(maxPartitions = 4))
    val fedShip = Graft.overSparqlEndpoints(eps,
      EndpointCatalogGen.EndpointOptions(maxPartitions = 4,
        shipWholeQuery = true))
    val optional =
      """PREFIX g: <urn:g:>
        |SELECT ?c ?nname ?rname WHERE {
        |  ?c a g:Customer ; g:nation ?n .
        |  { ?n a g:Nation ; g:name ?nname .
        |    OPTIONAL { ?n g:region ?r . ?r a g:Region ; g:name ?rname
        |               FILTER (CONTAINS(?rname, "A")) } }
        |} ORDER BY ?c""".stripMargin
    val union =
      """PREFIX g: <urn:g:>
        |SELECT ?x WHERE {
        |  { ?n a g:Nation ; g:name ?x } UNION { ?r a g:Region ; g:name ?x }
        |} ORDER BY ?x""".stripMargin
    def runFed(name: String, g: Graft, q: String): Unit = {
      val df = g.sparql(q)
      val t0 = System.nanoTime()
      val b0 = srvB.queriesServed.get()
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-18s rows=$n%-8d wall=$dt%6.2fs endpointB_queries=${srvB.queriesServed.get() - b0}")
    }
    for ((qn, q) <- Seq("optional" -> optional, "union" -> union)) {
      runFed(s"$qn/per-concept", fedLocal, q)
      runFed(s"$qn/pattern-ship", fedShip, q)
    }
    srvA.stop(); srvB.stop()
    spark.stop()
    // the JDK HttpServer's dispatcher thread is non-daemon and can
    // outlive stop() — flush and exit explicitly so a harness reading
    // this tool's stdout never loses the buffered tail waiting on a
    // JVM that will not die on its own
    System.out.flush()
    sys.exit(0)
  }
}
