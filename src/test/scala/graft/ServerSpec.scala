package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.api.{Graft, GraftServer, TpchCatalog}

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

/** `/sparql` + `/nextresult` service-layer contract (app/query.py parity):
  * blocking answers, incremental consumption to EOF, drained-session
  * signalling. */
class ServerSpec extends SparkTestBase {

  private lazy val g = Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)
  private val mapper = new ObjectMapper()

  private def get(url: String): com.fasterxml.jackson.databind.JsonNode = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
    mapper.readTree(body)
  }

  private def enc(s: String) = URLEncoder.encode(s, UTF_8)

  test("blocking /sparql returns all rows with vars and timings") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val q = """PREFIX g: <urn:g:> SELECT ?n WHERE {
                |  ?r a g:Region ; g:name ?n } ORDER BY ?n""".stripMargin
      val res = get(s"http://127.0.0.1:$port/sparql?query=${enc(q)}")
      assert(res.path("vars").get(0).asText() == "n")
      assert(res.path("totalRows").asInt() == 5)
      val names = (0 until 5).map(i => res.path("result").get(i).path("n").asText())
      assert(names == Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
      assert(res.path("execTime").asDouble() > 0)
    } finally server.stop()
  }

  test("non-blocking /sparql + /nextresult streams rows then EOF") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val q = "PREFIX g: <urn:g:> SELECT ?n WHERE { ?x a g:Nation ; g:name ?n }"
      val opened = get(s"http://127.0.0.1:$port/sparql?query=${enc(q)}&blocking=0")
      val id = opened.path("hashquery").asText()
      assert(id.nonEmpty && opened.path("totalRows").asInt() == -1)
      var rows = 0
      var eof = false
      while (!eof) {
        val r = get(s"http://127.0.0.1:$port/nextresult?id=$id")
        if (r.path("result").isTextual && r.path("result").asText() == "EOF") {
          eof = true
          assert(r.path("totalRows").asLong() == 25)
          assert(r.path("firstResult").asDouble() > 0)
        } else {
          rows += 1
          assert(r.path("result").path("n").asText().nonEmpty)
        }
      }
      assert(rows == 25)
      // drained session: the reference answers "Already finished"
      val done = get(s"http://127.0.0.1:$port/nextresult?id=$id")
      assert(done.path("error").asText() == "Already finished")
    } finally server.stop()
  }

  test("format=srj answers W3C sparql-results+json with typed terms") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val q = """PREFIX g: <urn:g:> SELECT ?r ?n WHERE {
                |  ?r a g:Region ; g:name ?n } ORDER BY ?n""".stripMargin
      val res = get(s"http://127.0.0.1:$port/sparql?query=${enc(q)}&format=srj")
      assert(res.path("head").path("vars").get(0).asText() == "r")
      val bindings = res.path("results").path("bindings")
      assert(bindings.size() == 5)
      assert(bindings.get(0).path("r").path("type").asText() == "uri")
      assert(bindings.get(0).path("n").path("type").asText() == "literal")
      assert(bindings.get(0).path("n").path("value").asText() == "AFRICA")
    } finally server.stop()
  }

  test("blocking mode streams chunked — a large SELECT never collects") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val q = "PREFIX g: <urn:g:> SELECT ?l ?qty WHERE { ?l a g:Lineitem ; g:quantity ?qty }"
      val conn = URI.create(s"http://127.0.0.1:$port/sparql?query=${enc(q)}")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("GET")
      // chunked transfer = rows left the driver incrementally, not as one
      // collected buffer (the response was produced from toLocalIterator)
      assert(conn.getHeaderField("Transfer-encoding") == "chunked")
      val res = mapper.readTree(conn.getInputStream)
      val expected = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      assert(res.path("totalRows").asLong() == expected)
      assert(res.path("result").size().toLong == expected)
    } finally server.stop()
  }

  test("empty and malformed queries answer with an error payload") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val none = get(s"http://127.0.0.1:$port/sparql")
      assert(none.path("error").asText() == "cannot read query")
      val bad = get(s"http://127.0.0.1:$port/sparql?query=${enc("SELECT nonsense (")}")
      assert(bad.has("error"))
    } finally server.stop()
  }

  test("format=csv and tsv stream W3C tabular results") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val q = """PREFIX g: <urn:g:>
                |SELECT ?r ?rname WHERE { ?r a g:Region ; g:name ?rname }
                |ORDER BY ?r""".stripMargin
      val csv = new String(URI.create(
        s"http://127.0.0.1:$port/sparql?query=${enc(q)}&format=csv")
        .toURL.openStream().readAllBytes(), "UTF-8")
      val csvLines = csv.split("\r\n").toSeq
      assert(csvLines.head == "r,rname")
      assert(csvLines.length == 6) // header + 5 regions
      assert(csvLines(1).startsWith("urn:g:region:")) // CSV: plain lexical form
      val tsvBody = new String(URI.create(
        s"http://127.0.0.1:$port/sparql?query=${enc(q)}&format=tsv")
        .toURL.openStream().readAllBytes(), "UTF-8")
      val tsvLines = tsvBody.split("\r\n").toSeq
      assert(tsvLines.head == "?r\t?rname")
      // TSV: SPARQL surface syntax — IRIs bracketed, strings quoted
      assert(tsvLines(1).matches("<urn:g:region:\\d+>\t\".*\""), tsvLines(1))
    } finally server.stop()
  }

  test("format=xml streams W3C sparql-results+xml") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val q = """PREFIX g: <urn:g:>
                |SELECT ?r ?rname WHERE { ?r a g:Region ; g:name ?rname }
                |ORDER BY ?r""".stripMargin
      val xml = new String(URI.create(
        s"http://127.0.0.1:$port/sparql?query=${enc(q)}&format=xml")
        .toURL.openStream().readAllBytes(), "UTF-8")
      assert(xml.startsWith("""<?xml version="1.0"?><sparql xmlns="http://www.w3.org/2005/sparql-results#">"""))
      assert(xml.contains("""<variable name="r"/><variable name="rname"/>"""))
      assert(xml.split("<result>").length == 6) // 5 regions
      assert(xml.contains("<uri>urn:g:region:"))
      assert(xml.contains("<literal>"))
      // well-formed enough for a real XML parser
      javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    } finally server.stop()
  }

  test("ASK answers the W3C boolean document; CONSTRUCT streams N-Triples") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val ask = get(s"http://127.0.0.1:$port/sparql?query=${
        enc("PREFIX g: <urn:g:> ASK { ?r a g:Region }")}&format=srj")
      assert(ask.path("boolean").asBoolean() && ask.has("head"))
      val askNo = get(s"http://127.0.0.1:$port/sparql?query=${
        enc("""PREFIX g: <urn:g:> ASK { ?r g:name "no such name" }""")}&format=srj")
      assert(!askNo.path("boolean").asBoolean())
      val nt = new String(URI.create(s"http://127.0.0.1:$port/sparql?query=${
        enc("""PREFIX g: <urn:g:>
              |CONSTRUCT { ?r g:label ?n } WHERE { ?r a g:Region ; g:name ?n }"""
          .stripMargin)}&format=nt").toURL.openStream().readAllBytes(), "UTF-8")
      val lines = nt.split("\n").toSeq
      assert(lines.length == 5)
      assert(lines.forall(_.matches("<urn:g:region:\\d+> <urn:g:label> \".*\" \\.")), lines.head)
    } finally server.stop()
  }

  test("ASK under XML is the boolean document; explicit format beats Accept") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val xml = new String(URI.create(s"http://127.0.0.1:$port/sparql?query=${
        enc("PREFIX g: <urn:g:> ASK { ?r a g:Region }")}&format=xml")
        .toURL.openStream().readAllBytes(), "UTF-8")
      assert(xml.contains("<boolean>true</boolean>") && !xml.contains("<results>"))
      // explicit format=srj wins over an XML Accept header
      val conn = URI.create(s"http://127.0.0.1:$port/sparql?query=${
        enc("PREFIX g: <urn:g:> SELECT ?n WHERE { ?n a g:Nation } LIMIT 1")}&format=srj")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestProperty("Accept", "application/sparql-results+xml")
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(conn.getHeaderField("Content-Type").contains("sparql-results+json"), body.take(80))
      assert(body.contains("\"bindings\""))
    } finally server.stop()
  }

  test("/explain reports decomposition and plan without executing") {
    val server = new GraftServer(g)
    val port = server.start()
    try {
      val q = """PREFIX g: <urn:g:>
                |SELECT ?name WHERE { ?c a g:Customer ; g:name ?name }""".stripMargin
      val res = get(s"http://127.0.0.1:$port/explain?query=${enc(q)}")
      val report = res.path("report").asText()
      assert(report.contains("Decomposition (1 stars"))
      assert(report.contains("customer@"))
      assert(report.contains("== Physical Plan =="))
      // explain must not count as a served query (federation tests rely
      // on queriesServed to pin dispatch strategies)
      assert(server.queriesServed.get() == 0)
    } finally server.stop()
  }
}
