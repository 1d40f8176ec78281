package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.Row

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** HTTP service layer — the Spark-native rebuild of the reference's Flask
  * app (`/root/reference/app/query.py`): `GET|POST /sparql?query=…&blocking=
  * 0|1` answers a SPARQL query, and with `blocking=0` registers an
  * incremental session (keyed by the md5 of the query, `query.py:100`)
  * whose rows are consumed one at a time via `/nextresult?id=…`
  * (`query.py:49-81`), ending with `result:"EOF"` and, once drained,
  * `error:"Already finished"` — the same consumption contract
  * [[Experiment]] implements for the dief@t metrics.
  *
  * Incremental rows come from `toLocalIterator` — partitions stream to the
  * driver on demand, so a non-blocking session never materializes the full
  * result. The server binds loopback (a serving tier would front this with
  * a real gateway; the query engine itself is the point here).
  */
final class GraftServer(g: Graft, port: Int = 0,
                        /** idle sessions are reaped after this long — an
                          * abandoned `blocking=0` client must not pin its
                          * partially-consumed iterator forever */
                        sessionTtlMillis: Long = 600000L) {

  private final class Session(val vars: Seq[String], val it: Iterator[Row],
                              val start: Long) {
    @volatile var first: Double = -1.0
    @volatile var served: Long = 0L
    @volatile var lastAccess: Long = System.currentTimeMillis()
  }

  private val sessions = new ConcurrentHashMap[String, Session]()

  /** Drop sessions idle past the TTL; returns how many were reaped.
    * Exposed for tests; also runs on a daemon timer. */
  def sweepIdleSessions(now: Long = System.currentTimeMillis()): Int = {
    var reaped = 0
    sessions.forEach { (k, s) =>
      if (now - s.lastAccess > sessionTtlMillis && sessions.remove(k, s)) reaped += 1
    }
    reaped
  }

  private val sweeper = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
    (r: Runnable) => { val t = new Thread(r, "graft-session-sweeper"); t.setDaemon(true); t })
  sweeper.scheduleWithFixedDelay(() => sweepIdleSessions(),
    sessionTtlMillis, math.max(sessionTtlMillis / 4, 1000L),
    java.util.concurrent.TimeUnit.MILLISECONDS)
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/sparql", (ex: HttpExchange) => safely(ex) { params =>
    val query = params.getOrElse("query", "")
    if (query.isEmpty) Map("result" -> Seq.empty, "error" -> "cannot read query")
    else {
      val blocking = params.getOrElse("blocking", "1") == "1"
      val start = System.nanoTime()
      val df = g.sparql(query)
      val vars = df.columns.toSeq
      if (blocking) {
        val rows = df.collect()
        val total = secondsSince(start)
        Map("vars" -> vars, "result" -> rows.toSeq.map(rowMap(vars, _)),
          "execTime" -> total, "firstResult" -> total,
          "totalRows" -> rows.length)
      } else {
        val id = md5(query)
        // duplicate hashquery (same query text re-registered): the reference
        // silently overwrote and leaked the first client's session
        // (`query.py:100`) — we replace explicitly so the old iterator is
        // released for GC rather than pinned in the map
        val prev = sessions.put(id, new Session(vars, df.toLocalIterator().asScala, start))
        val replaced = prev != null
        Map("vars" -> vars, "hashquery" -> id, "result" -> Seq.empty,
          "execTime" -> secondsSince(start), "totalRows" -> -1,
          "replacedSession" -> replaced)
      }
    }
  })

  server.createContext("/nextresult", (ex: HttpExchange) => safely(ex) { params =>
    val id = params.getOrElse("id", "")
    Option(sessions.get(id)) match {
      case None =>
        Map("result" -> "EOF", "totalRows" -> 1, "error" -> "Already finished")
      case Some(s) =>
        s.lastAccess = System.currentTimeMillis()
        if (s.it.hasNext) {
          val row = rowMap(s.vars, s.it.next())
          if (s.first < 0) s.first = secondsSince(s.start)
          s.served += 1
          Map("vars" -> s.vars, "result" -> row,
            "execTime" -> secondsSince(s.start), "firstResult" -> s.first,
            "totalRows" -> s.served)
        } else {
          sessions.remove(id)
          Map("vars" -> s.vars, "result" -> "EOF",
            "execTime" -> secondsSince(s.start), "firstResult" -> s.first,
            "totalRows" -> s.served)
        }
    }
  })

  /** Start serving; returns the bound port (ephemeral when constructed
    * with port 0). */
  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = { sweeper.shutdownNow(); server.stop(0) }

  // ---- plumbing -------------------------------------------------------------

  private def secondsSince(startNanos: Long): Double =
    (System.nanoTime() - startNanos) / 1e9

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  private def rowMap(vars: Seq[String], r: Row): Map[String, Any] =
    vars.zipWithIndex.map { case (v, i) =>
      v -> (r.get(i) match {
        case null => null
        case x @ (_: String | _: java.lang.Boolean | _: java.lang.Number) => x
        case other => other.toString // dates, decimals, arrays → lexical form
      })
    }.toMap

  /** GET query string and/or form-encoded POST body → params; answer JSON. */
  private def safely(ex: HttpExchange)(f: Map[String, String] => Map[String, Any]): Unit = {
    val out =
      try {
        val fromUrl = parseParams(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
        val fromBody =
          if (ex.getRequestMethod == "POST")
            parseParams(new String(ex.getRequestBody.readAllBytes(), UTF_8))
          else Map.empty[String, String]
        f(fromUrl ++ fromBody)
      } catch {
        case e: Throwable => Map("result" -> Seq.empty, "error" -> e.getMessage)
      }
    val bytes = mapper.writeValueAsBytes(toJava(out))
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def parseParams(raw: String): Map[String, String] =
    raw.split('&').toSeq.filter(_.contains('=')).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8)
    }.toMap

  private def toJava(x: Any): Any = x match {
    case m: Map[_, _] => m.map { case (k, v) => k.toString -> toJava(v) }.asJava
    case s: Seq[_]    => s.map(toJava).asJava
    case other        => other
  }
}
