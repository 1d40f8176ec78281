package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Executes a Cypher statement (the subset emitted by
  * [[DocStoreTranslators.toCypher]]) against a property graph modeled as
  * DataFrames — what `neo4j/__init__.py:165-242` does by sending the
  * statement to a live Bolt session. The zero-egress bench has no Neo4j,
  * but a per-label node frame plus a typed edge frame *is* a property
  * graph for the clause semantics the translator emits, so executing
  * against it proves the translation computes the star: relationship
  * patterns become joins through the edge frame (the stored-edge traversal
  * a graph store performs natively), WHERE terms become filters, RETURN
  * items become projections. Every clause is one declarative transform —
  * the composed plan optimizes as a whole (a WHERE equality behind a
  * relationship hop still pushes to the node scan).
  *
  * Supported surface: `MATCH (v:Label)` roots, `MATCH (v)-[:rel]->(w:Label)`
  * hops, `WHERE a.c = "lit" AND b.c IS NOT NULL …`, `RETURN a.c AS x, …`,
  * `SKIP n`, `LIMIT m` — the translator's closed output grammar.
  */
object CypherGraph {

  /** Property-graph stand-in. Each node frame carries its label's property
    * columns plus a caller-chosen node-identity column named `_id`; the
    * edge frame is (rel, src, dst) over those identities. */
  final case class Graph(nodes: Map[String, DataFrame], edges: DataFrame)

  private val Root = """MATCH \((\w+):(\w+)\)""".r
  private val Hop  = """MATCH \((\w+)\)-\[:(\w+)\]->\((\w+):(\w+)\)""".r
  private val Eq      = """(\w+)\.(\w+) = "((?:[^"\\]|\\.)*)"""".r
  private val NotNull = """(\w+)\.(\w+) IS NOT NULL""".r
  private val Ret     = """(\w+)\.(\w+) AS (\w+)""".r

  def execute(g: Graph, cypher: String): DataFrame = {
    // clause split — the emitted grammar is positional:
    // MATCH …[, MATCH …]* [WHERE …] RETURN … [SKIP n] [LIMIT m]
    var rest = cypher.trim
    def chop(marker: String): Option[String] = {
      val i = rest.indexOf(marker)
      if (i < 0) None else { val tail = rest.substring(i + marker.length); rest = rest.substring(0, i); Some(tail) }
    }
    val limit  = chop(" LIMIT ").map(_.trim.toLong)
    val skip   = chop(" SKIP ").map(_.trim.toLong)
    val ret    = chop(" RETURN ").getOrElse(
      throw new IllegalArgumentException(s"no RETURN clause: $cypher"))
    val where  = chop(" WHERE ")
    val matches = rest.split(", (?=MATCH )").toList

    // node variable → frame with properties renamed v__prop (dots in
    // column names would fight the resolver); hops join through the edges
    def prefixed(v: String, label: String): DataFrame = {
      val n = g.nodes.getOrElse(label,
        throw new IllegalArgumentException(s"unknown node label $label"))
      n.select(n.columns.toSeq.map(c => n(c).as(s"${v}__$c")): _*)
    }
    var df: DataFrame = null
    matches.foreach {
      case Root(v, label) =>
        val node = prefixed(v, label)
        df = if (df == null) node else df.crossJoin(node)
      case Hop(src, rel, dst, label) =>
        require(df != null && df.columns.contains(s"${src}___id"),
          s"hop from unbound variable $src")
        val e = g.edges.filter(col("rel") === rel).select("src", "dst")
        df = df.join(e, col(s"${src}___id") === col("src"))
          .join(prefixed(dst, label), col("dst") === col(s"${dst}___id"))
          .drop("src", "dst")
      case other => throw new IllegalArgumentException(s"bad MATCH: $other")
    }

    def resolve(v: String, c: String): Column = col(s"${v}__$c")
    where.map(_.split(" AND ").toSeq).getOrElse(Nil).foreach {
      case Eq(v, c, lex)   =>
        df = df.filter(resolve(v, c).cast("string") ===
          lex.replace("\\\"", "\"").replace("\\\\", "\\"))
      case NotNull(v, c)   => df = df.filter(resolve(v, c).isNotNull)
      case other => throw new IllegalArgumentException(s"bad WHERE term: $other")
    }

    val items = ret.split(", ").toSeq.map {
      case Ret(v, c, as) => resolve(v, c).as(as)
      case other => throw new IllegalArgumentException(s"bad RETURN item: $other")
    }
    df = df.select(items: _*)
    skip.foreach(n => df = df.offset(n.toInt))
    limit.foreach(n => df = df.limit(n.toInt))
    df
  }
}
