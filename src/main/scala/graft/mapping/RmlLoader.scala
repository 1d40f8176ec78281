package graft.mapping

import scala.util.parsing.combinator.RegexParsers

/** RML mapping loader: Turtle subset → [[Catalog]].
  *
  * The reference loads RML `.ttl` mapping files with rdflib + SPARQL
  * (`/root/reference/ontario/config/__init__.py:125-249` query_rml); here a
  * small Turtle parser reads the same files directly. Supported surface is
  * exactly what the reference's mappings use (demo/mappings): @prefix,
  * predicate-object lists with `;`/`,`, blank-node property lists for
  * rml:logicalSource / rr:subjectMap / rr:predicateObjectMap / rr:objectMap,
  * string literals and IRIs.
  */
object RmlLoader {

  private val RR = "http://www.w3.org/ns/r2rml#"
  private val RML = "http://semweb.mmlab.be/ns/rml#"

  sealed trait Node
  final case class NIri(v: String) extends Node
  final case class NLit(v: String) extends Node
  final case class NBnode(id: Int) extends Node

  final case class TTriple(s: Node, p: String, o: Node)

  private class TurtleParser extends RegexParsers {
    override val whiteSpace = """(\s|#[^\n]*)+""".r
    private var prefixes = Map[String, String]()
    private var bnodeCounter = 0
    val triples = scala.collection.mutable.ListBuffer[TTriple]()

    def iriRef: Parser[String] = "<" ~> """[^<>\s]*""".r <~ ">"
    def pname: Parser[String] =
      """[A-Za-z][A-Za-z0-9_.\-]*:[A-Za-z0-9_.\-]*""".r ^? (Function.unlift { s =>
        val i = s.indexOf(':')
        prefixes.get(s.substring(0, i)).map(_ + s.substring(i + 1))
      }, s => s"unknown prefix in '$s'") |
      ":" ~> """[A-Za-z0-9_.\-]+""".r ^? (Function.unlift { local =>
        prefixes.get("").map(_ + local)
      }, _ => "unknown default prefix")
    def iri: Parser[NIri] = (iriRef | pname) ^^ NIri.apply

    def stringLit: Parser[NLit] =
      ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ (s => NLit(s.substring(1, s.length - 1)))

    def obj: Parser[Node] = iri | stringLit | blankNode

    def blankNode: Parser[Node] = "[" ~> poList <~ "]" ^^ { pos =>
      bnodeCounter += 1
      val b = NBnode(bnodeCounter)
      pos.foreach { case (p, o) => triples += TTriple(b, p, o) }
      b
    }

    def verb: Parser[String] = "a" ^^ (_ =>
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type") | (iriRef | pname)

    def poList: Parser[List[(String, Node)]] =
      rep1sep(verb ~ rep1sep(obj, ","), ";") ^^ (
        _.flatMap { case v ~ os => os.map(o => (v, o)) })

    def prefixDecl: Parser[Unit] =
      "@prefix" ~> ("""[A-Za-z][A-Za-z0-9_.\-]*""".r ~ (":" ~> iriRef) ^^ { case ns ~ i =>
        prefixes += ns -> i
      } | ":" ~> iriRef ^^ { i => prefixes += "" -> i }) <~ "." ^^ (_ => ())

    def stmt: Parser[Unit] =
      prefixDecl |
      (iri | blankNode) ~ poList <~ "." ^^ { case s ~ pos =>
        pos.foreach { case (p, o) => triples += TTriple(s, p, o) }
      }

    def doc: Parser[Unit] = rep(stmt) ^^ (_ => ())
  }

  /** Parse a Turtle mapping document into a catalog. `source` becomes the
    * federation membership id of every molecule in the file (the reference
    * pairs each mapping file with one datasource in config.json). */
  def loadCatalog(ttl: String, source: String = "rml"): Catalog = {
    val p = new TurtleParser
    p.parseAll(p.doc, ttl) match {
      case p.Success(_, _) => ()
      case f: p.NoSuccess =>
        throw new IllegalArgumentException(s"Turtle parse error: ${f.msg} at ${f.next.pos}")
    }
    val bySubj: Map[Node, List[TTriple]] = p.triples.toList.groupBy(_.s)

    def one(s: Node, pred: String): Option[Node] =
      bySubj.getOrElse(s, Nil).find(_.p == pred).map(_.o)
    def all(s: Node, pred: String): List[Node] =
      bySubj.getOrElse(s, Nil).filter(_.p == pred).map(_.o)
    def lit(n: Node): String = n match {
      case NLit(v) => v
      case NIri(v) => v
      case other   => throw new IllegalArgumentException(s"expected literal, got $other")
    }

    val molecules = bySubj.keys.collect {
      case tm if one(tm, s"${RML}logicalSource").isDefined =>
        val ls = one(tm, s"${RML}logicalSource").get
        val table = lit(one(ls, s"${RML}source").getOrElse(
          throw new IllegalArgumentException(s"triple map $tm has no rml:source")))
        val sm = one(tm, s"${RR}subjectMap").getOrElse(
          throw new IllegalArgumentException(s"triple map $tm has no rr:subjectMap"))
        val subjTemplate = Template(lit(one(sm, s"${RR}template").getOrElse(
          throw new IllegalArgumentException(s"subjectMap of $tm has no rr:template"))))
        val cls = one(sm, s"${RR}class").map(lit).getOrElse("urn:graft:untyped")
        val preds = all(tm, s"${RR}predicateObjectMap").map { pom =>
          val pred = lit(one(pom, s"${RR}predicate").getOrElse(
            throw new IllegalArgumentException("predicateObjectMap without rr:predicate")))
          val om = one(pom, s"${RR}objectMap").getOrElse(
            throw new IllegalArgumentException(s"predicate $pred without rr:objectMap"))
          val termMap: TermMap =
            one(om, s"${RML}reference").map(r => RefMap(lit(r)))
              .orElse(one(om, s"${RR}template").map(t => TemplateMap(Template(lit(t)))))
              .orElse(one(om, s"${RR}constant").map(c => ConstantMap(lit(c))))
              .getOrElse(throw new IllegalArgumentException(
                s"objectMap of $pred has no reference/template/constant"))
          pred -> termMap
        }.toMap
        Molecule(cls, table, subjTemplate, preds, source)
    }.toList.sortBy(m => (m.rdfType, m.table))
    Catalog(molecules)
  }
}
