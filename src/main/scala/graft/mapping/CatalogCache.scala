package graft.mapping

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import java.nio.file.{Files, Path, Paths}

/** Sidecar persistence for probed catalogs — the deploy-time/query-time
  * split of the reference's `scripts/create_rdfmts.py`, which pages its
  * sources for minutes and then *writes the RDF-MT catalog to a JSON file*
  * consumed by every later query session. Probing costs one aggregate +
  * one containment anti-join per candidate link; a fresh session must load
  * the result, not re-pay it.
  *
  * The cache is keyed by a fingerprint of the source files (name, size,
  * mtime, recursively for parquet directories), so a changed lake
  * invalidates it and the next access re-probes.
  */
object CatalogCache {

  private val mapper = new ObjectMapper()

  /** Fingerprint of the backing files: stable across sessions, changed by
    * any rewrite (size or mtime) of any part-file. */
  def fingerprint(paths: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def feed(p: Path): Unit =
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.sorted().forEach(feed(_)) finally children.close()
      } else md.update(
        s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis};"
          .getBytes("UTF-8"))
    paths.sorted.foreach { s =>
      val p = Paths.get(s)
      if (Files.exists(p)) feed(p) else md.update(s"missing:$s;".getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Load if present and fingerprint-fresh, else generate and save. */
  def cached(path: Path, fp: String)(gen: => Catalog): Catalog =
    load(path, fp).getOrElse {
      val cat = gen
      save(path, fp, cat)
      cat
    }

  def save(path: Path, fp: String, cat: Catalog): Unit = {
    val root = mapper.createObjectNode()
    root.put("fingerprint", fp)
    val ms = root.putArray("molecules")
    cat.molecules.foreach { m =>
      val n = ms.addObject()
      n.put("rdfType", m.rdfType)
      n.put("table", m.table)
      n.put("subject", templateString(m.subject))
      n.put("source", m.source)
      n.put("broadcastHint", m.broadcastHint)
      n.put("cardinality", m.cardinality)
      val ps = n.putArray("predicates")
      m.predicates.toList.sortBy(_._1).foreach { case (p, tm) =>
        val pn = ps.addObject()
        pn.put("predicate", p)
        tm match {
          case RefMap(c, lang) =>
            pn.put("kind", "ref"); pn.put("column", c)
            lang.foreach(pn.put("langColumn", _))
          case TemplateMap(t) =>
            pn.put("kind", "template"); pn.put("template", templateString(t))
          case ConstantMap(v) =>
            pn.put("kind", "constant"); pn.put("value", v)
        }
      }
    }
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.write(path, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
  }

  /** None on missing file, unparseable content, or stale fingerprint. */
  def load(path: Path, fp: String): Option[Catalog] =
    if (!Files.exists(path)) None
    else try {
      val root = mapper.readTree(Files.readAllBytes(path))
      if (root.path("fingerprint").asText() != fp) None
      else {
        val ms = root.path("molecules").asInstanceOf[ArrayNode]
        val molecules = (0 until ms.size()).toList.map { i =>
          val n = ms.get(i).asInstanceOf[ObjectNode]
          val ps = n.path("predicates").asInstanceOf[ArrayNode]
          val preds = (0 until ps.size()).map { j =>
            val pn = ps.get(j)
            val tm: TermMap = pn.path("kind").asText() match {
              case "ref" => RefMap(pn.path("column").asText(),
                Option(pn.get("langColumn")).map(_.asText()))
              case "template" => TemplateMap(Template(pn.path("template").asText()))
              case "constant" => ConstantMap(pn.path("value").asText())
              case other =>
                throw new IllegalArgumentException(s"unknown term map kind $other")
            }
            pn.path("predicate").asText() -> tm
          }.toMap
          Molecule(
            rdfType = n.path("rdfType").asText(),
            table = n.path("table").asText(),
            subject = Template(n.path("subject").asText()),
            predicates = preds,
            source = n.path("source").asText(),
            broadcastHint = n.path("broadcastHint").asBoolean(),
            cardinality = n.path("cardinality").asLong())
        }
        Some(Catalog(molecules))
      }
    } catch { case _: Exception => None } // corrupt sidecar ⇒ re-probe

  /** Inverse of `Template(...)` parsing — safe while literal parts contain
    * no braces (true of any URI-shaped vocabulary). */
  private def templateString(t: Template): String = t.parts.map {
    case Left(l)  => l
    case Right(c) => s"{$c}"
  }.mkString
}
