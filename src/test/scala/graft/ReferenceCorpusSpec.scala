package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parser.SparqlParser

/** Grammar parity against the reference's own LSLOD workload: every query
  * file under `/root/reference/queries/{simpleQueries,complexqueries}`
  * (the DEXA'19 experiment corpus, `scripts/runExperiment.py`) must parse
  * into our algebra. Execution needs the LSLOD federation (not in this
  * container); parsing proves the grammar surface is a superset. */
class ReferenceCorpusSpec extends AnyFunSuite {

  private val dirs = List(
    "/root/reference/queries/simpleQueries",
    "/root/reference/queries/complexqueries")

  private def queryFiles: List[java.io.File] =
    dirs.map(new java.io.File(_)).filter(_.isDirectory)
      .flatMap(_.listFiles.toList).filter(_.isFile).sortBy(_.getName)

  test("every LSLOD workload query parses") {
    val files = queryFiles
    assume(files.nonEmpty, "reference corpus not present")
    val failures = files.flatMap { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath))
      SparqlParser.parse(text) match {
        case Right(q) =>
          assert(q.pattern.vars.nonEmpty, s"${f.getName}: no variables bound")
          None
        case Left(err) => Some(s"${f.getName}: $err")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
