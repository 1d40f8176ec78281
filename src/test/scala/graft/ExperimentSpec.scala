package graft

import graft.api.{Experiment, Graft, TpchCatalog}

/** The reference's experiment metrics protocol (runExperiment.py:44-63 —
  * dt/pt/t1/tn/c1/cn + dief@t answer trace) over the Spark engine. */
class ExperimentSpec extends SparkTestBase {

  lazy val g: Graft = Graft.overParquetDir(TpchCatalog.catalog, sfDir)(spark)

  test("metrics are ordered and counts match the materialized result") {
    val q =
      """PREFIX g: <urn:g:>
        |SELECT ?c ?name WHERE { ?c a g:Customer ; g:name ?name } ORDER BY ?c""".stripMargin
    val m = Experiment.run(g, q, traceEvery = 100)
    assert(m.dt > 0 && m.pt >= m.dt && m.t1 >= m.pt && m.tn >= m.t1)
    assert(m.cn == g.sparql(q).count())
    assert(m.c1 == 1)
    // trace is monotone in both time and count and ends at (tn-ish, cn)
    val ts = m.trace.map(_._1)
    val cs = m.trace.map(_._2)
    assert(ts == ts.sorted && cs == cs.sorted)
    assert(cs.last == m.cn)
  }

  test("empty results: t1 stays zero, trace empty") {
    val m = Experiment.run(g,
      """PREFIX g: <urn:g:>
        |SELECT ?c WHERE { ?c a g:Customer ; g:mktsegment "NOSUCH" }""".stripMargin)
    assert(m.cn == 0 && m.c1 == 0 && m.t1 == 0.0 && m.trace.isEmpty)
  }
}
