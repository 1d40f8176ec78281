package graft.api

import org.apache.spark.sql.DataFrame

import graft.parser.SparqlParser

/** The reference's experiment-metrics protocol
  * (`/root/reference/scripts/runExperiment.py:44-63, 85, 103+` and
  * `scripts/run_dief_experiment.py:46-56`, per BASELINE.md):
  *
  *  - `dt` decomposition time (here: parse + decompose/source-select),
  *  - `pt` planning time (here: Catalyst analysis of the compiled frame),
  *  - `t1` time to first answer, `tn` total execution time,
  *  - `c1`/`cn` first/total answer counts,
  *  - an answer `(time, count)` trace for dief@t curves.
  *
  * Results stream through `toLocalIterator` — the incremental consumption
  * path (the reference's `/nextresult` endpoint, `app/query.py:49-82`), so
  * `t1` genuinely measures first-tuple latency, not job completion.
  */
object Experiment {

  final case class RunMetrics(dt: Double, pt: Double, t1: Double, tn: Double,
                              c1: Long, cn: Long, trace: List[(Double, Long)])

  /** Run `query` through `g`, sampling the answer trace every
    * `traceEvery` rows. Times are seconds from query submission. */
  def run(g: Graft, query: String, traceEvery: Long = 1000L): RunMetrics = {
    val t0 = System.nanoTime()
    def secs(): Double = (System.nanoTime() - t0) / 1e9

    val parsed = SparqlParser.parseUnsafe(query)
    val dt = secs()

    val df: DataFrame = g.compile(parsed)
    df.queryExecution.executedPlan // force analysis + physical planning
    val pt = secs()

    val it = df.toLocalIterator()
    var n = 0L
    var t1 = 0.0
    val trace = List.newBuilder[(Double, Long)]
    while (it.hasNext) {
      it.next()
      n += 1
      if (n == 1) { t1 = secs(); trace += ((t1, 1L)) }
      else if (n % traceEvery == 0) trace += ((secs(), n))
    }
    val tn = secs()
    if (n > 0 && n % traceEvery != 0 && n != 1) trace += ((tn, n))
    RunMetrics(dt, pt, t1, tn, c1 = math.min(n, 1L), cn = n, trace.result())
  }
}
