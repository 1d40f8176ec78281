package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Dependent (bind) join with filter batching — the reference's
  * `NestedHashJoinFilter` (`/root/reference/ontario/operators/nonblocking/
  * NestedHashJoinFilter.py:42-234`): buffer left bindings, and every
  * `windowSize` distinct keys instantiate the right-side *source query*
  * with a disjunctive filter (its `makeInstantiation` builds
  * `FILTER ((?v=c1) || (?v=c2) …)`; the SQL wrappers emit IN-lists).
  *
  * Against co-located tables Catalyst's broadcast joins and dynamic
  * partition pruning make this pointless — the operator exists for
  * wrapper-style sources (JDBC, SPARQL endpoints, REST) where selective
  * bindings must travel to the remote side as literal constants. The
  * driver-side collect of distinct keys is intrinsic to bind joins (the
  * reference buffers the same tuples in its `filter_bag`); `maxKeys` guards
  * the non-selective case, where a plain shuffled join is the right plan
  * anyway.
  */
object BindJoin {

  /** @param fetchRight one batch of distinct key rows → right-side rows
    *                   (e.g. a JDBC/SPARQL query with an IN-list). Batches
    *                   run as independent jobs; results are unioned lazily.
    */
  def apply(left: DataFrame, keys: Seq[String],
            fetchRight: Seq[Row] => DataFrame,
            windowSize: Int = 20, maxKeys: Int = 100000,
            joinType: String = "inner"): DataFrame = {
    val distinctKeys = left.select(keys.map(col): _*).distinct()
      .limit(maxKeys + 1).collect()
    require(distinctKeys.length <= maxKeys,
      s"bind join is the wrong plan for >$maxKeys distinct keys; use a shuffled join")
    if (distinctKeys.isEmpty) {
      require(joinType == "inner", "empty left side: only inner bind join is defined")
      left.limit(0)
    } else {
      val right = distinctKeys.grouped(windowSize).map(b => fetchRight(b.toSeq))
        .reduce(_.unionByName(_))
      left.join(right, keys, joinType)
    }
  }
}
