package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph analytics over edge lists — the link-structure signals a
  * web-scale corpus pipeline ranks and filters by (page authority for
  * crawl prioritization, co-occurrence cliques for source clustering).
  *
  * Everything here is declarative DataFrame algebra: an iteration is a
  * hash join on the edge key plus a groupBy on the destination, i.e.
  * exactly the Pregel "scatter + gather" pair expressed so Catalyst owns
  * partitioning. No vertex state lives on the driver.
  *
  * Ranks use FIXED-POINT INTEGER arithmetic (micro-rank units, integral
  * division) rather than doubles: floating-point PageRank is only
  * reproducible up to summation order, which a distributed shuffle does
  * not fix — the integer contract makes every engine (and every run)
  * produce bit-identical ranks, which is what lets the relational oracle
  * check this operator exactly. The cost is bounded floor error per
  * in-edge, immaterial for ranking use.
  */
object GraphOps {

  /** Release a `localCheckpoint`ed frame's blocks NOW — `Dataset
    * .unpersist` only clears `persist()` cache entries, not checkpoint
    * blocks (the property-path closure learned this in round 4; same
    * bridge). */
  private def freeCheckpoint(df: DataFrame): Unit =
    org.apache.spark.sql.GraftBridge.freeCheckpoint(df)

  /** Fixed-point PageRank over directed `edges` (`src`, `dst` BIGINT).
    *
    * Contract (mirrors the textbook damped walk, integerized): every
    * node starts at `initMicro` micro-ranks; each iteration a node with
    * out-degree d sends each successor `rank * dampNum div (dampDen*d)`
    * (integral division) and every node restarts with
    * `initMicro * (dampDen - dampNum) div dampDen`. Dangling mass (sinks
    * have no successors) is dropped, not redistributed — the usual
    * pruned-power-iteration simplification, stated so the oracle can
    * reproduce it.
    *
    * Plan shape per iteration: one shuffle join of ranks onto the
    * out-degree-annotated edge list (both hash-partitioned by `src` —
    * the edge side is computed once and reused, so at cluster scale the
    * big relation keeps its partitioning across iterations) and one
    * map-side-combined groupBy on `dst`. Lineage is BOUNDED: every
    * `checkpointEvery` iterations the rank frame eagerly
    * `localCheckpoint`s and the superseded checkpoint's blocks are freed
    * immediately — the same policy [[connectedComponents]] applies per
    * round — so plan depth never exceeds `checkpointEvery` joins no
    * matter how many iterations run. */
  def pagerankInt(edges: DataFrame, iters: Int,
                  initMicro: Long = 1000000L,
                  dampNum: Int = 85, dampDen: Int = 100,
                  checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    // loud id typing, the [[connectedComponents]] contract: a silent
    // bigint cast of string ids would null every endpoint and VANISH the
    // node from the graph — wrong ranks, no error. (Unlike CC, there is
    // no string arm here: ranks are integer arithmetic over micro-units
    // and ids are only join keys, but accepting strings silently-cast is
    // exactly the mislabel class the r14/r15 adjudications closed.)
    locally {
      import org.apache.spark.sql.types._
      val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
      val ts = edges.schema("src").dataType
      val td = edges.schema("dst").dataType
      if (!(integral(ts) && integral(td)))
        throw new IllegalArgumentException(
          s"pagerankInt: edge endpoints must both be integral, got " +
            s"(src: $ts, dst: $td) — map ids to bigint explicitly (a " +
            "lossy implicit cast would drop nodes silently)")
    }
    val e = edges.select(col("src").cast("bigint").as("src"),
      col("dst").cast("bigint").as("dst")).distinct()
    // materialize the degree-annotated edge list and node set ONCE —
    // their lineage (often a multi-join upstream) must not re-execute
    // inside every iteration's plan. The node set derives from the
    // ALREADY-CHECKPOINTED eD in one explode pass (the inner join on
    // `src` keeps every edge row, so eD's endpoints are exactly e's):
    // the union-of-two-selects over `e` this replaces re-executed the
    // upstream edge lineage for each branch of its own checkpoint.
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val eD = e.join(outdeg, "src").localCheckpoint()
    val nodes = eD
      .select(explode(array(col("src"), col("dst"))).as("id")).distinct()
      .localCheckpoint()
    val base = initMicro * (dampDen - dampNum) / dampDen

    var rank = nodes.withColumn("rank", lit(initMicro))
    // the frame whose checkpoint blocks the NEXT checkpoint supersedes
    // (never `nodes`/`eD` — those live for the whole fixpoint)
    var prevCkpt: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val contribs = eD.join(rank, eD("src") === rank("id"))
        .select(col("dst").as("id"),
          expr(s"rank * $dampNum div (${dampDen}L * d)").as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      rank = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("c"), lit(0L))).as("rank"))
      if (i % checkpointEvery == 0 && i < iters) {
        rank = rank.localCheckpoint() // eager: materializes this round
        prevCkpt.foreach(freeCheckpoint)
        prevCkpt = Some(rank)
      }
    }
    rank
  }

  /** Connected components over an undirected edge list (`a`, `b`):
    * every node labels with the MINIMUM node id reachable from it — the
    * deterministic canonical representative (same convention as
    * [[graft.pipeline.Dedup.canonicalIds]]'s union–find).
    *
    * Min-label propagation with POINTER DOUBLING: each round a node
    * takes the smallest of (its label, its neighbors' labels, its
    * label's label). The neighbor step alone needs diameter rounds; the
    * label-of-label shortcut makes convergence logarithmic in component
    * diameter — the hash-to-min trick of the MapReduce-CC literature —
    * so `maxIters = 20` covers diameters past 2^20 and non-convergence
    * is a loud throw (the `graft.path.maxIters` convention), never a
    * silently-wrong label.
    *
    * Per round: one hash join of labels onto the (persisted, symmetric)
    * edge list + a map-side-combined min, one self-join for the
    * shortcut, and ONE materializing action — the eager
    * `localCheckpoint` that also truncates lineage (the fixpoint plan
    * otherwise grows exponentially, the property-path-closure lesson).
    * No vertex state ever lands on the driver. Returns (`id`,
    * `component`) for every node with at least one edge.
    *
    * Node ids may be INTEGRAL (labels are bigint, "minimum" is numeric)
    * or STRING (labels keep the strings, "minimum" is lexicographic —
    * the natural ER input, where ids are document keys). Anything else
    * throws loudly: a silent cast of string keys to bigint would null
    * every endpoint and hand each node its own component (wrong
    * clusters, no error). */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    import org.apache.spark.sql.types._
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    val ta = edges.schema("a").dataType
    val tb = edges.schema("b").dataType
    val idType =
      if (integral(ta) && integral(tb)) "bigint"
      else if (ta == StringType && tb == StringType) "string"
      else throw new IllegalArgumentException(
        s"connectedComponents: edge endpoints must both be integral or " +
          s"both string, got (a: $ta, b: $tb) — cast ids explicitly " +
          "(a lossy implicit cast would mislabel components silently)")
    // symmetrize in ONE pass over the edge lineage: each row explodes to
    // both orientations (the union-of-two-selects form this replaces ran
    // the upstream edge derivation — for the ER rows, the whole blocked
    // fuzzy join — once per branch). The explicit repartition on `y` sits
    // BELOW the distinct (hashpartitioning(y) satisfies the (x,y)
    // clustering the dedup needs — one exchange, not two) and is what the
    // per-round propagation join keys on, so the persisted edge list is
    // never re-exchanged inside the fixpoint: each round shuffles only
    // label-sized frames (guide §2.4 — establish the partitioning once).
    val ex = col("a").cast(idType)
    val ey = col("b").cast(idType)
    val sym = edges
      .select(explode(array(struct(ex.as("x"), ey.as("y")),
        struct(ey.as("x"), ex.as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .repartition(col("y"))
      .distinct()
      .persist()
    try {
      var labels = sym.select(col("x").as("id")).distinct()
        .select(col("id"), col("id").as("component"))
        .localCheckpoint()
      var i = 0
      while (i < maxIters) {
        // neighbor minimum: for each edge (x,y), y's label proposes for x
        val proposed = sym
          .join(labels.select(col("id").as("y"), col("component").as("nl")), "y")
          .groupBy(col("x").as("id")).agg(min("nl").as("nl"))
        // carry the round-start label as `old` through to the checkpoint:
        // the convergence probe then reads the checkpointed frame directly
        // instead of paying a doubled⋈labels join per round
        val stepped = labels.select(col("id"), col("component").as("old"))
          .join(proposed, Seq("id"), "left")
          .select(col("id"), col("old"),
            least(col("old"), coalesce(col("nl"), col("old")))
              .as("component"))
        // pointer doubling: a label is itself a node id — adopt ITS label.
        // The lookup side is the ROUND-START table (already materialized —
        // reading it twice is free), not `stepped` (a stepped⋈stepped
        // self-join re-executes the whole propagation join for the lookup
        // branch: a join is not an exchange, so nothing reuses it). Both
        // yield labels of reachable nodes, so the fixpoint — min reachable
        // id — and the no-change termination rule are unchanged.
        val doubled = stepped
          .join(labels.select(col("id").as("component"),
            col("component").as("ll")), Seq("component"), "left")
          .select(col("id"), col("old"),
            least(col("component"), coalesce(col("ll"), col("component")))
              .as("component"))
          .localCheckpoint()
        val changed = doubled
          .filter(col("component") =!= col("old")).limit(1).count()
        // the superseded round's checkpoint blocks are dead the moment the
        // new one is materialized (localCheckpoint is eager) — free them
        // now instead of waiting out the ContextCleaner's GC cycle (the
        // Bench lesson: leaked round blocks evict the live frontier)
        freeCheckpoint(labels)
        labels = doubled.select(col("id"), col("component"))
        i += 1
        if (changed == 0) return labels
      }
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          "(component diameter past 2^" + maxIters + " — raise maxIters)")
    } finally sym.unpersist(blocking = false)
  }

  /** Project a bipartite membership table (`group`, `member`) onto a
    * canonical member–member co-occurrence edge list (`a` < `b`): two
    * members are linked iff they share a group.
    *
    * Groups larger than `maxGroup` are EXCLUDED before the self-join —
    * the same frequency-cap bound the dedup family puts on LSH buckets
    * and gram df: a hub group of size g emits g·(g−1)/2 pairs, so one
    * viral group would otherwise dominate the shuffle at corpus scale.
    * The cap makes per-group emission ≤ maxGroup², and is part of the
    * operator's declared semantics (hub groups carry little signal). */
  def projectCoGrouped(bipartite: DataFrame, maxGroup: Int): DataFrame = {
    val bip = bipartite.select(col("group"), col("member")).distinct()
    val ok = bip.join(
      bip.groupBy("group").agg(count(lit(1)).as("sz"))
        .filter(col("sz") <= maxGroup).select("group"),
      Seq("group"))
    ok.alias("l").join(ok.alias("r"),
        col("l.group") === col("r.group") &&
          col("l.member") < col("r.member"))
      .select(col("l.member").as("a"), col("r.member").as("b"))
      .distinct()
  }

  /** Per-node triangle counts over a canonical undirected edge list
    * (`a` < `b`, deduplicated — [[projectCoGrouped]]'s output shape).
    *
    * The classic ordered two-path join: (x,y)⋈(y,z)⋈(x,z) with
    * x < y < z finds each triangle exactly once; exploding its three
    * corners and counting per node gives local triangle counts (the
    * clustering-coefficient numerator). Three hash joins on edge keys +
    * one aggregate — entirely shuffle-bound, no driver state.
    *
    * Fan-out guard: the two-path join is quadratic in the maximum
    * vertex degree (a hub of degree d emits O(d²) two-paths), so the
    * plan embeds a degree assertion — if any vertex's degree exceeds
    * `maxDegree` the QUERY FAILS with the offending bound instead of
    * silently going quadratic. The check is one extra aggregate +
    * 1-row broadcast inside the same lazy plan (no second execution of
    * the edge lineage). Inputs shaped by [[projectCoGrouped]]'s group
    * cap are bounded by construction; a raw edge list must either fit
    * the cap or be thinned upstream — raising `maxDegree` is an
    * explicit acceptance of O(maxDegree²) per-hub work. */
  def triangleCounts(edges: DataFrame, maxDegree: Int = 65536): DataFrame = {
    val e0 = edges.select(col("a"), col("b"))
    // one pass over the edge lineage (explode, not union-of-selects —
    // the guard must not run the upstream projection twice)
    val maxDeg = e0
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .agg(max("d").as("__maxd"))
    val e = e0.crossJoin(broadcast(maxDeg))
      .where(when(col("__maxd") > maxDegree,
        raise_error(concat(lit("triangleCounts: max vertex degree "),
          col("__maxd").cast("string"),
          lit(s" exceeds maxDegree=$maxDegree — the two-path join would " +
            "be quadratic in it; cap the graph upstream " +
            "(projectCoGrouped) or raise maxDegree explicitly"))))
        .otherwise(lit(true)))
      .select(col("a"), col("b"))
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.b") === col("e2.a"))
      .join(e.alias("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }
}
