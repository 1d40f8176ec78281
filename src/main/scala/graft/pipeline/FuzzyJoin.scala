package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string join under an edit-distance bound — the entity-
  * resolution primitive of a training-data pipeline (near-identical
  * titles, typo'd author names, OCR'd near-matches), expressed so the
  * verify step never degenerates into a cross join.
  *
  * Two-phase, like every bounded-similarity join in this library:
  * blocked CANDIDATE generation (cheap, may over-generate, must never
  * under-generate within the declared contract) followed by an exact
  * `levenshtein` VERIFY (Spark's codegen'd native) on the candidates
  * only.
  *
  * Blocking is the q-gram count filter: one edit destroys at most q of
  * a string's q-grams, so a pair within edit distance k whose LONGER
  * member has length ≥ q·(k+1) must share at least one q-gram — a join
  * on exploded distinct q-grams (any string of length ≥ q has them)
  * finds every such pair. Pairs where BOTH members are shorter than
  * q·(k+1) carry no gram guarantee and block on length bands instead
  * (each left string emits bands len−k…len+k, rights emit their own
  * length; band equality covers |len(a)−len(b)| ≤ k, which edit
  * distance ≤ k implies), exact by construction and bounded because
  * short strings are few. The two candidate sets overlap and union
  * through a distinct — coverage is what matters.
  *
  * Like the LSH/df caps of the dedup family, q-grams occurring on more
  * than `maxGramDf` rows of either side are EXCLUDED from blocking
  * (declared contract: a pair whose ONLY shared gram is boilerplate
  * that common is not found — the same trade every blocked similarity
  * join here makes, stated rather than silently suffered).
  */
object FuzzyJoin {

  /** Pairs (id_l, id_r, dist) with `levenshtein ≤ maxDist` (equal
    * strings included at dist 0 — filter on `dist` to drop them).
    * Inputs carry (`idCol`, `strCol`); ids must be unique per side. */
  def join(left: DataFrame, right: DataFrame,
           idCol: String, strCol: String,
           maxDist: Int = 1, q: Int = 3,
           maxGramDf: Int = 256): DataFrame = {
    require(maxDist >= 0 && q >= 2, s"need maxDist>=0, q>=2; got $maxDist, $q")
    val minLong = q * (maxDist + 1)

    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol).as(s"id_$tag"), col(strCol).as(s"s_$tag"),
        length(col(strCol)).as(s"len_$tag"))

    val l = side(left, "l")
    val r = side(right, "r")

    // ---- gram candidates: shared (df-capped) q-gram ------------------------
    // any string of length >= q contributes grams; the count-filter
    // guarantee kicks in whenever the pair's LONGER member is >= minLong.
    // NOTE (r21, measured dead end): the gram stream feeds each side's
    // df-cap groupBy, the cap's join-back probe, and the candidate join,
    // and exchange reuse misses the df-cap branch — but BOTH remedies
    // measured no better on the stage-latency-bound admit path
    // (q_entity_resolution_incremental isolated medians: r20 shape
    // 4.46 s / 54 jobs; eager candidate localCheckpoint inside the
    // operator 4.99 s / 67 jobs; caller-owned gram persist in erAdmit
    // 4.39 s / 65 jobs, task time UP 23.8 → 25.2 s). The cache's fill +
    // columnar serialization costs about what the second scan costs, and
    // the extra materialization jobs add barriers — kept the simple lazy
    // shape.
    def grams(df: DataFrame, tag: String): DataFrame =
      df.filter(col(s"len_$tag") >= q)
        .select(col(s"id_$tag"),
          explode(graft.functions.GraftFunctions.char_grams_distinct(
            col(s"s_$tag"), q)).as("g"))
    val gl = grams(l, "l")
    val gr = grams(r, "r")
    def dfCap(g: DataFrame): DataFrame =
      g.join(g.groupBy("g").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxGramDf).select("g"), Seq("g"))
    // no per-set distinct here: the post-union distinct below is the ONE
    // dedup pass (an inner distinct would add a full exchange+aggregate
    // per candidate set only to pre-shrink what the final distinct's
    // map-side partial aggregation absorbs anyway)
    val longCand = dfCap(gl).join(dfCap(gr), Seq("g"))
      .select(col("id_l"), col("id_r"))

    // ---- short-string candidates: length-band pairing ---------------------
    val shortL = l.filter(col("len_l") < minLong)
      .select(col("id_l"),
        explode(expr(s"sequence(greatest(len_l - $maxDist, 0), " +
          s"len_l + $maxDist)")).as("band"))
    val shortR = r.filter(col("len_r") < minLong)
      .select(col("id_r"), col("len_r").as("band"))
    val shortCand = shortL.join(shortR, Seq("band"))
      .select(col("id_l"), col("id_r"))

    // ---- exact verify on candidates only -----------------------------------
    longCand.unionByName(shortCand).distinct()
      .join(l.select(col("id_l"), col("s_l")), Seq("id_l"))
      .join(r.select(col("id_r"), col("s_r")), Seq("id_r"))
      .filter(abs(length(col("s_l")) - length(col("s_r"))) <= maxDist)
      .withColumn("dist", levenshtein(col("s_l"), col("s_r")))
      .filter(col("dist") <= maxDist)
      .select(col("id_l"), col("id_r"), col("dist"))
  }

  /** End-to-end entity resolution: the blocked edit-distance SELF-join
    * feeds [[GraphOps.connectedComponents]], and every record labels
    * with the minimum id of its edit-distance-≤k cluster (transitive:
    * a~b and b~c cluster a,c together even at dist 2k — the standard
    * merge semantics of match-graph ER). Records with no match keep
    * their own id. Output: (`idCol`, entity_id). */
  def entityClusters(records: DataFrame, idCol: String, strCol: String,
                     maxDist: Int = 1, q: Int = 3,
                     maxGramDf: Int = 256): DataFrame =
    labelFromEdges(records, idCol,
      fuzzySelfEdges(records, idCol, strCol, maxDist, q, maxGramDf))

  /** MULTI-PASS blocked ER (the standard multi-blocker construction of
    * the ER literature): the match graph unions one edge set per pass —
    * the fuzzy edit-distance self-join on `strCol` PLUS an
    * exact-equality pass per column in `exactCols` (two records match
    * when their names are within `maxDist` OR they agree on any exact
    * attribute; NULL exact values match nothing). Transitive closure
    * then merges across passes: a typo'd name joined by a shared email
    * joined by a clean name all collapse to one entity. */
  def entityClustersMulti(records: DataFrame, idCol: String, strCol: String,
                          exactCols: Seq[String],
                          maxDist: Int = 1, q: Int = 3,
                          maxGramDf: Int = 256): DataFrame = {
    val edges = (fuzzySelfEdges(records, idCol, strCol, maxDist, q,
      maxGramDf) +: exactCols.map(c => exactStarEdges(records, idCol, c)))
      .reduce(_ unionByName _)
    labelFromEdges(records, idCol, edges)
  }

  /** Self-join edge generation with the `id_l < id_r` canonicalization
    * pushed INTO candidate generation (the two-sided [[join]] face
    * generates every unordered pair in both orientations plus the full
    * diagonal and filters after the levenshtein verify — for a self-join
    * that is 2×+N candidates distinct-ed, joined back and verified for
    * the same edge set). One gram stream, one df cap (left and right df
    * are the same count on a self-join, so the shared-side cap is
    * unchanged), and every candidate is emitted once, low id left.
    * Coverage argument is [[join]]'s verbatim: both orientations of a
    * qualifying pair were generated there, so keeping exactly the
    * (min,max) orientation drops no pair. */
  private def fuzzySelfEdges(records: DataFrame, idCol: String,
                             strCol: String, maxDist: Int, q: Int,
                             maxGramDf: Int): DataFrame = {
    val minLong = q * (maxDist + 1)
    val base = records.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("len"))
    // the gram stream feeds FOUR consumers (the df-cap groupBy, its
    // join-back probe, and both candidate self-join sides); exchange
    // reuse misses the df-cap branch, so unpersisted the tokenize+explode
    // scan runs per consumer — persist the fixed-width rows, collapse the
    // (small) candidate list while the cache is hot, release (the
    // [[join]]/[[cosineSelfPairsLt]] lifecycle)
    val grams = base.filter(col("len") >= q)
      .select(col("id"), explode(graft.functions.GraftFunctions
        .char_grams_distinct(col("s"), q)).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eligible = grams.join(
      grams.groupBy("g").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxGramDf).select("g"), Seq("g"))
    // one dedup pass for both candidate sets: the post-union distinct
    // (inner distincts would each pay an exchange+aggregate the final
    // distinct's map-side partials make redundant)
    val longCand = eligible.select(col("g"), col("id").as("id_l"))
      .join(eligible.select(col("g"), col("id").as("id_r")), Seq("g"))
      .filter(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r"))
    val short = base.filter(col("len") < minLong)
    val shortCand = short
      .select(col("id").as("id_l"),
        explode(expr(s"sequence(greatest(len - $maxDist, 0), " +
          s"len + $maxDist)")).as("band"))
      .join(short.select(col("id").as("id_r"), col("len").as("band")),
        Seq("band"))
      .filter(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r"))
    val cand = longCand.unionByName(shortCand).distinct().localCheckpoint()
    grams.unpersist(blocking = false)
    cand
      .join(base.select(col("id").as("id_l"), col("s").as("s_l")), Seq("id_l"))
      .join(base.select(col("id").as("id_r"), col("s").as("s_r")), Seq("id_r"))
      .filter(abs(length(col("s_l")) - length(col("s_r"))) <= maxDist)
      .filter(levenshtein(col("s_l"), col("s_r")) <= maxDist)
      .select(col("id_l").as("a"), col("id_r").as("b"))
  }

  /** Exact-equality match edges on column `c`: records sharing a
    * non-null value connect through a STAR to the value's min-id member
    * — connectivity-equivalent to the clique the equality relation
    * implies, but LINEAR in group size (a million-record shared value
    * would emit O(g²) clique edges; connected components only needs a
    * spanning star). One map-side-combined min per value + one hash
    * join back. */
  private def exactStarEdges(records: DataFrame, idCol: String,
                             c: String): DataFrame = {
    val m = records.filter(col(c).isNotNull)
      .groupBy(col(c)).agg(min(col(idCol)).as("a"))
    records.filter(col(c).isNotNull).join(m, Seq(c))
      .filter(col(idCol) =!= col("a"))
      .select(col("a"), col(idCol).as("b"))
  }

  private def labelFromEdges(records: DataFrame, idCol: String,
                             edges: DataFrame): DataFrame = {
    val cc = GraphOps.connectedComponents(edges)
    records.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
  }

  /** Token-weighted COSINE similarity join — the token-based ER blocker
    * that complements edit distance (word-order-insensitive, robust to
    * token insertion/reorder: "acme corp ltd" ~ "ltd acme corp", which
    * no edit-distance bound finds cheaply).
    *
    * EXACT INTEGER arithmetic end to end (the bit-reproducibility
    * discipline of the perplexity/quantile/temperature family — FP
    * cosine is only reproducible up to summation order):
    *  - tokens: lowercase, split on non-alphanumeric runs, DISTINCT per
    *    record (token-less records never pair);
    *  - idf-like weight per token over the UNION corpus:
    *    `w_t = min(10⁶, (N·1000) div df_t)` — integer division, weight
    *    saturates at 10⁶ (tokens rarer than ~N/1000 are equally maximal
    *    discriminators, and the cap is what keeps every product below
    *    inside DECIMAL(38));
    *  - `cosine(l,r) ≥ τ/1000` tests as
    *    `dot² · 10⁶ ≥ τ² · ‖l‖² · ‖r‖²` with `dot = Σ_{t∈l∩r} w_t²` —
    *    no square root, no division, every term integer.
    *
    * Blocking: candidate pairs share ≥1 token with `df ≤ maxTokenDf`
    * (the gram/LSH df-cap contract); the VERIFY dot then sums over ALL
    * shared tokens of each candidate, capped ones included, so the
    * inequality is the true cosine test. With the cap lifted, recall is
    * exact for any τ > 0 (a pair sharing no token has cosine 0).
    *
    * THE CAP IS THE SCALE GUARD: candidate volume is Σ_t df_l(t)·df_r(t)
    * over under-cap tokens, so one token at df d emits up to d² pairs —
    * quadratic in the cap, which is why the default sits in the low
    * thousands (maxTokenDf² ≈ 1.6·10⁷ worst-case pairs per token, one
    * shuffle-sized unit of work) like the edit-distance family's
    * `maxGramDf = 256`, NOT at corpus scale. Tokens the cap excludes are
    * surfaced in [[CosineJoinWithStats.cappedTokens]] — a caller sees
    * the recall trade instead of silently suffering it (the
    * `doc_near_dup_simhash` capped-bucket convention); the side output
    * recomputes its (cheap, counts-only) lineage on demand.
    *
    * Overflow is LOUD, never a dropped pair — in two layers. The sums
    * stay LONG (codegen'd integer aggregation, no decimal tax) because
    * a loud per-record bound makes wrap PROVABLY impossible: the weight
    * cap keeps every term ≤ 10¹² and a record with more than
    * [[MaxRecordTokens]] = 9·10⁶ distinct tokens raises an error in the
    * norm pass (9·10⁶ · 10¹² = 9·10¹⁸ < 2⁶³; a pair's dot sums over a
    * SUBSET of either record's tokens, so the same bound covers it).
    * The THRESHOLD test's products do exceed long range for legitimate
    * inputs (~10⁴ shared max-weight tokens push `dot²·10⁶` past 10³⁸),
    * so they compute as DECIMAL(38,0) with a null-operand guard: under
    * ANSI mode (Spark 4's default) the engine throws at the overflowing
    * arithmetic, with ANSI off Spark NULLs it and the guard raises —
    * every path errors, none drops the pair.
    * Output: (id_l, id_r, dot_w2, norm_l, norm_r) — all exact integers
    * (bigint; values past 2⁶³ raise); derive `cos ≈ dot/√(nl·nr)`
    * downstream if a float is wanted.
    *
    * '''Default change (r16):''' `maxTokenDf` dropped from 2²⁰ to 4096 —
    * the old default let one stop-word token imply ~10¹² candidate pairs.
    * A pair whose EVERY shared token has df above the cap is no longer
    * found through this convenience form, and this form DISCARDS the
    * side output that would tell you so. Recall-sensitive callers must
    * use [[cosineJoinWithStats]] and inspect `cappedTokens` (empty ⇒
    * blocked recall is exact); raising `maxTokenDf` back is the explicit
    * opt-in to the quadratic cost. */
  def cosineJoin(left: DataFrame, right: DataFrame, idCol: String,
                 strCol: String, tauMilli: Int = 800,
                 maxTokenDf: Long = 4096): DataFrame =
    cosineJoinWithStats(left, right, idCol, strCol, tauMilli, maxTokenDf)
      .pairs

  /** [[cosineJoin]]'s result plus its recall observability side output:
    * `cappedTokens` is one row per token the df cap excluded from
    * blocking (`t`, `df`) — an operator that knowingly drops candidates
    * must surface how much it dropped (the LSH capped-bucket contract,
    * [[Dedup.PairsWithStats]]). A pair whose EVERY shared token is
    * listed here is not found; production callers at corpus scale
    * should read this, the convenience form discards it. */
  final case class CosineJoinWithStats(pairs: DataFrame,
                                       cappedTokens: DataFrame)

  def cosineJoinWithStats(left: DataFrame, right: DataFrame, idCol: String,
                          strCol: String, tauMilli: Int = 800,
                          maxTokenDf: Long = 4096): CosineJoinWithStats = {
    require(tauMilli > 0 && tauMilli <= 1000,
      s"tauMilli must be in (0, 1000], got $tauMilli")
    require(maxTokenDf >= 1, s"maxTokenDf must be >= 1, got $maxTokenDf")
    def toks(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id),
        explode(array_distinct(
          split(lower(col(strCol)), "[^a-z0-9]+"))).as("t"))
        .filter(col("t") =!= "")
    val lt = toks(left, "id_l")
    val rt = toks(right, "id_r")
    // df over the union corpus: lt/rt rows are distinct per (record,
    // token) by construction, so df is a plain count per token
    val u = lt.select(lit("l").as("sd"), col("id_l").as("rid"), col("t"))
      .unionByName(
        rt.select(lit("r").as("sd"), col("id_r").as("rid"), col("t")))
    // N is ONE scalar consumed by every weight — computed eagerly (one
    // bounded count job at construction, the dedup family's precedent)
    // rather than cross-joined as a 1-row broadcast: four consumers of
    // the weight frame would each re-plan that join, and a literal keeps
    // the whole plan pure hash equi-joins (spec-pinned)
    val dfs = u.groupBy("t").agg(count(lit(1)).as("df"))
    val nRecords = u.select("sd", "rid").distinct().count()
    val w = dfs.select(col("t"), col("df"),
      expr(s"least(1000000L, ${nRecords}L * 1000 div df)").as("w"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // long sums are safe under the loud token bound: every term ≤ 10¹²
    // (the weight cap) and ≤ MaxRecordTokens terms per record/pair
    val w2 = col("w") * col("w")
    def norm(tk: DataFrame, id: String, out: String): DataFrame =
      tk.join(w.select("t", "w"), Seq("t"))
        .groupBy(col(id)).agg(sum(w2).as(out), count(lit(1)).as("__nt"))
        .select(col(id),
          when(col("__nt") > MaxRecordTokens, raise_error(lit(
            s"cosineJoin: a record carries more than $MaxRecordTokens " +
              "distinct tokens — past this the exact integer norms " +
              "could wrap silently; chunk the strings upstream")))
            .otherwise(col(out)).as(out))
    val nl = norm(lt, "id_l", "norm_l")
    val nr = norm(rt, "id_r", "norm_r")
    val cand = lt.join(w.filter(col("df") <= maxTokenDf).select("t"),
        Seq("t"))
      .join(rt, Seq("t"))
      .select("id_l", "id_r").distinct()
    val dots = cand
      .join(lt, Seq("id_l"))
      .join(rt, Seq("id_r", "t"))
      .join(w.select("t", "w"), Seq("t"))
      .groupBy("id_l", "id_r").agg(sum(w2).as("dot_w2"))
    val lhs = col("dot_w2").cast(dec) * col("dot_w2") * lit(1000000L)
    val rhs = lit(tauMilli.toLong * tauMilli).cast(dec) *
      col("norm_l") * col("norm_r")
    val pairs = dots.join(nl, Seq("id_l")).join(nr, Seq("id_r"))
      .filter(when(lhs.isNull || rhs.isNull, raise_error(lit(
          "cosineJoin: DECIMAL(38) overflow in the exact cosine " +
            "threshold test — records share too many max-weight tokens " +
            "(a term of dot²·10⁶ / τ²·‖l‖²·‖r‖² passed 10³⁸); the exact " +
            "test cannot decide the pair, failing loudly instead of " +
            "dropping it. Bound per-record token counts upstream (chunk " +
            "the strings) or lower the weight cap.")))
        .otherwise(lhs >= rhs))
      .select(col("id_l"), col("id_r"), col("dot_w2"),
        col("norm_l"), col("norm_r"))
    CosineJoinWithStats(pairs,
      w.filter(col("df") > maxTokenDf).select(col("t"), col("df")))
  }

  /** The loud per-record distinct-token bound that keeps [[cosineJoin]]'s
    * long sums exact: 9·10⁶ terms of ≤ 10¹² each stay under 2⁶³. */
  val MaxRecordTokens: Long = 9000000L

  /** Entity resolution under the TOKEN-COSINE matcher: the
    * [[cosineJoin]] self-join feeds connected components, every record
    * labels with its cluster's minimum id — [[entityClusters]]' exact
    * twin for the word-order-insensitive regime (reordered/typo-token
    * names that edit distance can't bound). Weights are computed over
    * the doubled self-join corpus, which leaves the idf RATIOS — and
    * therefore every cosine — identical to the single-corpus weighting
    * (both N and every df double).
    *
    * Deliberately NO incremental-store twin (unlike [[erAdmit]]): idf
    * weights are corpus-GLOBAL, so every admitted batch shifts df/N and
    * can move an OLD pair across the threshold in either direction —
    * the edge-completeness argument that makes the edit-distance store
    * exact does not hold. Incremental cosine ER is a recompute-the-
    * corpus operation by its own semantics; run it on a cadence. */
  def entityClustersCosine(records: DataFrame, idCol: String,
                           strCol: String, tauMilli: Int = 800,
                           maxTokenDf: Long = 4096): DataFrame =
    labelFromEdges(records, idCol,
      cosineSelfPairsLt(records, idCol, strCol, tauMilli, maxTokenDf))

  /** Self-join arm of [[cosineJoinWithStats]], pairs canonicalized to
    * `id_l < id_r` — EXACTLY [[entityClustersCosine]]'s edge set, at half
    * the work: the two-sided form tokenizes the same records twice (once
    * per side), weighs them over the doubled union corpus, and verifies
    * every unordered pair in both orientations plus the diagonal before
    * the caller's `<` filter drops half. Here the token stream is
    * computed once and PERSISTED across its four consumers (df, norms,
    * candidate self-join sides), weights come from the single corpus —
    * identical by integer arithmetic, `(2n·1000) div (2·df) = (n·1000)
    * div df`, and the df cap compares the union-corpus `2·df` so the
    * blocking contract is unchanged — and candidates are generated once,
    * low id left. The verified pair list materializes (localCheckpoint)
    * while the token cache is hot, then the cache is released — the
    * [[containmentPairs]] lifecycle. */
  private def cosineSelfPairsLt(records: DataFrame, idCol: String,
                                strCol: String, tauMilli: Int,
                                maxTokenDf: Long): DataFrame = {
    require(tauMilli > 0 && tauMilli <= 1000,
      s"tauMilli must be in (0, 1000], got $tauMilli")
    require(maxTokenDf >= 1, s"maxTokenDf must be >= 1, got $maxTokenDf")
    val tk = records.select(col(idCol).as("rid"),
        explode(array_distinct(
          split(lower(col(strCol)), "[^a-z0-9]+"))).as("t"))
      .filter(col("t") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfs = tk.groupBy("t").agg(count(lit(1)).as("df"))
    val nRecords = tk.select("rid").distinct().count()
    val w = dfs.select(col("t"), col("df"),
      expr(s"least(1000000L, ${nRecords}L * 1000 div df)").as("w"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w2 = col("w") * col("w")
    val norms = tk.join(w.select("t", "w"), Seq("t"))
      .groupBy(col("rid")).agg(sum(w2).as("nrm"), count(lit(1)).as("__nt"))
      .select(col("rid"),
        when(col("__nt") > MaxRecordTokens, raise_error(lit(
          s"cosineJoin: a record carries more than $MaxRecordTokens " +
            "distinct tokens — past this the exact integer norms " +
            "could wrap silently; chunk the strings upstream")))
          .otherwise(col("nrm")).as("nrm"))
    // blocking cap on the UNION-corpus df (both sides are this corpus,
    // so union df = 2·df) — the declared cappedTokens contract
    val cand = tk.select(col("t"), col("rid").as("id_l"))
      .join(w.filter(col("df") * 2 <= maxTokenDf).select("t"), Seq("t"))
      .join(tk.select(col("t"), col("rid").as("id_r")), Seq("t"))
      .filter(col("id_l") < col("id_r"))
      .select("id_l", "id_r").distinct()
    val dots = cand
      .join(tk.select(col("rid").as("id_l"), col("t")), Seq("id_l"))
      .join(tk.select(col("rid").as("id_r"), col("t")), Seq("id_r", "t"))
      .join(w.select("t", "w"), Seq("t"))
      .groupBy("id_l", "id_r").agg(sum(w2).as("dot_w2"))
    val lhs = col("dot_w2").cast(dec) * col("dot_w2") * lit(1000000L)
    val rhs = lit(tauMilli.toLong * tauMilli).cast(dec) *
      col("norm_l") * col("norm_r")
    val pairs = dots
      .join(norms.select(col("rid").as("id_l"), col("nrm").as("norm_l")),
        Seq("id_l"))
      .join(norms.select(col("rid").as("id_r"), col("nrm").as("norm_r")),
        Seq("id_r"))
      .filter(when(lhs.isNull || rhs.isNull, raise_error(lit(
          "cosineJoin: DECIMAL(38) overflow in the exact cosine " +
            "threshold test — records share too many max-weight tokens " +
            "(a term of dot²·10⁶ / τ²·‖l‖²·‖r‖² passed 10³⁸); the exact " +
            "test cannot decide the pair, failing loudly instead of " +
            "dropping it. Bound per-record token counts upstream (chunk " +
            "the strings) or lower the weight cap.")))
        .otherwise(lhs >= rhs))
      .select(col("id_l").as("a"), col("id_r").as("b"))
      .localCheckpoint()
    tk.unpersist(blocking = false)
    pairs
  }

  /** Golden-record SURVIVORSHIP — the step after clustering in every
    * MDM/ER pipeline: collapse each entity's records into one canonical
    * record, per attribute the MOST FREQUENT non-null value (majority
    * evidence), ties broken to the LARGEST value (any total order works;
    * largest is one deterministic choice every engine agrees on — the
    * integer-exactness discipline of the mixture/quantile family).
    * Entities whose every value of an attribute is null keep null.
    *
    * Plan: per attribute one map-side-combined (entity, value) count +
    * one max_by per entity — k attributes are k independent aggregates
    * joined back on the entity key (each shuffles counts, never records;
    * at cluster scale all k share the entity hash partitioning). Output:
    * one row per entity (`entityCol` + `valueCols`). */
  def goldenRecords(records: DataFrame, entityCol: String,
                    valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "goldenRecords needs at least one attribute")
    val perCol = valueCols.map { c =>
      records.filter(col(c).isNotNull)
        .groupBy(col(entityCol), col(c))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col(entityCol))
        .agg(max_by(col(c), struct(col("__n"), col(c))).as(c))
    }
    val base = records.select(col(entityCol)).distinct()
    perCol.foldLeft(base)((acc, d) => acc.join(d, Seq(entityCol), "left"))
  }

  /** Survivorship from a MAINTAINED counts table — [[goldenRecords]]
    * split at its natural seam so the expensive half can run as a
    * STREAMING aggregate ([[graft.streaming.EventStreams.goldenCounts]]
    * keeps per-(entity, attr, value) counts continuously; Spark allows
    * one stateful aggregation per streaming query, so the k max_by
    * finishers stay batch-side over the materialized counts — the
    * reference-data pattern of `spikeFlags`). `counts` carries
    * (`entityCol`, `__attr`, `__value`, `__n`) with NULL-value rows
    * retained (they carry the entity's existence, the reason
    * [[graft.streaming.EventStreams.goldenCounts]] does not filter
    * them); the modal-with-largest-tiebreak rule is bit-identical to
    * [[goldenRecords]] whenever the attributes share one (string) type —
    * the unpivot's price; the typed general op remains goldenRecords. */
  def goldenFromCounts(counts: DataFrame, entityCol: String,
                       valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "goldenFromCounts needs at least one attribute")
    val perCol = valueCols.map { c =>
      counts.filter(col("__attr") === c && col("__value").isNotNull)
        .groupBy(col(entityCol))
        .agg(max_by(col("__value"), struct(col("__n"), col("__value")))
          .as(c))
    }
    val base = counts.select(col(entityCol)).distinct()
    perCol.foldLeft(base)((acc, d) => acc.join(d, Seq(entityCol), "left"))
  }

  // ---- incremental ER store ---------------------------------------------------

  private def exists(spark: org.apache.spark.sql.SparkSession,
                     path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Admit a batch into a persistent ER store — the incremental-corpus
    * treatment the dedup family's digest/band stores give exact and
    * near dedup ([[Dedup.freshAgainstStore]]), applied to entity
    * resolution: NEW records join existing clusters without recomputing
    * the corpus. The store keeps the admitted records' blocking columns
    * (`<dir>/records`: idCol, strCol) and the verified match edges
    * (`<dir>/edges`: a, b).
    *
    * Per batch the expensive work is ONE blocked fuzzy join of the
    * batch against (store ∪ batch) — every pair not involving a batch
    * member was found when its younger end was admitted, so the edge
    * set after n batches equals the full self-join's exactly WHEN
    * `maxGramDf` never binds (the full-vs-incremental gate row pins
    * this regime). Under a BINDING cap the two runs block on different
    * df snapshots: gram document frequency only GROWS as the corpus
    * grows, so an admit-time df is ≤ the one-shot corpus df — grams the
    * one-shot run excludes were still under-cap at early admits. Every
    * candidate is exact-verified either way, so the incremental edge
    * set is a SUPERSET of the one-shot's (strictly better recall, never
    * a wrong edge); what a binding cap costs is one-shot REPRODUCIBILITY,
    * not correctness. Ids must be unique across all batches;
    * re-admitted ids are dropped (idempotent replays).
    *
    * Write order is edges THEN records: a crash between them re-derives
    * the batch's edges on retry (the batch ids are still unknown), and
    * duplicate edge rows from such a retry are harmless — the CC kernel
    * reads edges through a distinct. */
  def erAdmit(batch: DataFrame, storeDir: String, idCol: String,
              strCol: String, maxDist: Int = 1, q: Int = 3,
              maxGramDf: Int = 256): Unit = {
    val spark = batch.sparkSession
    val recPath = s"$storeDir/records"
    val edgePath = s"$storeDir/edges"
    val b = batch.select(col(idCol), col(strCol))
    val known =
      if (exists(spark, recPath)) spark.read.parquet(recPath)
      else b.limit(0)
    val fresh = b.join(known.select(idCol), Seq(idCol), "left_anti")
      .localCheckpoint() // one blocked join + two writes read it; and the
                         // edge write must not re-plan through a store
                         // listing that the record write then changes
    val all = known.unionByName(fresh)
    join(fresh, all, idCol, strCol, maxDist, q, maxGramDf)
      .filter(col("id_l") =!= col("id_r"))
      .select(least(col("id_l"), col("id_r")).as("a"),
        greatest(col("id_l"), col("id_r")).as("b"))
      .distinct()
      .write.mode("append").parquet(edgePath)
    fresh.write.mode("append").parquet(recPath)
    // both consumers are done — release the checkpoint blocks now
    org.apache.spark.sql.GraftBridge.freeCheckpoint(fresh)
  }

  /** Entity labels for every record admitted to `storeDir`: connected
    * components over the STORED edge set (orders of magnitude smaller
    * than the corpus — the O(blocked-join) work was paid incrementally
    * at admit time), min-id labels, unmatched records keep their own
    * id. Output: (`idCol`, entity_id), one row per admitted record. */
  def erLabels(spark: org.apache.spark.sql.SparkSession, storeDir: String,
               idCol: String): DataFrame = {
    val recs = spark.read.parquet(s"$storeDir/records")
    val edgePath = s"$storeDir/edges"
    if (!exists(spark, edgePath))
      return recs.select(col(idCol), col(idCol).as("entity_id"))
    labelFromEdges(recs, idCol, spark.read.parquet(edgePath))
  }
}
