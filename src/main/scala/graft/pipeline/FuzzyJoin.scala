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
    // guarantee kicks in whenever the pair's LONGER member is >= minLong
    def grams(df: DataFrame, tag: String): DataFrame =
      df.filter(col(s"len_$tag") >= q)
        .select(col(s"id_$tag"),
          explode(array_distinct(expr(
            s"transform(sequence(1, len_$tag - ${q - 1}), " +
              s"i -> substring(s_$tag, i, $q))"))).as("g"))
    val gl = grams(l, "l")
    val gr = grams(r, "r")
    def dfCap(g: DataFrame): DataFrame =
      g.join(g.groupBy("g").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxGramDf).select("g"), Seq("g"))
    val longCand = dfCap(gl).join(dfCap(gr), Seq("g"))
      .select(col("id_l"), col("id_r")).distinct()

    // ---- short-string candidates: length-band pairing ---------------------
    val shortL = l.filter(col("len_l") < minLong)
      .select(col("id_l"),
        explode(expr(s"sequence(greatest(len_l - $maxDist, 0), " +
          s"len_l + $maxDist)")).as("band"))
    val shortR = r.filter(col("len_r") < minLong)
      .select(col("id_r"), col("len_r").as("band"))
    val shortCand = shortL.join(shortR, Seq("band"))
      .select(col("id_l"), col("id_r")).distinct()

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
                     maxGramDf: Int = 256): DataFrame = {
    val pairs = join(records, records, idCol, strCol, maxDist, q, maxGramDf)
      .filter(col("id_l") < col("id_r"))
    val cc = GraphOps.connectedComponents(
      pairs.select(col("id_l").as("a"), col("id_r").as("b")))
    records.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("entity_id"))
  }
}
