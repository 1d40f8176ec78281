package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: the query side is tiny
  * and broadcast, so the scan side streams once with no shuffle — at
  * cluster scale this is a map-only job over the corpus followed by a
  * per-query top-k (TakeOrdered-style). The SRP-LSH variant is the scale
  * path: bucket the corpus once (16-bit signed-random-projection
  * signature), then only score candidates that collide with the query's
  * bucket.
  */
object Similarity {

  private val dotExpr =
    "aggregate(zip_with(embedding, q_emb, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
  private val normExpr =
    "sqrt(aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * x))"

  private def queriesOf(emb: DataFrame, numQueries: Int): DataFrame =
    emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        expr(normExpr).as("q_norm"))

  /** Exact top-k cosine neighbours for the first `numQueries` vectors.
    * Output: (q_id, vec_id, cosine, rank). */
  def bruteForceTopK(emb: DataFrame, k: Int = 5, numQueries: Int = 3): DataFrame = {
    val scored = emb
      .withColumn("norm", expr(normExpr))
      .crossJoin(broadcast(queriesOf(emb, numQueries)))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", expr(dotExpr) / (col("norm") * col("q_norm")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "rank")
  }

  /** 16-bit signed-random-projection bucket signature. The "random"
    * hyperplane component for (plane i, dim d) is a deterministic
    * xxhash64-derived value in [-0.5, 0.5] — fully reproducible with no
    * broadcast weight matrix. */
  private def withSrpBucket(emb: DataFrame, planes: Int = 16): DataFrame =
    emb.withColumn("bucket", expr(
      s"""aggregate(
         |  transform(sequence(0, ${planes - 1}), i ->
         |    CASE WHEN aggregate(
         |      zip_with(embedding, sequence(0, size(embedding) - 1),
         |        (x, d) -> CAST(x AS DOUBLE) *
         |          (CAST(xxhash64(i * 1024 + d) % 1000 AS DOUBLE) / 1000.0)),
         |      0D, (acc, v) -> acc + v) > 0 THEN shiftleft(1, i) ELSE 0 END),
         |  0, (acc, b) -> acc + b)""".stripMargin))

  /** Approximate top-k via SRP-LSH: score only same-bucket candidates.
    * Recall < 1 by design; at corpus scale the scored fraction is
    * ~2^-planes of the data per query. Output: (q_id, vec_id, rank). */
  def lshTopK(emb: DataFrame, k: Int = 5, numQueries: Int = 3, planes: Int = 8): DataFrame = {
    val bucketed = withSrpBucket(emb, planes)
    val queries = bucketed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        expr(normExpr).as("q_norm"), col("bucket"))
    val scored = bucketed
      .withColumn("norm", expr(normExpr))
      .join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", expr(dotExpr) / (col("norm") * col("q_norm")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: global top-`n` most similar
    * pairs (a < b). Brute pair scoring locally; the LSH bucket path above
    * is the 100 TB variant (pairs only within buckets). */
  def topSimilarPairs(emb: DataFrame, n: Int = 50): DataFrame = {
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"),
      expr(normExpr).as("na"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("q_emb"),
      expr(normExpr).as("q_norm"))
    a.join(b, col("a") < col("b"))
      .withColumn("cosine",
        expr("aggregate(zip_with(ea, q_emb, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)") /
          (col("na") * col("q_norm")))
      .orderBy(col("cosine").desc, col("a"), col("b"))
      .limit(n)
      .select("a", "b")
  }
}
