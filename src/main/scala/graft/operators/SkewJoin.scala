package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join splitting (on by default in every session this library
  * builds) handles most skew at runtime; explicit salting remains the tool
  * when one key dominates so heavily that even split shuffle blocks
  * overwhelm a task — the classic web-corpus case (one boilerplate
  * document, one null-ish foreign key) at 100 TB.
  *
  * The left (large, skewed) side gets a deterministic salt derived from a
  * unique column; the right side is replicated `salts` ways. Same results
  * as a plain equi-join, `salts`× the right-side shuffle volume, no single
  * hot partition.
  */
object SkewJoin {

  /** @param leftUnique a left column that is unique-ish per row (any id) —
    *                   keeps the salt deterministic, no rand() in the plan */
  def salted(left: DataFrame, right: DataFrame, key: String,
             leftUnique: String, salts: Int = 8,
             joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(col(leftUnique)), lit(salts)))
    val saltedRight = right
      .withColumn("__salt", explode(lit((0 until salts).toArray)))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
