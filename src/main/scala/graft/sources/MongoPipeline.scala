package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Executes a MongoDB aggregation pipeline (the JSON emitted by
  * [[DocStoreTranslators.toMongoPipeline]]) against a DataFrame standing in
  * for the collection — what `mongodb/__init__.py:44-79` does by sending the
  * pipeline to a live `pymongo` client. The zero-egress bench has no Mongo
  * server, but a JSON-derived DataFrame *is* a document collection for the
  * stage semantics the translator emits, so executing against it proves the
  * translation computes the star, not merely stringifies it.
  *
  * Supported stages: `$match` (scalar equality and `$exists`/`$ne`/`$eq`/
  * `$gt`/`$gte`/`$lt`/`$lte`/`$in` operator objects), `$unwind` (array field
  * → one document per element), `$project` (`"$field"` renames and `1`
  * inclusions), `$skip`, `$limit`. Dotted paths address nested documents.
  * Each stage is one declarative DataFrame transform — the interpreter adds
  * no materialization and the composed plan optimizes as a whole (a
  * `$match` behind an `$unwind` still pushes to the scan).
  */
object MongoPipeline {

  def execute(collection: DataFrame, pipelineJson: String): DataFrame = {
    val stages = new ObjectMapper().readTree(pipelineJson)
    require(stages.isArray, s"pipeline must be a JSON array: ${pipelineJson.take(80)}")
    (0 until stages.size()).foldLeft(collection) { (df, i) =>
      applyStage(df, stages.get(i))
    }
  }

  private def applyStage(df: DataFrame, stage: JsonNode): DataFrame = {
    val names = stage.fieldNames()
    require(names.hasNext, "empty pipeline stage")
    val op = names.next()
    val body = stage.get(op)
    op match {
      case "$match"  => df.filter(matchExpr(df, body))
      case "$unwind" =>
        // top-level array field → one document per element, replaced in place
        val path = body.asText().stripPrefix("$")
        df.withColumn(path, explode(col(path)))
      case "$project" =>
        val cols = body.properties().iterator()
        val out = scala.collection.mutable.ListBuffer[Column]()
        while (cols.hasNext) {
          val e = cols.next()
          val v = e.getValue
          if (v.isTextual && v.asText().startsWith("$"))
            out += col(v.asText().stripPrefix("$")).as(e.getKey)
          else if (v.isNumber && v.asInt() == 1 || v.isBoolean && v.asBoolean())
            out += col(e.getKey)
          // 0 / false = exclusion: simply not selected
        }
        df.select(out.toSeq: _*)
      case "$skip"  => df.offset(body.asLong().toInt)
      case "$limit" => df.limit(body.asLong().toInt)
      case other =>
        throw new UnsupportedOperationException(s"pipeline stage $other")
    }
  }

  private def matchExpr(df: DataFrame, body: JsonNode): Column = {
    val fields = body.properties().iterator()
    var cond = lit(true)
    while (fields.hasNext) {
      val e = fields.next()
      cond = cond && fieldCond(df, e.getKey, e.getValue)
    }
    cond
  }

  private def fieldCond(df: DataFrame, path: String, spec: JsonNode): Column = {
    def exists = df.schema.fieldNames.contains(path.split("\\.").head)
    val c = if (exists) col(path) else lit(null)
    if (spec.isObject) {
      val ops = spec.properties().iterator()
      var cond = lit(true)
      while (ops.hasNext) {
        val e = ops.next()
        val v = e.getValue
        cond = cond && (e.getKey match {
          case "$exists" => if (v.asBoolean()) c.isNotNull else c.isNull
          case "$ne"     => if (v.isNull) c.isNotNull else !(c <=> literal(v))
          case "$eq"     => c === literal(v)
          case "$gt"     => c > literal(v)
          case "$gte"    => c >= literal(v)
          case "$lt"     => c < literal(v)
          case "$lte"    => c <= literal(v)
          case "$in"     =>
            c.isin((0 until v.size()).map(i => literalValue(v.get(i))): _*)
          case other =>
            throw new UnsupportedOperationException(s"match operator $other")
        })
      }
      cond
    } else c === literal(spec)
  }

  private def literal(v: JsonNode): Column = lit(literalValue(v))

  private def literalValue(v: JsonNode): Any =
    if (v.isNull) null
    else if (v.isBoolean) v.asBoolean()
    else if (v.isIntegralNumber) v.asLong()
    else if (v.isNumber) v.asDouble()
    else v.asText()
}
