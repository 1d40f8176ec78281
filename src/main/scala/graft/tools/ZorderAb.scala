package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: Morton z-value as the codegen'd shift/and/or Column expression vs
  * the same math as a Scala UDF — quantifies the functions-not-UDFs rule
  * on a pure per-row bit-shuffle. Scratch measurement main (not part of
  * the library surface); results recorded in SCALE.md. */
object ZorderAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 200000000L
    val df = spark.range(0, n, 1, 32)
      .select(col("id").as("a"), (col("id") * 7919L % 65536L).as("b"))
    val zUdf = udf((a: Long, b: Long) => {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((a >> i) & 1L) << (2 * i + 1)
        z |= ((b >> i) & 1L) << (2 * i)
        i += 1
      }
      z
    })
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.selectExpr("sum(z)").head()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label: median ${ts(1)}%.2f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    time("expr")(df.select(graft.sources.Zorder.zValue(col("a"), col("b")).as("z")))
    time("udf ")(df.select(zUdf(col("a"), col("b")).as("z")))
    spark.stop()
  }
}
