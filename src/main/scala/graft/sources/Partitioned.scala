package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout — the third leg of the layout toolkit
  * beside [[Bucketing]] (co-located joins) and [[Zorder]] (2-d range
  * locality): one directory per distinct value of a low-cardinality
  * column, so a query filtering on it never LISTS — let alone reads —
  * the other partitions' files (`PartitionFilters` in the scan, pruning
  * before any row group opens).
  *
  * The write pre-shuffles on the partition column so each output
  * directory is written by the tasks that own its key. Without this,
  * every input task holds rows of every partition value and writes one
  * file into each directory — tasks × partitions small files, the
  * classic 100 TB lake pathology. With it, files-per-directory is
  * bounded by the shuffle parallelism for that key.
  *
  * Fit: partition by the column EVERY query filters on and whose
  * cardinality stays in the hundreds (lang, source, date); bucket by
  * high-cardinality JOIN keys; z-order within files for 2-d ranges.
  */
object Partitioned {

  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)
}
