package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-side schema handling: the evolution counterpart to
  * `SchemaRegistry` (infer-once) — what happens when a long-lived bronze
  * lineage GAINS columns across versions (the reference's feeds add
  * fields; Glue crawlers re-infer — `industry_code_glue_job.py` reads
  * whatever the catalog says today).
  */
object Readers {

  /** Read a parquet lineage whose later files may carry ADDED columns:
    * `mergeSchema` unions all file footers into one schema and rows from
    * older files surface the newer columns as NULL — no rewrite of
    * history. Column pruning and filter pushdown still apply per file
    * (a file without the column prunes to the null vector).
    *
    * Note the cost model: schema merging reads every file footer at
    * planning time, which is why it is opt-in here and OFF for the hot
    * single-schema paths. */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** [[readEvolved]] + conform to a required column set: absent columns
    * are materialized as NULL of the declared type, extra columns are
    * dropped, order is canonical — the "old reader over new data / new
    * reader over old data" compatibility shim. */
  def readConformed(spark: SparkSession, required: Seq[(String, String)],
                    paths: String*): DataFrame = {
    val df = readEvolved(spark, paths: _*)
    val present = df.columns.toSet
    df.select(required.map { case (name, dtype) =>
      (if (present(name)) col(name) else lit(null)).cast(dtype).as(name)
    }: _*)
  }
}
