package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned sinks (SURVEY §2B K1–K5).
  *
  * Idempotence contract (C3): every write is a *dynamic partition
  * overwrite* — re-running `ymd=d` replaces exactly that partition and
  * leaves the rest of the table intact, reproducing the reference's
  * `replace=True` per-object overwrite (dags/common/s3_utils.py:7-14).
  * Requires `spark.sql.sources.partitionOverwriteMode=dynamic`
  * (set by GraftSession).
  */
object Writers {

  /** K1: partitioned bronze write. `format` ∈ json/csv/parquet; bronze is
    * text (json/csv) in the reference, parquet from silver on. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       format: String = "json"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .format(format)
      .save(path)

  /** K1 single-partition form: tag the partition value then dynamic-
    * overwrite — the common `runFor(date)` write. */
  def writeForDate(df: DataFrame, path: String, ymd: String,
                   format: String = "json"): Unit =
    writePartitioned(df.withColumn("ymd", lit(ymd)), path, "ymd", format)

  /** K3: silver parquet overwrite (industry_code_glue_job.py:53-66). */
  def writeSilver(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** K4: warehouse full-refresh — drop-and-recreate semantics of the
    * reference's Redshift preactions (industry_code_glue_job.py:89-101),
    * against the session catalog as the stand-in warehouse. */
  def warehouseFullRefresh(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(table)

  /** K4, real JDBC form: the reference loads Redshift with explicit
    * preactions `DROP TABLE ...; CREATE TABLE ...` before the COPY
    * (industry_code_glue_job.py:89-101). Same sequence here: the DROP runs
    * as a driver-side preaction statement (DROP-if-exists emulated via
    * catch — Derby has no IF EXISTS), then Spark's JDBC writer creates the
    * table from the DataFrame schema and inserts partitions in parallel.
    * Overwrite-mode's truncate path is deliberately NOT used: full refresh
    * here means a fresh table per the reference, not a truncated one. */
  def warehouseFullRefreshJdbc(df: DataFrame, table: String, url: String,
                               driver: Option[String] = None): Unit = {
    // register the driver for the preaction connection too — the Spark
    // writer resolves it from the option, but DriverManager does not
    driver.foreach(Class.forName)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // existence check instead of a swallow-all catch around DROP: a DROP
      // failing for any reason OTHER than absence (lock, privilege) must
      // surface, or Append below would silently double the table
      val rs = conn.getMetaData.getTables(null, null, null,
        Array("TABLE"))
      var exists = false
      try {
        while (rs.next() && !exists)
          exists = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
      } finally rs.close()
      if (exists) {
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE $table")
        finally st.close()
      }
    } finally conn.close()
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .mode(SaveMode.Append) // table was dropped above; Spark creates it
    driver.fold(w)(d => w.option("driver", d)).save()
  }

  /** K5-shape: idempotent year-partition refresh for the calendar dim —
    * ≡ the procedure's `DELETE WHERE year=` + insert (sql.py:36). */
  def writeYearPartition(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy("year").parquet(path)
}
