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

  /** Per-table write serialization. Spark's dynamic partition overwrite
    * commit is NOT atomic across writers (delete-then-rename per
    * partition): two concurrent jobs overwriting the same partition can
    * interleave delete/rename and leave a mixed or nested directory —
    * Spark explicitly does not support concurrent writes to one table.
    * Within one driver JVM this lock makes "one writer's complete payload
    * wins" true by construction (the reference gets the same guarantee
    * from S3 whole-object last-put-wins). ACROSS drivers nothing here can
    * help: same-source runs must be serialized by the ledger
    * (`PartitionLedger.isProcessed` + one runner per source, as IngestJob
    * does) — that is the documented contract, not a suggestion. */
  private val writeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def serialized[T](path: String)(body: => T): T =
    writeLocks.computeIfAbsent(path, _ => new Object).synchronized(body)

  /** K1/K2: partitioned bronze write. `format` ∈ json/csv/parquet; bronze
    * is text (json/csv) in the reference, parquet from silver on. CSV
    * writes the header row: the reference lands `to_csv(index=False)`
    * output (yfinance_operator.py:145-146) whose first line is the
    * column names — Spark's headerless CSV default would re-read as
    * `_c0…`, silently dropping the schema at the format boundary. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       format: String = "json"): Unit =
    serialized(path) {
      val w = df.write
        .mode(SaveMode.Overwrite)
        .partitionBy(partitionCol)
        .format(format)
      (if (format == "csv") w.option("header", "true") else w).save(path)
    }

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

  /** MERGE-INTO semantics on a plain partitioned parquet table: delta rows
    * replace same-key rows, new keys append, everything else is kept —
    * and ONLY the partitions present in the delta are read or rewritten.
    *
    * Scale shape: the existing-side read is pruned to the delta's
    * partitions WITHOUT ever materializing the partition list on the
    * driver — a 10-year backfill delta would inline thousands of literals
    * through a collect+`isin`. Instead (a) a one-row min/max agg bounds
    * the scan statically (two literals in the plan regardless of delta
    * size — planning-time partition pruning), and (b) a broadcast LEFT
    * SEMI join against the delta's distinct partition values prunes
    * exactly, with the `between` predicate on the build side making it
    * DPP-eligible (Catalyst's PartitionPruning requires a likely-selective
    * predicate on the build side; a bare distinct does not qualify), so
    * gap partitions inside the range are dropped by
    * `dynamicpruningexpression` at the SCAN, not post-read. 100 TB of
    * untouched history is never scanned; the write is a dynamic partition
    * overwrite, so untouched partitions' files are never replaced. The
    * merged frame is lineage-cut (`Lineage.cut`) before the
    * overwrite: the read and the write share `path`, and the cut both
    * materializes the merge result ahead of any file deletion and removes
    * the self-referencing file scan from the write plan. On a real
    * cluster set `spark.graft.checkpointDir` so the cut is durable — a
    * lost executor between materialize and commit must not be able to
    * drop blocks of the data being written over its only source.
    *
    * Generalizes the reference's per-object `replace=True` put
    * (dags/common/s3_utils.py:7-14) from whole-partition replacement to
    * keyed row-level upsert. */
  def upsertByKey(delta: DataFrame, path: String, keyCols: Seq[String],
                  partitionCol: String): Unit = serialized(path) {
    val spark = delta.sparkSession
    val exists = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    val merged = if (!exists) delta else {
      // keep-existing-unless-replaced: anti-join on the key, then union
      prunedCurrent(delta, path, partitionCol)
        .join(delta.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
        .unionByName(delta)
    }
    graft.core.Lineage.cut(merged)
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
  }

  /** The existing-table read for [[upsertByKey]], pruned to the delta's
    * partitions without a driver-side partition list (see the upsert
    * Scaladoc for why each piece exists). Visible so the plan shape —
    * two range literals, no `isin` list, DPP-eligible semi join — is
    * assertable in WritersSpec. */
  private[graft] def prunedCurrent(delta: DataFrame, path: String,
                                   partitionCol: String): DataFrame = {
    val spark = delta.sparkSession
    // one-row driver agg: static scan bounds, O(1) in delta partitions
    val Seq(minP, maxP) = delta
      .agg(min(col(partitionCol)), max(col(partitionCol)))
      .head().toSeq
    val touched = delta.select(col(partitionCol)).distinct()
      .filter(col(partitionCol).between(lit(minP), lit(maxP)))
    spark.read.parquet(path)
      .filter(col(partitionCol).between(lit(minP), lit(maxP)))
      .join(broadcast(touched), Seq(partitionCol), "left_semi")
  }
}
