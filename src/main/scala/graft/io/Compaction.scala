package graft.io

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the housekeeping a partitioned 100 TB lake
  * needs: streaming/incremental writers leave many small files per
  * partition; queries then pay per-file open cost and tiny row groups.
  * Rewrites one partition to ⌈bytes / targetBytes⌉ files via an
  * all-columns pass (no semantic change; idempotent — re-running
  * compacts to the same layout).
  */
object Compaction {

  def partitionBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  /** Compact a single partition directory in place (read → coalesce →
    * overwrite). Returns the resulting file count. */
  def compactPartition(spark: SparkSession, partitionPath: String,
                       targetBytes: Long = 128L * 1024 * 1024): Int = {
    val bytes = partitionBytes(partitionPath)
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(partitionPath)
    // stage through a temp dir: Spark cannot overwrite its own input
    val tmp = partitionPath + ".__compacting"
    df.coalesce(files).write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(partitionPath)
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(delete)); f.delete()
    }
    delete(target)
    new java.io.File(tmp).renameTo(target)
    Option(target.listFiles).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
  }
}
