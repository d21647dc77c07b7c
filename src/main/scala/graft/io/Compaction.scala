package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the housekeeping a partitioned 100 TB lake
  * needs: streaming/incremental writers leave many small files per
  * partition; queries then pay per-file open cost and tiny row groups.
  * Rewrites one partition to ⌈bytes / targetBytes⌉ files via an
  * all-columns pass (no semantic change; idempotent — re-running
  * compacts to the same layout).
  *
  * All filesystem access goes through the Hadoop `FileSystem` API so the
  * same code resolves on local disk, HDFS, or an object store (s3a/gs) —
  * `java.io.File` would silently see nothing on the latter.
  */
object Compaction {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def partitionBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val f = fs(spark, p)
    if (!f.exists(p)) 0L
    else f.getContentSummary(p).getLength
  }

  /** Compact a single partition directory in place (read → coalesce →
    * overwrite). Returns the resulting file count. */
  def compactPartition(spark: SparkSession, partitionPath: String,
                       targetBytes: Long = 128L * 1024 * 1024): Int = {
    val bytes = partitionBytes(spark, partitionPath)
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(partitionPath)
    // stage through a temp dir: Spark cannot overwrite its own input
    val tmp = partitionPath + ".__compacting"
    df.coalesce(files).write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new Path(partitionPath)
    val f = fs(spark, target)
    // Hadoop FS signals failure via `false`, not exceptions — an ignored
    // false here either nests tmp INSIDE the surviving target (duplicate
    // data) or strands the only copy at tmp after target was deleted
    if (!f.delete(target, true) && f.exists(target))
      throw new java.io.IOException(s"compaction: could not delete $target")
    if (!f.rename(new Path(tmp), target))
      throw new java.io.IOException(s"compaction: could not rename $tmp -> $target")
    f.listStatus(target).count(_.getPath.getName.endsWith(".parquet"))
  }
}
