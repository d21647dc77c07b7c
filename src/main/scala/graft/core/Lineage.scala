package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage cuts with a durability switch.
  *
  * Every iterative / self-join operator in the engine cuts lineage at
  * well-known sites (encoded-set reuse, posting lists, each
  * connected-components round, composite-pipeline stage boundaries).
  * By default the cut is `localCheckpoint`: blocks live in EXECUTOR
  * storage — fast, no configuration, correct on local[n]. But on a real
  * cluster a single lost executor makes a local checkpoint unrecoverable,
  * which is fatal for an iterative job (the connected-components loop)
  * whose lineage was truncated: the job cannot replay what it deliberately
  * forgot. Setting `spark.graft.checkpointDir` to a durable (HDFS/S3)
  * path switches every cut site to a RELIABLE `checkpoint()` that
  * survives executor loss — the posture a 100 TB, 1000-executor run
  * wants. (Reference analog: Glue job bookmarks persist job progress
  * durably rather than in worker memory,
  * glue_job_scripts/industry_code_glue_job.py:26-32.)
  */
object Lineage {
  val confKey = "spark.graft.checkpointDir"

  /** Cut the plan lineage here. `eager = false` materializes at the first
    * action, so plan-only callers (explain, plan specs, query
    * enumeration) trigger no job in either mode. */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(confKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // honor the CURRENTLY configured dir: a context-level dir left
        // over from an earlier configuration must not silently redirect
        // durable checkpoints. getCheckpointDir is the fully-qualified
        // form of dir plus a minted UUID subdir, so the active dir is
        // current iff its PARENT equals the configured dir — compared on
        // the FULL qualified identity (scheme + authority + path, via
        // Hadoop's own makeQualified, which resolves scheme-less dirs
        // against the default FS exactly like setCheckpointDir does).
        // Path-only comparison treated hdfs://nn1/ckpt as already-active
        // when hdfs://nn2/ckpt (or an s3 dir with the same path) was —
        // a filesystem move that silently kept writing to the stale
        // location. Either side failing to qualify falls back to
        // re-setting, so a broken identity can never be "already active"
        // (setCheckpointDir mints a fresh subdir; correctness unchanged).
        def qualified(s: String): Option[String] =
          try {
            val p = new org.apache.hadoop.fs.Path(s)
            Some(p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .makeQualified(p).toUri.toString.stripSuffix("/"))
          } catch { case scala.util.control.NonFatal(_) => None }
        val want = qualified(dir)
        val activeParent = spark.sparkContext.getCheckpointDir.flatMap(c =>
          qualified(c).map(q => q.substring(0, math.max(q.lastIndexOf('/'), 0))))
        if (want.isEmpty || activeParent != want)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  /** Chainable syntax: `df.filter(...).cut(eager = false)`. */
  implicit class LineageOps(private val df: DataFrame) extends AnyVal {
    def cut(eager: Boolean = true): DataFrame = Lineage.cut(df, eager)
  }
}
