package graft

import graft.core.Lineage
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Fault-tolerance contract of [[Lineage.cut]] (VERDICT r5 task 4).
  *
  * Every iterative operator (connected components, PageRank, k-core, LPA,
  * SSSP) truncates lineage at its round boundaries, so after a cut the
  * job CANNOT replay upstream stages — the cut data is the only copy.
  * On local[n] the default `localCheckpoint` keeps that copy in executor
  * block storage; on a 1000-executor cluster a single lost executor
  * destroys it mid-loop and the job is unrecoverable. The documented
  * remedy is `spark.graft.checkpointDir` → reliable `checkpoint()` to a
  * durable filesystem. These specs SIMULATE executor loss (dropping every
  * persisted block — the exact effect of losing the executors that held
  * a local checkpoint) and prove each side of the contract:
  *   - local mode really is destroyed by block loss (the simulation has
  *     teeth — the failure the conf exists to prevent is reproduced);
  *   - reliable mode survives the same loss with identical results,
  *     recomputing from the checkpoint files, not from storage.
  */
class FaultToleranceSpec extends SparkSpec {
  import spark.implicits._

  /** Simulated executor loss: every block-manager-resident copy of every
    * persisted RDD is dropped (blocking, so the loss has happened before
    * the next action — no listener-bus race). */
  private def dropAllBlocks(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

  /** Two chained cuts ≈ two rounds of an iterative loop: the second cut's
    * input is the first cut (its lineage is truncated there), the final
    * aggregate's input is the second. Losing blocks after materialization
    * leaves nothing to replay from in local mode. */
  private def twoRoundPipeline(): org.apache.spark.sql.DataFrame = {
    val base = spark.range(0, 1000).select($"id", ($"id" % 7).as("k"))
    val round1 = Lineage.cut(base.groupBy("k").agg(sum("id").as("s")))
    Lineage.cut(round1.filter($"s" > 0).withColumn("s2", $"s" * 2))
  }

  test("local checkpoint cut is destroyed by block loss (negative control)") {
    assert(spark.conf.getOption(Lineage.confKey).isEmpty)
    val cut = twoRoundPipeline() // eager: materialized into block storage
    assert(cut.count() === 7)    // healthy before the loss
    dropAllBlocks()
    val e = intercept[Exception] { cut.agg(sum("s2")).collect() }
    // Spark's own diagnosis of this exact scenario: "Checkpoint block
    // rdd_N_M not found! Either the executor that originally checkpointed
    // this partition is no longer alive, or the original RDD is
    // unpersisted."
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.toLowerCase.contains("checkpoint block")),
      s"expected a lost-checkpoint-block failure, got: ${msgs(e).take(3)}")
  }

  test("reliable checkpoint cut survives block loss with identical results") {
    val dir = Files.createTempDirectory("graft-reliable-ckpt").toString
    spark.conf.set(Lineage.confKey, dir)
    try {
      val cut = twoRoundPipeline()
      val healthy = cut.orderBy("k").as[(Long, Long, Long)].collect().toSeq
      dropAllBlocks()
      val recovered = cut.orderBy("k").as[(Long, Long, Long)].collect().toSeq
      assert(recovered === healthy)
      // durability is on DISK, not in storage: the checkpoint dir holds
      // the materialized partitions a replacement executor would read
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("part-")).count()
      assert(files > 0, s"no checkpoint part files written under $dir")
    } finally spark.conf.unset(Lineage.confKey)
  }

  test("checkpoint dir identity is the FULL qualified URI, not the bare path") {
    val dirA = Files.createTempDirectory("graft-ckpt-ident").toString
    try {
      // activate dirA, then reconfigure to the SAME filesystem identity
      // spelled with an explicit scheme: makeQualified resolves both to
      // one URI, so the active dir must be kept (no fresh subdir minted)
      spark.conf.set(Lineage.confKey, dirA)
      Lineage.cut(spark.range(3).toDF()).count()
      val active1 = spark.sparkContext.getCheckpointDir
      spark.conf.set(Lineage.confKey, s"file:$dirA")
      Lineage.cut(spark.range(3).toDF()).count()
      assert(spark.sparkContext.getCheckpointDir === active1,
        "same qualified identity must not re-mint the checkpoint dir")
      // an identity that fails to qualify must RE-SET (and so fail
      // loudly), never be silently treated as already-active — the
      // stale-location hazard the qualified compare exists to prevent
      spark.conf.set(Lineage.confKey, s"bogus-fs://cluster-b$dirA")
      val e = intercept[Exception] {
        Lineage.cut(spark.range(3).toDF()).count()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(m => m.toLowerCase.contains("bogus-fs") ||
        m.toLowerCase.contains("no filesystem")),
        s"expected a loud unsupported-filesystem failure, got: ${msgs(e).take(3)}")
    } finally {
      spark.conf.unset(Lineage.confKey)
      // restore a sane context dir for later suites sharing this session
      spark.sparkContext.setCheckpointDir(
        Files.createTempDirectory("graft-ckpt-reset").toString)
    }
  }

  test("connectedComponents completes correctly under sustained block loss " +
       "when the checkpoint dir is durable") {
    // a 12-node chain needs several pointer-jumping rounds (each round a
    // cut), plus a separate 2-node component as a control
    val pairs = ((0L until 11L).map(i => (i, i + 1)) :+ (100L, 101L))
      .toDF("a", "b")
    val expected = graft.operators.DedupOps.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(expected.count(_._2 == 0L) === 12 && expected.size === 14)

    val dir = Files.createTempDirectory("graft-cc-ckpt").toString
    spark.conf.set(Lineage.confKey, dir)
    // adversarial scheduler: after EVERY job (each CC round's convergence
    // count is one job), drop every persisted block before the next round
    // can read it — continuous simulated executor churn across the loop
    val churn = new SparkListener {
      override def onJobEnd(end: SparkListenerJobEnd): Unit =
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.sparkContext.addSparkListener(churn)
    try {
      val survived = graft.operators.DedupOps.connectedComponents(pairs, "a", "b")
        .as[(Long, Long)].collect().toSet
      assert(survived === expected)
    } finally {
      spark.sparkContext.removeSparkListener(churn)
      spark.conf.unset(Lineage.confKey)
    }
  }
}
