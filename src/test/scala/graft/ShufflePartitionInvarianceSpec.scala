package graft

/** Shuffle-partition invariance sweep (VERDICT r6 task 7).
  *
  * Everything is tuned on local[32] with shuffle.partitions=32; a
  * 1000-executor cluster runs the same plans at hundreds-to-thousands of
  * shuffle partitions. Partition count changes task boundaries, partial-
  * aggregation grouping, merge order, and (for the custom aggregators)
  * buffer-merge order — none of which may change RESULTS: the engine's
  * discipline is integer/rounded arithmetic before any cut, order-
  * independent aggregation algebra, and deterministic tie-breaks.
  *
  * This spec RE-EXECUTES the ten most shuffle-heavy registry queries at
  * shuffle.partitions = 8 / 32 / 200 and asserts the collected results
  * are bit-identical (string render of every row, sorted — doubles must
  * match to the last bit, not within a tolerance). Wall-clock per setting
  * is reported so the cluster-conf story has a datum: at this toy SF the
  * 200-partition leg pays pure scheduling overhead, which is the
  * expected shape (partitions ≫ data); the invariance is the claim.
  */
class ShufflePartitionInvarianceSpec extends SparkSpec {

  /** The shuffle-heavy set: iterative CC + label propagation, LSH
    * banding, the composite pipeline, sessionization, the deterministic
    * epoch shuffle, both skew-salted plans, a windowed rolling stat, and
    * the custom bounded-heap/CMS aggregates. */
  private val queries = Seq(
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_cluster_sizes",
    "pipeline_training_corpus",
    "graph_pagerank",
    "events_session_windows",
    "mix_epoch_shuffle",
    "agg_skew_salted",
    "join_skew_salted",
    "stats_heavy_hitters",
    "dedup_simhash") // r8: rebuilt 64-bit form, sharded band join

  test("results are bit-identical at shuffle.partitions = 8 / 32 / 200") {
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      val settings = Seq(8, 32, 200)
      val header = f"${"query"}%-28s" +
        settings.map(n => f"p=$n%-5d").mkString(" ") + " (sec at sf0.001)"
      info(header)
      queries.foreach { q =>
        val legs = settings.map { n =>
          spark.conf.set(key, n.toString)
          val t0 = System.nanoTime()
          val res = SparkEntry.queries(q)(spark, TestSpark.sfDir)
            .collect().map(_.toString).sorted.toSeq
          val dt = (System.nanoTime() - t0) / 1e9
          (n, res, dt)
        }
        info(f"$q%-28s" + legs.map(l => f"${l._3}%5.1f ").mkString(" "))
        assert(legs.head._2.nonEmpty, s"$q returned no rows")
        legs.tail.foreach { case (n, res, _) =>
          assert(res === legs.head._2,
            s"$q: results differ between ${settings.head} and $n partitions")
        }
      }
    } finally spark.conf.set(key, orig)
  }

  test("cogroup verify is bucket-count invariant: the exact-CC queries " +
      "are bit-identical at P = 8 / 32 / 200 with the cogroup path pinned") {
    // the blocked cogroup verify derives its bucket count P from
    // shuffle.partitions — the knob a real cluster turns — so varying it
    // must only re-shape the routing, never the verified pairs. At this
    // toy SF the auto path takes the join verify (below the cutoff);
    // pinning the cutoff at 0 forces the cogroup branch under all three
    // P values.
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    spark.conf.set("spark.graft.dedup.verifyJoinCutoff", "0")
    try {
      for (q <- Seq("dedup_components", "dedup_cluster_sizes",
          "dedup_ppjoin_jaccard")) {
        val legs = Seq(8, 32, 200).map { n =>
          spark.conf.set(key, n.toString)
          SparkEntry.queries(q)(spark, TestSpark.sfDir)
            .collect().map(_.toString).sorted.toSeq
        }
        assert(legs.head.nonEmpty, s"$q returned no rows")
        assert(legs.tail.forall(_ === legs.head),
          s"$q: cogroup-verified results vary with bucket count")
      }
    } finally {
      spark.conf.set(key, orig)
      spark.conf.unset("spark.graft.dedup.verifyJoinCutoff")
    }
  }
}
