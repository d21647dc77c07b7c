package graft
import org.apache.spark.sql.SparkSession

/** Bench main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Results go to the `noop` sink — unlike
  * `.count()`, noop materializes every output column, so projection-heavy
  * queries can't be silently pruned to a row count. A warmup query runs
  * first so JVM/codegen startup doesn't land on the first timed query.
  *
  * Each query is timed over TWO passes and the MIN is reported
  * (`"passes":2` in the JSON makes the protocol self-describing). Min-of-N
  * is the standard way to measure the engine's compute cost rather than
  * transient host noise: same-code full-suite totals observed on this box
  * ranged 66→83 s across one hour purely from co-tenant interference, a
  * ±12% band that would drown real per-query regressions. The min of two
  * warm passes is a stable, reproducible statistic of the plan itself. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // A query that throws must surface in the artifact, not just stderr: a
    // fast failure is indistinguishable from a fast plan in the timings map
    // (an sf1 run once reported 0.06 s "wins" that were schema errors).
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.next().take(200) }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop blocks pinned by lineage cuts (localCheckpoint) so storage
      // pressure from one query can't bleed into the next — without this,
      // 100+ queries in one JVM accumulate pinned RDDs until eviction/GC
      // inflates late-suite timings ~2× (measured on this box)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }

    // warmup: JVM + codegen + parquet footer reads, untimed — one query
    // per hot code-path family (relational, shingle/kernel, vector,
    // window) so JIT compilation doesn't land on the first timed query of
    // each family
    exec("q1_pricing_summary")
    exec("dedup_ngram_jaccard")
    exec("sim_cosine_pairs")
    exec("events_asof_enrich")

    // dev affordance: `runMain graft.Bench q1 q2` times only those queries;
    // the driver passes no args and gets the full registry
    val names = if (args.nonEmpty) args.toSeq.sorted
                else SparkEntry.queries.keys.toSeq.sorted
    val passes = 2
    val results = names.map(n => n -> (1 to passes).map(_ => exec(n)).min)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
        .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","passes":$passes,"queries":$qs$errJson,"sf":"$sfDir"}"""
    println(line)
    // driver output tails can truncate the per-query map on long registries;
    // also persist the full line as a tracked artifact so every round's
    // per-query regression check is auditable from the repo alone.
    // Subset (dev) runs must not clobber the full-registry artifact;
    // SPARK_GRAFT_BENCH_OUT redirects it (e.g. the sf1 headroom run →
    // bench_full_sf1.json) so runs at other SFs don't either.
    if (args.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")),
        (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
