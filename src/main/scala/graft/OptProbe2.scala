package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-14 probe batch 2: where do the remaining hot queries spend —
  * the shingle HOF scan (every dedup/hygiene query's first stage), the
  * PPJoin pipeline's internal stages, and the bottom-k containment
  * probe's join-side choice. Read-only measurements (guide §1.1).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.OptProbe2 [passes]"`. */
object OptProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-opt-probe2")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(df: => DataFrame): Unit = {
      val t = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe2] $name%-46s $t%7.3f s")
    }

    import graft.operators.{DedupOps, TextOps}
    import graft.core.Lineage.LineageOps
    def docs = graft.core.Tables(spark, sfDir).documents
    val par = spark.sparkContext.defaultParallelism

    // ---- raw scan cost decomposition --------------------------------
    time("scan_text_only")(docs.select($"doc_id", length($"text").as("l")))
    time("scan_tokens")(docs.select($"doc_id", size(split($"text", " ")).as("n")))
    time("scan_shingles2")(docs.select($"doc_id",
      size(TextOps.shingles($"text", 2)).as("n")))
    time("scan_shingles2_distinct_hash_sorted")(docs.select($"doc_id",
      size(sort_array(transform(array_distinct(TextOps.shingles($"text", 2)),
        t => xxhash64(t)))).as("n")))
    time("scan_shingles3")(docs.select($"doc_id",
      size(TextOps.shingles($"text", 3)).as("n")))
    time("scan_shingles8")(docs.select($"doc_id",
      size(TextOps.shingles($"text", 8)).as("n")))

    // ---- PPJoin internal stages (t=0.9, plain corpus) -----------------
    val sh = docs.select($"doc_id", TextOps.shingles($"text", 2).as("sh"))
    val sets = sh.select($"doc_id".as("id"),
        sort_array(transform(array_distinct($"sh"), t => xxhash64(t))).as("s"))
      .withColumn("sz", size($"s"))
      .repartition(par)
      .cut(eager = false)
    time("ppjoin_encoded_sets")(sets)
    val posting = sets.select($"id", $"sz", explode($"s").as("h"))
    time("ppjoin_posting_explode")(posting)
    val freq = posting.groupBy($"h").agg(count(lit(1)).as("df"))
    time("ppjoin_df_agg")(freq)
    val eps = 1e-9
    val threshold = 0.9
    val prefixLen = $"sz" - ceil(lit(threshold) * $"sz" - eps) + 1
    val byRarity = Window.partitionBy($"id").orderBy($"df", $"h")
    val prefixes = posting.join(freq, "h")
      .withColumn("rn", row_number().over(byRarity))
      .filter($"rn" <= prefixLen)
      .select($"id", $"sz", $"rn", $"h")
    time("ppjoin_prefixes_window")(prefixes)
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      ($"l.sz" + $"r.sz") - eps)
    val positionOk =
      (lit(1) + least($"l.sz" - $"l.rn", $"r.sz" - $"r.rn")) >= alpha
    val lengthOk = least($"l.sz", $"r.sz").cast("double") >=
      greatest($"l.sz", $"r.sz") * threshold
    val candidates = prefixes.as("l").join(prefixes.as("r"),
        $"l.h" === $"r.h" && $"l.id" < $"r.id" && lengthOk && positionOk)
      .select($"l.id".as("id_a"), $"r.id".as("id_b"))
      .distinct()
    time("ppjoin_candidates")(candidates)
    time("ppjoin_full")(DedupOps.jaccardPairs(sh, "doc_id", "sh", 0.9))

    // ---- bottom-k containment probe: join-side variants ----------------
    def bottomkSets = docs
      .select($"doc_id", TextOps.shingles($"text", 3).as("shingles"))
      .select($"doc_id",
        sort_array(array_distinct(
          transform(array_distinct($"shingles"), t => TextOps.hash32(t))))
          .as("hs"))
      .withColumn("sz", size($"hs"))
      .filter($"sz" > 0)
      .repartition(par)
      .cut(eager = false)
    def bottomkDirected(join: (DataFrame, DataFrame) => DataFrame): DataFrame = {
      val ss = bottomkSets
      val posting = ss.select($"doc_id".as("qid"), explode($"hs").as("h"))
      val probe = ss.select($"doc_id".as("pid"), $"sz", explode(slice($"hs", 1, 16)).as("h"))
      join(probe, posting)
        .filter($"pid" =!= $"qid")
        .groupBy($"pid".as("a"), $"qid".as("b"), $"sz".as("sza"))
        .agg(count(lit(1)).as("m"))
        .withColumn("est", $"m".cast("double") / least(lit(16), $"sza"))
    }
    time("bottomk_asis")(bottomkDirected((p, q) => p.join(q, "h")))
    time("bottomk_probe_bcast")(bottomkDirected((p, q) => q.join(broadcast(p), "h")))
    time("bottomk_shuffle_merge")(bottomkDirected((p, q) =>
      p.hint("merge").join(q, "h")))
    time("bottomk_shuffle_hash")(bottomkDirected((p, q) =>
      p.hint("shuffle_hash").join(q, "h")))
    time("bottomk_full_query")(SparkEntry.queries("dedup_containment_bottomk")(spark, sfDir))

    spark.stop()
  }
}
