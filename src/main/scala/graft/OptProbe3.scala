package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 probe batch 3: signature-build stage costs of the
  * simhash/minhash family, and the bucketedPairs grid, to size whether a
  * per-doc signature kernel is worth building. Read-only (guide §1.1).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.OptProbe3 [passes]"`. */
object OptProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-opt-probe3")
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
      println(f"[probe3] $name%-46s $t%7.3f s")
    }

    import graft.operators.{DedupOps, TextOps}
    def docs = graft.core.Tables(spark, sfDir).documents

    // warmup
    time("warmup_scan")(docs.select($"doc_id", length($"text").as("l")))

    time("simhash64_signatures")(
      DedupOps.simhashes64(docs, "doc_id", TextOps.tokens($"text")))
    time("simhash_full")(SparkEntry.queries("dedup_simhash")(spark, sfDir))

    val withShingles = docs
      .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      .select($"doc_id", array_distinct($"shingles").as("shingles"))
    time("minhash_signatures_k16")(
      DedupOps.minhashSignatures(withShingles, "doc_id", "shingles", 16))
    time("minhash_lsh_full")(SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir))

    // bucketedPairs grid alone (simhash banding)
    val sim = DedupOps.simhashes64(docs, "doc_id", TextOps.tokens($"text"))
    val banded = sim.select($"id", $"bands", posexplode($"bands"))
      .select($"id", $"bands", $"pos".as("band"), $"col".as("bucket"))
    time("simhash_bucketed_pairs")(
      DedupOps.bucketedPairs(banded, carry = Seq("bands")))

    spark.stop()
  }
}
