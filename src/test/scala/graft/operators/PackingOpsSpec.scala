package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g"),    // 7 tokens
    (2L, "h i j"),            // 3
    (3L, "k"),                // 1
    (4L, "l m n o p q r s t") // 9
  ).toDF("doc_id", "text")

  test("chunkByTokens: stride == chunk partitions tokens exactly (lossless)") {
    val rebuilt = PackingOps.chunkByTokens(docs, "doc_id", "text", 3, 3)
      .groupBy($"doc_id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct($"chunk_id", $"chunk_text"))),
          c => c("chunk_text"))).as("re"),
        sum($"chunk_tokens").as("n"))
      .orderBy($"doc_id")
      .as[(Long, String, Long)].collect()
    val orig = docs.orderBy($"doc_id")
      .select($"doc_id", $"text", size(split($"text", " ")).cast("long"))
      .as[(Long, String, Long)].collect()
    assert(rebuilt === orig)
  }

  test("chunkByTokens: overlapping windows slide by stride") {
    val chunks = PackingOps.chunkByTokens(
        docs.filter($"doc_id" === 1L), "doc_id", "text", 4, 2)
      .orderBy($"chunk_id")
      .select($"chunk_text").as[String].collect()
    // 7 tokens, starts 0,2,4,6
    assert(chunks === Seq("a b c d", "c d e f", "e f g", "g"))
  }

  test("chunkByTokens is scan-local: no Exchange in the plan") {
    val plan = PackingOps.chunkByTokens(docs, "doc_id", "text", 32, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("packSequences: two-level cumsum equals a global-window cumsum") {
    val d = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
    val packed = PackingOps.packSequences(d, "doc_id", "text", 256L, 8)
      .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toMap
    val global = d.select($"doc_id",
        sum(size(split($"text", " ")).cast("long")).over(
          Window.orderBy($"doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("c"))
      .as[(Long, Long)].collect().toMap
    assert(packed === global)
  }

  test("packSequences: every doc binned once, bins nondecreasing in id order") {
    val rows = PackingOps.packSequences(docs, "doc_id", "text", 8L, 4)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"cum_tokens", $"bin")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1) === Seq(1L, 2L, 3L, 4L))
    // budget 8: cum_before = 0,7,10,11 -> bins 0,0,1,1
    assert(rows.map(_._4) === Seq(0L, 0L, 1L, 1L))
    assert(rows.map(_._3) === Seq(7L, 10L, 11L, 20L))
  }
}
