package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (x even, y odd)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (255L, 255L),
        (0xFFFFL, 0L), (0L, 0xFFFFL))
      .toDF("x", "y")
      .select(LayoutOps.zValue($"x", $"y")).as[Long].collect()
    assert(out(0) === 0L)
    assert(out(1) === 1L) // x bit 0 → z bit 0
    assert(out(2) === 2L) // y bit 0 → z bit 1
    assert(out(3) === 3L)
    assert(out(4) === 0xFFFFL)     // 8+8 bits interleave into low 16
    assert(out(5) === 0x55555555L) // x fills even bits
    assert(out(6) === 0xAAAAAAAAL) // y fills odd bits
  }

  test("z-order layout bounds BOTH dims per partition; x-sort bounds one") {
    // 64×64 grid → 16 partitions. Under z-order every partition owns a
    // contiguous z-range = a bounded box in (x, y); under an x-only sort
    // each partition spans the full y range. A y-range predicate then
    // prunes z-ordered partitions but can never prune x-sorted ones.
    val grid = spark.range(64L * 64L)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))

    def boxes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select($"y", spark_partition_id().as("p"))
        .groupBy($"p").agg(min($"y").as("ylo"), max($"y").as("yhi"))
        .select($"ylo", $"yhi").as[(Long, Long)].collect().toSeq

    val zBoxes = boxes(LayoutOps.zorderBy(grid, "x", "y", 16))
    val xBoxes = boxes(grid.repartitionByRange(16, $"x")
      .sortWithinPartitions($"x"))

    // predicate: y in [0, 7] — 1/8 of the y space
    val zHit = zBoxes.count { case (lo, hi) => lo <= 7 && hi >= 0 }
    val xHit = xBoxes.count { case (lo, hi) => lo <= 7 && hi >= 0 }
    assert(xHit === xBoxes.size, "x-sorted layout cannot prune on y")
    assert(zHit <= zBoxes.size / 2,
      s"z-order should bound y per partition: $zHit of ${zBoxes.size} hit")
    // and the layout is lossless
    assert(LayoutOps.zorderBy(grid, "x", "y", 16).count() === 64L * 64L)
  }
}
