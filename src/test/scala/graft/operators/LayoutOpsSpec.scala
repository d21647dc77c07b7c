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

  test("writeWithBloom: footer carries a bloom; misses prove absence") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomp").toString
    val ids = spark.range(0, 10000).select(($"id" * 7919L).as("id"))
    LayoutOps.writeWithBloom(ids.coalesce(1), s"$dir/t", Seq("id"), 10000L)
    val file = new java.io.File(s"$dir/t").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration))
    try {
      val rg = reader.getRowGroups.get(0)
      val colDesc = rg.getColumns.asScala
        .find(_.getPath.toDotString == "id").get
      val bf = reader.getBloomFilterDataReader(rg).readBloomFilter(colDesc)
      assert(bf != null, "footer must carry a bloom filter for id")
      // no false negatives: every written id probes true
      val present = (0L until 100L).forall(i => bf.findHash(bf.hash(i * 7919L)))
      assert(present)
      // misses prove absence: most non-multiples should probe false, and
      // ANY miss lets the reader skip the row group for that needle
      val misses = (0L until 100L).count(i => !bf.findHash(bf.hash(i * 7919L + 1L)))
      assert(misses > 50, s"expected mostly misses on absent ids, got $misses/100")
    } finally reader.close()
    // the bloom write is still a plain parquet file for any reader
    assert(spark.read.parquet(s"$dir/t").count() === 10000L)
  }
}
