package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Data-layout operators for scan pruning at scale.
  *
  * Partition pruning (ymd= dirs) and bucketing (co-located joins) are
  * covered by io.Layout/Writers; this adds MULTI-DIMENSIONAL clustering:
  * Z-ordering interleaves the bits of two sort dimensions so that a
  * file's contiguous z-range bounds BOTH dimensions at once — parquet
  * min/max stats then skip files for 2-D range predicates the way a
  * plain sort skips for its single leading column. The standard layout
  * trick for "filter by (user, time) or (time, user) equally often" at
  * 100 TB, without writing the data twice.
  *
  * Everything is pure column arithmetic on longs (shift/and/or — inside
  * whole-stage codegen); the clustering itself is `repartitionByRange` +
  * `sortWithinPartitions` on the z-value, both existing Spark machinery.
  */
object LayoutOps {

  /** Spread the low 16 bits of x so bit i lands at bit 2i — the Morton
    * magic-number spreading sequence. */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two dims (low 16 bits each): x takes the even
    * bits, y the odd bits. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Cluster `df` for 2-D range predicates on (xCol, yCol): range-
    * partition on the z-value (each output partition owns a contiguous
    * z-range ⇒ a bounded box in (x, y) space) and sort within partitions
    * so parquet row-group stats are tight too. The z column is internal
    * and dropped after the physical sort. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
               partitions: Int): DataFrame =
    df.withColumn("_z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")

  /** Write parquet with row-group BLOOM FILTERS on the given columns —
    * the point-lookup complement to z-order's range pruning: min/max
    * row-group stats can't skip for high-cardinality ids scattered per
    * row group, but a footer bloom filter answers "id definitely not
    * here" per row group, so a needle query opens only the groups that
    * might match. Pure parquet-format feature (parquet-hadoop honors the
    * `parquet.bloom.filter.enabled#col` write options); readers that
    * ignore blooms still read the file normally. */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                     expectedDistinct: Long = 100000L): Unit = {
    val w = bloomCols.foldLeft(df.write.mode("overwrite")) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c",
          expectedDistinct.toString)
    }
    w.parquet(path)
  }
}
