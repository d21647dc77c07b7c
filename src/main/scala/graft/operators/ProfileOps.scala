package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Data-profiling operator: one pass over the table computing
  * per-column null counts, distincts (exact or HLL sketch), min/max —
  * the pre-flight check of every large-scale training-data run.
  * One aggregate, all columns at once: a single scan + single (tiny)
  * shuffle regardless of column count.
  */
object ProfileOps {

  /** Wide one-row profile: for each column — nulls, distinct, min, max
    * (stringified for heterogeneous output). `approx` switches distinct
    * counting to HyperLogLog++ (rsd 5%), the only sane choice at 100 TB. */
  def profile(df: DataFrame, columns: Seq[String], approx: Boolean = false)
      : DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (approx) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Long-layout profile (column, nulls, n_distinct, min, max) — the
    * reporting shape; built by unpivoting the wide one-row result on the
    * driver side (the wide row is O(columns), not data-sized). */
  def profileLong(df: DataFrame, columns: Seq[String], approx: Boolean = false)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val row = profile(df, columns, approx).head()
    columns.map { c =>
      (c,
        row.getAs[Long](s"${c}__nulls"),
        row.getAs[Long](s"${c}__distinct"),
        row.getAs[String](s"${c}__min"),
        row.getAs[String](s"${c}__max"))
    }.toDF("column", "nulls", "n_distinct", "min", "max")
  }

  /** Exact interpolated per-group percentiles WITHOUT the `percentile`
    * aggregate. Spark's exact percentile builds a value→count
    * OpenHashMap per partial-aggregation task (~|distinct| entries EACH,
    * serialized through the shuffle) and merges+sorts single-threaded
    * per group — on a near-unique column that ships ~cores copies of
    * each group's data through the wire. This form computes the
    * identical answer from pieces that stay narrow and parallel: one
    * hash-agg to per-value counts, one window pass over the DISTINCT
    * value table for cumulative ranks (per-group sort happens once, not
    * once per map task), then a rank-covering lookup of the two
    * straddling values per requested percentile.
    *
    * The interpolation replicates
    * `catalyst.expressions.aggregate.Percentile.getPercentile` op for op
    * — position = p·(n−1) in double, floor/ceil straddling ranks,
    * `(hi−pos)·vlo + (pos−lo)·vhi` — INCLUDING its two special cases
    * (integral position; equal straddling values, where the two-product
    * form can differ 1 ulp from the bare value), so results are
    * bit-identical to the aggregate (PropertySpec percentile identity on
    * random multisets with ties). Returns one row per group:
    * (groupCol, <name per requested percentile>), unrounded. */
  def exactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                       pcts: Seq[(Double, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(groupCol))
    val ranked = counts
      .withColumn("hi", sum(col("cnt")).over(byVal))
      .withColumn("lo", col("hi") - col("cnt") + 1)
      .withColumn("n", max(col("hi")).over(whole))
    val aggs = pcts.map { case (p, name) =>
      val pos = lit(p) * (col("n") - lit(1)) // double, as Percentile does
      val lower = floor(pos) + 1             // 1-based straddling ranks
      val higher = ceil(pos) + 1
      val vlo = max(when(col("lo") <= lower && lower <= col("hi"), col(valueCol)))
      val vhi = max(when(col("lo") <= higher && higher <= col("hi"), col(valueCol)))
      val interp = (ceil(pos) - pos) * vlo + (pos - floor(pos)) * vhi
      when(ceil(pos) === floor(pos) || vlo === vhi, vlo).otherwise(interp)
        .as(name)
    }
    ranked
      // n is functionally dependent on the group (one total per group);
      // grouping on it makes it referencable inside the rank math
      .groupBy(col(groupCol), col("n"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("n")
  }
}
