package graft.io

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass data-quality counters via Spark's Observation API
  * (`CollectMetrics`): row count, per-column null counts, and a numeric
  * min/max band are accumulated ON the production write itself — no
  * second scan of the input. At 100 TB the difference between "write,
  * then re-read to validate" and "observe while writing" is a full extra
  * pass over the table; observed metrics ride the task results back to
  * the driver for free.
  *
  * Usage: `val (df2, obs) = QualityObserver.observed(df, Seq("k"), Some("v"))`
  * → run the write on `df2` → `obs.get` blocks until the action finishes
  * and returns the metric row.
  */
object QualityObserver {

  /** Attach an observation to `df`: `n_rows`, `<c>_nulls` per requested
    * column, and `<numCol>_min`/`_max` when a numeric column is given.
    * Returns the instrumented frame and the Observation handle. */
  def observed(df: DataFrame, nullCols: Seq[String],
               numCol: Option[String] = None): (DataFrame, Observation) = {
    val obs = Observation()
    val nullMetrics = nullCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    val numMetrics = numCol.toSeq.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    val metrics = count(lit(1)).as("n_rows") +: (nullMetrics ++ numMetrics)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
