package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gold analysis layer (SURVEY §7.6): the backtesting shapes implied by
  * the reference's stated purpose (README.md:3 "backtesting and
  * analysis") over long-layout OHLCV series — returns, moving averages/
  * volatility, drawdown, cross-asset as-of alignment, calendar joins.
  *
  * Every op is windowed per asset key (one shuffle on the key; state
  * bounded per key) — the plan shape survives 1000 assets or 10M.
  */
object GoldOps {

  private def byAsset(key: String, date: String) =
    Window.partitionBy(col(key)).orderBy(col(date))

  /** Daily simple + log returns per asset. */
  def withReturns(prices: DataFrame, key: String, date: String,
                  close: String): DataFrame = {
    val w = byAsset(key, date)
    val prev = lag(col(close), 1).over(w)
    prices
      .withColumn("ret", col(close) / nullif(prev, lit(0.0)) - 1)
      .withColumn("log_ret",
        when(prev > 0 && col(close) > 0, log(col(close) / prev)))
  }

  /** Rolling moving average + volatility (stddev of returns) over the
    * trailing `n` rows. */
  def withRolling(prices: DataFrame, key: String, date: String,
                  close: String, n: Int): DataFrame = {
    val w = byAsset(key, date).rowsBetween(-(n - 1), Window.currentRow)
    prices
      .withColumn(s"ma$n", avg(col(close)).over(w))
      .withColumn(s"vol$n", stddev_samp(col("ret")).over(w))
  }

  /** Running maximum drawdown: 1 − close / running_max(close). */
  def withDrawdown(prices: DataFrame, key: String, date: String,
                   close: String): DataFrame = {
    val w = byAsset(key, date).rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    prices.withColumn("drawdown",
      lit(1.0) - col(close) / max(col(close)).over(w))
  }

  /** As-of alignment of a sparse series onto a dense date spine (e.g. FX
    * onto trading days): union + running last-known-value — the scalable
    * as-of join (single shuffle, no range-join explosion). `valueCols`
    * are carried from the sparse side. */
  def asOfAlign(spine: DataFrame, sparse: DataFrame, key: String,
                date: String, valueCol: String): DataFrame = {
    val tagged = spine.select(col(key), col(date), lit(null).cast("double").as("__v"),
        lit(1).as("__side"))
      .unionByName(sparse.select(col(key), col(date),
        col(valueCol).cast("double").as("__v"), lit(0).as("__side")))
    val w = Window.partitionBy(col(key)).orderBy(col(date), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(valueCol, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__v", "__side")
  }

  /** OHLC resampling: collapse a tick/daily series to one bar per
    * (asset, bucket) — open = value at the earliest (ts, tiebreak), close
    * at the latest, high/low = max/min. A single hash aggregate using
    * `min_by`/`max_by` with a struct ordering key: one shuffle, map-side
    * partial aggregation, no window sort — the shape that survives any
    * number of assets or ticks per bucket. */
  def ohlcResample(series: DataFrame, key: String, tsCol: String,
                   tiebreak: String, valueCol: String,
                   bucket: Column): DataFrame = {
    val ord = struct(col(tsCol), col(tiebreak))
    series.groupBy(col(key), bucket.as("bucket"))
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n"))
  }

  /** Cross join with the calendar dim to label trading vs holiday rows
    * (broadcast — the calendar is tiny). */
  def withCalendar(prices: DataFrame, calendar: DataFrame, date: String)
      : DataFrame =
    prices.join(broadcast(calendar.select(col("date").as(date),
      col("is_market_holiday"), col("quarter_id"))), Seq(date), "left")

  /** OHLC bars as MERGEABLE PARTIALS: same bars as [[ohlcResample]] plus
    * the ordering keys (open/close ts + tiebreak) that make two partial
    * bars combinable. This is the incremental-gold algebra: maintain the
    * bar table by merging each micro-batch's partials into the stored
    * partials (associative and order-independent — spec-asserted), never
    * re-reading history. Project the partials through [[ohlcFinish]] for
    * the user-facing bar columns. */
  def ohlcPartials(series: DataFrame, key: String, tsCol: String,
                   tiebreak: String, valueCol: String,
                   bucket: Column): DataFrame = {
    val ord = struct(col(tsCol), col(tiebreak))
    val keyed = struct(col(valueCol).as("v"), col(tsCol).as("ts"),
      col(tiebreak).as("tb"))
    series.groupBy(col(key), bucket.as("bucket"))
      .agg(min_by(keyed, ord).as("o"), max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"), max_by(keyed, ord).as("c"),
        count(lit(1)).as("n"))
      .select(col(key), col("bucket"),
        col("o.v").as("open"), col("o.ts").as("open_ts"),
        col("o.tb").as("open_tb"),
        col("high"), col("low"),
        col("c.v").as("close"), col("c.ts").as("close_ts"),
        col("c.tb").as("close_tb"), col("n"))
  }

  /** Merge two partial-bar tables: earliest open wins, extremes combine,
    * latest close wins, counts add. One hash aggregate on (key, bucket) —
    * the micro-batch side is usually tiny, so at scale this is a
    * broadcast-sized increment against a bucketed bar table. */
  def ohlcMergePartials(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val openKeyed = struct(col("open").as("v"), col("open_ts").as("ts"),
      col("open_tb").as("tb"))
    val closeKeyed = struct(col("close").as("v"), col("close_ts").as("ts"),
      col("close_tb").as("tb"))
    a.unionByName(b).groupBy(col(key), col("bucket"))
      .agg(
        min_by(openKeyed, struct(col("open_ts"), col("open_tb"))).as("o"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        max_by(closeKeyed, struct(col("close_ts"), col("close_tb"))).as("c"),
        sum(col("n")).as("n"))
      .select(col(key), col("bucket"),
        col("o.v").as("open"), col("o.ts").as("open_ts"),
        col("o.tb").as("open_tb"),
        col("high"), col("low"),
        col("c.v").as("close"), col("c.ts").as("close_ts"),
        col("c.tb").as("close_tb"), col("n"))
  }

  /** User-facing bar projection of a partials table. */
  def ohlcFinish(partials: DataFrame, key: String): DataFrame =
    partials.select(col(key), col("bucket"), col("open"), col("high"),
      col("low"), col("close"), col("n"))

  /** Densify a sparse daily series to EVERY calendar day in each key's
    * observed [min, max] range and forward-fill the value (LOCF) — the
    * gap-filling step before any calendar-aligned computation (returns on
    * a holiday-gapped series, telemetry with silent days). Rows created by
    * the fill are flagged `filled`.
    *
    * Scale posture: the per-key date grid is built with
    * `sequence(min, max)` + `explode` off a per-key single-row aggregate —
    * grid size is (days in range), never (keys × global range). The fill
    * itself is one `last(ignoreNulls)` running window, so the whole op is
    * two shuffles on the key (agg + window) regardless of key count; no
    * join against a global calendar table is ever materialized. */
  def denseForwardFill(series: DataFrame, key: String, date: String,
                       valueCol: String): DataFrame = {
    val grid = series.groupBy(col(key))
      .agg(min(col(date)).as("__lo"), max(col(date)).as("__hi"))
      .select(col(key),
        explode(sequence(col("__lo"), col("__hi"))).as(date))
    val w = Window.partitionBy(col(key)).orderBy(col(date))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(series, Seq(key, date), "left")
      .withColumn("filled", col(valueCol).isNull)
      .withColumn(valueCol,
        last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** As-of join, direction = NEAREST (pandas `merge_asof(direction=
    * 'nearest')`): each spine row takes the sparse row of the same key
    * closest in time — before OR after — within `tolerance` (micros);
    * ties break to the earlier sparse row. Spark has no nearest-asof, and
    * a range join would re-scan candidates; this is the scalable form:
    * union both sides, then per key ONE ordered window pass computing the
    * last sparse value at-or-before (running `last(ignoreNulls)`) and the
    * first at-or-after (`first(ignoreNulls)` over the FOLLOWING frame) —
    * a single shuffle on the key, state bounded by the frame.
    *
    * Sparse rows sort BEFORE spine rows at the same timestamp (side tag),
    * so an exact-tie sparse row is seen by the backward pass — "before"
    * includes "simultaneous", matching ASOF semantics. */
  def asOfNearest(spine: DataFrame, sparse: DataFrame, key: String,
                  tsCol: String, valueCol: String,
                  tolerance: Long): DataFrame = {
    val tagged = spine
      .select(col(key), col(tsCol),
        lit(null).cast("double").as("__v"),
        lit(null).cast("long").as("__qts"), lit(1).as("__side"))
      .unionByName(sparse.select(col(key), col(tsCol),
        col(valueCol).cast("double").as("__v"),
        unix_micros(col(tsCol)).as("__qts"), lit(0).as("__side")))
    val ord = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevV = last(col("__v"), ignoreNulls = true).over(back)
    val prevTs = last(col("__qts"), ignoreNulls = true).over(back)
    val nextV = first(col("__v"), ignoreNulls = true).over(fwd)
    val nextTs = first(col("__qts"), ignoreNulls = true).over(fwd)
    val dPrev = unix_micros(col(tsCol)) - prevTs
    val dNext = nextTs - unix_micros(col(tsCol))
    val takePrev = prevTs.isNotNull && dPrev <= tolerance &&
      (nextTs.isNull || dNext > tolerance || dPrev <= dNext)
    val takeNext = nextTs.isNotNull && dNext <= tolerance && !takePrev
    tagged
      .withColumn(valueCol,
        when(takePrev, prevV).when(takeNext, nextV))
      .withColumn("matched_delta_us",
        when(takePrev, dPrev).when(takeNext, dNext))
      .filter(col("__side") === 1)
      .drop("__v", "__qts", "__side")
  }

  /** Rolling exact median over the trailing `n` rows per key — the robust
    * centre line (median band) a quant pipeline pairs with [[withRolling]]'s
    * mean/vol. Exact `percentile(0.5)` as a window aggregate: Catalyst
    * evaluates the aggregate over each ROWS frame, so the state is bounded
    * by the frame (n rows), not the partition — one shuffle on the key. */
  def withRollingMedian(prices: DataFrame, key: String, date: String,
                        valueCol: String, n: Int): DataFrame = {
    val w = byAsset(key, date).rowsBetween(-(n - 1), Window.currentRow)
    prices.withColumn(s"med$n",
      percentile(col(valueCol), lit(0.5)).over(w))
  }
}
