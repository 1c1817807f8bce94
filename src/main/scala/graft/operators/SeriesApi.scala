package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reusable time-series operator API — the library surface a
  * reference (catena-style TSDB) user programs against. The §2.8 contract
  * queries (Q33, Q48–Q51) are thin wrappers over these.
  *
  * Everything is a declarative Catalyst plan: downsampling/latest are
  * partial+final hash aggregates (map-side combined, |groups| rows
  * shuffled); rate/SMA are per-series windows (one shuffle on the series
  * key — none at all if the input is stored series-bucketed,
  * [[graft.sources.BucketedLayout]]); gap-fill builds its dense spine from
  * the data's own bounds and broadcasts it.
  */
object SeriesApi {

  /** Time-bucket × series rollup with the canonical TSDB aggregate set
    * (count/avg/sum/min/max), unrounded. `unit` is any date_format pattern
    * ("yyyy-MM-dd" = daily, "yyyy-MM-dd HH" = hourly…). */
  def downsample(df: DataFrame, ts: String, unit: String,
                 keys: Seq[String], value: String): DataFrame =
    df.groupBy((date_format(col(ts), unit).as("bucket") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"),
           avg(value).as("avg_v"), sum(value).as("sum_v"),
           min(value).as("min_v"), max(value).as("max_v"))

  /** Latest point per series — the TSDB hot query — as an order-independent
    * aggregate (no window, no sort). */
  def latestPoint(df: DataFrame, keys: Seq[String], ts: String, value: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max_by(col(value), col(ts)).as("last_value"), max(col(ts)).as("last_ts"))

  /** Per-row rate of change within each series: (value − lag(value)) /
    * seconds elapsed. Rows with no predecessor or non-increasing ts get a
    * null rate. `tieBreak` pins the order of equal-ts points. */
  def rate(df: DataFrame, keys: Seq[String], ts: String, value: String,
           tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(ts) +: tieBreak.map(col)).map(_.asc): _*)
    df.withColumn("__dv", col(value) - lag(value, 1).over(w))
      .withColumn("__dt_us", unix_micros(col(ts)) - lag(unix_micros(col(ts)), 1).over(w))
      .withColumn("rate",
        when(col("__dt_us") > 0, col("__dv") / (col("__dt_us").cast("double") / lit(1e6))))
      .drop("__dv", "__dt_us")
  }

  /** Dense per-series daily spine LEFT JOIN observed buckets: one row per
    * (series, day) between the data's min and max day, `n` null on empty
    * days. The spine (days × series) is tiny relative to the data and
    * broadcasts. */
  def gapFillDaily(df: DataFrame, ts: String, keys: Seq[String]): DataFrame = {
    val buckets = df.groupBy((to_date(col(ts)).as("d") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"))
    val bounds = df.agg(min(to_date(col(ts))).as("lo"), max(to_date(col(ts))).as("hi"))
    val spine = bounds.select(explode(sequence(col("lo"), col("hi"))).as("d"))
      .crossJoin(df.select(keys.map(col): _*).distinct())
    spine.join(buckets, Seq("d") ++ keys, "left")
  }

  /** Trailing moving average of `value` over the current + (window−1)
    * preceding rows per series, ordered by `order`. */
  def sma(df: DataFrame, keys: Seq[String], order: String, value: String,
          window: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
      .rowsBetween(-(window - 1), 0)
    df.withColumn("sma", avg(value).over(w))
  }
}
