package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability — production telemetry WITHOUT extra passes.
  *
  * `Dataset.observe` attaches aggregate metrics to a plan node; they are
  * computed BY the action that runs the query (accumulator-style, inside
  * the same tasks), so a 100 TB ingest job reports row counts, null
  * rates, and value checksums at zero additional scans — where a naive
  * `df.count()` + `df.filter(...).count()` telemetry would double- and
  * triple-read the source. The [[Observation]] handle blocks until the
  * action finishes and then yields the metric row.
  *
  * `qualityMetrics` is the standard gate this engine attaches to ingest
  * frames (ST1's batch twin): row count, null counts of the critical
  * columns, and the value sum (a cheap drift/backfill checksum against
  * the previous run's). ObserveSpec pins metrics == direct aggregates and
  * the zero-extra-pass contract (one action, metrics present).
  */
object Observe {

  /** Attach the standard ingest-quality metrics; returns (instrumented
    * frame, handle). Run ONE action on the frame, then read `get`. */
  def qualityMetrics(df: DataFrame, name: String = "quality"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val instrumented = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("user_id").isNull, 1).otherwise(0)).as("null_user"),
      sum(when(col("value").isNull, 1).otherwise(0)).as("null_value"),
      sum(col("value")).as("sum_value"))
    (instrumented, obs)
  }
}
