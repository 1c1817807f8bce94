package graft

import graft.operators.Observe
import org.apache.spark.sql.functions._

/** [[Observe]] — observe-metrics telemetry: values equal the direct
  * aggregates, and they ride the SAME action (no extra scan). */
class ObserveSpec extends SparkSpecBase {

  test("quality metrics equal direct aggregates and ride one action") {
    val events = Tables.events(spark, sfDir)
    val (instrumented, obs) = Observe.qualityMetrics(events)
    // one action drives both the query and the metrics
    val rowsSeen = instrumented.count()
    val m = obs.get
    assert(m("n_rows") === rowsSeen)
    assert(m("null_user") === 0L && m("null_value") === 0L)
    val direct = events.agg(sum("value")).head.getDouble(0)
    assert(math.abs(m("sum_value").asInstanceOf[Double] - direct) /
      math.max(1.0, math.abs(direct)) < 1e-9)
  }

  test("metrics survive a downstream transform chain (observe sits mid-plan)") {
    val events = Tables.events(spark, sfDir)
    val (instrumented, obs) = Observe.qualityMetrics(events, "mid")
    // the observed node feeds a filter+agg; metrics still reflect the FULL
    // pre-filter stream — observation point semantics, not sink semantics
    val filtered = instrumented.filter(col("event_type") === "click")
      .agg(count(lit(1))).head.getLong(0)
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] > filtered)
    assert(m("n_rows") === events.count())
  }
}
