package graft.operators

import graft.Tables
import graft.functions.Rounding.dround
import graft.functions.SeriesFunctions.floorDiv
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 (Q17/Q18) + §2.8: the time-series operator package — the
  * catena-derived surface (series scans, downsampling, rates, gap-fill,
  * as-of joins) re-expressed as Catalyst plans.
  */
object TimeSeriesOps {

  /** Q17 as-of join: for each `error` event, the latest `click` by the same
    * user at-or-before it.
    *
    * Implementation is the scalable union+window rewrite, NOT a range join:
    * both event kinds are unioned, shuffled ONCE on user_id, and a running
    * `last(click_value, ignoreNulls)` window carries the most recent click
    * forward to each error row. O(n log n) per user partition, no quadratic
    * pairing, no broadcast — this survives 100 TB where a nested-loop as-of
    * would not. Clicks sort before errors on ts ties (kind 0 < 1), matching
    * the inclusive `e.ts >= c.ts` semantics of the DuckDB ASOF JOIN oracle
    * (twinning pre-validated, SURVEY §5.2b).
    */
  def q17(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id", "value")
    val errors = e.filter(col("event_type") === "error")
      .select("user_id", "ts")
    AsOfJoin.lastBefore(errors, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", payload = Seq("value"),
        inclusive = true, tieBreak = Seq("event_id"))
      .filter(col("asof_value").isNotNull)
      .agg(count(lit(1)).as("n_matched"), dround(sum("asof_value"), 4).as("sum_click"))
  }

  /** x13: Q17's as-of contract executed by the custom whole-operator plan
    * ([[graft.plans.AsOfMergeJoinExec]]) instead of the union+window
    * rewrite — same declared DuckDB ASOF oracle, so the custom
    * SparkStrategy path is hash-checked end-to-end. One shuffle + sort per
    * side, then a streaming forward merge per key partition: no |L|+|R|
    * union materialization, no window buffer. */
  def x13AsofExec(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id", "value")
    val errors = e.filter(col("event_type") === "error")
      .select("user_id", "ts")
    AsOfJoin.lastBeforeExec(errors, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", payload = Seq("value"),
        inclusive = true, tieBreak = Seq("event_id"))
      .filter(col("asof_value").isNotNull)
      .agg(count(lit(1)).as("n_matched"), dround(sum("asof_value"), 4).as("sum_click"))
  }

  /** Q18 point-in-interval join: events inside each user's
    * [first signup, last purchase] window. Equi-join on user_id (shuffle
    * hash/SMJ — linear) with the interval predicate as a residual filter;
    * the interval side is one row per user so it is broadcastable at scale. */
  def q18(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val iv = e.groupBy(col("user_id").as("iv_user"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("lo"),
           max(when(col("event_type") === "purchase", col("ts"))).as("hi"))
      .filter(col("lo").isNotNull && col("hi").isNotNull)
    RangeJoin.pointInInterval(e, iv,
        col("user_id") === col("iv_user"), col("ts"), col("lo"), col("hi"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  /** Q47 series range scan — the catena iterator: one (source, metric) key,
    * a ts range, points in order. At 100 TB: day-partition pruning + series
    * bucketing makes this a handful of local file reads, like catena's
    * partition-list binary search. */
  def q47(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id") === 7 && col("event_type") === "click" &&
              col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
              col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
      .orderBy("ts", "event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
              col("event_id"), col("value"))

  /** [[q47]] over the engine's OWN storage layout ([[graft.GraftStore]])
    * instead of the flat driver parquet: the same contract query, but the
    * ts range additionally lands on the `day=` partition column (the store
    * facade derives it), so the scan PRUNES day directories before any file
    * IO and the series key reaches the remaining files' stats. Output is
    * row-identical to [[q47]]; BucketedLayoutSpec asserts both the equality
    * and that files touched < files on disk. */
  def q47Store(s: SparkSession, storeDir: String): DataFrame =
    new graft.GraftStore(s, storeDir)
      .series(7L, "click",
        Some(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
        Some(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
              col("event_id"), col("value"))

  /** [[q48]] over the store layout. The day bucket IS the partition column
    * (writeEvents derives `day` from ts with the same format string), so
    * the rollup never evaluates `date_format` per row and — because `day`
    * comes from directory names, not file bytes — the parquet ReadSchema
    * shrinks to (event_type, value). Same aggregate/rounding pipeline as
    * the declared q48; output is identical except at dround's binary ties —
    * a group whose exact decimal mean sits ON a .xxxx5 boundary rounds by
    * the last bit of the double sum, which follows summation order and
    * hence physical layout (BucketedLayoutSpec documents and bounds this
    * to one rounding step; n/min/max/sum are layout-invariant). */
  def q48Store(s: SparkSession, storeDir: String): DataFrame =
    graft.sources.BucketedLayout.readEvents(s, storeDir)
      // partition-type inference reads day= back as DATE; the declared d is
      // the yyyy-MM-dd string (a date->string cast, cheaper than the flat
      // path's µs-timestamp date_format and fed from directory names)
      .groupBy(col("day").cast("string").as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_v"),
           min("value").as("min_v"), max("value").as("max_v"))
      .select(col("d"), col("event_type"), col("n"),
              dround(col("sum_v") / col("n"), 4).as("avg_v"),
              dround(col("sum_v"), 4).as("sum_v"),
              dround(col("min_v"), 4).as("min_v"), dround(col("max_v"), 4).as("max_v"))
      .orderBy("d", "event_type")

  /** Q48 downsample / rollup — THE canonical TSDB query: day buckets ×
    * metric, five aggregates in one partial+final hash-agg pass
    * ([[SeriesApi.downsample]] + the contract's rounding/ordering). */
  def q48(s: SparkSession, d: String): DataFrame =
    SeriesApi.downsample(Tables.events(s, d), "ts", "yyyy-MM-dd",
        keys = Seq("event_type"), value = "value")
      // avg_v is the declared ROUND(AVG(value), 4) — computed as sum/n (the
      // same single IEEE divide DuckDB's AVG performs) and rounded with
      // [[Rounding.dround]], which reproduces DuckDB's binary rounding on
      // the .xxxx5 knife edges (46.49875 at sf0.01, 38.37875 at sf0.001)
      // where Spark's shortest-repr round and a decimal rewrite both
      // diverge from the declared oracle (VERDICT r01 root cause).
      .select(col("bucket").as("d"), col("event_type"), col("n"),
              dround(col("sum_v") / col("n"), 4).as("avg_v"),
              dround(col("sum_v"), 4).as("sum_v"),
              dround(col("min_v"), 4).as("min_v"), dround(col("max_v"), 4).as("max_v"))
      .orderBy("d", "event_type")

  /** Q49 per-series rate: value delta / time delta. unix_micros on the
    * µs-truncated ts matches DuckDB's floor-truncating epoch arithmetic. */
  def q49(s: SparkSession, d: String): DataFrame =
    SeriesApi.rate(Tables.events(s, d), keys = Seq("user_id", "event_type"),
        ts = "ts", value = "value", tieBreak = Seq("event_id"))
      .filter(col("rate").isNotNull)
      .groupBy("event_type")
      .agg(dround(avg("rate"), 6).as("avg_rate"), count(lit(1)).as("n_rates"))
      .orderBy("event_type")

  /** Q50 gap-fill: dense daily spine (sequence+explode ≡ generate_series)
    * LEFT JOIN observed buckets; empty-day counts. The spine is tiny
    * (days × metrics) so it broadcasts; observed buckets come pre-aggregated. */
  def q50(s: SparkSession, d: String): DataFrame =
    SeriesApi.gapFillDaily(Tables.events(s, d), "ts", keys = Seq("event_type"))
      .groupBy("event_type")
      .agg(count(when(col("n").isNull, 1)).as("n_empty"), count(lit(1)).as("n_days"))
      .orderBy("event_type")

  /** Q51 SMA: 3-bucket moving average over the daily downsample
    * ([[SeriesApi.downsample]] → [[SeriesApi.sma]]). */
  def q51(s: SparkSession, d: String): DataFrame = {
    val daily = SeriesApi.downsample(Tables.events(s, d), "ts", "yyyy-MM-dd",
        keys = Seq("event_type"), value = "value")
      .select(col("bucket").as("d"), col("event_type"), col("sum_v"))
    SeriesApi.sma(daily, keys = Seq("event_type"), order = "d", value = "sum_v", window = 3)
      .select(col("d"), col("event_type"), dround(col("sma"), 4).as("sma"))
      .orderBy("event_type", "d")
  }

  /** x20 gap-based sessionization: a user's events split into sessions
    * wherever the gap to the previous event exceeds 6 hours — the classic
    * event-pipeline operator (funnel/engagement analytics, and the batch
    * twin of the streaming session window ST4). Session ids are the running
    * count of gap-breaks, so they are dense, per-user, and deterministic.
    *
    * All gap arithmetic is exact integer microseconds (`unix_micros` here ≡
    * `epoch_us` in the oracle; both sides see the same floor-truncated µs
    * timestamps), so no FP knife edges exist in the session BOUNDARIES; only
    * the per-session value sum is rounded, through [[Rounding.dround]].
    *
    * Scale: one shuffle on user_id serves both windows and the session agg
    * (same partitioning), then per-partition sorts — O(n log n) per user,
    * no self-join, no pairing blowup. Skewed power-users are bounded by
    * their own event count, not the corpus; AQE skew-split handles the
    * shuffle side at 100 TB. */
  def x20Sessionize(s: SparkSession, d: String): DataFrame = {
    val gapUs = 6L * 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session", sum("brk").over(run))
      .groupBy("user_id", "session")
      .agg(count(lit(1)).as("n_events"),
           min("event_id").as("first_event"),
           expr("(max(us) - min(us)) div 1000000").as("duration_s"),
           dround(sum("value"), 4).as("sum_value"))
      .orderBy("user_id", "session")
  }

  /** x23 counter increase with reset handling — the Prometheus-style
    * `increase()` semantics every metrics pipeline needs: per series, the
    * value delta to the previous point counts as increase, except a DROP is
    * a counter reset (process restart) and the post-reset value itself is
    * the increase since zero. Totals and reset counts per metric.
    *
    * Cross-engine determinism: increases are differences (or raw values) of
    * the fixture's 2-decimal doubles, so the rounded SUM sits ~1e-11 from a
    * 4-dp boundary only if the true total does — and the true total is a
    * multiple of 0.01. Scale: one (user_id, event_type) shuffle for the lag
    * window, then a 5-row hash agg; same shape as Q30/Q49. */
  def x23CounterRate(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev", lag("value", 1).over(w))
      .withColumn("inc",
        when(col("prev").isNull, lit(null))
          .when(col("value") < col("prev"), col("value"))
          .otherwise(col("value") - col("prev")))
      .groupBy("event_type")
      .agg(count(col("inc")).as("n_deltas"),
           count(when(col("value") < col("prev"), 1)).as("n_resets"),
           dround(sum("inc"), 4).as("total_increase"))
      .orderBy("event_type")
  }

  /** x24 time-weighted average — the TSDB aggregate that is NOT plain AVG:
    * each point's value is weighted by how long it was current (time until
    * the series' next point), so irregular sampling doesn't bias the mean
    * toward burst periods.
    *
    * Exactness across engines: values are 2-decimal → integer cents
    * (exact), gaps are integer µs (exact), so Σ(cents·dt_us) accumulates in
    * DECIMAL(38,0) here and int128 in DuckDB — both exact — and the ONE
    * IEEE operation each engine performs is the same double divide of the
    * same two integers. No summation-order sensitivity exists at all.
    * Scale: one series shuffle for the lead window + a per-metric agg;
    * the decimal accumulator is fixed-width, partial+final as usual. */
  def x24Twa(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"), col("value"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("next_us", lead("us", 1).over(w))
      .filter(col("next_us").isNotNull && col("next_us") > col("us"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("dt_us", col("next_us") - col("us"))
      .groupBy("event_type")
      // cents is widened to decimal BEFORE the multiply: a long×long product
      // would silently wrap in non-ANSI mode for large values × long gaps,
      // while DuckDB's int128 multiply stays exact — engines would diverge
      // precisely at scale (ADVICE r4)
      .agg(count(lit(1)).as("n_intervals"),
           sum(col("cents").cast("decimal(18,0)") * col("dt_us")).as("sw"),
           sum("dt_us").as("sdt"))
      .select(col("event_type"), col("n_intervals"),
        dround(col("sw").cast("double") / (col("sdt").cast("double") * lit(100.0)), 4).as("twa"))
      .orderBy("event_type")
  }

  /** x25 anomaly days via z-score — the alerting query over the downsample:
    * days whose per-metric daily volume deviates ≥ 1.8 (rounded) sample
    * standard deviations from that metric's own daily mean.
    *
    * Determinism: daily sums snap to exact DECIMAL(18,2) (2-decimal inputs)
    * before the double cast, so both engines window over IDENTICAL doubles;
    * mean/stddev then agree to ~1e-12 relative and z is rounded to 2 dp
    * through [[Rounding.dround]] BEFORE the threshold filter, so both
    * engines select the same rows. Scale: the windowed stats run over the
    * ~30-row-per-metric daily aggregate, not the raw events — the wide data
    * is reduced by the first hash agg and the z pass is metadata-sized. */
  def x25Anomaly(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"), col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sum_dec"))
      .withColumn("day_sum", col("sum_dec").cast("double"))
    val w = Window.partitionBy("event_type")
    daily
      .withColumn("mu", avg("day_sum").over(w))
      .withColumn("sd", stddev_samp("day_sum").over(w))
      // sd = 0 (constant series) is a cross-engine knife edge: Spark's
      // Divide yields NULL (row silently filtered) while DuckDB's x/0.0
      // yields ±inf (row emitted). Exclude constant series EXPLICITLY on
      // both sides so the declared semantics don't depend on divide-by-zero
      // behavior (ADVICE r4); the twin carries the same `sd > 0` filter.
      .filter(col("sd") > 0)
      .withColumn("z", dround((col("day_sum") - col("mu")) / col("sd"), 2))
      .filter(abs(col("z")) >= 1.8)
      .select(col("d"), col("event_type"), col("sum_dec").cast("double").as("day_sum"), col("z"))
      .orderBy("d", "event_type")
  }

  /** x26 linear-interpolation gap fill — Q50 counts the holes; this FILLS
    * them: every missing (day, metric) daily-sum bucket gets the linear
    * interpolation between its nearest observed neighbors (leading/trailing
    * holes with only one neighbor are dropped — no extrapolation).
    *
    * Determinism: observed sums snap to DECIMAL(18,2) first (identical
    * doubles both engines), day distances are exact integers, and the lerp
    * `prev + (next - prev) * (dd/span)` is written with ONE association on
    * both sides. Scale: interpolation runs over the daily AGGREGATE (days ×
    * metrics), not raw events; the two ignore-nulls windows share one
    * event_type partitioning. */
  def x26Interpolate(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val daily = e.groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val bounds = e.agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
    val spine = bounds.select(explode(sequence(col("lo"), col("hi"))).as("d"))
      .crossJoin(e.select("event_type").distinct())
    val w = Window.partitionBy("event_type").orderBy("d")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("d", "event_type"), "left")
      .withColumn("prev_v", last("v", ignoreNulls = true).over(wPrev))
      .withColumn("prev_d", last(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first("v", ignoreNulls = true).over(wNext))
      .withColumn("next_d", first(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(wNext))
      .filter(col("v").isNotNull || (col("prev_v").isNotNull && col("next_v").isNotNull))
      .select(col("d"), col("event_type"),
        when(col("v").isNotNull, lit("obs")).otherwise(lit("lerp")).as("src"),
        dround(when(col("v").isNotNull, col("v"))
          .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) *
            (datediff(col("d"), col("prev_d")).cast("double") /
             datediff(col("next_d"), col("prev_d")).cast("double"))), 4).as("v"))
      .orderBy("d", "event_type")
  }

  /** x57 next-event transition matrix — the dataset-construction step for
    * behavioral sequence modeling: each (event, next event by the same
    * user) adjacent pair, reduced to per-(event_type → next_type)
    * transition counts and probabilities. The per-pair rows are exactly
    * the (context, label) examples a next-event predictor trains on; the
    * declared output is their exact transition matrix, which doubles as
    * the class-balance audit a sampler needs before emitting the examples.
    *
    * Scale: ONE shuffle on user_id (high-cardinality — no q29-style
    * low-cardinality window anywhere), a 1-row lead per event inside each
    * user partition, then a map-side-combined hash aggregate onto
    * |types|² ≤ 25 rows; the totals join is a broadcast of ≤5 rows.
    * Ordering inside a user is (ts, event_id) — a total order, so the
    * lead target is engine-independent. */
  /** x58 2-D box query — the selective slice both dashboards and training
    * extracts cut constantly: one user range × one time range, aggregated
    * per type. Declared over the flat fixture (both range predicates reach
    * the parquet scan as PushedFilters — PlanSpec); the SAME contract runs
    * over the [[graft.sources.ZOrderLayout]] store as bench row
    * `x58_zorder`, where the sidecar min/max index turns the box into
    * FILE-level skipping before any task is scheduled — the reason a 2-D
    * layout exists at all: day partitioning prunes only the time axis, a
    * user-sorted layout only the user axis; the z-curve prunes on both at
    * once. All-integer output except the one rounded sum. */
  def x58Box(s: SparkSession, d: String): DataFrame =
    boxAgg(Tables.events(s, d))

  /** The box contract shared by the flat and z-store paths: users [3,7] ×
    * ts [2024-01-10, 2024-01-15), per-type aggregate. */
  private[graft] def boxAgg(e: DataFrame): DataFrame =
    e.filter(col("user_id").between(3, 7) &&
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dround(sum("value"), 4).as("sum_value"),
           min("event_id").as("min_event"), max("event_id").as("max_event"))
      .orderBy("event_type")

  /** x59 session funnel — the conversion report over x20's sessions: how
    * many sessions reach each prefix of the ordered journey
    * view → click → purchase (subsequence within the session, not
    * adjacency: the first view, the first click strictly after it, the
    * first purchase strictly after that). Output is the 4-row funnel with
    * corpus-wide conversion fractions — the analytics readout product
    * teams drive ranking/recommendation training labels from.
    *
    * Scale: session assignment is x20's per-user window (high-cardinality
    * partition key); each funnel stage is one (user, session)-keyed
    * aggregate joined forward — three session-keyed shuffles over
    * ever-SHRINKING stage tables, never a corpus self-join; the final
    * table is 4 rows + one broadcast of a 1-row total. */
  /** x59/x73's shared machinery, ONE PASS: 6h-gap sessions, then the
    * staged firsts (first view; first click strictly after it; first
    * purchase after that) as per-session CONDITIONAL WINDOW MINIMA —
    * each stage's `min(when(...))` over the (user, session) partition
    * references the previous stage's column, so the whole funnel rides
    * the sessionization pass instead of re-deriving the session frame
    * per stage (the r13 plan fed `sess` into four separate join/agg
    * branches, re-running the 2-window cascade — and its scan+shuffle+
    * sort — four times; at 100× the repeated corpus passes are the
    * funnel's whole cost). The (user_id, session) windows and the final
    * per-session aggregate all run on the sessionization shuffle's
    * user_id partitioning (a ClusteredDistribution it already
    * satisfies) — ONE exchange in the entire plan.
    * Returns one row per (user_id, session) with nullable t_v/t_c/t_p
    * (null = the session never reached that stage). */
  private def funnelSessions(s: SparkSession, d: String): DataFrame = {
    val gapUs = 6L * 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sw = Window.partitionBy("user_id", "session")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session", sum("brk").over(run))
      // null-safe staging: `us > t_v` is null when t_v is (no view in the
      // session) → when() yields null → min skips it → t_c stays null
      .withColumn("t_v",
        min(when(col("event_type") === "view", col("us"))).over(sw))
      .withColumn("t_c",
        min(when(col("event_type") === "click" && col("us") > col("t_v"),
          col("us"))).over(sw))
      .withColumn("t_p",
        min(when(col("event_type") === "purchase" && col("us") > col("t_c"),
          col("us"))).over(sw))
      .groupBy("user_id", "session")
      .agg(min("t_v").as("t_v"), min("t_c").as("t_c"), min("t_p").as("t_p"))
  }

  def x59Funnel(s: SparkSession, d: String): DataFrame = {
    // count(col) skips nulls, so the four funnel counters reduce in ONE
    // aggregate over the per-session frame; the 4-row readout unpacks
    // from the single counter row (no per-stage plan branches, no
    // broadcast of a separately-computed total)
    val counters = funnelSessions(s, d)
      .agg(count(lit(1)).as("n_all"), count("t_v").as("n_v"),
           count("t_c").as("n_c"), count("t_p").as("n_p"))
    counters.select(explode(array(
        struct(lit("0_all").as("stage"), col("n_all").as("n_sessions")),
        struct(lit("1_view").as("stage"), col("n_v").as("n_sessions")),
        struct(lit("2_view_click").as("stage"), col("n_c").as("n_sessions")),
        struct(lit("3_view_click_purchase").as("stage"),
          col("n_p").as("n_sessions")))).as("r"),
      col("n_all"))
      .select(col("r.stage").as("stage"), col("r.n_sessions").as("n_sessions"),
        dround(col("r.n_sessions").cast("double") / col("n_all").cast("double"), 4)
          .as("frac"))
      .orderBy("stage")
  }

  /** x73 time-to-convert distribution — the latency readout behind x59's
    * counts: over CONVERTED sessions (the funnel's last stage), exact
    * p50/p90 and mean of seconds from the first view to the converting
    * purchase, corpus-wide. Conversion RATE says whether users convert;
    * this says how long the intent-to-purchase window stays open — the
    * number attribution windows (ST16's join bound) are calibrated from.
    *
    * Reuses x59's staged-firsts machinery; the reduction is one exact
    * percentile over the |converted sessions| deltas (q25's interpolation
    * contract, x34's sketch at 100 TB). Integer µs → integer-seconds
    * deltas before the percentile, so the interpolated values are exact
    * halves at worst. */
  def x73ConvertTime(s: SparkSession, d: String): DataFrame = {
    // converted sessions carry a non-null t_p (and, by staging, t_v) on
    // the one-pass frame — no tv⋈tp join needed
    funnelSessions(s, d).filter(col("t_p").isNotNull)
      .select(expr("(t_p - t_v) div 1000000").as("sec"))
      .agg(count(lit(1)).as("n_converted"),
           dround(expr("percentile(sec, 0.5)"), 4).as("p50_s"),
           dround(expr("percentile(sec, 0.9)"), 4).as("p90_s"),
           dround(avg("sec"), 4).as("mean_s"))
  }

  /** x60 recency-decay engagement score — the freshness weighting a
    * sampling/mixing pipeline applies to behavioral data: per user,
    * Σ value·e^(−age_days/7) against the fixed corpus horizon 2024-01-31
    * (a 7-day half-life-ish decay; the horizon is pinned so both engines
    * and any re-run weight identically). One scan + one map-side-combined
    * aggregate — no window, no join; the 100 TB shape is the same
    * hash-agg as q19. Each weight is a double e^(−k/7), k integer days;
    * the rounded sum is the declared output (x18's ln precedent: libm
    * agreement to well past 4 dp). */
  def x60Decay(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("age_d",
        datediff(lit("2024-01-31").cast("date"), to_date(col("ts"))))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           dround(sum(col("value") * exp(col("age_d").cast("double") * -1.0 / 7.0)), 4)
             .as("decay_score"))
      .orderBy("user_id")

  /** x64 range aggregate — the dashboard slice every TSDB serves: per-type
    * cnt/sum/min/max/avg over a DELIBERATELY misaligned [t0, t1) (sub-hour
    * edges, so every resolution of the rollup decomposition is exercised).
    * Declared as the direct raw-scan form (the oracle-checkable
    * semantics); bench row `x64_rollup` answers the IDENTICAL contract
    * through [[graft.sources.RollupStore]]'s coarsest-first router — full
    * days from the day table, edge hours from the hour table, sub-hour
    * edges from raw — which at 100 TB turns a month of billions of events
    * into ~150 rollup rows + two bounded edge scans (RollupStoreSpec pins
    * routed ≡ direct on aligned/misaligned/sub-hour ranges). */
  def x64RangeAgg(s: SparkSession, d: String): DataFrame =
    rangeContract(graft.sources.RollupStore.directAgg(
      Tables.events(s, d), X64T0, X64T1))

  private[graft] val X64T0 = java.time.Instant.parse("2024-01-05T00:30:10Z").toEpochMilli * 1000L
  private[graft] val X64T1 = java.time.Instant.parse("2024-01-20T07:45:00Z").toEpochMilli * 1000L

  /** Shared rounding/ordering for the declared and rollup-routed forms. */
  private[graft] def rangeContract(df: DataFrame): DataFrame =
    df.select(col("event_type"), col("cnt"),
      dround(col("s"), 4).as("sum_value"), col("mn").as("min_value"),
      col("mx").as("max_value"), dround(col("avg"), 4).as("avg_value"))
      .orderBy("event_type")

  /** x65 time-based RANGE window — the trailing-24h rolling feature
    * (events and mean value in the preceding day, per user) that q30–q32's
    * ROW frames cannot express: a row's frame is VALUE-bounded
    * (`rangeBetween` on µs), so it holds however many events fall in the
    * day, and ties in ts are frame-equivalent by definition — the
    * set-based frame is tie-proof cross-engine where a row frame needs a
    * total order. Declared output is the per-user checksum reduction
    * (q31/q32's convention) over the full per-event window columns.
    *
    * Scale: one user_id shuffle (high-cardinality), one sort per
    * partition; the range frame is a sliding two-pointer over the sorted
    * run — O(n) amortized per partition, state bounded by the 24 h span,
    * the same shape at any corpus size. */
  def x65TimeWindow(s: SparkSession, d: String): DataFrame = {
    val dayUs = 24L * 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us").rangeBetween(-dayUs, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("avg_24h", avg("value").over(w))
      .groupBy("user_id")
      // each summand is pre-rounded to the 1e-4 grid, so the checksum is a
      // sum of exact 4-dp decimals — it lands ON the grid, never at
      // half-grid, killing the q48 knife-edge class the scanner flagged
      // for the raw-sum form at sf0.1 (values exactly X.xxxx5)
      .agg(sum("n_24h").as("sum_n"), dround(sum(dround(col("avg_24h"), 4)), 4).as("checksum"))
      .orderBy("user_id")
  }

  /** x66 interval union — gaps-and-islands coalescing: each event opens a
    * 5-minute activity interval [ts, ts+300 s); overlapping/touching
    * intervals per user merge into maximal covered spans. The declared
    * output is per-user span count + exact covered seconds — the
    * "total active time" readout that raw event counts overstate whenever
    * activity bursts overlap, and the building block for uptime/SLA and
    * ad-exposure dedup calculations.
    *
    * Algebra: sort a user's intervals by start; an interval starts a NEW
    * span iff its start exceeds the running max of all previous ends
    * (strictly — touching intervals merge). That running max is one
    * window over the user partition; the span id is the running sum of
    * start flags; spans then reduce by (user, span). All integer µs.
    *
    * Scale: one user_id shuffle feeds both windows and the reduction —
    * the same single-shuffle profile as q31; no self-join of intervals
    * (the naive overlap join is quadratic per user). */
  def x66IntervalUnion(s: SparkSession, d: String): DataFrame = {
    val lenUs = 300L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val prevMax = max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("end", col("us") + lenUs)
      .withColumn("new_span",
        when(prevMax.isNull || col("us") > prevMax, 1L).otherwise(0L))
      .withColumn("span",
        sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "span")
      .agg(min("us").as("s0"), max("end").as("s1"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_spans"),
           expr("sum(s1 - s0) div 1000000").as("covered_s"))
      .orderBy("user_id")
  }

  /** x69 per-series trend — least-squares slope/intercept of value over
    * time per event_type via the REGRESSION AGGREGATES (`regr_slope`,
    * `regr_intercept`, `regr_r2`): the drift detector that turns "is this
    * metric creeping up?" into one number per series, and the aggregate
    * family none of q19–q28 exercises. Time is DAYS since the corpus
    * epoch (integer-derived, so the x-axis is identical in both engines;
    * slope is then per-day drift).
    *
    * Scale: regression aggregates are one-pass sums of (x, y, xy, x², y²)
    * — map-side-combined hash agg onto |types| rows, q19's shape; no
    * window, no sort. Rounded at 4 under the usual FP-sum precedent. */
  def x69Trend(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        floorDiv(unix_micros(col("ts")), 86400000000L).cast("double").as("x"),
        col("value").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           dround(expr("regr_slope(y, x)"), 4).as("slope"),
           dround(expr("regr_intercept(y, x)"), 4).as("intercept"),
           dround(expr("regr_r2(y, x)"), 6).as("r2"))
      .orderBy("event_type")

  /** x70 MAD robust outliers — the outlier gate x25's z-score cannot give
    * on heavy-tailed metrics: per event_type, exact median, MAD
    * (median |v − med|), and the count of points beyond 3·MAD. Mean/σ are
    * dragged by the outliers they are supposed to find; the median/MAD
    * pair is breakdown-50% robust, which is why metric-quality monitors
    * use it.
    *
    * Two grouped exact-percentile passes (q25's interpolation contract,
    * identical formula both engines) + one broadcast-join back + one
    * conditional count — three scans bounded by |types| intermediate
    * rows, no window. At 100 TB the exact median swaps for x34's sketch
    * with the same downstream algebra. */
  def x70MadOutliers(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = e.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("med"))
    val mad = e.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("ad"))
      .groupBy("event_type").agg(expr("percentile(ad, 0.5)").as("mad"))
    e.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           dround(max("med"), 4).as("median"),
           dround(max("mad"), 4).as("mad"),
           sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1)
             .otherwise(0)).cast("long").as("n_outliers"))
      .orderBy("event_type")
  }

  /** x71 behavioral entropy — per-user Shannon entropy of the event-type
    * mix + the dominant type (min-alphabetical on count ties): the
    * diversity score a segmentation/sampling pipeline keys on (entropy 0 =
    * single-behavior user, ln 5 = uniform). One (user, type) hash agg →
    * per-user reduction; the argmax is a 2-level aggregate over ≤5 rows
    * per user, not a window. ln-sum rounding under x18's precedent. */
  def x71UserEntropy(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val tot = counts.groupBy("user_id").agg(sum("c").as("n"))
    val ent = counts.join(tot, "user_id")
      .withColumn("p", col("c").cast("double") / col("n").cast("double"))
      .groupBy("user_id")
      .agg(max("n").as("n_events"),
           dround(-sum(col("p") * log(col("p"))), 4).as("entropy"))
    val top = counts
      .groupBy("user_id")
      .agg(max(struct(col("c").as("c"), reverseLex(col("event_type")).as("rt"))).as("m"))
      .select(col("user_id"), col("m.c").as("top_n"),
              reverseLex(col("m.rt")).as("top_type"))
    ent.join(top, "user_id")
      .select(col("user_id"), col("n_events"), col("entropy"),
              col("top_type"), col("top_n"))
      .orderBy("user_id")
  }

  /** Order-reversing string involution over the events fixture's
    * lowercase-ascii type names: max(struct(c, reverseLex(t))) then picks
    * the SMALLEST type name among count ties — an argmax with a
    * deterministic alphabetical tiebreak, no window needed. */
  private def reverseLex(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    translate(c, "abcdefghijklmnopqrstuvwxyz", "zyxwvutsrqponmlkjihgfedcba")

  /** x72 retention cohorts — the activation readout: users cohorted by
    * first-seen day; for each (cohort, day offset 0–7), how many cohort
    * members were active and the retention rate. The curve that separates
    * "acquired users" from "retained users" — and the aggregate shape
    * (small dense matrix from a big sparse log) that makes it a good
    * stress of the distinct→join→rate pipeline.
    *
    * Scale: one (user, day) DISTINCT (the only corpus-sized shuffle),
    * one per-user min for the cohort (same shuffle key — co-planned), a
    * user-keyed join back, then a |days|×8 aggregate with a broadcast of
    * cohort sizes. No window, no self-join of the activity log. */
  def x72Retention(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohort = act.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohort.groupBy("cohort_day").agg(count(lit(1)).as("n_cohort"))
    act.join(cohort, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("offset").between(0, 7))
      .groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("offset"), col("n_active"), col("n_cohort"),
        dround(col("n_active").cast("double") / col("n_cohort").cast("double"), 4).as("rate"))
      .orderBy("cohort_day", "offset")
  }

  /** x75 DAU/WAU stickiness — the engagement-intensity ratio: per day,
    * distinct daily actives over distinct trailing-7-day actives. The
    * trailing window is computed JOIN-FREE: each (user, active-day) row
    * map-side explodes to the ≤7 future days whose window it falls in,
    * then one distinct aggregate per day — no day-spine range join (a
    * nested loop at any scale), no window function; work is a flat 7×
    * multiplier on the |user × day| distinct activity table. Days past
    * the corpus end are pruned by the inner join with the DAU side.
    * At 100 TB the per-day exact distinct finalizes one hash set per day
    * (bounded by that day's actives); past that, swap both counts for
    * x63's mergeable HLL sketches — the explode/agg shape is unchanged. */
  def x75Stickiness(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = act.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = act
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
              col("user_id"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        dround(col("dau").cast("double") / col("wau").cast("double"), 4).as("stickiness"))
      .orderBy("day")
  }

  /** x76 behavioral typicality — each user's sequence scored under the
    * CORPUS transition model (x57's matrix): mean −ln P(next | cur) over
    * the user's adjacent event pairs. Low = textbook behavior, high =
    * anomalous path — x18's LM-scoring idea lifted from token unigrams to
    * event bigrams, and the per-user readout an abuse/quality triage
    * ranks on.
    *
    * Every observed user transition exists in the corpus matrix by
    * construction (the corpus includes the user), so P > 0 and the score
    * is finite. Scale: the lead pass is x57's one user-shuffle; the model
    * is ≤|types|² rows broadcast back onto the pair stream; one per-user
    * aggregate. ln-sum rounding under x18's precedent. */
  def x76Typicality(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = pairs.groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("event_type").agg(sum("n").as("tot"))
    val model = counts.join(totals, "event_type")
      .select(col("event_type"), col("next_type"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
    pairs.join(broadcast(model), Seq("event_type", "next_type"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_trans"),
           dround(avg(-log(col("p"))), 4).as("xent"))
      .orderBy("user_id")
  }

  /** x79 U-shaped multi-touch attribution — each purchase distributes one
    * unit of credit over the same user's clicks in the preceding 24 h:
    * first click 0.4, last 0.4, middles split 0.2 (k = 1 → 1.0, k = 2 →
    * 0.5/0.5) — the position-based model growth teams use between
    * last-touch (all to the last) and linear (flat). Declared output is
    * credit mass per click DAY — the budget-allocation readout.
    *
    * The candidate join is user-keyed equi + a 24 h residual — per-user
    * click×purchase pairing, bounded by per-user activity at fixture
    * scale; at 100 TB the same contract joins day-banded keys (q16's
    * banding) so candidates are bounded per (user, day), or streams
    * through ST16's watermarked interval join. Weights are exact decimal
    * constants and one k−2 division; per-purchase credit sums to 1 by
    * construction, making the day aggregate a conservation check. */
  def x79Attribution(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("c_ts"), to_date(col("ts")).as("c_day"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val cand = purchases.join(clicks, "user_id")
      .filter(col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
    val w = Window.partitionBy("p_id").orderBy("c_ts", "click_id")
    val k = Window.partitionBy("p_id")
    val weighted = cand
      .withColumn("rn", row_number().over(w))
      .withColumn("k", count(lit(1)).over(k))
      .withColumn("credit",
        when(col("k") === 1, 1.0)
          .when(col("k") === 2, 0.5)
          .when(col("rn") === 1 || col("rn") === col("k"), 0.4)
          .otherwise(lit(0.2) / (col("k") - 2).cast("double")))
    weighted.groupBy(col("c_day").as("day"))
      .agg(count(lit(1)).as("n_clicks"),
           dround(sum("credit"), 4).as("credit"))
      .orderBy("day")
  }

  /** x80 seasonal-naive forecast backtest — the baseline every real
    * forecaster must beat, evaluated in one pass: predict each day's
    * per-type mean value with the SAME WEEKDAY's mean a week earlier,
    * then score MAE / MAPE per type over the evaluable days. Shipping the
    * backtest (not a forecast) is the honest engine primitive: it turns
    * "is our fancy model any good" into a join.
    *
    * One corpus scan → the (type, day) daily-mean aggregate (the x64/ST18
    * rollup shape — at scale this READS the day rollup instead); the
    * 7-day lag is a window over the |types|·|days| AGGREGATE (x31's
    * discipline — aggregate-sized input, never the corpus). */
  def x80Backtest(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum("value").as("sv"), count(lit(1)).as("n"))
      .withColumn("m", col("sv") / col("n").cast("double"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("f", lag("m", 7).over(w))
      .withColumn("fday", lag("day", 7).over(w))
      // a gap in the day sequence would silently misalign lag-7; restrict
      // to rows whose lag really is 7 calendar days back (both engines)
      .filter(col("f").isNotNull && datediff(col("day"), col("fday")) === 7)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
           dround(avg(abs(col("m") - col("f"))), 4).as("mae"),
           dround(avg(abs(col("m") - col("f")) / abs(col("m"))), 4).as("mape"))
      .orderBy("event_type")
  }

  /** x81 weekday seasonality profile — the day-of-week shape x80's
    * seasonal-naive forecast presumes: per (type, weekday 0=Sun..6=Sat),
    * event count, share of the type's weekly mass, and mean value. The
    * readout that justifies (or kills) a lag-7 model before anyone fits
    * one. One map-side-combined hash agg onto ≤|types|·7 rows + a
    * broadcast totals join — q19's shape; weekday derives integer-only
    * (Spark dayofweek−1 ≡ DuckDB dayofweek, both calendar-table lookups,
    * no FP). */
  def x81Weekday(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select(col("event_type"), (dayofweek(col("ts")) - 1).cast("long").as("dow"),
              col("value"))
    val agg = base.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    val tot = agg.groupBy("event_type").agg(sum("n").as("tot"))
    agg.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow"), col("n"),
        dround(col("n").cast("double") / col("tot").cast("double"), 4).as("share"),
        dround(col("sv") / col("n").cast("double"), 4).as("avg_value"))
      .orderBy("event_type", "dow")
  }

  /** x147 next-incident carry — the FORWARD-looking as-of: for every
    * purchase, the user's next error event strictly after it (and the
    * gap in seconds; null when no error follows). q17/x13 look BACKWARD
    * (latest quote at or before); x57's lead() sees only the next ROW
    * regardless of type; this carries the next row OF A GIVEN TYPE — the
    * "time from action to first incident" primitive behind churn-risk
    * and incident-attribution readouts.
    *
    * Mechanics: one window over (user, time, event_id) with a FORWARD
    * frame (1 FOLLOWING → ∞) and a conditional min — no self-join, no
    * second shuffle; "strictly after" is the frame bound plus the
    * event_id tiebreak (a same-timestamp error with a later event_id
    * counts as after — the declared tie rule). All-integer µs.
    *
    * Scale: the q31 profile — one user_id shuffle, per-user partitions,
    * never corpus-sized; output is the purchase subset only. */
  def x147NextIncident(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_err_us",
        min(when(col("event_type") === "error", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("(next_err_us - us) div 1000000").as("gap_s"))
      .orderBy("user_id", "event_id")
  }

  /** x142 day-volume distribution positions — the remaining DISTRIBUTION
    * window family (percent_rank, cume_dist, nth_value), deliberately
    * aggregate-fed: each (type, day) daily volume placed within its
    * type's empirical day-volume distribution, plus the type's
    * 3rd-lowest daily volume as the trim floor a "drop the 2 quietest
    * days" robustness rule would use.
    *
    * Determinism: the window orders by (n, day) — a FULL tiebreak, so
    * rank/frame positions are unique; percent_rank = (rn−1)/(N−1) and
    * cume_dist = rn/N are then exact rationals of integers, identical in
    * both engines, rounded at 6dp only for the hash. nth_value reads the
    * explicit full frame (the default frame stops at CURRENT ROW and
    * would null the first two rows — the classic nth_value trap).
    *
    * Scale: the window input is the (type, day) aggregate — |types|·days
    * rows from one map-side-combined hash agg; partitions are days-per-
    * type, never corpus-sized (the q29/x86 rule this suite pins). */
  def x142DayRank(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("n", "day")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .withColumn("pr", dround(percent_rank().over(w), 6))
      .withColumn("cd", dround(cume_dist().over(w), 6))
      .withColumn("third_low", nth_value(col("n"), 3).over(full))
      .orderBy("event_type", "day")
  }

  def x57Transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = pairs.groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("event_type").agg(sum("n").as("tot"))
    counts.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("next_type"), col("n"),
        dround(col("n").cast("double") / col("tot").cast("double"), 4).as("p"))
      .orderBy("event_type", "next_type")
  }

  /** x86 CUSUM change scan — the changepoint readout a drift monitor runs
    * per series: for each user's value stream (ts, event_id order), the
    * peak absolute CUSUM deviation. The statistic is kept ALL-INTEGER so
    * the hash is exact across engines: with cents v_i = ts-ordered values
    * at 2 decimals ×100, prefix sums C_i and total T over n points, the
    * deviation at i is |n·C_i − i·T| (the mean-centered CUSUM scaled by
    * n·100 — scale-free for argmax/threshold purposes, no double mean, no
    * σ division anywhere). Reported: n, the peak, and the event_id where
    * the peak is first attained (min event_id among argmax positions — a
    * deterministic tie-break).
    *
    * Scale: one shuffle on user_id (high-cardinality — the q29 lesson),
    * two window passes over the same sort, one hash agg. Peak magnitudes
    * bound by n·Σ|v| ≤ 1e5·1e9 per user — BIGINT-safe by orders of
    * magnitude. */
  def x86Cusum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("c", sum("cents").over(run))
    val totals = scanned.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("t"))
    scanned.join(totals, "user_id")
      .withColumn("dev", abs(col("n") * col("c") - col("i") * col("t")))
      .groupBy("user_id")
      .agg(max("n").as("n"), max("dev").as("peak_dev"),
        min_by(col("event_id"), struct(-col("dev"), col("event_id")))
          .as("peak_event"))
      .orderBy("user_id")
  }

  /** x87 finite-window EWMA — the last-value smoother a feature store
    * materializes per entity: over each user's final up-to-8 events
    * (recency rank r = 1 newest), weights (1−α)^(r−1) with α = 1/4,
    * normalized over the taps present. The weight ladder is EXACT
    * integers: (3/4)^(r−1) × 4^7 = 3^(r−1)·4^(8−r), so numerator
    * Σ cents·w and denominator Σ w are BIGINT sums and the ONLY double is
    * the final rounded division — no float accumulation order anywhere.
    *
    * Scale: rank + filter keeps ≤8 rows per user before the aggregate, so
    * the shuffle after the window carries 8·|users| tiny rows; the window
    * itself is the one user_id shuffle every per-series op here shares. */
  def x87Ewma(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= 8)
      // 3^(r−1)·4^(8−r) for r = 1..8, spelled as an exact literal ladder —
      // no libm pow whose cast-truncation could flip a weight by one
      .withColumn("wt", element_at(
        array(Seq(16384L, 12288L, 9216L, 6912L, 5184L, 3888L, 2916L, 2187L)
          .map(lit): _*), col("r").cast("int")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_taps"),
        dround(sum(col("cents") * col("wt")).cast("double")
          / (sum("wt") * 100).cast("double"), 4).as("ewma"))
      .orderBy("user_id")
  }

  /** x90 session path trigrams — the sequential-pattern mining step a
    * behavioral model starts from: within x20's 6-hour-gap sessions,
    * every three consecutive event types, counted corpus-wide, top 20 by
    * (n DESC, path). Two leads over the one user-shuffled sort; the
    * session-id equality filter (same island for all three) replaces a
    * pairwise self-join — no quadratic candidate step. Count-ordered
    * with the full path as tie-break: deterministic. The same
    * sessionization's BIGRAM statistic, row-normalized into transition
    * probabilities, is [[x126MarkovTransitions]] — complementary, not
    * overlapping: this is a top-k pattern cut, that is the complete
    * fitted matrix. */
  def x90PathTrigrams(s: SparkSession, d: String): DataFrame = {
    val gapUs = 6L * 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum("brk").over(run))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .withColumn("s3", lead("sess", 2).over(w))
      .filter(col("t3").isNotNull && col("s3") === col("sess"))
      .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  /** x91 SCD2 state intervals — the slowly-changing-dimension build every
    * warehouse runs over an event stream: per user, maximal runs of equal
    * event_type in (ts, event_id) order (the current-state intervals a
    * type-2 dimension row would carry), summarized per type as interval
    * count, mean run length, and longest run. Islands come from the
    * rn − rn_by_type difference — two window passes over the SAME
    * user_id sort (one shuffle; the per-(user,type) rank reuses the
    * partition), then one hash agg. All-integer until the final rounded
    * mean. */
  def x91Scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wt = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val runs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("island",
        row_number().over(w).cast("long") - row_number().over(wt).cast("long"))
      .groupBy("user_id", "event_type", "island")
      .agg(count(lit(1)).as("len"))
    runs.groupBy("event_type")
      .agg(count(lit(1)).as("n_intervals"),
        dround(sum("len").cast("double") / count(lit(1)).cast("double"), 4)
          .as("avg_run"),
        max("len").as("max_run"))
      .orderBy("event_type")
  }

  /** x99 grid alignment with LOCF — the resampling step that puts ragged
    * series onto a common clock before any cross-series math (x92's
    * correlations, x80's backtests): per event_type, the fixture-anchored
    * hourly spine [2024-01-01 00:00, 2024-01-30 23:00], each hour carrying
    * the observed cents sum or the last observation carried forward
    * (leading holes stay NULL — no back-fill, same no-extrapolation rule
    * as x26). All-integer payload (exact cents), so LOCF propagates exact
    * values.
    *
    * Scale: the corpus collapses to the (type, hour) hash agg FIRST; the
    * spine join and the LOCF window run over the grid (types·hours rows —
    * aggregate-sized, corpus-independent), which is why the 5-partition
    * window here is NOT the q29 trap: its input is already tiny. */
  def x99Align(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("observed"))
    val spine = hourly.select("event_type").distinct()
      .crossJoin(broadcast(Tables.events(s, d).sparkSession.sql(
        """SELECT explode(sequence(TIMESTAMP '2024-01-01 00:00:00',
          |TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS h""".stripMargin)))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left")
      .withColumn("filled", last("observed", ignoreNulls = true).over(w))
      .select(col("event_type"), col("h"),
        col("observed").isNotNull.cast("int").as("is_observed"),
        col("filled").as("filled_cents"))
      .orderBy("event_type", "h")
  }

  /** x100 OHLC downsample — the finance-canonical bar aggregation, which
    * is also exactly catena's per-series rollup shape: per (event_type,
    * day), the first value (open), max (high), min (low), last value
    * (close), event count, and exact cents volume. Open/close are argmin/
    * argmax aggregates over the total (ts, event_id) order — hash
    * aggregates with map-side combine, NOT per-group windows, so a
    * hot series never serializes onto one task (the q29 rule applied to
    * bars). Picked values are raw doubles (no arithmetic — exact on both
    * engines); volume is exact cents. */
  def x100Ohlc(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("ts"), col("event_id"), col("value"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max("value").as("high"), min("value").as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n"), sum("cents").as("volume_cents"))
      .orderBy("event_type", "day")

  /** x96 join-key skew audit — the pre-flight a 100 TB join runs before
    * choosing SMJ vs salting: per-key row counts for the prospective join
    * key, the 10 heaviest keys with their corpus share and
    * multiple-of-median, computed from one hash agg + one
    * TakeOrderedAndProject over the key-count table + a broadcast 1-row
    * stats aggregate. The median is the exact interpolated percentile
    * (Q25's cross-engine-validated quantile_cont twin). This readout IS
    * the evidence behind this repo's own AQE-vs-salting calls
    * (BASELINE.md's skew-stress sections). */
  def x96KeySkew(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    val stats = counts.agg(count(lit(1)).as("n_keys"), sum("n").as("total"),
      expr("percentile(n, 0.5d)").as("med"))
    counts.orderBy(col("n").desc, col("user_id")).limit(10)
      .crossJoin(broadcast(stats))
      .select(col("user_id"), col("n"),
        dround(col("n").cast("double") / col("total").cast("double"), 4).as("share"),
        dround(col("n").cast("double") / col("med"), 2).as("x_median"))
      .orderBy(col("n").desc, col("user_id"))
  }

  /** x98 population-stability drift — the PSI readout a serving monitor
    * computes between a reference window and a live window: per
    * event_type, value histograms over FIXED bins (cents ÷ 2500, capped
    * at bin 13 — edges are part of the declared contract, so both halves
    * and both engines bin identically), Laplace-smoothed shares over the
    * full 14-bin grid, PSI = Σ (p_a − p_b)·ln(p_a / p_b). The split point
    * is a fixed timestamp literal (the fixture midpoint), standing in for
    * the train-snapshot vs live-window pair a deployment would plug in.
    *
    * Scale: two corpus-partition hash aggs onto ≤|types|·14 cells each,
    * grid completion via a broadcast 14-row bin spine, constant-width
    * final reduce. ln-sum rounding under x18/x67's precedent. */
  def x98PsiDrift(s: SparkSession, d: String): DataFrame = {
    val mid = lit("2024-01-15 12:00:00").cast("timestamp")
    val binned = Tables.events(s, d)
      .select(col("event_type"),
        when(col("ts") < mid, lit("a")).otherwise(lit("b")).as("half"),
        least(((col("value").cast("decimal(18,2)") * 100).cast("long")
          / 2500).cast("long"), lit(13L)).as("bin"))
      .groupBy("event_type", "half", "bin").agg(count(lit(1)).as("c"))
    val grid = binned.select("event_type").distinct()
      .crossJoin(broadcast(s.range(0, 14).toDF("bin")))
    val halves = Seq("a", "b").map { h =>
      val counts = binned.filter(col("half") === h)
        .select(col("event_type"), col("bin"), col("c"))
      val tot = counts.groupBy("event_type").agg(sum("c").as(s"n_$h"))
      grid.join(counts, Seq("event_type", "bin"), "left")
        .na.fill(0L, Seq("c"))
        .join(broadcast(tot), "event_type")
        .select(col("event_type"), col("bin"),
          ((col("c") + 1).cast("double")
            / (col(s"n_$h") + 14).cast("double")).as(s"p_$h"),
          col(s"n_$h"))
    }
    halves(0).join(halves(1), Seq("event_type", "bin"))
      .groupBy("event_type")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        dround(sum((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b"))), 4)
          .as("psi"))
      .orderBy("event_type")
  }

  /** x92 cross-metric correlation — the dependence matrix a feature
    * auditor reads before co-training on per-entity daily aggregates:
    * Pearson correlation between event types over per-(user, day) value
    * sums, one row per unordered type pair. The moments are EXACT:
    * per-cell sums are cents (BIGINT), and nΣxy − ΣxΣy / variance terms
    * are computed in DECIMAL(38,0) (bounded ~1e22 here — far inside 38
    * digits), so both engines divide the SAME two exact integers; the
    * single double step is sqrt(d1·d2) of one exact product, then the
    * rounded division. Zero-variance guard is an explicit filter (the
    * x25 knife-edge rule).
    *
    * Scale: one (user, day) hash agg (map-side combined), a 5-way pivot
    * to one row per cell, then a CONSTANT-width aggregate (10 pairs ×
    * 5 moments) — the reduction is independent of corpus size, x51's
    * tree-aggregate shape. */
  def x92CorrPairs(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cells = Tables.events(s, d)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("cents"))
      .groupBy("user_id", "day")
      .pivot("event_type", types)
      .agg(first("cents"))
      .na.fill(0L, types)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val pairs = for {
      i <- types.indices; j <- types.indices if i < j
    } yield (types(i), types(j))
    val moments = cells.agg(
      count(lit(1)).as("n"),
      pairs.flatMap { case (a, b) => Seq(
        sum(col(a)).as(s"sx_$a$b"), sum(col(b)).as(s"sy_$a$b"),
        sum(dec(col(a)) * dec(col(a))).as(s"sxx_$a$b"),
        sum(dec(col(b)) * dec(col(b))).as(s"syy_$a$b"),
        sum(dec(col(a)) * dec(col(b))).as(s"sxy_$a$b"))
      }: _*)
    val rows = pairs.map { case (a, b) =>
      val n = dec(col("n")); val k = s"$a$b"
      val num = n * col(s"sxy_$k") - dec(col(s"sx_$k")) * dec(col(s"sy_$k"))
      val d1 = n * col(s"sxx_$k") - dec(col(s"sx_$k")) * dec(col(s"sx_$k"))
      val d2 = n * col(s"syy_$k") - dec(col(s"sy_$k")) * dec(col(s"sy_$k"))
      struct(lit(a).as("type_a"), lit(b).as("type_b"),
        d1.as("d1"), d2.as("d2"),
        num.cast("double").as("numd"), (d1 * d2).cast("double").as("dend"))
    }
    moments.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .filter(col("d1") > 0 && col("d2") > 0)
      .select(col("type_a"), col("type_b"),
        dround(col("numd") / sqrt(col("dend")), 4).as("corr"))
      .orderBy("type_a", "type_b")
  }

  /** x109 exact two-sample Kolmogorov–Smirnov drift — the nonparametric
    * companion to x98's PSI gate, over the SAME reference/live split: per
    * event_type, D = max over the pooled support of |CDF_ref − CDF_live|,
    * computed EXACTLY. x98 answers "how far apart are the fixed-bin
    * histograms" (bin edges are part of its contract); KS answers "how far
    * apart are the distributions, bin-free" — the test that catches a
    * within-bin shift PSI's 2500-cent bins smooth away.
    *
    * Exactness discipline: values snap to integer cents; the per-type
    * VALUE HISTOGRAM (cells bounded by the cents domain, not the corpus —
    * the x103/x78 spine argument) carries integer running counts; the
    * statistic's numerator max|n_b·cumₐ − n_a·cum_b| is DECIMAL(38,0)
    * (x92's rule — n·cum overflows Long at ~1e9×1e9 corpus scale); the
    * one double is the final rounded divide by n_a·n_b. D only changes at
    * support points, so evaluating after each histogram cell IS the exact
    * supremum. One corpus-sized hash agg; everything after runs on
    * aggregate-sized cell tables. */
  def x109KsDrift(s: SparkSession, d: String): DataFrame = {
    val mid = lit("2024-01-15 12:00:00").cast("timestamp")
    val hist = Tables.events(s, d)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        when(col("ts") < mid, 1L).otherwise(0L).as("ina"))
      .groupBy("event_type", "cents")
      .agg(sum(col("ina")).as("ca"), sum(lit(1L) - col("ina")).as("cb"))
    val tot = hist.groupBy("event_type").agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    val w = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum_a", sum("ca").over(w))
      .withColumn("cum_b", sum("cb").over(w))
      .join(broadcast(tot), "event_type")
      .withColumn("dn", abs(
        col("n_b").cast("decimal(38,0)") * col("cum_a").cast("decimal(38,0)")
          - col("n_a").cast("decimal(38,0)") * col("cum_b").cast("decimal(38,0)")))
      .groupBy("event_type")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
           max("dn").cast("decimal(38,0)").as("d_num"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("d_num"),
        dround(col("d_num").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")), 4).as("ks"))
      .orderBy("event_type")
  }

  /** x107 peak session concurrency — the capacity-planning readout: per
    * day, the maximum number of simultaneously-open user sessions (x20's
    * 6-hour-gap sessions, inclusive [start, end] intervals) plus the
    * day's start/end counts. The classic ±1 boundary sweep, but the
    * running count is NEVER one global window task:
    *
    *  1. sessions → boundary events (+1 at start, −1 at end);
    *  2. per-HOUR subtotals → exclusive prefix over the hour spine (an
    *     aggregate of ≤ years·8760 rows — x16/x102's two-level trick with
    *     time itself as the bucket) → broadcast carry-in per hour;
    *  3. intra-hour running sum windowed by hour — parallelism = live
    *     hours, each task bounded by that hour's boundary count;
    *  4. per-day max. At 100 TB the sweep shuffles boundaries (2 rows per
    *     session), never events.
    *
    * Tie discipline: the intra-hour frame is RANGE (peers included), so
    * every boundary in a (us, kind) tie group carries the AFTER-GROUP
    * total — order within the group can't change any emitted value in
    * either engine — and kind orders starts (0) before ends (1), so
    * back-to-back sessions at the same microsecond count as overlapping
    * (inclusive-interval semantics, declared). All-integer. */
  def x107PeakConcurrency(s: SparkSession, d: String): DataFrame = {
    val gapUs = 6L * 3600L * 1000000L
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session", sum("brk").over(run))
      .groupBy("user_id", "session")
      .agg(min("us").as("start_us"), max("us").as("end_us"))
    val bounds = sessions
      .select(col("start_us").as("us"), lit(0L).as("kind"), lit(1L).as("delta"))
      .unionAll(sessions.select(col("end_us"), lit(1L), lit(-1L)))
      .withColumn("hr", floorDiv(col("us"), hourUs))
    val sub = bounds.groupBy("hr").agg(sum("delta").as("sub"))
    val wh = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, -1)
    val carry = sub
      .withColumn("carry", coalesce(sum("sub").over(wh), lit(0L)))
      .select(col("hr").as("c_hr"), col("carry"))
    val wi = Window.partitionBy("hr").orderBy("us", "kind")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.join(broadcast(carry), col("hr") === col("c_hr"))
      .withColumn("cum", col("carry") + sum("delta").over(wi))
      .withColumn("epoch_day", floorDiv(col("hr"), 24L))
      .groupBy("epoch_day")
      .agg(max("cum").as("peak"),
           sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
           sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_ends"))
      .orderBy("epoch_day")
  }

  /** x117 inter-arrival burstiness — point-process statistics per event
    * type over PER-USER event streams: coefficient of variation and the
    * Goh–Barabási burstiness index B = (σ−μ)/(σ+μ) of the inter-arrival
    * gaps. A Poisson stream scores B ≈ 0, periodic < 0, bursty → 1 — the
    * capacity/anomaly readout that says whether load arrives smoothly or
    * in spikes.
    *
    * Scale discipline: the lag window partitions by (user_id,
    * event_type) — high-cardinality series keys (x20's rule), never by
    * the 5-value event_type alone. Gap moments then reduce in ONE
    * map-side-combined agg per type: n, Σg (Long — µs gaps over a month
    * sum to ~1e12·rows/series, safe), and Σg² in DECIMAL(38,0) (x92's
    * overflow rule: a single month-long µs gap squares to ~7e24, past
    * Long). σ uses the n-divisor (population) form computed from exact
    * integer sums: σ² = (n·Q − S²)/n², evaluated in DECIMAL then ONE
    * divide to double; sqrt is IEEE-correctly-rounded in both engines,
    * so the only rounding discipline needed is the final dround. */
  def x117Burstiness(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("gap").as("sg"),
        sum(col("gap").cast("decimal(38,0)") * col("gap").cast("decimal(38,0)"))
          .as("sq"))
      .withColumn("varNum",
        (col("n").cast("decimal(38,0)") * col("sq")
          - col("sg").cast("decimal(38,0)") * col("sg").cast("decimal(38,0)")))
      .withColumn("mean", col("sg").cast("double") / col("n").cast("double"))
      .withColumn("sigma",
        sqrt(col("varNum").cast("double"))
          / (col("n").cast("double")))
      .select(col("event_type"), col("n"),
        dround(col("mean"), 4).as("mean_gap_us"),
        dround(col("sigma") / col("mean"), 4).as("cv"),
        dround((col("sigma") - col("mean")) / (col("sigma") + col("mean")), 4)
          .as("burstiness"))
      .orderBy("event_type")
  }

  /** x111 M4 downsample — the error-free visualization downsample
    * (Jugel et al., VLDB 2014): per (series, pixel-column time bucket),
    * the min, max, FIRST, and LAST values. Unlike q48's avg rollup, M4
    * guarantees the rendered line through the four extrema is pixel-exact
    * for any width-aligned chart, which is why every production TSDB
    * (including the reference's rollup surface) ships it.
    *
    * Scale: ONE partial+final hash agg — `min_by`/`max_by` over the
    * (µs, event_id) order key are declarative aggregates, so first/last
    * selection map-side-combines like min/max and the shuffle carries one
    * row per (series, bucket) regardless of corpus size; no window, no
    * sort. Bucket count is bounded by chart width × series, so the result
    * is screen-sized at any data scale. All four outputs are SELECTED
    * stored doubles (no arithmetic) — bit-identical across engines with
    * no rounding step.
    *
    * The first/last order key (µs, event_id) is packed into ONE
    * DECIMAL(31,0): offset-in-hour (≤ 3.6e9, 10 digits) × 10¹⁹ +
    * event_id (any 63-bit id, 19 digits) — order-isomorphic to the pair
    * within a bucket (the hour start is constant there). A STRUCT order
    * key would demote the whole agg to SortAggregate (struct buffers
    * aren't UnsafeRow-mutable — measured on this very query); the decimal
    * buffer keeps HashAggregate + map-side combine (PlanSpec pin). */
  def x111M4(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val p19 = lit(new java.math.BigDecimal("10000000000000000000")) // 10^19
    Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("hr", floorDiv(col("us"), hourUs))
      .withColumn("pack",
        (col("us") - col("hr") * hourUs).cast("decimal(10,0)") * p19 + col("event_id"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"),
        min("value").as("v_min"), max("value").as("v_max"),
        min_by(col("value"), col("pack")).as("v_first"),
        max_by(col("value"), col("pack")).as("v_last"))
      .orderBy("event_type", "hr")
  }

  /** x120 hourly-count autocorrelation — per event type, the sample ACF
    * of the hourly event-count series at lags 1–3 (zero-filled over the
    * GLOBAL hour spine, so silent hours count as 0 — dropping them would
    * alias the very periodicity the ACF measures). The seasonality
    * readout behind capacity planning and anomaly baselines: r₁ ≈ 1 says
    * smooth load, a daily cycle shows as structure at lag 24 (the
    * contract keeps 1–3; the mechanics are lag-generic).
    *
    * Determinism/scale in one shape: the corpus collapses to the (type,
    * hour) count agg FIRST (map-side combined, x99's spine precedent);
    * the spine join, lead windows, and moment sums all run over the
    * AGGREGATE (|types|·|hours| rows). The ACF itself is assembled from
    * INTEGER sums only — with m = S/n, both numerator and denominator
    * scale by n² into exact integers (decimal(38,0) here ↔ HUGEINT in
    * the twin — the 100 TB posture: S² wraps a long at S ≈ 3e9):
    *   num_k·n² = n²·Σc_t·c_{t+k} − n·S·(H_k+T_k) + (n−k)·S²
    *   den·n²   = n²·Σc² − n·S²
    * so each engine performs ONE double divide on identical integers. */
  def x120HourlyAcf(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val counts = Tables.events(s, d)
      .select(col("event_type"), floorDiv(unix_micros(col("ts")), hourUs).as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("c"))
    val bounds = counts.agg(min("hr").as("h0"), max("hr").as("h1"))
    val spine = counts.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val series = spine.join(counts, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"), coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("hr")
    val led = series
      .withColumn("c1", lead("c", 1).over(w))
      .withColumn("c2", lead("c", 2).over(w))
      .withColumn("c3", lead("c", 3).over(w))
    def lagSums(k: Int) = Seq(
      sum(col("c") * col(s"c$k")).as(s"xy$k"),
      sum(when(col(s"c$k").isNotNull, col("c"))).as(s"h$k"),
      sum(col(s"c$k")).as(s"t$k"))
    val aggCols = Seq(count(lit(1)).as("n"), sum("c").as("ss"),
      sum(col("c") * col("c")).as("qq")) ++ lagSums(1) ++ lagSums(2) ++ lagSums(3)
    val m = led.groupBy("event_type").agg(aggCols.head, aggCols.tail: _*)
    def r(k: Int) = {
      // moment products in decimal(38,0) (the x125 idiom): LongType would
      // wrap silently at S ≈ 3e9 events per type (S² term) while the
      // twin's uncast HUGEINT sums stay exact — the n²-scaled terms top
      // out ~1e29 at a 100 TB corpus, well inside 38 digits
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val (dn, dss, dqq) = (dec(col("n")), dec(col("ss")), dec(col("qq")))
      val num = dn * dn * dec(col(s"xy$k")) -
        dn * dss * dec(col(s"h$k") + col(s"t$k")) +
        dec(col("n") - k) * dss * dss
      val den = dn * dn * dqq - dn * dss * dss
      struct(lit(k).as("lag"),
        dround(num.cast("double") / den.cast("double"), 4).as("r"))
    }
    m.select(col("event_type"), explode(array(r(1), r(2), r(3))).as("a"))
      .select(col("event_type"), col("a.lag").as("lag"), col("a.r").as("r"))
      .orderBy("event_type", "lag")
  }

  /** x123 retention cohorts — the product-analytics daily retention
    * triangle: users grouped by FIRST-ACTIVE day (cohort), and for each
    * day offset 0–13, how many of that cohort were active (any event)
    * that day, with the retention share. x72's sibling question at day
    * granularity over the full user base.
    *
    * Scale: raw events collapse to distinct (user, day) FIRST (one hash
    * shuffle — the only corpus-sized exchange); first-day is a per-user
    * min over that (user-sized); offsets join activity back to first-day
    * per user (user-sized equi-join) and everything after is the
    * |cohorts|·14 matrix. All-integer until the rounded share. */
  def x123Retention(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    x123FromActivity(Tables.events(s, d)
      .select(col("user_id"), floorDiv(unix_micros(col("ts")), dayUs).as("day"))
      .distinct())
  }

  /** x123's matrix over any distinct (user_id, day) activity frame — the
    * entry point ST25's continuously-maintained activity store derives
    * the retention triangle from (first-day is re-derived here, so a
    * LATE row for an earlier day correctly reassigns its user's cohort —
    * the failure mode an incrementally-cached first-day would have). */
  def x123FromActivity(act: DataFrame): DataFrame = {
    val first = act.groupBy("user_id").agg(min("day").as("cohort_day"))
    val size = first.groupBy("cohort_day").agg(count(lit(1)).as("cohort_users"))
    act.join(first, "user_id")
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("offset"))
      .filter(col("offset").between(0, 13))
      .groupBy("cohort_day", "offset").agg(count(lit(1)).as("n_active"))
      .join(broadcast(size), "cohort_day")
      .select(col("cohort_day"), col("offset"), col("n_active"), col("cohort_users"),
        dround(col("n_active").cast("double") / col("cohort_users").cast("double"), 4)
          .as("retained"))
      .orderBy("cohort_day", "offset")
  }

  /** x124 rolling active users — per day in the observed range: distinct
    * daily actives (DAU), distinct 7-day-window actives (WAU, window
    * [d−6, d]), and the DAU/WAU stickiness ratio. The engagement
    * trendline next to x123's cohort triangle; exact (no sketch), which
    * matters because stickiness moves in percents.
    *
    * Exact rolling DISTINCT without re-scanning per window: each distinct
    * (user, day) activity COVERS the 7 window-days it is visible to —
    * explode day..day+6, distinct (user, window day) again (a user
    * active twice inside one window must count once), then a count per
    * window day. Expansion mass is exactly 7·|user-days| rows — linear,
    * shuffled once on the (user, wday) distinct; every aggregate after
    * is |days|-sized. All-integer until the rounded ratio. */
  def x124RollingActive(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    x124FromActivity(Tables.events(s, d)
      .select(col("user_id"), floorDiv(unix_micros(col("ts")), dayUs).as("day"))
      .distinct())
  }

  /** x124 over any distinct (user_id, day) activity frame — like
    * [[x123FromActivity]], servable from ST25's continuously-maintained
    * activity store. */
  def x124FromActivity(act: DataFrame): DataFrame = {
    val bounds = act.agg(min("day").as("d0"), max("day").as("d1"))
    val weekly = act
      .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("wday"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .filter(col("wday").between(col("d0"), col("d1")))
      .groupBy("wday").agg(count(lit(1)).as("active_7d"))
    val daily = act.groupBy("day").agg(count(lit(1)).as("active_1d"))
    weekly.join(daily, col("wday") === col("day"), "left")
      .select(col("wday").as("day"),
        coalesce(col("active_1d"), lit(0L)).as("active_1d"), col("active_7d"),
        dround(coalesce(col("active_1d"), lit(0L)).cast("double")
          / col("active_7d").cast("double"), 4).as("stickiness"))
      .orderBy("day")
  }

  /** x129 activity streaks — per user, the longest run of CONSECUTIVE
    * active days and the number of distinct streaks, rolled up into a
    * per-streak-length histogram (how many users peak at a k-day
    * streak). The engagement readout next to x124's rolling actives:
    * streaks measure habit, windows measure reach. Gaps-and-islands via
    * the classic (day − dense-position) constancy: within a user, day −
    * row_number() is constant exactly along a consecutive run. The
    * per-user window is bounded by a user's ACTIVE-DAY count (≤ span
    * days, not events — the distinct collapses first); everything after
    * is user-sized then histogram-sized. All-integer. */
  def x129Streaks(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val act = Tables.events(s, d)
      .select(col("user_id"), floorDiv(unix_micros(col("ts")), dayUs).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val runs = act
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
    val perUser = runs.groupBy("user_id")
      .agg(max("len").as("best_streak"), count(lit(1)).as("n_streaks"))
    perUser.groupBy("best_streak")
      .agg(count(lit(1)).as("n_users"),
        sum("n_streaks").cast("long").as("total_streaks"))
      .orderBy("best_streak")
  }

  /** x130 hourly burst flags — the rate-anomaly readout at SERIES level
    * (x25 flags per-point value outliers; this flags HOURS whose event
    * count spikes vs the trailing day): per event type over the
    * zero-filled hour spine, flag hours with a full 24h of history where
    * `24·n ≥ 3·sum24` (count ≥ 3× the trailing-24h mean) and n ≥ 10 —
    * entirely INTEGER predicates, no rate division anywhere, so there is
    * no rounding discipline to even apply. Output: the flagged hours
    * with their counts and trailing sums.
    *
    * Scale: the corpus collapses to the (type, hour) agg first; the
    * trailing-sum window runs over the AGGREGATE-sized spine (x120's
    * shape). */
  def x130BurstFlags(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val counts = Tables.events(s, d)
      .select(col("event_type"), floorDiv(unix_micros(col("ts")), hourUs).as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("c"))
    val bounds = counts.agg(min("hr").as("h0"), max("hr").as("h1"))
    val spine = counts.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val series = spine.join(counts, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"), coalesce(col("c"), lit(0L)).as("c"))
    val w24 = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
    series
      .withColumn("sum24", sum("c").over(w24))
      .withColumn("n24", count(lit(1)).over(w24))
      .filter(col("n24") === 24 && col("c") >= 10 &&
        col("c") * 24 >= col("sum24") * 3)
      .select(col("event_type"), col("hr"), col("c").as("n"), col("sum24"))
      .orderBy("event_type", "hr")
  }

  /** x126 session Markov transition matrix — the exact first-order
    * transition probabilities between consecutive event types inside
    * x20's 6-hour-gap sessions: for every ordered pair (t_from, t_to)
    * observed, the integer transition count, the t_from row marginal,
    * and p = n / n_from. This is the statistic a Markov attribution /
    * next-action model is FIT from — [[x90PathTrigrams]] (top-20 trigram
    * COUNTS, same sessionization) cannot express it: the matrix is
    * complete (no top-k cut), bigram-granular, and row-normalized.
    * Re-specced in round 10 from a trigram-path form that duplicated x90.
    *
    * Plan: ONE `lead` pair over the one user-shuffled (µs, event_id)
    * sort (x90's same-island filter — no session array is ever
    * materialized), then a map-side-combined count whose key space is
    * ≤ |event types|² = 25; the row-marginal window runs over that
    * aggregate (constant-width — not the q29 unpartitioned-window trap),
    * so nothing after the first shuffle is corpus-sized. All-integer
    * until the single rounded divide. */
  def x126MarkovTransitions(s: SparkSession, d: String): DataFrame = {
    val gapUs = 6L * 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trans = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum("brk").over(run))
      .withColumn("t_to", lead("event_type", 1).over(w))
      .withColumn("s2", lead("sess", 1).over(w))
      .filter(col("t_to").isNotNull && col("s2") === col("sess"))
      .groupBy(col("event_type").as("t_from"), col("t_to"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy("t_from")
    trans
      .withColumn("n_from", sum("n").over(wf))
      .withColumn("p",
        dround(col("n").cast("double") / col("n_from").cast("double"), 4))
      .orderBy("t_from", "t_to")
  }

  /** x155 anti-entropy replica reconciliation — the Merkle-style repair
    * plan two copies of a partitioned table compute WITHOUT shipping
    * rows: each replica folds every day-partition to a constant-size
    * fingerprint (row count + an ORDER-INSENSITIVE sum of per-row md5
    * prefixes — commutative, so partitioning/arrival order can't change
    * it), the day fingerprints are diffed, and ONLY mismatched days get
    * the row-level anti-join that names the missing event_ids. Replica B
    * is derived in-query (on days ≡ 3 mod 7 only, drop event_id ≡ 0 mod
    * 97 — a deterministic, DAY-LOCALIZED simulated partition loss), so
    * the operator is self-contained and the shortlist genuinely prunes.
    *
    * Scale story: at 100 TB the fingerprint pass is two map-side-combined
    * scans onto |days| rows each; the compare moves only day rows; the
    * repair anti-join re-reads the fixture pruned by the (broadcast)
    * mismatched-day shortlist — repair cost ∝ damaged days, never corpus
    * size. PlanSpec pins the shortlist join under the anti-join. Output:
    * the missing rows (day, event_id) with each day's replica counts. */
  def x155ReplicaDiff(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    def keyed(df: DataFrame): DataFrame = df.select(
      floorDiv(unix_micros(col("ts")), dayUs).as("day"),
      col("event_id"),
      conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long").as("h"))
    val a = keyed(Tables.events(s, d))
    val b = a.filter(!(pmod(col("day"), lit(7L)) === 3L
      && pmod(col("event_id"), lit(97L)) === 0L))
    def fp(df: DataFrame) = df.groupBy("day")
      .agg(count(lit(1)).as("n"), sum("h").as("fp"))
    val bad = fp(a)
      .join(fp(b).select(col("day").as("b_day"), col("n").as("n_b"),
          col("fp").as("fp_b")),
        col("day") === col("b_day"), "left")
      .filter(col("fp_b").isNull
        || col("fp") =!= col("fp_b") || col("n") =!= col("n_b"))
      .select(col("day"), col("n").as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // BOTH repair inputs are day-pruned by the broadcast shortlist BEFORE
    // the row-level anti-join. The anti condition references n_a (a
    // shortlist column) so PushDownLeftSemiAntiJoin can NEVER sink the
    // anti-join below the pruning join — without it Catalyst reorders the
    // anti onto the UNPRUNED corpus and the fingerprint pass buys nothing
    // (observed; PlanSpec pins both pruned shapes).
    val damagedA = a.join(broadcast(bad), Seq("day"))
    val damagedB = b.join(broadcast(bad.select("day")), Seq("day"), "left_semi")
    damagedA
      .join(damagedB.select(col("day").as("r_day"), col("event_id").as("r_id")),
        col("day") === col("r_day") && col("event_id") === col("r_id")
          && col("n_a") >= 0L,
        "left_anti")
      .select(col("day"), col("event_id"), col("n_a"), col("n_b"))
      .orderBy("day", "event_id")
  }

  /** x164 A/B experiment readout — the two-proportion test an
    * experimentation platform runs over behavioral data: users are
    * deterministically hash-assigned to control/treatment (md5 parity —
    * replayable, engine-independent, the x15 split discipline),
    * conversion = the user fired ≥ 10 purchase events (every user in
    * this dense fixture purchases at least once, so the frequent-buyer
    * gate is what leaves BOTH outcome classes populated at every sf —
    * measured 13/15, 129/150, 1282/1500), and the readout
    * is per-variant counts, rates, the lift, and the pooled two-sample
    * z² statistic with its 95% verdict. The suite's first inferential
    * surface: x103's AUC ranks a score, this TESTS a difference.
    *
    * Exactness (the x139/x158 discipline): z² is a ratio of integer
    * moments once cleared of nested divisions —
    *   z² = (c₁n₂ − c₂n₁)² · (n₁+n₂) / (n₁n₂ · C · (N − C))
    * with C = c₁+c₂, N = n₁+n₂ — every term an exact integer in
    * decimal(38,0) (the long-wrapping cross term squared stays exact
    * through ~1e9 users per variant; past that — where HUGEINT saturates
    * identically — run the same clearing in doubles over the exact
    * moments), ONE double divide, and the significance flag compares
    * that one double to the χ²₁ 95% critical value both engines hold
    * literally.
    *
    * Scale: the corpus collapses to per-user (converted) FIRST (one
    * user-keyed map-side-combined aggregate — the only corpus-sized
    * exchange); assignment is a map-side hash on the user-sized frame;
    * the readout is a 1-row fold. */
  def x164AbTest(s: SparkSession, d: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val users = Tables.events(s, d)
      .groupBy("user_id")
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 10L)
        .cast("long").as("conv"))
      .withColumn("variant",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(2L)))
    val m = users.agg(
      sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("variant") === 0L, col("conv")).otherwise(0L)).as("c1"),
      sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n2"),
      sum(when(col("variant") === 1L, col("conv")).otherwise(0L)).as("c2"))
    val cross = dec(col("c1")) * dec(col("n2")) - dec(col("c2")) * dec(col("n1"))
    val cTot = dec(col("c1") + col("c2"))
    val nTot = dec(col("n1") + col("n2"))
    val z2 = (cross * cross * nTot).cast("double") /
      (dec(col("n1")) * dec(col("n2")) * cTot * (nTot - cTot)).cast("double")
    m.select(col("n1"), col("c1"), col("n2"), col("c2"),
      dround(col("c1").cast("double") / col("n1").cast("double"), 6).as("p1"),
      dround(col("c2").cast("double") / col("n2").cast("double"), 6).as("p2"),
      dround((dec(col("c2")) * dec(col("n1"))).cast("double")
        / (dec(col("c1")) * dec(col("n2"))).cast("double"), 6).as("lift"),
      dround(z2, 4).as("z2"),
      (z2 > 3.841459).cast("int").as("significant"))
  }

  /** x165 churn hazard curve — the survival-analysis readout x123's
    * cohort triangle cannot express: per lifetime age a (days between a
    * user's first and last activity), how many users were still AT RISK
    * at that age and how many CHURNED exactly there, with the discrete
    * hazard d/n — censoring handled the Kaplan–Meier way: users whose
    * last activity is within 7 days of the corpus horizon are censored
    * (still alive — they leave the risk set after their observed age
    * but never count as deaths).
    *
    * All-integer: lifetimes collapse from distinct (user, day) to
    * per-user (first, last) (user-sized); the age histogram is
    * |ages|-sized; n_at_risk is a REVERSED cumulative sum over that
    * aggregate (aggregate-fed window); hazard is the one rounded
    * divide. The product-limit curve itself is deliberately NOT output:
    * a cumulative float product has no cross-engine exactness story,
    * and the (n, d) pairs ARE the sufficient statistic it derives from. */
  def x165HazardCurve(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val act = Tables.events(s, d)
      .select(col("user_id"),
        floorDiv(unix_micros(col("ts")), dayUs).as("day"))
      .distinct()
    val horizon = act.agg(max("day").as("h_day"))
    val life = act.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .crossJoin(broadcast(horizon))
      .select((col("d1") - col("d0")).as("age"),
        (col("d1") >= col("h_day") - 7L).cast("long").as("censored"))
    val byAge = life.groupBy("age")
      .agg(count(lit(1)).as("n_ending"),
        sum(lit(1L) - col("censored")).as("d"))
    val wRisk = Window.orderBy(col("age").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byAge
      .withColumn("n_at_risk", sum("n_ending").over(wRisk))
      .select(col("age"), col("n_at_risk"), col("d").as("n_churned"),
        dround(col("d").cast("double") / col("n_at_risk").cast("double"), 6)
          .as("hazard"))
      .orderBy("age")
  }

  /** x166 CUSUM changepoint — WHERE each series' level shifted, the
    * question x25 (pointwise z-score outliers) and x130 (burst flags)
    * don't answer: per event type, the single split of the daily-count
    * series maximizing the cumulative-sum deviation |D_t| = |n·P_t −
    * t·S| (the classic CUSUM statistic, n-scaled so it stays in exact
    * integers — P_t the count prefix at day-index t, S the series
    * total), with the before/after means and the shift. The first
    * readout of a "did the pipeline's volume regime change, and when"
    * incident review.
    *
    * Exactness/scale: the corpus collapses to (type, day) counts first
    * (map-side combined); the prefix runs per type over that
    * |types|·|days| aggregate; the argmax is a map-side-combinable
    * max(struct(absD, −t)) — ties break to the EARLIEST split; means
    * are exact integer ratios rounded once. n·P_t stays far inside a
    * long (days ≈ 3.7e3 at a decade, counts 1e12 → ~4e15). Splits
    * range t ∈ [1, n−1] so both sides are nonempty. */
  def x166CusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val counts = Tables.events(s, d)
      .select(col("event_type"),
        floorDiv(unix_micros(col("ts")), dayUs).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = counts
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("p", sum("c").over(run))
    val tot = pre.groupBy(col("event_type").as("g_type"))
      .agg(max("t").as("n"), max("p").as("s_tot"))
    pre.join(tot, col("event_type") === col("g_type"))
      .filter(col("t") < col("n"))
      .withColumn("dev", col("n") * col("p") - col("t") * col("s_tot"))
      .withColumn("absd", abs(col("dev")))
      .groupBy("event_type")
      .agg(max(struct(col("absd"), (-col("t")).as("nt"), col("day").as("day"),
        col("t").as("t"), col("p").as("p"), col("n").as("n"),
        col("s_tot").as("s_tot"))).as("m"))
      .select(col("event_type"),
        col("m.day").as("cp_day"), col("m.t").as("t"), col("m.n").as("n_days"),
        col("m.absd").as("absd"),
        dround(col("m.p").cast("double") / col("m.t").cast("double"), 4)
          .as("before_mean"),
        dround((col("m.s_tot") - col("m.p")).cast("double")
          / (col("m.n") - col("m.t")).cast("double"), 4).as("after_mean"),
        dround((col("m.s_tot") - col("m.p")).cast("double")
          / (col("m.n") - col("m.t")).cast("double")
          - col("m.p").cast("double") / col("m.t").cast("double"), 4)
          .as("shift"))
      .orderBy("event_type")
  }

  /** x173 l-diversity audit — the privacy readout x89's k-anonymity
    * cannot give: a QI group can be LARGE (k-safe) yet still leak if all
    * its rows share one sensitive value. Here the quasi-identifier is
    * the (event_type, day, hour-of-day) cell an attacker can observe,
    * the sensitive attribute is user_id, and l = the count of DISTINCT
    * users per cell; per event type we report cells, low-diversity cells
    * (l < 3), the worst l, and the share of event rows sitting in a
    * low-l cell — the rows where observing the QI pins the user to < 3
    * candidates.
    *
    * Shape mirrors x89's two-fold: one (QI → l, rows) hash aggregate
    * whose output is bounded by the QI domain (|types|·days·24), then a
    * per-type rollup — the corpus is touched once and the distinct-user
    * count is the only expand. All-integer until the one rounded share. */
  def x173LDiversity(s: SparkSession, d: String): DataFrame = {
    val dayUs = 24L * 3600L * 1000000L
    val hourUs = 3600L * 1000000L
    val cells = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        floorDiv(unix_micros(col("ts")), dayUs).as("day"),
        pmod(floorDiv(unix_micros(col("ts")), hourUs), lit(24L)).as("hod"))
      .groupBy("event_type", "day", "hod")
      .agg(countDistinct("user_id").as("l"), count(lit(1)).as("n_rows"))
    cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("l") < 3L, 1L).otherwise(0L)).as("n_low"),
        min("l").as("min_l"),
        dround(sum(when(col("l") < 3L, col("n_rows")).otherwise(0L))
            .cast("double") / sum("n_rows").cast("double"), 4).as("risk_share"))
      .orderBy("event_type")
  }

  /** x176 two-feature OLS fit — the suite's first multivariate MODEL
    * fit (x69 fits one slope per series, x164 tests one difference):
    * regress each user's purchase count on (active days, total events)
    * by solving the 3×3 normal equations with Cramer's rule over EXACT
    * integer moments — n, Σx₁, Σx₂, Σx₁², Σx₁x₂, Σx₂², Σy, Σx₁y, Σx₂y
    * are all BIGINT sums off one user-sized aggregate; each 3×3
    * determinant is a sum of six triple products in decimal(38,0)
    * (HUGEINT in the twin), and each coefficient is ONE double divide of
    * two exact determinants. No per-user residual pass, no iterative
    * solver, no FP accumulation order anywhere.
    *
    * Scale: the corpus collapses to per-user (x₁, x₂, y) first — the
    * only corpus-sized exchange — then a 1-row moment fold; the normal
    * matrix never materializes. Past ~1e9 users the triple products
    * leave decimal(38,0)/HUGEINT range together (the x164 saturation
    * note); run the identical Cramer clearing in doubles over the exact
    * moments there — the algebra is unchanged. */
  def x176OlsFit(s: SparkSession, d: String): DataFrame = {
    val dayUs = 24L * 3600L * 1000000L
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val users = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        floorDiv(unix_micros(col("ts")), dayUs).as("day"))
      .groupBy("user_id")
      .agg(countDistinct("day").as("x1"), count(lit(1)).as("x2"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val mo = users.agg(
      count(lit(1)).as("s00"), sum("x1").as("s01"), sum("x2").as("s02"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum("y").as("t0"), sum(col("x1") * col("y")).as("t1"),
      sum(col("x2") * col("y")).as("t2"))
    def det3(a: Column, b: Column, c: Column, dd: Column, e: Column,
             f: Column, g: Column, h: Column, i: Column): Column =
      dec(a) * (dec(e) * dec(i) - dec(f) * dec(h)) -
      dec(b) * (dec(dd) * dec(i) - dec(f) * dec(g)) +
      dec(c) * (dec(dd) * dec(h) - dec(e) * dec(g))
    val A  = det3(col("s00"), col("s01"), col("s02"),
                  col("s01"), col("s11"), col("s12"),
                  col("s02"), col("s12"), col("s22"))
    val A0 = det3(col("t0"), col("s01"), col("s02"),
                  col("t1"), col("s11"), col("s12"),
                  col("t2"), col("s12"), col("s22"))
    val A1 = det3(col("s00"), col("t0"), col("s02"),
                  col("s01"), col("t1"), col("s12"),
                  col("s02"), col("t2"), col("s22"))
    val A2 = det3(col("s00"), col("s01"), col("t0"),
                  col("s01"), col("s11"), col("t1"),
                  col("s02"), col("s12"), col("t2"))
    mo.select(col("s00").as("n_users"),
      dround(A0.cast("double") / A.cast("double"), 6).as("b0"),
      dround(A1.cast("double") / A.cast("double"), 6).as("b1"),
      dround(A2.cast("double") / A.cast("double"), 6).as("b2"))
  }

  /** x177 temporal pattern match — the CEP surface x59's strict-funnel
    * counting cannot express: per user, 'view' events FOLLOWED BY a
    * 'purchase' within 6 hours with NO 'error' strictly between — a
    * MATCH_RECOGNIZE-class pattern (positive step + deadline + negative
    * condition). Built on x147's conditional forward-frame machinery:
    * one window partitioned by user over (µs, event_id) order computes,
    * per row, the next purchase time and next error time (min over a
    * 1-FOLLOWING..UNBOUNDED frame of the type-gated timestamp); a view
    * matches iff its next purchase beats both the deadline and the next
    * error. Per user: views, matches, match rate, and the mean
    * view→purchase latency over matches (exact integer µs sum, one
    * rounded divide; null when no match).
    *
    * Scale: ONE user-keyed shuffle and sort serves both forward mins —
    * no self-join against future events, no per-pattern pass; adding
    * pattern steps adds window columns, not shuffles. */
  def x177PatternMatch(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val deadline = 6L * 3600L * 1000000L
    val m = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("np", min(when(col("event_type") === "purchase", col("us"))).over(w))
      .withColumn("ne", min(when(col("event_type") === "error", col("us"))).over(w))
    val matched = col("np").isNotNull && col("np") - col("us") <= deadline &&
      (col("ne").isNull || col("ne") > col("np"))
    m.filter(col("event_type") === "view")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_views"),
        sum(when(matched, 1L).otherwise(0L)).as("n_matched"),
        sum(when(matched, col("np") - col("us"))).as("lat_us"))
      .select(col("user_id"), col("n_views"), col("n_matched"),
        dround(col("n_matched").cast("double")
          / col("n_views").cast("double"), 4).as("match_rate"),
        when(col("n_matched") > 0L,
          dround(col("lat_us").cast("double")
            / (col("n_matched").cast("double") * 1e6), 3)).as("avg_latency_s"))
      .orderBy("user_id")
  }

  /** x178 cross-correlation lead-lag — WHICH series LEADS: for every
    * ordered pair of event types, the Pearson correlation between a's
    * hourly count at hour t and b's at hour t+k, k ∈ 0–3 — the
    * cross-series question x120's ACF (self only) and x92's lag-0 metric
    * correlation cannot answer; the readout behind cascade detection
    * (errors lead purchases?) and capacity planning.
    *
    * Machinery is x120's, crossed: corpus → (type, hour) counts
    * (map-side, the only corpus-sized exchange), zero-filled over the
    * global hour spine; each (type, hour) row explodes its 4 lag probes
    * onto target hour t+k and equi-joins the spine (aggregate-sized:
    * |types|²·|hours|·4 rows); per (a, b, k) ONE moment fold — n, Σx,
    * Σy, Σxy, Σx², Σy², all BIGINT. r = (nΣxy − ΣxΣy) /
    * √((nΣx²−(Σx)²)(nΣy²−(Σy)²)) with products in decimal(38,0)/HUGEINT
    * (the x120 wrap note), each factor cast to double, IEEE sqrt (both
    * engines correctly rounded), ONE divide, round 4; a zero-variance
    * side yields NULL (guarded, not ±inf). Dense spine means n = N−k
    * exactly — no alignment holes. */
  def x178CrossCorrelation(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val counts = Tables.events(s, d)
      .select(col("event_type"), floorDiv(unix_micros(col("ts")), hourUs).as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("c"))
    val bounds = counts.agg(min("hr").as("h0"), max("hr").as("h1"))
    val spine = counts.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val series = spine.join(counts, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"), coalesce(col("c"), lit(0L)).as("c"))
    val probes = series.select(col("event_type").as("t_lead"),
        col("hr"), col("c").as("x"),
        explode(sequence(lit(0L), lit(3L))).as("lag"))
      .withColumn("tgt", col("hr") + col("lag"))
    val m = probes.join(series.select(col("event_type").as("t_follow"),
          col("hr").as("tgt"), col("c").as("y")), Seq("tgt"))
      .filter(col("t_lead") =!= col("t_follow"))
      .groupBy("t_lead", "t_follow", "lag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num = dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))
    val vx = dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
    val vy = dec(col("n")) * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
    m.select(col("t_lead"), col("t_follow"), col("lag"),
        when(vx > 0 && vy > 0,
          dround(num.cast("double")
            / sqrt(vx.cast("double") * vy.cast("double")), 4)).as("r"))
      .orderBy("t_lead", "t_follow", "lag")
  }

  /** x179 FIFO queue matching — the WAITING-TIME surface none of the
    * funnel ops have: treat each user's views as queued requests and
    * purchases as FIFO services; report, per user, how many requests
    * were served, how many services fired on an EMPTY queue (wasted),
    * and the exact mean wait of served requests. x73 measures
    * first-view→first-purchase; x177 matches each view to its NEXT
    * purchase (one purchase can serve many views); this is the 1-1
    * queueing discipline.
    *
    * The FIFO recursion is closed-form, not iterative (the Lindley
    * reflection): with the ±1 running balance B over (µs, event_id)
    * order, a purchase fires on an empty queue iff its post-event
    * balance is a NEW strict minimum below 0 (each reflection step =
    * one wasted service); the k-th MATCHED purchase then serves exactly
    * the k-th view, so the pairing is a rank-equality join of two
    * row_number windows — no loop, no recursion, provably v_k < p_k
    * (the queue was nonempty). Three windows + one user-keyed
    * aggregate-sized join, all off ONE user shuffle; waits are exact
    * integer µs with one rounded divide. */
  private[graft] def x179Base(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        when(col("event_type") === "view", 1L).otherwise(-1L).as("delta"))

  /** x179's per-pair frame — (user, view, purchase, wait) for every served
    * request; exposed so ST30's online queue can be pinned against the
    * batch reflection pair-for-pair. */
  private[graft] def x179Pairs(s: SparkSession, d: String): DataFrame = {
    val base = x179Base(s, d)
    val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val marked = base
      .withColumn("bal", sum("delta").over(wOrd))
      .withColumn("wasted", col("delta") === -1L
        && col("bal") < least(lit(0L), coalesce(min(col("bal")).over(wPrev), lit(0L))))
    val views = marked.filter(col("delta") === 1L)
      .withColumn("rk", row_number().over(wOrd))
      .select(col("user_id"), col("rk"), col("us").as("view_us"),
        col("event_id").as("view_id"))
    val served = marked.filter(col("delta") === -1L && !col("wasted"))
      .withColumn("rk", row_number().over(wOrd))
      .select(col("user_id").as("p_user"), col("rk").as("p_rk"),
        col("us").as("p_us"), col("event_id").as("purchase_id"))
    views.join(served,
        col("user_id") === col("p_user") && col("rk") === col("p_rk"))
      .select(col("user_id"), col("view_id"), col("view_us"),
        col("purchase_id"), (col("p_us") - col("view_us")).as("wait_us"))
  }

  def x179FifoMatching(s: SparkSession, d: String): DataFrame = {
    val base = x179Base(s, d)
    val waits = x179Pairs(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_served"), sum("wait_us").as("wait_us"))
    val totals = base.groupBy("user_id")
      .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_views"),
        sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_purchases"))
    totals.join(waits, Seq("user_id"), "left")
      .select(col("user_id"), col("n_views"), col("n_purchases"),
        coalesce(col("n_served"), lit(0L)).as("n_served"),
        (col("n_purchases") - coalesce(col("n_served"), lit(0L))).as("n_wasted"),
        when(col("n_served") > 0L,
          dround(col("wait_us").cast("double")
            / (col("n_served").cast("double") * 1e6), 3)).as("avg_wait_s"))
      .orderBy("user_id")
  }

  /** x180 growth accounting — the product-growth ledger x123's cohort
    * triangle and x124's rolling actives both miss: per day, actives
    * split into NEW (first-ever day), RETAINED (also active yesterday),
    * RESURRECTED (returning after a gap), plus CHURNED (active yesterday,
    * silent today) and the quick ratio (new+resurrected)/churned — the
    * decomposition growth review runs weekly.
    *
    * Shape: distinct (user, day) first (the ONE corpus-sized exchange,
    * x123's discipline), then user-ordered lag + first-day windows on the
    * user-sized frame classify each active day in one pass; the day
    * ledger is a |days| aggregate; churn aligns yesterday's actives over
    * the dense day spine (a silent day still reports, with zero actives
    * and full churn). All-integer; quick ratio NULL when churn is 0 (not
    * ±inf). Also servable from ST25's maintained activity store via
    * [[x180FromActivity]] — the store IS the distinct (user, day) set. */
  def x180GrowthAccounting(s: SparkSession, d: String): DataFrame = {
    val dayUs = 24L * 3600L * 1000000L
    val act = Tables.events(s, d)
      .select(col("user_id"), floorDiv(unix_micros(col("ts")), dayUs).as("day"))
      .distinct()
    x180FromActivity(act)
  }

  /** x180 over an already-maintained distinct (user, day) activity set
    * (ST25's store serves this directly). */
  def x180FromActivity(act: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    val classed = act
      .withColumn("prev", lag("day", 1).over(w))
      .select(col("day"),
        when(col("prev").isNull, lit(1L)).otherwise(0L).as("is_new"),
        when(col("prev") === col("day") - 1L, 1L).otherwise(0L).as("is_ret"),
        when(col("prev").isNotNull && col("prev") < col("day") - 1L, 1L)
          .otherwise(0L).as("is_res"))
    val daily = classed.groupBy("day")
      .agg(count(lit(1)).as("n_active"), sum("is_new").as("n_new"),
        sum("is_ret").as("n_retained"), sum("is_res").as("n_resurrected"))
    val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val wDay = Window.orderBy("day")
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"))
      .withColumn("churned",
        coalesce(lag("n_active", 1).over(wDay), lit(0L)) - col("n_retained"))
      .withColumn("quick_ratio",
        when(col("churned") > 0L,
          dround((col("n_new") + col("n_resurrected")).cast("double")
            / col("churned").cast("double"), 4)))
      .orderBy("day")
  }

  /** x182 deterministic bootstrap replicates — the UNCERTAINTY readout
    * the inferential shelf lacks (x103 ranks a score, x164 tests one
    * difference, x176 fits coefficients; none put an error bar on an
    * estimate): 10 user-level bootstrap resamples of the mean purchases
    * per user, with replicate weights drawn as Poisson(1) — the standard
    * big-data approximation of multinomial resampling that keeps every
    * row INDEPENDENT (no global n to coordinate, so the resample is one
    * map-side expression). Randomness is md5-table-lookup deterministic
    * (the x15/x164 hash discipline): h = first-8-hex(md5(user:rep)) mod
    * 10⁴, weight via the Poisson(1) CDF quantized at 1e-4 (0|1|2|3|4|5 →
    * 3679/3679/1839/613/153/37). The replicate spread IS the standard
    * error; the replicates ship, the sufficient statistic, not a
    * cross-replicate float fold.
    *
    * Scale: corpus → per-user purchase counts (the one corpus-sized
    * exchange, shared with x164) → user×10 map-side weighted rows → 10
    * 1-row folds; exact integer Σw, Σw·y with ONE divide per replicate. */
  def x182Bootstrap(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d).groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    users.select(col("user_id"), col("y"),
        explode(sequence(lit(0L), lit(9L))).as("rep"))
      .withColumn("h", pmod(conv(substring(md5(concat(
          col("user_id").cast("string"), lit(":"), col("rep").cast("string"))),
          1, 8), 16, 10).cast("long"), lit(10000L)))
      .withColumn("w", when(col("h") < 3679L, 0L).when(col("h") < 7358L, 1L)
        .when(col("h") < 9197L, 2L).when(col("h") < 9810L, 3L)
        .when(col("h") < 9963L, 4L).otherwise(5L))
      .groupBy("rep")
      .agg(sum("w").as("n_drawn"), sum(col("w") * col("y")).as("wy"))
      .select(col("rep"), col("n_drawn"),
        dround(col("wy").cast("double") / col("n_drawn").cast("double"), 6)
          .as("mean_purchases"))
      .orderBy("rep")
  }

  /** x183 weekday × hour interaction residuals — the TWO-WAY seasonal
    * decomposition x81 (weekday main effect only) cannot express: fit
    * the additive model count ≈ grand + dow-effect + hour-effect over
    * the zero-filled 7×24 grid and report each cell's RESIDUAL — where
    * the calendar axes INTERACT (the Friday-night spike no pair of
    * marginal profiles predicts), the cell an anomaly baseline must
    * model separately.
    *
    * Exactness: with D = 7, H = 24, every fitted value clears to integer
    * arithmetic — fitted·168 = 7·rowSum + 24·colSum − total and
    * resid·168 = 168·n − that — so both engines divide identical BIGINTs
    * by 168.0 exactly once per cell. The grid is zero-FILLED (a silent
    * cell is a −fitted residual, not a missing row). Corpus → 168-cell
    * map-side agg; marginals are two folds of the aggregate; output is
    * the 168-row grid. */
  def x183WeekdayHourResiduals(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val counts = Tables.events(s, d)
      .select((dayofweek(col("ts")) - 1).cast("long").as("dow"),
        pmod(floorDiv(unix_micros(col("ts")), hourUs), lit(24L)).as("hod"))
      .groupBy("dow", "hod").agg(count(lit(1)).as("n"))
    val spine = s.range(7).select(col("id").as("dow"))
      .crossJoin(s.range(24).select(col("id").as("hod")))
    val cells = spine.join(counts, Seq("dow", "hod"), "left")
      .select(col("dow"), col("hod"), coalesce(col("n"), lit(0L)).as("n"))
    val rows = cells.groupBy("dow").agg(sum("n").as("rs"))
    val cols = cells.groupBy("hod").agg(sum("n").as("cs"))
    val tot = cells.agg(sum("n").as("tt"))
    cells.join(broadcast(rows), "dow").join(broadcast(cols), "hod")
      .crossJoin(broadcast(tot))
      .select(col("dow"), col("hod"), col("n"),
        dround((lit(7L) * col("rs") + lit(24L) * col("cs") - col("tt"))
          .cast("double") / 168.0, 4).as("fitted"),
        dround((lit(168L) * col("n") - lit(7L) * col("rs")
          - lit(24L) * col("cs") + col("tt")).cast("double") / 168.0, 4)
          .as("residual"))
      .orderBy("dow", "hod")
  }
}
