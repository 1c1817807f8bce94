package graft.operators

import graft.Tables
import graft.functions.Rounding.dround
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5–§2.7: window functions, sort/limit/set ops, scalar
  * function families. Same contract rules as [[RelationalOps]].
  *
  * Window scale posture: every window partitions by a high-cardinality key
  * (event_type×user_id, orderpriority, …) so WindowExec's per-partition sort
  * is bounded; none of these windows is an unpartitioned global window
  * (which would serialize on one task at 100 TB).
  */
object AnalyticOps {

  // ---- §2.5 windows ------------------------------------------------------

  /** Q29 ranking family over a totally-ordered window, SCALE-SAFE: no
    * window ever sees a full event_type group (5 distinct values — a
    * per-group window would serialize corpus/5 onto one task at 100 TB).
    *
    * The contract's ORDER BY (value DESC, event_id) is a strict total
    * order (event_id is the PK), which closes every member of the family:
    *   - row_number: two-level top-20 exactly as q34 — local top-20 per
    *     (event_type, 256-way row-hash bucket) at full cluster width, then
    *     the exact global top-20 from the ≤256·20 finalists per group;
    *   - rank / dense_rank: a total order has no ties, so both equal
    *     row_number;
    *   - ntile(4): group-global only through the group's TOTAL count n —
    *     one hash aggregate (partial+final, 5 result rows, broadcast back)
    *     and SQL ntile is closed-form in (rn, n): with q = n div 4,
    *     r = n mod 4, the first r buckets hold q+1 rows, so
    *     nt = (rn-1) div (q+1) + 1         if rn <= r·(q+1)
    *        = r + (rn-1-r·(q+1)) div q + 1 otherwise.
    * Net plan: bucketed window + finalist window (≤5120 rows/group) + one
    * count aggregate + a broadcast join — every full-width pass is
    * hash-partitioned on (event_type, bkt), nothing serializes. */
  def q29(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("event_id", "event_type", "value")
    val wLocal = Window.partitionBy("event_type", "bkt")
      .orderBy(col("value").desc, col("event_id"))
    val wFinal = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    val ranked = ev
      .withColumn("bkt", pmod(xxhash64(col("event_id")), lit(256)))
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= 20)
      .withColumn("rn", row_number().over(wFinal).cast("long"))
      .filter(col("rn") <= 20)
    val counts = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    // ntile(4) closed form, all-integral; the else-divisor is safe: rn >
    // r*(q+1) implies q >= 1 (with q = 0 every row sits in the first r = n
    // buckets, so the THEN branch always fires).
    val nt = expr(
      """CASE WHEN rn <= (n % 4) * (n div 4 + 1)
        |     THEN (rn - 1) div (n div 4 + 1) + 1
        |     ELSE (n % 4) + (rn - 1 - (n % 4) * (n div 4 + 1)) div greatest(n div 4, 1) + 1
        |END""".stripMargin)
    ranked.join(broadcast(counts), "event_type")
      .select(col("event_id"), col("event_type"), col("rn"),
              col("rn").as("rk"), col("rn").as("drk"), nt.cast("long").as("nt"))
      .orderBy("event_type", "rn")
  }

  private def seriesW = Window.partitionBy("user_id", "event_type")
    .orderBy("ts", "event_id")

  /** Q30 lag deltas per series (TSDB delta/rate primitive). Scale: the
    * (user_id, event_type) series key is the shuffle key — at 100 TB this is
    * one shuffle, and with the events table bucketed by series hash it is
    * shuffle-free. */
  def q30(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("delta", col("value") - lag("value", 1).over(seriesW))
      .groupBy("event_type")
      .agg(dround(sum("delta"), 4).as("sum_delta"), count(col("delta")).as("n_delta"))
      .orderBy("event_type")

  /** Q31 running sum (rows frame), per-user checksum. */
  def q31(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("cum", sum("value").over(w))
      .groupBy("user_id")
      .agg(dround(sum("cum"), 4).as("checksum"))
      .orderBy("user_id")
  }

  /** Q32 moving average over current + 2 preceding rows, per series. */
  def q32(s: SparkSession, d: String): DataFrame = {
    val w = seriesW.rowsBetween(-2, 0)
    Tables.events(s, d)
      .withColumn("ma", avg("value").over(w))
      .groupBy("event_type")
      .agg(dround(sum("ma"), 4).as("checksum"))
      .orderBy("event_type")
  }

  /** Q33 latest point per series — catena's hot query — as a single
    * max_by/max aggregate (no window, no sort: partial+final agg only;
    * [[SeriesApi.latestPoint]] + contract formatting). */
  def q33(s: SparkSession, d: String): DataFrame =
    SeriesApi.latestPoint(Tables.events(s, d),
        keys = Seq("user_id", "event_type"), ts = "ts", value = "value")
      .select(col("user_id"), col("event_type"),
              dround(col("last_value"), 4).as("last_value"),
              date_format(col("last_ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
      .orderBy("user_id", "event_type")

  /** Q34 top-k per group, TWO-LEVEL: local top-3 per (group, 256-way row-hash
    * bucket) at full cluster width, then the exact global top-3 from the
    * ≤256·3 finalists per group. With a handful of groups (5 priorities
    * here — low-cardinality group keys are the COMMON top-k-per-group
    * case) a single per-group window serializes each group's corpus-sized
    * slice onto one task; two-level is exact because each row lives in one
    * bucket and both levels rank by the same total order (price DESC, key
    * ASC) — see x31's scaladoc for the argument. */
  def q34(s: SparkSession, d: String): DataFrame = {
    val wLocal = Window.partitionBy("o_orderpriority", "bkt")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wFinal = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
              pmod(xxhash64(col("o_orderkey")), lit(256)).as("bkt"))
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= 3)
      .withColumn("rn", row_number().over(wFinal).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_orderpriority", "rn")
  }

  // ---- §2.6 sort / limit / set ops --------------------------------------

  /** Q35 multi-key global sort + limit (range-partitioned SortExec). */
  def q35(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
      .orderBy(col("l_returnflag").asc, col("l_extendedprice").desc,
               col("l_orderkey"), col("l_linenumber"))
      .limit(50)

  /** Q36 top-k → TakeOrderedAndProject (no global sort materialized). */
  def q36(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select("event_id", "value")
      .orderBy(col("value").desc, col("event_id"))
      .limit(10)

  /** Q37 UNION ALL vs UNION DISTINCT cardinalities. */
  def q37(s: SparkSession, d: String): DataFrame = {
    val t = Tables.events(s, d).select("event_type")
    val allCnt  = t.unionAll(t).agg(count(lit(1)).as("n")).select(lit("all").as("kind"), col("n"))
    val distCnt = t.union(t).distinct().agg(count(lit(1)).as("n")).select(lit("dist").as("kind"), col("n"))
    allCnt.unionByName(distCnt).orderBy("kind")
  }

  /** Q38 INTERSECT (distinct semantics). */
  def q38(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    e.filter(col("event_type") === "click").select("user_id")
      .intersect(e.filter(col("event_type") === "purchase").select("user_id"))
      .orderBy("user_id")
  }

  /** Q39 EXCEPT (distinct semantics). */
  def q39(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    e.filter(col("event_type") === "view").select("user_id")
      .except(e.filter(col("event_type") === "error").select("user_id"))
      .orderBy("user_id")
  }

  // ---- §2.7 scalar function families ------------------------------------

  /** Q40 string functions (all codegen'd Catalyst expressions, no UDFs). */
  def q40(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
              upper(col("p_name")).as("up"),
              substring(col("p_name"), 1, 5).as("s5"),
              length(col("p_name")).cast("long").as("len"),
              trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"),
              expr("replace(p_name, 'a', '@')").as("rep"))
      .orderBy("p_partkey")

  /** Q41 regex extract/replace with per-word counts. */
  def q41(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(regexp_extract(col("p_type"), "^(\\w+)", 1).as("word"),
              regexp_replace(col("p_type"), "[AEIOU]", "_").as("masked"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"), min("masked").as("sample"))
      .orderBy("word")

  /** Q42 date/time family over orders (ms-precision timestamps). */
  def q42(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(year(col("o_orderdate")).cast("int").as("y"),
              month(col("o_orderdate")).cast("int").as("m"),
              datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
                .cast("long").as("dd"),
              date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
              unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .groupBy("y", "m")
      .agg(count(lit(1)).as("n"), max("dd").as("max_dd"),
           min("plus30").as("min_plus30"), min("epoch_s").as("min_epoch"))
      .orderBy("y", "m")

  /** Q43 math family; FLOOR-then-cast pins the double→int rounding rule that
    * differs between engines (Spark truncates, DuckDB rounds). */
  def q43(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
              dround(col("value"), 4).as("v"),
              dround(abs(col("value") - 50), 4).as("a"),
              ceil(col("value")).cast("long").as("c"),
              floor(col("value")).cast("long").as("f"),
              dround(log(col("value") + 1), 4).as("lnv"),
              dround(exp(col("value") / 100), 4).as("ex"),
              dround(sqrt(col("value")), 4).as("sq"),
              (floor(col("value") * 100).cast("long") % 7).as("md"))
      .orderBy("event_id")

  /** Q44 array family over embeddings via higher-order functions — stays
    * inside codegen, no UDF; elements cast FLOAT→DOUBLE before arithmetic
    * so both engines sum the identical doubles left-to-right. dround keeps
    * the -0.0 a tiny negative e1 rounds to (DuckDB semantics; the round-1
    * `+ 0` twin edit is retired — the twin is back to the declared SQL). */
  def q44(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
              size(col("embedding")).cast("long").as("dim"),
              dround(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
              dround(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
                               (acc, x) => acc + x.cast("double")), 4).as("s8"),
              dround(sqrt(aggregate(col("embedding"), lit(0.0),
                                    (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("norm"),
              size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"))
      .orderBy("vec_id")

  /** Q45 JSON-in-string: schema-on-read via get_json_object. */
  def q45(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"),
           count(col("k")).as("n"))
      .orderBy("event_type")

  /** Q46 conditionals + DOUBLE→DECIMAL(18,4)→STRING round-trip. */
  def q46(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
              col("value").cast("decimal(18,4)").cast("string").as("dec_str"),
              coalesce(nullif(col("event_type"), lit("error")), lit("E")).as("cond"),
              when(col("value") > 100, "hi").when(col("value") > 50, "mid")
                .otherwise("lo").as("band"))
      .orderBy("event_id")

  /** x61 pivot — wide per-user activity features: event counts spread into
    * one column per event_type, the reshaping step that turns a long event
    * log into a model-ready feature row. The pivot VALUES are passed
    * explicitly (the fixture's closed 5-type domain, FIXTURES.md) — that
    * matters at scale: `pivot(col)` without values runs an extra distinct
    * JOB over the corpus to discover the domain before planning, while the
    * explicit form plans one pass. Compiles to a single hash aggregate
    * with conditional counts (exactly the SQL twin's shape) — one shuffle
    * on user_id, output width fixed by the domain. */
  def x61Pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click").as("n_click"), col("error").as("n_error"),
        col("purchase").as("n_purchase"), col("signup").as("n_signup"),
        col("view").as("n_view"))
      .orderBy("user_id")

  /** x62 unpivot — the inverse reshaping: lineitem's four per-row measures
    * melted to (metric, value) rows via Spark's native `unpivot` (one
    * Expand pass — rows×4, no shuffle until the final 4-group aggregate),
    * then reduced to per-metric totals. The long form is what generic
    * metric sinks and plotting layers consume; at 100 TB the Expand is
    * map-local and the aggregate is 4 rows. */
  def x62Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "v")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"), dround(sum("v"), 4).as("total"),
           dround(avg("v"), 4).as("mean"))
      .orderBy("metric")
}
