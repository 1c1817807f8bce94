package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time bucketing for FACT–FACT joins — the layout decision that
  * deletes the biggest shuffle a 100 TB warehouse has.
  *
  * `BucketedLayout` solves the time-series side (partition pruning +
  * series clustering for events); this solves the relational side: orders
  * and lineitem written with `bucketBy(n, join_key)` + `sortBy(join_key)`
  * into catalog tables. Spark then knows each table is hash-distributed
  * AND sorted on the key, so an equi-join between them plans as a
  * SortMergeJoin with NO Exchange and NO Sort on either side — the
  * shuffle is paid ONCE at write time and amortized over every subsequent
  * join, which is exactly how a fact table that joins on the same key
  * thousands of times a day should be stored.
  *
  * The `repartition(n, key)` before the write makes exactly one file per
  * bucket: a single sorted file is the precondition for trusting the
  * write-time `sortBy`. Spark ≥ 3 no longer infers scan output ordering
  * from bucketed files BY DEFAULT (multi-file buckets read as
  * concatenations, where the inference was unsound) — with one file per
  * bucket it is sound, and `spark.sql.legacy.bucketedTableScan
  * .outputOrdering=true` restores it, eliding the join-side Sorts too.
  * Even without the flag the big win stands: the EXCHANGE (cluster-wide
  * network shuffle) is gone either way; the residual per-bucket sort of
  * already-sorted runs is a cheap local scan.
  *
  * Bucket counts must match on both tables (Spark joins bucketed tables
  * exchange-free only when the bucket counts line up; at scale pick n
  * once per key domain — e.g. 4096 for the orderkey family — and write
  * every fact sharing that key with it).
  */
object BucketedFacts {

  /** Write orders + lineitem as co-bucketed catalog tables under `path`.
    * Idempotent (overwrites). Requires a catalog-enabled session. */
  def writePair(spark: SparkSession, sfDir: String, path: String,
                buckets: Int = 8): Unit = {
    def write(df: DataFrame, key: String, table: String): Unit =
      df.repartition(buckets, col(key))
        .write.format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"$path/$table")
        .mode("overwrite")
        .saveAsTable(table)
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    write(graft.Tables.orders(spark, sfDir), "o_orderkey", "orders_bucketed")
    write(graft.Tables.lineitem(spark, sfDir), "l_orderkey", "lineitem_bucketed")
  }

  /** The Q10-shape revenue join over the bucketed pair — plans with zero
    * Exchange and zero Sort below the join (asserted in BucketedFactsSpec).
    * Merge-hinted for the same reason Q10 is: at FIXTURE scale the planner
    * would broadcast the small side, hiding the property under test; at
    * fact-table scale SMJ is what the planner picks anyway, and the bucket
    * layout is what makes it exchange- and sort-free. */
  def revenueJoin(spark: SparkSession): DataFrame =
    spark.table("orders_bucketed").hint("merge")
      .join(spark.table("lineitem_bucketed"),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
}
