package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-format sources (CSV / JSON-lines) with EXPLICIT schemas.
  *
  * Schema inference is banned at scale — it is a full extra pass over the
  * data before the real one, and it can silently re-type columns between
  * runs. Every reader here takes a `StructType` (in practice derived once
  * from the authoritative parquet fixture or a checked-in DDL) and pins the
  * parse behavior: PERMISSIVE mode with a corrupt-record column, so bad
  * rows land in a quarantine column instead of failing the 100 TB job, and
  * UTC timestamps to match the engine session.
  */
object Readers {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, org.apache.spark.sql.types.StringType, nullable = true)

  /** CSV with header; `schema` is authoritative (header only cross-checks
    * column order). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path)

  /** JSON-lines (one object per line — the only JSON shape that splits
    * across workers; multiline JSON cannot be parallelized). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
      .json(path)

  /** Rows whose raw text failed the schema — route to quarantine, never drop
    * silently. Spark refuses queries that reference ONLY the corrupt column
    * of a lazy text source (it cannot know corruption without parsing the
    * other columns), so splitting clean/corrupt requires the parsed frame to
    * be materialized: `cache()` here is the documented pattern, and the one
    * read feeds both outputs. */
  def corruptRows(df: DataFrame): DataFrame =
    df.cache().filter(df(CorruptCol).isNotNull)

  /** Clean rows with the quarantine column removed. */
  def cleanRows(df: DataFrame): DataFrame =
    df.cache().filter(df(CorruptCol).isNull).drop(CorruptCol)

  /** Both splits from ONE cached parse — the preferred entry point. The
    * cache is keyed on the parsed plan (caching twice is a no-op), but this
    * shape makes the lifecycle explicit: the CALLER owns `df` and should
    * `df.unpersist()` once both sides are consumed. */
  def quarantineSplit(df: DataFrame): (DataFrame, DataFrame) =
    (cleanRows(df), corruptRows(df))
}
