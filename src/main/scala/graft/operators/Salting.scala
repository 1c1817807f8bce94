package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins — the manual fallback when AQE's
  * skew-join split cannot apply (SURVEY §4.3).
  *
  * AQE splits skewed SORT-MERGE partitions at runtime, but only between
  * shuffle stages it fully controls; a skewed SHUFFLED HASH join, a skewed
  * aggregation feeding a join, or a stream-static join against a hot key
  * can still serialize one executor behind the hot key's partition. Salting
  * is the layout-level fix: the big side spreads each key over `salt`
  * sub-keys (a deterministic per-row hash — NOT rand(), whose
  * re-evaluation under task retry silently duplicates/loses rows), the
  * small side replicates each row `salt` ways, and the join key becomes
  * (key, salt). The hot key's rows now land on `salt` partitions instead
  * of one; the price is a `salt`× blow-up of the SMALL side only.
  *
  * Pick `salt` ≈ the skew factor capped by cluster width; at 100 TB the
  * salt column would come from the same write-time layout decision as
  * bucketing (BucketedFacts) so repeated joins reuse it.
  */
object Salting {

  /** Equi-join `big ⋈ small` on `key`, with the big side's rows spread over
    * `salt` sub-keys. Output = exactly the unsalted inner join's rows. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 saltOn: Seq[Column]): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn("_salt", pmod(xxhash64(saltOn: _*), lit(salt.toLong)))
    val smallS = small.withColumn("_salt", explode(
      sequence(lit(0L), lit(salt.toLong - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
