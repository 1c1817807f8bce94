package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The one train/val/test assignment rule, shared by the batch split
  * (x48, keyed on the CC cluster id) and the streaming router (ST13,
  * keyed on the admitted doc's own id, which IS its cluster's
  * representative for every later match): md5 of the key's decimal
  * string against lexicographic-prefix bounds — engine-independent,
  * partitioning-independent, and stable for the life of the corpus.
  * 'cc'/256 ≈ 79.7% train, ('e6'−'cc')/256 ≈ 10.2% val, rest test. */
object SplitRule {
  def of(key: Column): Column = {
    val h = md5(key.cast("string"))
    when(h < "cc", lit("train"))
      .when(h < "e6", lit("val"))
      .otherwise(lit("test"))
  }
}
