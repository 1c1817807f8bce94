package graft

import graft.sources.PostingsStore
import org.apache.spark.sql.functions._

/** [[PostingsStore]] — the persisted inverted index must serve exactly the
  * declared x83 BM25 rows while reading ONLY the query terms' hash
  * buckets (the inverted-index contract: query work ∝ posting lists, not
  * corpus size). */
class PostingsStoreSpec extends SparkSpecBase {

  private val queryTerms = Seq("hash", "join", "filter")

  test("store-served BM25 equals declared x83; scan reads only the query buckets") {
    val dir = java.nio.file.Files.createTempDirectory("postings").toString
    val st = new PostingsStore(spark, dir)
    st.build(Tables.documents(spark, sfDir), buckets = 64)
    val served = st.bm25(queryTerms, k = 20)
    val declared = operators.TextOps.x83Bm25(spark, sfDir)
    // row-identical: same docs, same term counts, same dround'd scores
    assert(served.count() === declared.count())
    assert(served.except(declared).isEmpty && declared.except(served).isEmpty)
    // pruning: the served plan reads only the ≤3 buckets the terms hash
    // to, out of the 64 the store wrote
    val touched = served.inputFiles.filter(_.contains("/tb="))
      .map(_.split("/tb=")(1).split("/")(0).toLong).toSet
    assert(touched.size <= queryTerms.size, s"read ${touched.size} buckets")
    val written = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).count(_.startsWith("tb="))
    assert(written > touched.size, "store too small for the pruning claim to bite")
    // term predicate reaches the parquet scan inside the pruned buckets
    val plan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("In(term"), s"term filter not pushed:\n$plan")
  }

  test("append grows the index incrementally: build(A)+append(B) serves build(A∪B)'s rows") {
    val docs = Tables.documents(spark, sfDir)
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val incDir = java.nio.file.Files.createTempDirectory("postings_inc").toString
    val inc = new PostingsStore(spark, incDir)
    inc.build(a, buckets = 32)
    inc.append(b)
    val fullDir = java.nio.file.Files.createTempDirectory("postings_full").toString
    val full = new PostingsStore(spark, fullDir)
    full.build(docs, buckets = 32)
    val servedInc = inc.bm25(queryTerms, k = 20)
    val servedFull = full.bm25(queryTerms, k = 20)
    assert(servedInc.count() === servedFull.count())
    assert(servedInc.except(servedFull).isEmpty && servedFull.except(servedInc).isEmpty)
  }

  test("an unindexed term contributes nothing; empty query intersection returns no rows") {
    val dir = java.nio.file.Files.createTempDirectory("postings2").toString
    val st = new PostingsStore(spark, dir)
    st.build(Tables.documents(spark, sfDir), buckets = 16)
    val withGhost = st.bm25(queryTerms :+ "zzz_not_a_token_zzz", k = 20)
    val base = st.bm25(queryTerms, k = 20)
    assert(withGhost.except(base).isEmpty && base.except(withGhost).isEmpty)
    assert(st.bm25(Seq("zzz_not_a_token_zzz")).count() === 0)
  }
}
