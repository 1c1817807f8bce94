package graft

import graft.functions.SeriesFunctions
import graft.functions.SeriesFunctions.TsPoint
import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

/** Scalar/aggregate helpers + multimodal plumbing. */
class FunctionsSpec extends SparkSpecBase {

  test("ema matches hand-computed recurrence") {
    import spark.implicits._
    // alpha=0.5 over [1,2,3]: 1 → 1.5 → 2.25
    val df = Seq(Seq(1.0, 2.0, 3.0)).toDF("vs")
      .select(SeriesFunctions.ema(col("vs"), 0.5).as("e"))
    assert(math.abs(df.head.getDouble(0) - 2.25) < 1e-12)
  }

  test("ema of empty array is the (unseeded) zero initial value") {
    import spark.implicits._
    val df = Seq(Seq.empty[Double]).toDF("vs")
      .select(SeriesFunctions.ema(col("vs"), 0.5).as("e"))
    assert(df.head.getDouble(0) === 0.0)
  }

  test("LatestPointAgg is partitioning-invariant (partial+final correct)") {
    import spark.implicits._
    val pts = (1L to 1000L).map(i => TsPoint(ts = (i * 7919) % 1000, value = i.toDouble))
    val expected = pts.maxBy(_.ts).value
    val agg = udaf(SeriesFunctions.LatestPointAgg)
    for (parts <- Seq(1, 4, 13)) {
      val got = pts.toDF("ts", "value").repartition(parts)
        .agg(agg(col("ts"), col("value"))).head.getDouble(0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("multimodal decode: deterministic, row-preserving, schema stable") {
    val media = MultimodalOps.mediaTable(spark, sfDir)
    val feats = MultimodalOps.decodeAll(media)
    assert(feats.count() === media.count())
    val f = feats.filter(col("media_id") === 0).head()
    val f2 = MultimodalOps.decodeAll(media.repartition(9))
      .filter(col("media_id") === 0).head()
    assert(f.features.toSeq === f2.features.toSeq)
    assert(f.features.length === 4)
    // mean byte of lowercase ASCII text must be within the printable range
    assert(f.features(1) > 32f && f.features(1) < 127f)
  }

  test("decodeStub on known bytes") {
    val f = MultimodalOps.decodeStub("ab".getBytes("UTF-8"))
    assert(f.toSeq === Seq(2f, 97.5f, math.sqrt((97.0 * 97 + 98.0 * 98) / 2).toFloat, 97f))
  }
}
