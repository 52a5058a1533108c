package graft

import org.apache.spark.sql.functions._
import graft.operators.{MllibBridge, VectorStats}

class MllibBridgeSpec extends SparkSpec {
  import spark.implicits._

  test("Summarizer per-dim stats agree with the explode-path stats") {
    val e = Tables.embeddings(spark, sf0001)
    val ml = MllibBridge.summarize(e, "embedding").head()
    val mlMean = ml.getAs[scala.collection.Seq[Double]]("mean")
    val mlVar = ml.getAs[scala.collection.Seq[Double]]("variance")
    assert(ml.getAs[Long]("cnt") == 500L)

    val ours = VectorStats.dimStats(
        VectorStats.explodeVectors(e, "vec_id", "embedding"))
      .orderBy("idx")
      .select("mean", "stdev").as[(Double, Double)].collect()
    ours.zipWithIndex.foreach { case ((m, sd), i) =>
      assert(math.abs(m - mlMean(i)) < 1e-9, s"mean dim $i")
      assert(math.abs(sd * sd - mlVar(i)) < 1e-9, s"variance dim $i")
    }
  }

  test("array <-> vector round trip is lossless") {
    val e = Tables.embeddings(spark, sf0001).limit(20)
    val rt = MllibBridge.toArray(
      MllibBridge.toMlVector(e, "embedding", "v"), "v", "back")
    val bad = rt.filter(not(col("embedding") === col("back"))).count()
    assert(bad == 0)
  }
}
