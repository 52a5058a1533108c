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

class VecStatsNativeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("native TypedImperativeAggregate == Aggregator udaf, bit for bit") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").cast("array<float>").as("vector"))
      .repartition(8) // force partial buffers + merge() on both paths
      .withColumn("g", col("id") % 7)
    val nat = e.groupBy("g")
      .agg(graft.functions.VecStatsNative.vecStats(col("id"), col("vector")).as("vs"))
      .select(col("g"), col("vs.cnt"), col("vs.sumId").cast("string"),
        col("vs.mean"), col("vs.m2"), col("vs.mn"), col("vs.mx"))
      .collect().map(_.toString).sorted.toSeq
    val agg = graft.functions.VecStatsAgg.vecStats
    val old = e.groupBy("g")
      .agg(agg(col("id"), col("vector")).as("vs"))
      .select(col("g"), col("vs.cnt"), col("vs.sumId").cast("string"),
        col("vs.mean"), col("vs.m2"), col("vs.mn"), col("vs.mx"))
      .collect().map(_.toString).sorted.toSeq
    assert(nat == old)
  }

  test("declared input types coerce int ids and double vectors instead of corrupting") {
    // ADVICE r2: without declared input types, an array<double> vector
    // read through getFloat silently produced garbage (4 bytes of each
    // 8-byte slot) and an int id blew up mid-job. ImplicitCastInputTypes
    // makes analysis insert the casts, so both now aggregate correctly.
    val df = spark.range(4)
      .select(col("id").cast("int").as("id"),
        array(col("id").cast("double"), lit(2.0d)).as("vector"))
    val row = df.agg(
        graft.functions.VecStatsNative.vecStats(col("id"), col("vector")).as("vs"))
      .select(col("vs.cnt"), col("vs.mean"), col("vs.mx")).head()
    assert(row.getLong(0) == 4L)
    assert(row.getSeq[Double](1) == Seq(1.5d, 2.0d))
    assert(row.getSeq[Double](2) == Seq(3.0d, 2.0d))
  }
}
