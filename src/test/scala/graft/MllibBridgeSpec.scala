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

  test("PCA projection: orthonormal components, manual-multiply parity, kNN recall") {
    // k=32 of 64: the synthetic embeddings are near-ISOTROPIC (no
    // low-rank structure for PCA to exploit), so halving the dims keeps
    // ~half the variance — on real embedding corpora (which are heavily
    // anisotropic) the same recall arrives at much smaller k
    val e = Tables.embeddings(spark, sf0001)
    val (proj, pc) = MllibBridge.pcaProject(e, "embedding", k = 32, out = "proj")
    // component matrix is d x k with orthonormal columns
    assert(pc.length == 64 && pc.head.length == 32)
    for (a <- 0 until 32; b <- a until 32) {
      val dotAb = (0 until 64).iterator.map(i => pc(i)(a) * pc(i)(b)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dotAb - want) < 1e-9, s"col $a . col $b = $dotAb")
    }
    // projected column equals the manual matrix multiply
    val rows = proj.select("vec_id", "proj")
      .as[(Long, Seq[Double])].collect().toMap
    val raw = e.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    raw.take(20).foreach { case (id, v) =>
      val manual = MllibBridge.pcaProjectQuery(pc, v.map(_.toDouble))
      manual.zip(rows(id)).foreach { case (m, p) =>
        assert(math.abs(m - p) < 1e-9, s"vec $id")
      }
    }
    // coarse-rank in PCA space -> exact re-rank recovers the true top-10
    // (16 of 64 dims; pool 100 of 500)
    val q = QueryConstants.Q64
    val qp = MllibBridge.pcaProjectQuery(pc, q)
    val pool = proj.withColumn("pd",
        graft.functions.VectorFunctions.dist(col("proj"),
          graft.functions.VectorFunctions.doubleVec(qp.toIndexedSeq)))
      .orderBy(col("pd"), col("vec_id")).limit(100)
      .select("vec_id").as[Long].collect().toSet
    val trueTop = graft.operators.BruteForce.knn(e, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = trueTop.count(pool.contains) / 10.0
    assert(recall >= 0.8, s"recall@10=$recall")
  }

  test("array <-> vector round trip is lossless") {
    val e = Tables.embeddings(spark, sf0001).limit(20)
    val rt = MllibBridge.toArray(
      MllibBridge.toMlVector(e, "embedding", "v"), "v", "back")
    val bad = rt.filter(not(col("embedding") === col("back"))).count()
    assert(bad == 0)
  }

  test("LR quality filter: label recovery, column-scoring parity, threshold filter") {
    // separable corpus: good = varied alphabetic prose, bad = short
    // repeated junk — the features (length, distinct ratio, alpha
    // ratio, log tokens) split them on every axis
    val good = (1 to 60).map(i => (i.toLong,
      s"the quick brown fox number $i discusses a broad range of topics " +
        s"with many distinct words like alpha beta gamma delta epsilon " +
        s"covering document analysis at reasonable length", 1))
    val bad = (61 to 120).map(i => (i.toLong, "zz zz zz 123 !!!", 0))
    val docs = spark.createDataFrame(good ++ bad)
      .toDF("id", "text", "label")
    val (coef, b) = MllibBridge.trainQualityLr(docs, "text", "label")
    assert(coef.length == 4)
    val scored = docs.withColumn("score",
      MllibBridge.lrScore(col("text"), coef, b))
    // full label recovery on the separable corpus
    assert(scored.filter((col("score") >= 0.5) === (col("label") === 1))
      .count() == 120L)
    // the Column scorer == driver-side sigmoid over the same features
    // (catches any weight/feature misalignment in lrScore)
    val rows = scored
      .select(col("id"), MllibBridge.qualityFeatures(col("text")).as("f"),
        col("score"))
      .as[(Long, Seq[Double], Double)].collect()
    rows.foreach { case (id, f, s) =>
      val z = f.zip(coef).map { case (x, c) => x * c }.sum + b
      val manual = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(s - manual) < 1e-9, s"doc $id: $s vs $manual")
    }
    // threshold filter keeps exactly the high-quality half
    assert(scored.filter(col("score") >= 0.5).select("id")
      .as[Long].collect().toSet == good.map(_._1).toSet)
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
