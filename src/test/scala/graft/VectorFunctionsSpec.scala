package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head().getDouble(0)

  test("euclidean distance matches hand values") {
    val d = one(dist(floatVec(Seq(0f, 3f)), floatVec(Seq(4f, 0f))))
    assert(math.abs(d - 5.0) < 1e-12)
  }

  test("distSq is squared distance") {
    val d = one(distSq(floatVec(Seq(1f, 1f)), floatVec(Seq(2f, 2f))))
    assert(math.abs(d - 2.0) < 1e-12)
  }

  test("cosine of parallel vectors is 1, orthogonal 0, zero-norm 0") {
    assert(math.abs(one(cosine(floatVec(Seq(1f, 2f)), floatVec(Seq(2f, 4f)))) - 1.0) < 1e-12)
    assert(math.abs(one(cosine(floatVec(Seq(1f, 0f)), floatVec(Seq(0f, 1f))))) < 1e-12)
    assert(one(cosine(floatVec(Seq(0f, 0f)), floatVec(Seq(1f, 1f)))) == 0.0)
  }

  test("inBox tests the L-inf window") {
    val in = Seq(1).toDF("x")
      .select(inBox(floatVec(Seq(0.5f, 0.5f)), floatVec(Seq(0.4f, 0.4f)), lit(0.2)).as("b"))
      .head().getBoolean(0)
    val out = Seq(1).toDF("x")
      .select(inBox(floatVec(Seq(0.7f, 0.5f)), floatVec(Seq(0.4f, 0.4f)), lit(0.2)).as("b"))
      .head().getBoolean(0)
    assert(in && !out)
  }

  test("hasDim validates vector length") {
    val df = Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f, 3f))).toDF("id", "v")
    assert(df.filter(hasDim(col("v"), 2)).count() == 1)
  }

  test("dist/dot raise on mismatched vector lengths") {
    // the reference validates vector size (MemoryVectorIndex.cs:105-108);
    // silent truncation would return a wrong distance
    val df = Seq((1L, Seq(1f, 2f, 3f))).toDF("id", "v")
    val ex = intercept[Exception] {
      df.select(dist(col("v"), floatVec(Seq(1f, 2f))).as("d")).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(ex).exists(m => m != null && m.contains("length mismatch")))
  }
}
