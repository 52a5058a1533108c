package graft.operators

import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interop with Spark MLlib's vector stack (BASELINE.json's "batch vector
  * operations via MLlib"): ARRAY<FLOAT> columns convert losslessly to
  * `ml.linalg.Vector` and back, and MLlib's `Summarizer` is the
  * off-the-shelf analog of our per-dimension stats (A2) — one distributed
  * pass, no explode, same mean/variance/count semantics (variance =
  * sample; our build compares M2, whose argmax is identical for a fixed
  * count). Useful when composing with MLlib pipelines (e.g. KMeans for a
  * learned IVF coarse quantizer). */
object MllibBridge {

  /** ARRAY<FLOAT|DOUBLE> column → MLlib dense vector column. */
  def toMlVector(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(out, array_to_vector(col(vecCol)))

  /** MLlib vector column → ARRAY<DOUBLE>/ARRAY<FLOAT>. */
  def toArray(df: DataFrame, vecCol: String, out: String,
              float32: Boolean = true): DataFrame = {
    val arr = vector_to_array(col(vecCol))
    df.withColumn(out, if (float32) arr.cast("array<float>") else arr)
  }

  /** Per-dimension (mean, variance, count) via MLlib Summarizer — the
    * library twin of VecStatsAgg (one row out: arrays of d doubles). */
  def summarize(df: DataFrame, vecCol: String): DataFrame =
    toMlVector(df, vecCol, "_mlvec")
      .select(Summarizer.metrics("mean", "variance", "count")
        .summary(col("_mlvec")).as("s"))
      .select(vector_to_array(col("s.mean")).as("mean"),
        vector_to_array(col("s.variance")).as("variance"),
        col("s.count").as("cnt"))
}
