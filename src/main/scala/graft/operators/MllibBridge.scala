package graft.operators

import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{Column, DataFrame}
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

  /** PCA projection via MLlib (the data-DEPENDENT twin of
    * `Similarity.rpKnn`'s random projection, and the standard OPQ/PQ
    * pre-rotation): fit the top-`k` principal components on the corpus,
    * return (projected corpus with `out` = ARRAY<DOUBLE>, the d×k
    * component matrix row-major) so queries can be projected with the
    * SAME matrix at probe time. Data-dependent eigenvectors are not
    * portable to a SQL oracle (sign/rotation ambiguity across eigen
    * libraries), so the PCA family is SPEC-gated: orthonormal
    * components, projection ≡ manual matrix multiply, and a recall
    * floor for coarse-rank → exact re-rank kNN in the reduced space.
    *
    * Scale: `PCA.fit` is one distributed Gramian pass (d×d driver
    * eigensolve — d is the embedding dim, not the corpus); projection
    * is a narrow map. Store the projected column as a sidecar at
    * ingest and the coarse pass scans k doubles per row instead of d. */
  def pcaProject(df: DataFrame, vecCol: String, k: Int,
                 out: String): (DataFrame, Array[Array[Double]]) = {
    val pca = new org.apache.spark.ml.feature.PCA()
      .setInputCol("_mlvec").setOutputCol("_mlproj").setK(k)
    val model = pca.fit(toMlVector(df, vecCol, "_mlvec"))
    val outDf = model.transform(toMlVector(df, vecCol, "_mlvec"))
      .withColumn(out, vector_to_array(col("_mlproj")))
      .drop("_mlvec", "_mlproj")
    val pc = model.pc // d rows × k cols, column-major DenseMatrix
    val rows = Array.tabulate(pc.numRows, pc.numCols)((i, j) => pc(i, j))
    (outDf, rows)
  }

  /** Project a query vector with the component matrix from
    * [[pcaProject]] (rows = original dims, cols = k). */
  def pcaProjectQuery(pc: Array[Array[Double]], q: Seq[Double]): Array[Double] = {
    val k = pc.headOption.map(_.length).getOrElse(0)
    Array.tabulate(k)(j => pc.indices.iterator.map(i => pc(i)(j) * q(i)).sum)
  }

  /** Hand-crafted per-document quality features — the input of the
    * classifier-based quality filter ([[trainQualityLr]]): length
    * score, distinct-token ratio, alphabetic ratio (the
    * `TextOps.qualityScore` components, unweighted) plus log1p of the
    * token count. A narrow codegen projection (ARRAY<DOUBLE> of 4),
    * shared verbatim by training and scoring so the two can never
    * featurize differently. */
  def qualityFeatures(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val toks = TextOps.tokens(t)
    array(
      least(length(t).cast("double") / 400.0d, lit(1.0d)),
      size(array_distinct(toks)).cast("double") /
        greatest(size(toks), lit(1)).cast("double"),
      length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
        greatest(length(t), lit(1)).cast("double"),
      log1p(size(toks).cast("double")))
  }

  /** CLASSIFIER-BASED quality filtering — the GPT-3/CCNet-style learned
    * complement of the heuristic `TextOps.qualityScore` gate: fit a
    * binary logistic regression on [[qualityFeatures]] over a labeled
    * sample (label 1 = high-quality reference corpus, 0 = raw crawl),
    * then score the full corpus with the returned (coefficients,
    * intercept) via [[lrScore]] — which is a pure broadcast-weights
    * Column expression, so the 100 TB scoring pass is a codegen'd dot
    * product + sigmoid with NO model object, no shuffle, and no UDF.
    * Data-dependent weights are not portable to a SQL oracle (L-BFGS
    * convergence is library-private), so the family is SPEC-gated like
    * PCA: label recovery on a separable corpus, scoring ≡ MLlib's own
    * `transform` probabilities, and threshold-filter behavior. */
  def trainQualityLr(labeled: DataFrame, textCol: String, labelCol: String,
                     maxIter: Int = 50): (Array[Double], Double) = {
    val feat = labeled.select(
      array_to_vector(qualityFeatures(col(textCol))).as("features"),
      col(labelCol).cast("double").as("label"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setStandardization(true)
    val model = lr.fit(feat)
    (model.coefficients.toArray, model.intercept)
  }

  /** Score text with a fitted quality LR: sigmoid(coef · features +
    * intercept) as a pure Column expression (weights embedded as
    * literals — the broadcast-free scoring path of
    * [[trainQualityLr]]). */
  def lrScore(text: Column, coef: Array[Double], intercept: Double): Column = {
    val f = qualityFeatures(text)
    val z = coef.zipWithIndex.map { case (c, i) =>
      element_at(f, i + 1) * lit(c)
    }.reduce(_ + _) + lit(intercept)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
