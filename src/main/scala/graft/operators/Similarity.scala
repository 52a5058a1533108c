package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbour search over embedding columns.
  *
  * Three access paths, trading recall for scan cost:
  *  - brute force (BruteForce.knn / knnJoin) — the exact baseline;
  *  - random-hyperplane LSH buckets — sign-bit sketch of each vector;
  *    query probes its own bucket (plus optional multi-probe neighbours
  *    at 1 hamming bit) and ranks candidates exactly;
  *  - IVF (inverted-file) coarse partitioning — vectors assigned to the
  *    nearest of C coarse centroids; query probes the nprobe nearest
  *    lists and ranks those exactly.
  *
  * Scale: both paths turn a full-scan kNN into a pruned scan keyed by a
  * partition column (bucket / list id). At 100 TB the embedding table is
  * written partitioned/bucketed by that key, so a probe is a partition-
  * pruned parquet read — no shuffle at query time. Hyperplanes/centroids
  * are tiny and broadcast. Determinism: hyperplanes come from a seeded
  * PRNG embedded as literals; centroids are the first C vectors by id
  * (deterministic; a Lloyd refinement would keep the same plumbing). */
object Similarity {

  /** Deterministic hyperplanes: `numPlanes` x `dim` doubles in [-1, 1]
    * from a seeded LCG (values are literals — the DuckDB oracle embeds
    * the same constants). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    var state = seed
    def next(): Double = {
      // 64-bit LCG (Knuth), top 53 bits → [0,1)
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) * 2.0d - 1.0d
    }
    Array.fill(numPlanes, dim)(next())
  }

  /** Sign-bit bucket id of a vector column for the given planes:
    * bit j set ⇔ dot(v, plane_j) > 0. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(vec, doubleVec(p)) > 0d, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Assign every vector its LSH bucket. */
  def lshAssign(emb: DataFrame, idCol: String, vecCol: String,
                planes: Array[Array[Double]]): DataFrame =
    emb.withColumn("bucket", lshBucket(col(vecCol), planes))

  /** Driver-side bucket of a query vector — MUST stay in lockstep with
    * lshBucket's `dot > 0` sign convention. */
  def queryBucket(planes: Array[Array[Double]], q: Seq[Double]): Int =
    planes.zipWithIndex.map { case (p, j) =>
      val d = p.indices.map(i => q(i) * p(i)).sum
      if (d > 0) 1 << j else 0
    }.sum

  /** ANN top-k: rank (exactly) only the vectors in the query's bucket.
    * Recall < 1 by construction; the candidate set is deterministic. */
  def lshKnn(emb: DataFrame, idCol: String, vecCol: String,
             planes: Array[Array[Double]], q: Seq[Double], k: Int): DataFrame = {
    val qBucket = queryBucket(planes, q)
    lshAssign(emb, idCol, vecCol, planes)
      .filter(col("bucket") === qBucket)
      .withColumn("dist", dist(col(vecCol), doubleVec(q)))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** IVF coarse assignment: centroid set = the `numLists` vectors with the
    * smallest ids (deterministic coarse quantizer); every vector joins its
    * nearest centroid (ties → lowest centroid id). Returns emb + `list_id`.
    * The centroid side is broadcast — the big side never shuffles. */
  /** The deterministic coarse-centroid relation shared by assignment and
    * probing (one definition — no drift, no duplicate top-N job when the
    * caller reuses it). */
  def ivfCentroids(emb: DataFrame, idCol: String, vecCol: String,
                   numLists: Int): DataFrame =
    emb.orderBy(col(idCol)).limit(numLists)
      .select(col(idCol).as("list_id"), col(vecCol).as("centroid"))

  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
                numLists: Int): DataFrame = {
    val centroids = ivfCentroids(emb, idCol, vecCol, numLists)
    val joined = emb.crossJoin(broadcast(centroids))
      .withColumn("cdist", dist(col(vecCol), col("centroid")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("cdist"), col("list_id"))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("centroid", "cdist", "rn")
  }

  /** Persist embeddings partitioned by their LSH bucket: an ANN probe
    * then reads exactly one (or a few, multi-probe) partitions —
    * partition-pruned parquet, no shuffle, no full scan. This is the
    * 100 TB serving layout for the LSH path. */
  def writeBucketed(emb: DataFrame, idCol: String, vecCol: String,
                    planes: Array[Array[Double]], path: String): Unit =
    lshAssign(emb, idCol, vecCol, planes)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Probe a bucketed store: top-k within the given buckets. The bucket
    * filter prunes at the partition level (visible as PartitionFilters
    * in the scan). */
  private def probeBuckets(spark: org.apache.spark.sql.SparkSession, path: String,
                           idCol: String, vecCol: String, buckets: Seq[Int],
                           q: Seq[Double], k: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*))
      .withColumn("dist", dist(col(vecCol), doubleVec(q)))
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  /** Top-k within the query's own bucket. */
  def probeBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
                    idCol: String, vecCol: String,
                    planes: Array[Array[Double]], q: Seq[Double], k: Int): DataFrame =
    probeBuckets(spark, path, idCol, vecCol,
      Seq(queryBucket(planes, q)), q, k)

  /** Multi-probe variant: also visit every bucket at hamming distance 1
    * from the query's (one flipped sign bit) — the standard recall boost;
    * still a partition-pruned IN-filter read of numPlanes+1 buckets. */
  def probeBucketedMulti(spark: org.apache.spark.sql.SparkSession, path: String,
                         idCol: String, vecCol: String,
                         planes: Array[Array[Double]], q: Seq[Double], k: Int): DataFrame = {
    val qBucket = queryBucket(planes, q)
    probeBuckets(spark, path, idCol, vecCol,
      qBucket +: planes.indices.map(j => qBucket ^ (1 << j)), q, k)
  }

  /** IVF ANN top-k: probe the `nprobe` centroid lists nearest to the
    * query, rank their members exactly. */
  def ivfKnn(emb: DataFrame, idCol: String, vecCol: String,
             numLists: Int, nprobe: Int, q: Seq[Double], k: Int): DataFrame = {
    val centroids = ivfCentroids(emb, idCol, vecCol, numLists)
      .localCheckpoint() // one top-N job feeds both assignment and probing
    val assigned = emb.crossJoin(broadcast(centroids))
      .withColumn("cdist", dist(col(vecCol), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("cdist"), col("list_id"))))
      .filter(col("rn") === 1)
      .drop("centroid", "cdist", "rn")
    val probeLists = centroids
      .withColumn("qdist", dist(col("centroid"), doubleVec(q)))
      .orderBy(col("qdist"), col("list_id"))
      .limit(nprobe)
      .select(col("list_id"))
    assigned.join(broadcast(probeLists), "list_id")
      .withColumn("dist", dist(col(vecCol), doubleVec(q)))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
