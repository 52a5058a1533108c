package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions.{cosine, dist, dot, doubleVec}

/** Retrieval composition operators: hybrid rank fusion over the
  * keyword ([[TextOps.bm25]] / [[TextIndex.probe]]) and vector
  * ([[BruteForce.knn]] / any serving-store probe) legs, and ColBERT
  * style multi-vector late-interaction scoring. Both are pure
  * compositions of relations the engine already produces — the modern
  * RAG serving stack expressed as DataFrame plans.
  */
object Retrieval {

  /** RECIPROCAL-RANK FUSION (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse N ranked lists into one by score(id) = Σ_lists 1/(k + rank),
    * ids absent from a list contributing 0 for it. RRF is the standard
    * hybrid-retrieval combiner (BM25 leg + dense-vector leg) because it
    * needs no score calibration between legs — only ranks.
    *
    * Each input must carry (`idCol`, `rankCol`) with rank 1-based and
    * dense within its list. The fold is a left-to-right chain of outer
    * joins with the reciprocal terms added in list order, so the double
    * sum has ONE well-defined evaluation order — an oracle replaying
    * the same order reproduces it bit for bit (a groupBy-sum over a
    * union would not: Spark's partial aggregation adds in partition
    * order).
    *
    * Scale: ranked lists are top-N relations (N ≪ corpus — they come
    * out of pruned store probes), so every join side is broadcastable;
    * the fused relation never exceeds Σ list sizes. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val renamed = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol).as("id"), col(rankCol).as(s"_r$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(k.toDouble) + col(s"_r$i").cast("double")),
        lit(0.0)))
      .reduce((a, b) => a + b)
    joined
      .withColumn("rrf", round(score, 9))
      .orderBy(col("rrf").desc, col("id"))
      .limit(topK)
      .select(col("id"), col("rrf"))
  }

  /** ColBERT-style LATE-INTERACTION scoring (Khattab & Zaharia, SIGIR
    * 2020) over derived sub-vectors: a d-dim embedding is read as
    * d/`subDim` contiguous token vectors, the query likewise, and
    * score(doc) = Σ_queryTokens max_docTokens dot(qTok, docTok) — the
    * MaxSim operator. With the chunk count fixed at plan time the whole
    * scoring is ONE codegen'd projection per row (no explode, no
    * shuffle, no UDF): each dot is a native [[graft.functions
    * .VectorExpressions]] vecDot on an array slice, the per-query-token
    * max a `greatest`, the final score a fixed-order sum. Top-k then
    * runs as TakeOrderedAndProject.
    *
    * Scale: a linear embarrassingly-parallel scan — or feed it only a
    * store probe's candidate set for the two-stage (ANN retrieve →
    * MaxSim re-rank) serving shape. */
  def maxSimScore(vec: Column, query: Seq[Double], subDim: Int): Column = {
    require(query.length % subDim == 0, "query length must be a multiple of subDim")
    // native kernel (vec_maxsim): one primitive loop per row, the exact
    // op order of the slice/dot/greatest composition it replaced — the
    // composed form allocated nSub slice arrays per row, which
    // dominated the full-corpus scan (rerankbench A/B in BASELINE.md)
    graft.functions.VectorExpressions.vecMaxSim(
      vec, query.grouped(subDim).toSeq)
  }

  /** Top-`topK` documents under [[maxSimScore]], deterministic on the
    * 6dp-rounded score with the id tie-break. */
  def maxSim(points: DataFrame, idCol: String, vecCol: String,
             query: Seq[Double], subDim: Int, topK: Int): DataFrame =
    points
      .withColumn("maxsim", round(maxSimScore(col(vecCol), query, subDim), 6))
      .orderBy(col("maxsim").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), col("maxsim"))

  /** HARD-NEGATIVE MINING for contrastive embedding training: per
    * query, the `k` NEAREST points whose cosine similarity stays at or
    * below `simCeiling` — close enough to be informative negatives,
    * dissimilar enough to not be unlabeled positives/near-duplicates
    * (the standard in-batch-negatives upgrade: DPR, Karpukhin et al.
    * 2020). Filter-then-rank, not rank-then-filter: a near-dup crowding
    * the true top-k must not push real negatives out.
    *
    * This is the exact anchor (queries broadcast against a full scan,
    * per-query map-side top-k — the v3/a20 join shape); at corpus
    * scale feed `points` from a serving-store probe's candidate pool
    * instead of the raw table, exactly like [[maxSim]]'s a23 staging. */
  def hardNegatives(points: DataFrame, idCol: String, vecCol: String,
                    queries: DataFrame, qIdCol: String, qVecCol: String,
                    simCeiling: Double, k: Int): DataFrame = {
    val joined = points.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("dist", dist(col(vecCol), col(qVecCol)))
      .withColumn("cos", cosine(col(vecCol), col(qVecCol)))
      .filter(col("cos") <= simCeiling)
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("dist"), col(idCol))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("rank"),
        round(col("dist"), 6).as("dist"))
  }
}
