package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import scala.collection.mutable

/** A pinned, immutable, serializable form of the space-partitioning index
  * — the engine's analog of the reference's always-in-memory
  * MemoryVectorIndex (MemoryVectorIndex.cs): collect the (~2N tiny rows)
  * tree ONCE, then answer any number of vicinity queries without
  * touching the cluster, or broadcast it and batch-search a whole
  * queries relation in one distributed pass (index-accelerated
  * similarity join — no per-level frontier jobs, no per-query collect).
  */
final case class PinnedNode(dim: Int, mid: Float, low: Long, high: Long)

final class PinnedIndex private (
    val internal: mutable.LongMap[PinnedNode],
    val leaves: mutable.LongMap[Array[Long]]) extends Serializable {

  /** Box-candidate ids for one query (driver- or executor-local walk). */
  def candidates(q: Seq[Double], domain: Double): Seq[Long] = {
    val out = mutable.ArrayBuffer.empty[Long]
    val stack = mutable.Stack[Long](0L)
    while (stack.nonEmpty) {
      val rid = stack.pop()
      leaves.get(rid).foreach(out ++= _)
      internal.get(rid).foreach { n =>
        val (lo, hi) =
          if (n.dim < 0) (true, true)
          else {
            val c = q(n.dim)
            (n.mid.toDouble >= c - domain, n.mid.toDouble <= c + domain)
          }
        if (lo && n.low >= 0) stack.push(n.low)
        if (hi && n.high >= 0) stack.push(n.high)
      }
    }
    out.toSeq
  }

  /** Candidate ids for an L2 ball query via the reference's
    * squared-distance-budget pruning (MemoryVectorIndex.cs:259-344):
    * budget = r² − Σ_d offs(d)² tightens per split on the non-query side
    * and prunes at < 0 — a strictly tighter candidate superset than the
    * box test for ball queries (exactness comes from the caller's
    * re-check, same contract as `candidates`). */
  def candidatesL2(q: Seq[Double], radius: Double): Seq[Long] =
    candidatesL2Bounded(q, radius, Int.MaxValue).get

  def nodeCount: Int = internal.size + leaves.size

  /** Total leaf point ids held by the tree. */
  lazy val leafIdCount: Long =
    leaves.iterator.map(_._2.length.toLong).sum

  /** Exact k-nearest-neighbours via branch-and-bound: depth-first,
    * nearer child first, pruning subtrees whose squared lower bound
    * (Σ per-dim offs² — the same budget math as candidatesL2) exceeds
    * the current k-th best distance. `vecOf` supplies point vectors
    * (see PinnedIndex.pinWithVectors). Ties at the k-th boundary break
    * toward the smaller id. Returns (id, distance) sorted by
    * (distance, id). */
  def knn(q: Seq[Double], k: Int, vecOf: Long => Array[Float]): Seq[(Long, Double)] =
    knnBounded(q, k, vecOf, Int.MaxValue).get

  /** `knn` with a work budget: gives up (None) once more than
    * `maxOffers` leaf vectors have been offered to the heap — the
    * caller's signal that branch-and-bound pruning is ineffective here
    * (high-d distance concentration) and an exact answer would cost a
    * near-full walk. A Some result is always the exact top-k. Lets the
    * optimizer rule probe "is this query cheap to answer from the pin?"
    * in bounded time instead of stalling the driver. */
  def knnBounded(q: Seq[Double], k: Int, vecOf: Long => Array[Float],
                 maxOffers: Int): Option[Seq[(Long, Double)]] = {
    if (k <= 0) return Some(Nil)
    var offers = 0
    // max-heap of the current best k (d2, id): head = worst kept, i.e.
    // the largest distance and, among ties, the largest id (the one a
    // smaller-id tie should evict — matching the brute (dist, id) order)
    val heap = mutable.PriorityQueue.empty[(Double, Long)](
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    def kth: Double = if (heap.size < k) Double.PositiveInfinity else heap.head._1
    object Aborted extends scala.util.control.ControlThrowable
    def offer(id: Long): Unit = {
      offers += 1
      if (offers > maxOffers) throw Aborted
      val v = vecOf(id)
      var d2 = 0d
      var i = 0
      while (i < v.length) {
        val d = v(i).toDouble - q(i); d2 += d * d; i += 1
      }
      if (heap.size < k) heap.enqueue((d2, id))
      else if (d2 < heap.head._1 ||
        (d2 == heap.head._1 && id < heap.head._2)) {
        heap.dequeue(); heap.enqueue((d2, id))
      }
    }
    val offs = new Array[Double](q.length)
    // Prune with a 1e-9 relative slack: the bound's add/subtract chain
    // drifts by ~d·ulp vs the left-to-right fold `offer` uses, so an
    // exact-boundary subtree could otherwise be cut. Slack only ADMITS
    // subtrees — the heap's exact distances keep the result exact.
    def kthSlack: Double = kth * 1.000000001d
    def visit(rid: Long, bound: Double): Unit = {
      if (bound > kthSlack) return
      leaves.get(rid).foreach(_.foreach(offer))
      internal.get(rid).foreach { n =>
        if (n.dim < 0) {
          if (n.low >= 0) visit(n.low, bound)
          if (n.high >= 0) visit(n.high, bound)
        } else {
          val c = q(n.dim)
          val m = n.mid.toDouble
          val old = offs(n.dim)
          val nbLow = math.max(math.max(c - m, 0d), old)
          val nbHigh = math.max(math.max(m - c, 0d), old)
          val bLow = bound - old * old + nbLow * nbLow
          val bHigh = bound - old * old + nbHigh * nbHigh
          val order =
            if (c <= m) Seq((n.low, bLow, nbLow), (n.high, bHigh, nbHigh))
            else Seq((n.high, bHigh, nbHigh), (n.low, bLow, nbLow))
          order.foreach { case (child, b, nb) =>
            if (child >= 0 && b <= kthSlack) {
              offs(n.dim) = nb; visit(child, b); offs(n.dim) = old
            }
          }
        }
      }
    }
    try {
      visit(0L, 0d)
      Some(heap.toSeq
        .map { case (d2, id) => (id, math.sqrt(d2)) }
        .sortBy { case (id, d) => (d, id) })
    } catch { case Aborted => None }
  }

  /** `candidatesL2` with an output cap: None once the candidate set
    * exceeds `cap` (the caller would reject an InSet that big anyway —
    * no point walking out the rest of the tree). */
  def candidatesL2Bounded(q: Seq[Double], radius: Double, cap: Int): Option[Seq[Long]] = {
    val out = mutable.ArrayBuffer.empty[Long]
    object Aborted extends scala.util.control.ControlThrowable
    val offs = new Array[Double](q.length)
    def visit(rid: Long, budget: Double): Unit = {
      leaves.get(rid).foreach { ids =>
        out ++= ids
        if (out.size > cap) throw Aborted
      }
      internal.get(rid).foreach { n =>
        if (n.dim < 0) {
          if (n.low >= 0) visit(n.low, budget)
          if (n.high >= 0) visit(n.high, budget)
        } else {
          val c = q(n.dim)
          val m = n.mid.toDouble
          val old = offs(n.dim)
          if (n.low >= 0) {
            val nb = math.max(math.max(c - m, 0d), old)
            val b = budget + old * old - nb * nb
            if (b >= 0) { offs(n.dim) = nb; visit(n.low, b); offs(n.dim) = old }
          }
          if (n.high >= 0) {
            val nb = math.max(math.max(m - c, 0d), old)
            val b = budget + old * old - nb * nb
            if (b >= 0) { offs(n.dim) = nb; visit(n.high, b); offs(n.dim) = old }
          }
        }
      }
    }
    try {
      visit(0L, radius * radius * 1.000000001d)
      Some(out.toSeq)
    } catch { case Aborted => None }
  }
}

object PinnedIndex {

  /** Collect an index relation into its pinned form. */
  def pin(index: DataFrame): PinnedIndex = {
    val internal = mutable.LongMap.empty[PinnedNode]
    val leaves = mutable.LongMap.empty[Array[Long]]
    val buf = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    index.select("rangeId", "dimension", "mid", "lowRangeId", "highRangeId", "id")
      .collect()
      .foreach { r =>
        val rid = r.getLong(0)
        if (!r.isNullAt(5))
          buf.getOrElseUpdate(rid, mutable.ArrayBuffer.empty) += r.getLong(5)
        if (!r.isNullAt(3))
          internal.update(rid, PinnedNode(
            if (r.isNullAt(1)) -1 else r.getInt(1),
            if (r.isNullAt(2)) 0f else r.getFloat(2),
            r.getLong(3),
            if (r.isNullAt(4)) -1L else r.getLong(4)))
      }
    buf.foreach { case (k, v) => leaves.update(k, v.toArray) }
    new PinnedIndex(internal, leaves)
  }

  /** Pin the tree AND the point vectors (serving-mode kNN needs both;
    * ~(2N tiny rows + N·d floats) — the same footprint the reference's
    * always-in-memory index carries).
    *
    * PIN BUDGET: the vector map is the dominant term — N·d·4 bytes plus
    * boxing overhead (10M × 96 floats ≈ 4 GB on the pinning JVM); the
    * tree itself is ~48 bytes/node (10M points ≈ 1 GB). This is the
    * documented serving-mode bound, same as the reference's in-memory
    * index. Beyond it, DON'T pin vectors: `knnDistributed` keeps the
    * vectors in the cluster and pins only the tree; beyond even the
    * tree budget, use IndexSearch's frontier descent (never collects
    * anything). */
  def pinWithVectors(index: DataFrame, points: DataFrame, idCol: String,
                     vecCol: String): (PinnedIndex, mutable.LongMap[Array[Float]]) = {
    val pinned = pin(index)
    val vecs = mutable.LongMap.empty[Array[Float]]
    points.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect()
      .foreach { r =>
        // null vectors are unindexable — skip them (they'd NPE the pin);
        // callers that must preserve null-distance ordering check for
        // them separately (VectorIndexCatalog.registerServing)
        if (!r.isNullAt(0) && !r.isNullAt(1))
          vecs.update(r.getLong(0), r.getSeq[Float](1).toArray)
      }
    (pinned, vecs)
  }

  /** Exact kNN with the tree pinned but the VECTORS left distributed —
    * the beyond-pin-budget serving route (see pinWithVectors' budget
    * note). Candidates come from a `candidatesL2` ball probe; the
    * distance ranking runs as a distributed top-k (codegen distance +
    * TakeOrdered) over the candidate semi-join — the vectors never
    * leave the cluster. The ball doubles until the k-th candidate
    * distance lies inside the probed radius (then every true neighbour
    * was necessarily a candidate) or the ball has swallowed the whole
    * tree, so the result equals BruteForce.knn exactly, ties on
    * (dist, id). */
  def knnDistributed(pinned: PinnedIndex, points: DataFrame, idCol: String,
                     vecCol: String, q: Seq[Double], k: Int,
                     initRadius: Double = 1.0): Seq[(Long, Double)] = {
    if (k <= 0) return Nil
    // a non-positive (or NaN) start radius would never grow under r *= 2
    // — the loop below would spin forever on the driver
    require(initRadius > 0d, s"initRadius must be positive, got $initRadius")
    val spark = points.sparkSession
    import spark.implicits._
    var r = initRadius
    var result: Seq[(Long, Double)] = Nil
    var done = false
    while (!done) {
      val cands = pinned.candidatesL2(q, r)
      val exhausted = cands.size >= pinned.leafIdCount
      var bumped = false
      if (cands.size >= k || exhausted) {
        val candDf = cands.toDF(idCol)
        val top = points
          .join(broadcast(candDf), idCol)
          .select(col(idCol).cast("long"),
            dist(col(vecCol), doubleVec(q)).as("dist"))
          .orderBy(col("dist"), col(idCol))
          .limit(k)
          .as[(Long, Double)].collect().toSeq
        if (exhausted || (top.size >= k && top.last._2 <= r)) {
          result = top
          done = true
        } else if (top.size >= k) {
          // The candidate set is a subset of all points, so this top-k's
          // k-th distance upper-bounds the true one: probing at exactly
          // that radius provably captures every true neighbour, and the
          // next pass's check (top.last._2 <= r) must succeed — one extra
          // pass instead of O(log(range)) doublings from a tiny initRadius.
          // The bump REPLACES the doubling (bumped flag): the next probe
          // runs at exactly the bound, not twice it.
          r = math.max(r, top.last._2)
          bumped = true
        }
      }
      if (!done && !bumped) r *= 2
    }
    result
  }

  /** Index-accelerated similarity (range) join: for every row of
    * `queries` (queryIdCol, queryVecCol), all points within `radius`.
    * The pinned tree is broadcast; each task walks it per query row and
    * emits candidate ids (one distributed map — no frontier loop); the
    * exact predicate re-checks after joining the points back. Equals
    * BruteForce.distanceJoin by construction. */
  def searchJoin(pinned: PinnedIndex, points: DataFrame, idCol: String,
                 vecCol: String, queries: DataFrame, queryIdCol: String,
                 queryVecCol: String, radius: Double): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val pinB = spark.sparkContext.broadcast(pinned)
    val cands = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        val q = qv.map(_.toDouble).toSeq
        pinB.value.candidatesL2(q, radius).map(id => (qid, id))
      }
      .toDF(queryIdCol, idCol)
    cands
      .join(points.select(col(idCol), col(vecCol)), idCol)
      .join(broadcast(queries.select(col(queryIdCol), col(queryVecCol))), queryIdCol)
      .filter(dist(col(vecCol), col(queryVecCol)) <= radius)
      .select(col(queryIdCol), col(idCol))
  }
}
