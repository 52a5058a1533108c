package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** The reference's SECOND index algorithm: an implicit-center binary trie
  * over normalized vectors (MemoryVectorIndex/MemoryVectorIndex.cs).
  * Unlike the stats-driven mean-split tree (IndexBuild), the trie needs
  * no statistics: node at conceptual (depth, dim) splits at an implicit
  * center that starts at 0 and shifts by step/2 per descent, step
  * halving each full dimension cycle; leaves hold record lists up to
  * `listThreshold` and split on overflow (Add, cs:84-228). Search and
  * remove carry the squared-distance budget that tightens per visited
  * split (Find cs:230-344, Remove cs:358-489). Max depth = float32
  * significand bits (cs:604) — the F9 mantissa constant.
  *
  * Spark-first usage: the trie is cheap to build incrementally with no
  * cluster coordination, so the distributed form keeps ONE TRIE PER
  * PARTITION built inside mapPartitions where the data already lives
  * (`searchJoin`) — no global structure, no shuffle; results re-checked
  * exactly like every other candidate path. */
final class TrieVectorIndex(listThreshold: Int = 10) extends Serializable {
  require(listThreshold > 0, "List threshold must be greater than zero.")

  /** Child slots per node; -1 = absent (cs: entries list of (low, high)). */
  private val lows = mutable.ArrayBuffer.empty[Int]
  private val highs = mutable.ArrayBuffer.empty[Int]
  private val records = mutable.HashMap.empty[Int, mutable.ArrayBuffer[(Long, Array[Float])]]
  private var vectorSize = -1
  private var n = 0L

  /** Float32 significand bit length (MemoryVectorIndex.cs:604). */
  val MaxDepth = 24

  def count: Long = n
  def nodeCount: Int = lows.size

  def iterator: Iterator[(Long, Array[Float])] =
    records.valuesIterator.flatten

  private def newNode(): Int = {
    lows += -1; highs += -1; lows.size - 1
  }

  /** Incremental insert — port of Add (cs:84-228), including the
    * split-only-remaining-dims overflow behavior and the oversized
    * "bad distribution" leaf fallback. */
  def add(id: Long, vec: Array[Float]): Unit = {
    if (lows.isEmpty) {
      require(vec.length > 0, "Invalid vector size.")
      vectorSize = vec.length
      n = 1
      newNode()
      records(0) = mutable.ArrayBuffer((id, vec))
      return
    }
    require(vec.length == vectorSize, "Invalid vector size.")

    var index = 0
    var step = 1f
    val centers = new Array[Float](vec.length)
    var depth = 0
    while (depth < MaxDepth) {
      step /= 2
      var i = 0
      while (i < vec.length) {
        val low = lows(index)
        val high = highs(index)
        if (vec(i) < centers(i)) {
          if (low >= 0) { centers(i) -= step; index = low }
          else if (high >= 0) {
            val leaf = newNode()
            lows(index) = leaf
            records(leaf) = mutable.ArrayBuffer((id, vec))
            n += 1
            return
          } else {
            addToLeaf(index, id, vec, centers, step, depth, i)
            return
          }
        } else {
          if (high >= 0) { centers(i) += step; index = high }
          else if (low >= 0) {
            val leaf = newNode()
            highs(index) = leaf
            records(leaf) = mutable.ArrayBuffer((id, vec))
            n += 1
            return
          } else {
            addToLeaf(index, id, vec, centers, step, depth, i)
            return
          }
        }
        i += 1
      }
      depth += 1
    }
  }

  /** Leaf append + overflow split over the REMAINING dims of the current
    * depth (cs:163-225: the split loop reuses the caller's `i` without
    * reset, so a list that one dim cycle cannot separate stays oversized
    * — "bad distribution, probably not normalized"). */
  private def addToLeaf(index0: Int, id: Long, vec: Array[Float],
                        centers: Array[Float], step: Float,
                        depth: Int, i0: Int): Unit = {
    var index = index0
    val list = records(index)
    list += ((id, vec))
    n += 1
    if (list.size <= listThreshold || depth >= MaxDepth - 1) return
    records.remove(index)

    var lowList = mutable.ArrayBuffer.empty[(Long, Array[Float])]
    var highList = list
    var i = i0
    while (i < vec.length) {
      var j = highList.size - 1
      while (j >= 0) {
        if (highList(j)._2(i) < centers(i)) {
          lowList += highList(j)
          highList.remove(j)
        }
        j -= 1
      }
      if (lowList.isEmpty) {
        centers(i) += step
        val next = newNode()
        highs(index) = next
        index = next
      } else if (highList.isEmpty) {
        centers(i) -= step
        val t = lowList; lowList = highList; highList = t
        val next = newNode()
        lows(index) = next
        index = next
      } else {
        val lo = newNode()
        val hi = newNode()
        lows(index) = lo
        highs(index) = hi
        records(lo) = lowList
        records(hi) = highList
        return
      }
      i += 1
    }
    // bad distribution: keep the oversized list (cs:222-225)
    records(index) = highList
  }

  /** Budget-pruned vicinity search — port of Find (cs:230-344): budget
    * starts at r², each descent to the side away from the query swaps
    * that dim's previous contribution prevDelta² for delta²; prune when
    * negative. Candidates still need the exact re-check (the reference's
    * own contract: "predicate should verify the match"). */
  def find(q: Array[Float], distance: Float): Iterator[(Long, Array[Float])] = {
    if (lows.isEmpty) return Iterator.empty
    require(q.length == vectorSize, "Invalid vector size.")
    val out = mutable.ArrayBuffer.empty[(Long, Array[Float])]
    // centers tracks each dim's accumulated implicit center along the
    // current path (cs: the `centers` array), restored on backtrack —
    // shifts are powers of two, so the undo is float-exact
    val centers = new Array[Float](vectorSize)
    def visit(index: Int, i: Int, step: Float, budget: Float): Unit = {
      val low = lows(index)
      val high = highs(index)
      if (low == -1 && high == -1) {
        records.get(index).foreach(out ++= _)
        return
      }
      val delta = q(i) - centers(i)
      val prevDelta = math.max(math.abs(delta) - step, 0f)
      val half = step / 2
      val ni = if (i + 1 == vectorSize) 0 else i + 1
      val nstep = if (i + 1 == vectorSize) half else step
      if (low != -1) {
        val b = if (delta <= 0) budget
          else budget + (prevDelta - delta) * (prevDelta + delta)
        if (b >= 0) {
          centers(i) -= half; visit(low, ni, nstep, b); centers(i) += half
        }
      }
      if (high != -1) {
        val b = if (delta >= 0) budget
          else budget + (prevDelta - delta) * (prevDelta + delta)
        if (b >= 0) {
          centers(i) += half; visit(high, ni, nstep, b); centers(i) -= half
        }
      }
    }
    visit(0, 0, 1f, distance * distance)
    out.iterator
  }

  /** Budget-pruned remove — port of Remove (cs:358-489): drop matching
    * records in reachable leaves; an emptied leaf is unlinked and
    * single-child ancestor chains pruned (no list consolidation, like
    * the reference). `pred` decides the actual match. */
  def remove(q: Array[Float], distance: Float,
             pred: (Long, Array[Float]) => Boolean): Unit = {
    if (lows.isEmpty) return
    require(q.length == vectorSize, "Invalid vector size.")
    val centers = new Array[Float](vectorSize)
    // returns true when the visited child emptied and was unlinked
    def visit(index: Int, i: Int, step: Float, budget: Float): Boolean = {
      val low = lows(index)
      val high = highs(index)
      if (low == -1 && high == -1) {
        records.get(index) match {
          case Some(list) =>
            val before = list.size
            val kept = list.filterNot { case (id, v) => pred(id, v) }
            n -= (before - kept.size)
            if (kept.isEmpty) { records.remove(index); true }
            else { records(index) = kept; false }
          case None => true // chain node with no leaf left
        }
      } else {
        val delta = q(i) - centers(i)
        val prevDelta = math.max(math.abs(delta) - step, 0f)
        val half = step / 2
        val ni = if (i + 1 == vectorSize) 0 else i + 1
        val nstep = if (i + 1 == vectorSize) half else step
        if (low != -1) {
          val b = if (delta <= 0) budget
            else budget + (prevDelta - delta) * (prevDelta + delta)
          if (b >= 0) {
            centers(i) -= half
            val emptied = visit(low, ni, nstep, b)
            centers(i) += half
            if (emptied) lows(index) = -1
          }
        }
        if (high != -1) {
          val b = if (delta >= 0) budget
            else budget + (prevDelta - delta) * (prevDelta + delta)
          if (b >= 0) {
            centers(i) += half
            val emptied = visit(high, ni, nstep, b)
            centers(i) -= half
            if (emptied) highs(index) = -1
          }
        }
        lows(index) == -1 && highs(index) == -1 && !records.contains(index)
      }
    }
    visit(0, 0, 1f, distance * distance)
  }
}

object TrieIndex {

  /** Build a trie from (id, vector) rows. */
  def build(rows: IterableOnce[(Long, Array[Float])],
            listThreshold: Int = 10): TrieVectorIndex = {
    val t = new TrieVectorIndex(listThreshold)
    rows.iterator.foreach { case (id, v) => t.add(id, v) }
    t
  }

  /** Probe one trie for every query with the float-budget inflation and
    * exact re-check — shared by the per-call and the prepared paths.
    *
    * The float32 budget must OVER-approximate the double ball:
    * radius.toFloat can round down and the budget accumulation can
    * under-shoot by ~d·ulp, making the prune a false-negative source
    * the exact re-check cannot recover. A 1e-4 relative inflation
    * dominates both; the extra candidates are removed right here.
    * The re-check compares sqrt(s) <= radius (NOT s <= radius²):
    * for a boundary point whose distance IS the radius, radius²
    * rounds below the exact squared sum and the squared compare
    * drops it — sqrt matches BruteForce.rangeSearch bit for bit. */
  private def probeTrie(trie: TrieVectorIndex,
                        queries: Array[(Long, Array[Float])],
                        radius: Double): Iterator[(Long, Long)] =
    queries.iterator.flatMap { case (qid, qv) =>
      trie.find(qv, (radius * 1.0001).toFloat).filter { case (_, v) =>
        var s = 0d; var i = 0
        while (i < v.length) {
          val d = v(i).toDouble - qv(i).toDouble; s += d * d; i += 1
        }
        math.sqrt(s) <= radius
      }.map { case (id, _) => (qid, id) }
    }

  /** Distributed vicinity join with NO global index: one trie per
    * partition, built where the data lives inside mapPartitions, probed
    * for every (broadcast) query, exact re-check inline. Equals the
    * brute-force distance join; the per-partition trie turns each
    * partition's scan into a budget-pruned probe.
    *
    * Each call rebuilds the partition tries (one scan). For REPEATED
    * query batches against the same points, `prepare` +
    * `searchJoinPrepared` amortizes the build across calls. */
  def searchJoin(points: DataFrame, idCol: String, vecCol: String,
                 queries: Array[(Long, Array[Float])], radius: Double,
                 listThreshold: Int = 10): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(queries)
    points
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        probeTrie(build(rows, listThreshold), qB.value, radius)
      }
      .toDF("qid", idCol)
  }

  /** Build the per-partition tries ONCE and cache them (the trie
    * objects stay where their partition's data lives — deserialized in
    * executor memory, spilling serialized to disk under pressure): every
    * subsequent `searchJoinPrepared` batch probes the cached tries
    * instead of rebuilding them, amortizing the build across query
    * batches. Call `.unpersist()` on the returned RDD when done. */
  def prepare(points: DataFrame, idCol: String, vecCol: String,
              listThreshold: Int = 10)
      : org.apache.spark.rdd.RDD[TrieVectorIndex] = {
    val spark = points.sparkSession
    import spark.implicits._
    val tries = points
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .rdd
      .mapPartitions(rows => Iterator.single(build(rows, listThreshold)))
    tries.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tries
  }

  /** Probe tries cached by `prepare` — identical semantics to
    * searchJoin, minus the per-call build scan. */
  def searchJoinPrepared(points: DataFrame, idCol: String,
                         tries: org.apache.spark.rdd.RDD[TrieVectorIndex],
                         queries: Array[(Long, Array[Float])],
                         radius: Double): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(queries)
    tries.flatMap(trie => probeTrie(trie, qB.value, radius))
      .toDF("qid", idCol)
  }

  /** DataFrame-of-queries form (mirrors PinnedIndex.searchJoin): the
    * query side is the broadcast side of this join — it is gathered and
    * shipped to every point partition exactly like the build side of any
    * Spark broadcast join, so it must be the small relation. The point
    * side streams; one trie is built per point partition. */
  def searchJoin(points: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, queryIdCol: String, queryVecCol: String,
                 radius: Double, listThreshold: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    searchJoin(points, idCol, vecCol, qs, radius, listThreshold)
  }
}
