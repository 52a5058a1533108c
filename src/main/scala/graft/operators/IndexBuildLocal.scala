package graft.operators

import scala.collection.mutable

/** The in-task sequential subtree builder — the hot inner loop of the
  * hybrid index build (IndexBuild.buildLocalSubtrees) and of the
  * per-document build. Engineered like the reference's walker
  * (IndexBuilder.cs:31-157) for throughput:
  *  - parallel primitive arrays (ids / vectors), no per-point tuples;
  *  - two-pass sum/sumSq statistics (vectorizable multiply-adds, no
  *    per-element division) with scratch buffers REUSED across every
  *    node of the subtree — allocation per node is just the two child
  *    id/vector arrays the partition produces;
  *  - id sums in Long with an exact-overflow fallback to BigInt
  *    (the reference uses Int128, Stats.cs:26).
  *
  * Semantics are the build rules of SURVEY.md §2 (A3/A4/F10 + the
  * degenerate-split guard): split dim = argmax (even levels) / argmin
  * (odd) of M2 = sumSq − sum²/n with lowest-index ties; mid = float32
  * mean; high ⇔ v > mid ∨ (v = mid ∧ id > pivot); pure id-split when the
  * rounded mid cannot separate (mid ∉ (min, max)). Mean here is sum/n
  * while the distributed path merges Welford partials — the two can
  * differ in the last ulp, which only moves argmax/equality corners;
  * search results are tree-shape independent. */
object IndexBuildLocal {

  /** Emits (rangeId, dimension|-1, mid, low|-1, high|-1, id|-1) rows. */
  def buildSubtree(rootRangeId: Long, rootLevel: Int,
                   ids0: Array[Long], vecs0: Array[Array[Float]],
                   bucketSize: Int)
      : Iterator[(Long, Int, Float, Long, Long, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Long, Int, Float, Long, Long, Long)]
    if (ids0.isEmpty) return out.iterator
    val d = vecs0(0).length
    val sum = new Array[Double](d)
    val sumSq = new Array[Double](d)
    val mn = new Array[Double](d)
    val mx = new Array[Double](d)

    val stack = mutable.Stack.empty[(Long, Int, Array[Long], Array[Array[Float]])]
    stack.push((rootRangeId, rootLevel, ids0, vecs0))
    while (stack.nonEmpty) {
      val (rangeId, level, ids, vecs) = stack.pop()
      val n = ids.length
      if (n > 0) {
        if (n <= bucketSize || level >= IndexBuild.MaxDepth - 1) {
          var j = 0
          while (j < n) {
            out += ((rangeId, -1, 0f, -1L, -1L, ids(j)))
            j += 1
          }
        } else {
          java.util.Arrays.fill(sum, 0d)
          java.util.Arrays.fill(sumSq, 0d)
          java.util.Arrays.fill(mn, Double.PositiveInfinity)
          java.util.Arrays.fill(mx, Double.NegativeInfinity)
          // id sum: Long fast path, exact BigInt fallback on overflow
          var sumIdL = 0L
          var overflow = false
          var j = 0
          while (j < n && !overflow) {
            val prev = sumIdL
            sumIdL = prev + ids(j)
            if (((prev ^ sumIdL) & (ids(j) ^ sumIdL)) < 0) overflow = true
            else j += 1
          }
          val pivotId =
            if (!overflow) sumIdL / n
            else (ids.foldLeft(BigInt(0))(_ + _) / n).toLong

          j = 0
          while (j < n) {
            val vec = vecs(j)
            var i = 0
            while (i < d) {
              val v = vec(i).toDouble
              sum(i) += v
              sumSq(i) += v * v
              if (v < mn(i)) mn(i) = v
              if (v > mx(i)) mx(i) = v
              i += 1
            }
            j += 1
          }
          val useMax = level % 2 == 0
          var best = 0
          var bestM2 = sumSq(0) - sum(0) * sum(0) / n
          var i = 1
          while (i < d) {
            val m2i = sumSq(i) - sum(i) * sum(i) / n
            if (if (useMax) m2i > bestM2 else m2i < bestM2) {
              best = i; bestM2 = m2i
            }
            i += 1
          }
          val mid = (sum(best) / n).toFloat
          val degenerate = mid.toDouble >= mx(best) || mid.toDouble <= mn(best)
          val lowId = rangeId * 2 + 1
          val highId = rangeId * 2 + 2
          out += ((rangeId,
            if (degenerate) -1 else best,
            if (degenerate) 0f else mid,
            lowId, highId, -1L))

          // partition into child arrays (one boolean pass + fill)
          var nHigh = 0
          val goHigh = new Array[Boolean](n)
          j = 0
          while (j < n) {
            val h =
              if (degenerate) ids(j) > pivotId
              else {
                val v = vecs(j)(best)
                v > mid || (v == mid && ids(j) > pivotId)
              }
            goHigh(j) = h
            if (h) nHigh += 1
            j += 1
          }
          val hIds = new Array[Long](nHigh)
          val hVecs = new Array[Array[Float]](nHigh)
          val lIds = new Array[Long](n - nHigh)
          val lVecs = new Array[Array[Float]](n - nHigh)
          var hi = 0
          var lo = 0
          j = 0
          while (j < n) {
            if (goHigh(j)) { hIds(hi) = ids(j); hVecs(hi) = vecs(j); hi += 1 }
            else { lIds(lo) = ids(j); lVecs(lo) = vecs(j); lo += 1 }
            j += 1
          }
          stack.push((lowId, level + 1, lIds, lVecs))
          stack.push((highId, level + 1, hIds, hVecs))
        }
      }
    }
    out.iterator
  }
}
