package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-dimension streaming statistics over whole vectors — the
  * reference's single-pass Welford accumulator (VectorIndex/
  * IndexBuilder.cs:159-197, Stats.cs:6-27) as a Spark `Aggregator` with
  * Chan's parallel merge, so the distributed index build aggregates
  * ARRAY<FLOAT> rows directly: no posexplode, no d-fold row blow-up —
  * the shuffle carries ONE buffer (4 doubles per dimension) per
  * (range × map task) instead of d rows (SURVEY.md §2.11, A2).
  *
  * sumId accumulates in BigDecimal — overflow-exact like the reference's
  * Int128 accumulator (Stats.cs:26).
  */
case class VecStatsBuf(var cnt: Long, var sumId: java.math.BigDecimal,
                       var mean: Array[Double], var m2: Array[Double],
                       var mn: Array[Double], var mx: Array[Double])

case class VecStats(cnt: Long, sumId: java.math.BigDecimal,
                    mean: Array[Double], m2: Array[Double],
                    mn: Array[Double], mx: Array[Double])

class VecStatsAgg extends Aggregator[(Long, Array[Float]), VecStatsBuf, VecStats] {

  override def zero: VecStatsBuf =
    VecStatsBuf(0L, java.math.BigDecimal.ZERO, Array.empty, Array.empty,
      Array.empty, Array.empty)

  override def reduce(b: VecStatsBuf, in: (Long, Array[Float])): VecStatsBuf = {
    val (id, vec) = in
    val d = vec.length
    if (b.cnt == 0L) {
      b.mean = new Array[Double](d)
      b.m2 = new Array[Double](d)
      b.mn = Array.fill(d)(Double.PositiveInfinity)
      b.mx = Array.fill(d)(Double.NegativeInfinity)
    }
    b.cnt += 1
    b.sumId = b.sumId.add(java.math.BigDecimal.valueOf(id))
    val n = b.cnt
    var i = 0
    while (i < d) {
      val v = vec(i).toDouble
      val pa = b.mean(i)
      val a = pa + (v - pa) / n
      b.mean(i) = a
      b.m2(i) += (v - pa) * (v - a)
      if (v < b.mn(i)) b.mn(i) = v
      if (v > b.mx(i)) b.mx(i) = v
      i += 1
    }
    b
  }

  /** Chan's pairwise merge: exact-count, numerically stable. */
  override def merge(x: VecStatsBuf, y: VecStatsBuf): VecStatsBuf = {
    if (x.cnt == 0L) y
    else if (y.cnt == 0L) x
    else {
      val n = x.cnt + y.cnt
      val d = x.mean.length
      var i = 0
      while (i < d) {
        val delta = y.mean(i) - x.mean(i)
        x.m2(i) += y.m2(i) + delta * delta * x.cnt * y.cnt / n
        x.mean(i) += delta * y.cnt / n
        if (y.mn(i) < x.mn(i)) x.mn(i) = y.mn(i)
        if (y.mx(i) > x.mx(i)) x.mx(i) = y.mx(i)
        i += 1
      }
      x.cnt = n
      x.sumId = x.sumId.add(y.sumId)
      x
    }
  }

  override def finish(b: VecStatsBuf): VecStats =
    VecStats(b.cnt, b.sumId, b.mean, b.m2, b.mn, b.mx)

  override def bufferEncoder: Encoder[VecStatsBuf] = Encoders.product[VecStatsBuf]
  override def outputEncoder: Encoder[VecStats] = Encoders.product[VecStats]
}

object VecStatsAgg {
  /** Untyped column form: vec_stats(idCol, vecCol) usable in groupBy.agg. */
  lazy val vecStats: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new VecStatsAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Float])]())
}
