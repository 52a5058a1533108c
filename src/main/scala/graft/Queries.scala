package graft

/** Shared query constants: the fixed vicinity-query vector (a rounded copy
  * of sf0.01 vec_id=0, embedded as a literal so Spark and the DuckDB
  * oracle see the exact same doubles) and its SQL literal form. */
object QueryConstants {
  val Q64: Seq[Double] = Seq(
    0.054, 0.106, -0.038, -0.252, 0.2, -0.097, -0.078, -0.015, 0.164,
    0.028, 0.04, -0.028, -0.193, -0.07, -0.027, -0.032, -0.022, 0.084,
    0.007, 0.12, -0.245, -0.167, 0.151, -0.05, -0.077, 0.295, 0.076,
    -0.075, 0.031, 0.225, 0.112, 0.27, -0.17, -0.257, 0.008, -0.035,
    -0.009, 0.023, 0.012, 0.043, 0.085, -0.014, -0.145, -0.036, 0.025,
    0.109, 0.062, -0.137, 0.143, -0.128, 0.021, 0.241, 0.078, -0.125,
    0.054, 0.006, 0.047, 0.038, -0.176, -0.126, -0.054, 0.012, 0.105,
    -0.258)

  val Q64f: Seq[Float] = Q64.map(_.toFloat)

  /** DuckDB DOUBLE[] literal of Q64. */
  val Q64Sql: String = Q64.mkString("CAST([", ", ", "] AS DOUBLE[])")

  /** Vicinity radius (≈1-5% selectivity across sf). */
  val Radius = 1.25

  /** L-inf box half-width for the box-search query (≈4% selectivity). */
  val BoxDomain = 0.35

  /** DuckDB expression for euclidean distance of `embedding` to Q64 in
    * float64 — matches Spark's zip_with/aggregate fold semantics. */
  val DistSql: String = s"list_distance(CAST(embedding AS DOUBLE[]), $Q64Sql)"

  /** Target language mixture for p4_rebalance. DYADIC shares: decimal →
    * double conversion is exact in both engines, so the derived
    * per-domain keep rates (target·K/count) are bit-identical. */
  val RebalanceTargets: Seq[(String, Double)] = Seq(
    "en" -> 0.25, "de" -> 0.25, "fr" -> 0.1875, "es" -> 0.1875,
    "zh" -> 0.125)

  /** The same targets as a DuckDB VALUES list. */
  val RebalanceTargetsSql: String = RebalanceTargets
    .map { case (l, t) => s"('$l', CAST($t AS DOUBLE))" }
    .mkString(", ")
}
