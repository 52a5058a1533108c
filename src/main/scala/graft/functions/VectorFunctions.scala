package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar functions built purely from Catalyst built-in
  * (codegen-friendly) higher-order functions — no UDFs, so predicate
  * pushdown / whole-stage codegen apply and DuckDB oracles can mirror the
  * semantics exactly.
  *
  * Semantics reproduce the reference's distance/box predicates:
  *  - exact euclidean distance re-check: MempryVectorIndex.Tests/MemoryVectorIndexTests.cs:209-217
  *  - squared-distance budget form:      MemoryVectorIndex/MemoryVectorIndex.cs:262
  *  - box-interval predicate:            DDL.sql:249-253,275-278,290-293
  *
  * All arithmetic is promoted to double (float32 storage, float64 math)
  * to match SQL Server's `real` + internal double aggregation and DuckDB.
  */
object VectorFunctions {

  /** Element-wise (a-b)^2 summed: squared L2 distance, computed in double.
    * Native codegen'd kernel (VectorExpressions); same left-to-right
    * float64 fold as the declarative `zip_with`+`aggregate` form. */
  def distSq(a: Column, b: Column): Column = VectorExpressions.vecDistSq(a, b)

  /** Euclidean distance sqrt(sum((a_i-b_i)^2)), in double. */
  def dist(a: Column, b: Column): Column = sqrt(distSq(a, b))

  /** Dot product in double (native codegen'd kernel). */
  def dot(a: Column, b: Column): Column = VectorExpressions.vecDot(a, b)

  /** L2 norm in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity dot(a,b)/(|a||b|); 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0d, lit(0d)).otherwise(d / n)
  }

  /** Literal ARRAY<FLOAT> column from a Scala float array (query vectors). */
  def floatVec(v: Seq[Float]): Column =
    array(v.map(x => lit(x)): _*)

  /** Literal ARRAY<DOUBLE> column. */
  def doubleVec(v: Seq[Double]): Column =
    array(v.map(x => lit(x)): _*)

  /** Box-interval containment: every component of `vec` within
    * [q_i - domain, q_i + domain] (the L-inf over-approximation the SQL
    * search uses per split dimension, DDL.sql:249-253). */
  def inBox(vec: Column, q: Column, domain: Column): Column =
    forall(
      zip_with(vec, q, (x, c) =>
        (x.cast("double") >= c.cast("double") - domain.cast("double")) &&
        (x.cast("double") <= c.cast("double") + domain.cast("double"))),
      b => b)

  /** Vector length validation (MemoryVectorIndex.cs:105-108). */
  def hasDim(vec: Column, d: Int): Column = size(vec) === d

  // L2 unit-normalization lives in VectorStats.l2Normalize (DataFrame
  // level): the norm must be projected into a column BEFORE the per-
  // element lambda, or it re-evaluates O(d) work per element.
}
