package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate pair graph (the edge
  * relations the dedup family already produces — LSH-verified Jaccard
  * pairs, containment pairs, cosine pairs). [[Dedup.clusterIds]] gives
  * connected components; this adds local-structure operators.
  */
object Graphs {

  /** TRIANGLE ENUMERATION — all (a < b < c) with the three edges
    * (a,b), (b,c), (a,c) present. Triangles measure cluster COHESION:
    * a dedup component that is a chain of borderline pairs (zero
    * triangles) is a different animal from a clique of mutual
    * near-copies, and transitive keep-first deletion is only safe in
    * the latter (the d12 clusters tell you the component, this tells
    * you how solid it is).
    *
    * `edges` must be canonical (a < b, unique). The plan is the
    * standard two-join enumeration: wedges (a,b)+(b,c) keyed on the
    * middle vertex, closed by an (a,c) hash join — each a keyed equi
    * join, no cross product. At corpus scale the classic refinement is
    * to orient edges by (degree, id) instead of raw id so the wedge
    * key is never a global hub; the dedup graphs this serves are
    * already df-capped upstream ([[Dedup]]'s maxShingleDf / giant-
    * bucket caps bound any vertex's degree), so id orientation is
    * sufficient here. */
  def triangles(edges: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val wedges = e.join(
      e.select(col("a").as("b"), col("b").as("c")), "b")
    wedges.join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-vertex degree of a canonical (a < b) edge relation. */
  def degrees(edges: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame =
    edges.select(col(aCol).as("node"))
      .unionAll(edges.select(col(bCol).as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
}
