package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames — the
  * companion to [[Dedup.connectedComponents]]'s label propagation:
  * where components answer "which docs are transitively tied", these
  * answer local-structure questions (triangle mass = how clique-ish a
  * co-engagement neighborhood is — the classic community/spam signal:
  * organic interest graphs close triangles, scripted farms don't).
  *
  * Algorithms are the published distributed forms: triangle counting
  * via the COMPACT-FORWARD / degree-ordered wedge join (Suri &
  * Vassilvitskii, "Counting triangles and the curse of the last
  * reducer", WWW 2011) — wedges are generated from each edge's LOWER-
  * degree endpoint so a power-law hub never materializes its full
  * neighborhood square.
  */
object Graph {

  /** Exact global + per-node triangle counts over an undirected edge
    * list. PRECONDITION (the phash unique-id lesson, documented
    * because violations corrupt counts silently): canonical simple
    * edges — `src < dst`, no duplicates. Self-loops are dropped by a
    * narrow filter here; duplicate edges are the caller's contract
    * (every producer in this repo emits them from a distinct/groupBy,
    * so re-distincting here would buy a redundant shuffle).
    *
    * Wedge join on the degree-ordered orientation: orient each edge
    * toward the higher (degree, id) endpoint; each node then emits
    * wedges only over its OUT-neighbors (≤ O(m^{1/2}) per node on any
    * graph — the curse-of-the-last-reducer fix), and a wedge (a→b,
    * a→c) closes iff oriented edge b→c exists — ONE equi-join against
    * the oriented edge set. Two shuffles total (wedge build + close
    * join), both on edge keys, never a neighborhood cross product
    * outside the bounded out-degree.
    *
    * Output: one row — n_triangles (exact long). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val s = col(srcCol)
    val d = col(dstCol)
    val e = edges.select(s.as("_a"), d.as("_b")).filter(col("_a") =!= col("_b"))
    // degree per endpoint (both directions), then the (degree, id)
    // total order that makes the orientation acyclic and balanced.
    val deg = e.select(col("_a").as("_n")).unionAll(e.select(col("_b").as("_n")))
      .groupBy(col("_n")).agg(count(lit(1)).as("_deg"))
    val withDeg = e
      .join(deg.select(col("_n").as("_a"), col("_deg").as("_da")), Seq("_a"))
      .join(deg.select(col("_n").as("_b"), col("_deg").as("_db")), Seq("_b"))
    val oriented = withDeg.select(
      when(col("_da") < col("_db") ||
        (col("_da") === col("_db") && col("_a") < col("_b")), col("_a"))
        .otherwise(col("_b")).as("_lo"),
      when(col("_da") < col("_db") ||
        (col("_da") === col("_db") && col("_a") < col("_b")), col("_b"))
        .otherwise(col("_a")).as("_hi"))
    val wedges = oriented.select(col("_lo"), col("_hi").as("_w1"))
      .join(oriented.select(col("_lo"), col("_hi").as("_w2")), Seq("_lo"))
      .filter(col("_w1") < col("_w2"))
    val closing = oriented.select(
      least(col("_lo"), col("_hi")).as("_w1"),
      greatest(col("_lo"), col("_hi")).as("_w2"))
    wedges.join(closing, Seq("_w1", "_w2"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
