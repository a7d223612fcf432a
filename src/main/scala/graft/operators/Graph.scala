package graft.operators

import graft.operators.Caching.TrackedDf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair/edge tables (co-purchase, co-citation,
  * near-dup link graphs). Iterative label propagation lives in
  * [[Dedup.clusters]]; integer PageRank in the registered
  * `graph_pagerank` query; here are the one-shot structural queries.
  */
object Graph {

  /** Exact triangle count via degree-ordered edge orientation — the
    * clustering-coefficient numerator, and the classic example of a
    * graph query whose naive plan (three-way self-join) explodes on
    * hub nodes while the oriented plan stays bounded.
    *
    * Each undirected edge is oriented from its (degree, id)-smaller
    * endpoint to the larger; every triangle then has exactly ONE
    * wedge s→x, s→y with both arrows leaving its minimum-degree
    * vertex, so counting (wedge ⋉ closing edge) counts each triangle
    * once. 100 TB path: out-degree under this orientation is
    * O(√m) even for a star's hub (a hub's edges point INTO it), so
    * the wedge join materializes O(Σ outdeg²) = O(m^1.5) rows
    * worst-case instead of the hub-degree² blowup; the closing-edge
    * check is a semi join (no payload), and every join is a hash
    * join on node keys.
    *
    * @param pairs distinct undirected edges as (u, v) with u < v
    * @return one row: n_triangles
    */
  def triangles(pairs: DataFrame): DataFrame = {
    // persisted: the edge list feeds the degree agg, the orientation
    // join, AND the closing-edge probe — without this the (possibly
    // expensive) upstream pair-mining subtree runs three times. Slim
    // rows: two node ids per edge.
    val es = pairs.select(col("u"), col("v"))
      .persistTracked
    val deg = es.select(col("u").as("node"))
      .unionByName(es.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val keyed = es
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    // persisted: the oriented edge list feeds both wedge sides and is
    // the probe target for the closing-edge semi join
    val o = keyed.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"))
      .persistTracked
    val wedges = o.as("o1").join(o.as("o2"),
      col("o1.s") === col("o2.s") && col("o1.t") < col("o2.t"))
      .select(col("o1.t").as("x"), col("o2.t").as("y"))
    wedges
      .join(es.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
