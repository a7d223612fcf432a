package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangles counts each triangle once on known graphs") {
    // K4 has C(4,3)=4 triangles; a dangling edge adds none
    val k4 = for {
      u <- 1L to 4L; v <- 1L to 4L if u < v
    } yield (u, v)
    val edges = (k4 :+ ((4L, 9L))).toDF("u", "v")
    val got = Graph.triangles(edges).collect().head.getLong(0)
    assert(got == 4L, s"K4 + dangling edge: expected 4 triangles, got $got")
  }

  test("triangles: star graph has none, empty graph yields zero row") {
    val star = (2L to 6L).map(v => (1L, v)).toDF("u", "v")
    assert(Graph.triangles(star).collect().head.getLong(0) == 0L)
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(Graph.triangles(empty).collect().head.getLong(0) == 0L)
  }
}
