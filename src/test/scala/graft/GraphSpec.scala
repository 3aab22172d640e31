package graft

import graft.operators.Graph
import org.apache.spark.sql.DataFrame

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Long =
    Graph.triangleCount(edges.toDF("s", "d"), "s", "d")
      .collect()(0).getLong(0)

  test("triangleCount: K4 has 4 triangles, a path has none") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(count(k4) == 4L)
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0L)
  }

  test("triangleCount: triangle with pendant edges counts exactly one") {
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))) == 1L)
  }

  test("triangleCount: self-loops are dropped, not counted as wedge mass") {
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 2L))) == 1L)
  }

  test("triangleCount: two disjoint triangles plus a bridge") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    assert(count(e) == 2L)
  }

  test("triangleCount: a hub star closes only the planted rim edges") {
    // hub 0 to 10 spokes; rim edges 1-2 and 3-4 close 2 triangles.
    // The degree orientation emits wedges from the LOW-degree spokes,
    // so the hub never pairs its full neighborhood.
    val star = (1L to 10L).map(i => (0L, i))
    assert(count(star ++ Seq((1L, 2L), (3L, 4L))) == 2L)
  }

  test("triangleCount: empty edge set returns a zero row, not an empty frame") {
    val empty: DataFrame = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(Graph.triangleCount(empty, "s", "d").collect()(0).getLong(0) == 0L)
  }
}
