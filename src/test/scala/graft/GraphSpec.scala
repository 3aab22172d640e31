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

  /** Sequential reference model of the exact-integer PageRank — the
    * same micro-unit floor divisions, computed single-threaded. The
    * distributed op must match it EXACTLY on any graph (that is the
    * whole point of the integer discipline). */
  private def prModel(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val ed = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = ed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = ed.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / deg(s) }.sum).toMap
      pr = contrib.map { case (n, c) => n -> (150000L + 85L * c / 100L) }
    }
    pr
  }

  private def prRun(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRankInt(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRankInt matches the sequential integer model exactly (asymmetric graph)") {
    // hub-and-chain: hub 0 over 4 spokes, a tail hanging off spoke 1 —
    // asymmetric degrees so per-node ranks all differ.
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 5L), (5L, 6L))
    assert(prRun(g, 5) == prModel(g, 5))
  }

  test("pageRankInt: regular graphs rank uniformly; hubs outrank spokes") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val r = prRun(k4, 3)
    assert(r.values.toSet.size == 1) // 3-regular: all ranks identical
    val star = (1L to 6L).map(i => (0L, i))
    val rs = prRun(star, 4)
    assert(rs(0L) > rs(1L) && (1L to 6L).map(rs).toSet.size == 1)
  }

  /** Sequential reference for fixed-depth k-core peeling. */
  private def coreModel(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    var ed = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var deg = ed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    for (_ <- 1 to rounds) {
      val surv = deg.filter(_._2 >= k).keySet
      ed = ed.filter { case (s, d) => surv(s) && surv(d) }
      deg = ed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    }
    deg.filter(_._2 >= k)
  }

  private def coreRun(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] =
    Graph.kCorePeel(edges.toDF("s", "d"), "s", "d", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCorePeel: pendant chain cascades off a K5 core round by round") {
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val chain = Seq((5L, 6L), (6L, 7L), (7L, 8L)) // tail off core node 5
    val g = k5 ++ chain
    // k=4: chain nodes never reach degree 4; the K5 core survives with
    // its internal degree 4 (node 5's tail edge is induced away).
    val got = coreRun(g, 4, 2)
    assert(got == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
    assert(got == coreModel(g, 4, 2))
  }

  test("kCorePeel plans no forced broadcast: induce joins are hint-free anti-joins on the dropped delta") {
    // round-11 verdict item 3: the old broadcast(survivors) hint forced
    // a ~|V|-wide broadcast in round 1 (where survivors ≈ the whole
    // node set — a multi-GB executor OOM at 10^9 nodes). The peel now
    // anti-joins the NEWLY-dropped delta with NO hint, so AQE picks
    // the strategy from the delta's actual runtime size. Pin both
    // facts in the analyzed plan: no ResolvedHint anywhere, and the
    // induce step is anti-join-shaped.
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val g = k5 ++ Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val df = Graph.kCorePeel(g.toDF("s", "d"), "s", "d", 4, 2)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"kCorePeel must not force a join strategy:\n$analyzed")
    assert(analyzed.contains("LeftAnti"),
      s"induce step should anti-join the dropped delta:\n$analyzed")
  }

  test("kCorePeel: fixed depth peels exactly `rounds` cascade steps, not to fixpoint") {
    // triangle + 3-node tail, k=2: each round exposes ONE new tail
    // node below k, so depth controls how far the cascade runs.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    for (r <- 1 to 3)
      assert(coreRun(g, 2, r) == coreModel(g, 2, r), s"rounds=$r")
    // after enough rounds only the triangle remains
    assert(coreRun(g, 2, 3).keySet == Set(1L, 2L, 3L))
  }

  test("kCorePeel: a deep peel crosses the plan-truncation boundary with the model intact") {
    // every 4th round (the BRANCHING boundary — kCorePeel's round plan
    // references the previous frame 3x, so the tree triples per round;
    // the linear boundary of 8 put 3^8 plan copies into the checkpoint
    // round's execution-event string and reproducibly OOM'd the 8g
    // test driver) rebuilds the edge frame as an eager localCheckpoint.
    // A 10-round cascade on a 9-node tail off a triangle crosses the
    // boundary twice: rounds 5-8 read the checkpointed round-4 frame,
    // 9-10 the round-8 one, and the peel must still match the driver
    // model exactly.
    val tail = (3L to 11L).sliding(2).map(w => (w(0), w(1))).toSeq
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++ tail
    for (r <- Seq(8, 9, 10))
      assert(coreRun(g, 2, r) == coreModel(g, 2, r), s"rounds=$r")
    assert(coreRun(g, 2, 10).keySet == Set(1L, 2L, 3L))
  }
}
