package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRankFixed: hand-computed integer ranks on a path graph") {
    // path a(1) — b(2) — c(3), symmetric edges; scale 1e6, 3 rounds.
    // r1: a=575000 b=1850000 c=575000
    // r2: a=936250 b=1127500 c=936250
    // r3: a=150000+floor(85·1127500/200)=629187
    //     b=150000+2·floor(85·936250/100)=1741624  (floor eats the .5s)
    val pairs = Seq((1L, 2L), (2L, 3L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRankFixed(edges, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(
      1L -> (1L, 629187L), 2L -> (2L, 1741624L), 3L -> (1L, 629187L)))
  }

  test("pageRankFixed: rank mass concentrates on the hub of a star") {
    val spokes = (2L to 6L)
    val pairs = spokes.map(s => (1L, s))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRankFixed(edges, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(spokes.forall(s => got(1L) > got(s)), "hub must outrank spokes")
    assert(spokes.map(got).toSet.size === 1, "spokes are symmetric")
    // determinism under repartitioning — the point of the integer form
    val again = Graph.pageRankFixed(edges.repartition(7), iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(again === got)
  }

  test("labelPropagation: dense cores separate where CC would merge, ties go min") {
    // two triangles {1,2,3} and {4,5,6} joined by ONE bridge edge 3—4:
    // connected components would glue all six; LPA keeps two communities
    // (each bridge endpoint hears 2 in-triangle votes vs 1 across).
    val tri1 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val tri2 = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val pairs = tri1 ++ tri2 ++ Seq((3L, 4L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // min-label tie-break drives both triangles to their smallest member
    assert(got(1L)._1 === got(2L)._1 && got(2L)._1 === got(3L)._1)
    assert(got(4L)._1 === got(5L)._1 && got(5L)._1 === got(6L)._1)
    assert(got(1L)._1 !== got(4L)._1, "bridge must not merge the triangles")
    assert(got(1L)._2 === 3L && got(4L)._2 === 3L, "community sizes")
    // determinism under repartitioning — the tie-break is a total order
    val again = Graph.labelPropagation(edges.repartition(5), iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(again === got)
  }

  test("labelPropagation keeps every vertex on directed/asymmetric input") {
    // the r11 review finding: the old inner-join re-keying dropped any
    // vertex without in-edges each round — a directed path 1→2→3 lost all
    // three vertices by round 3 and returned EMPTY. The r12 formulation
    // (own-label n=0 candidate unioned into every round's counts) keeps
    // the full endpoint set {1, 2, 3}: no-in-edge vertices keep their
    // label, receivers propagate down the path.
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.labelPropagation(directed, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got.keySet === Set(1L, 2L, 3L),
      s"asymmetric input must not lose vertices: $got")
    assert(got(1L) === 1L, "no in-edges → keeps its own label")
    assert(got(2L) === 1L && got(3L) === 1L,
      "labels flow down the directed path")
  }

  test("sharedChunkEdges: chunk-sharing docs link, hot groups capped, symmetric") {
    val shared16 = (1 to 16).map(i => s"s$i").mkString(" ")
    val boiler16 = (1 to 16).map(i => s"b$i").mkString(" ")
    val docs = (Seq(
      (1L, shared16 + " unique one"),
      (2L, shared16 + " unique two"),
      (3L, "totally different words here")) ++
      // 4 docs sharing a boilerplate chunk — capped out at maxGroup=3
      (10L to 13L).map(i => (i, boiler16 + s" filler$i"))
    ).toDF("doc_id", "text")
    val edges = Graph.sharedChunkEdges(docs, "text", "doc_id",
      chunkSize = 16, maxGroup = 3)
      .as[(Long, Long)].collect().toSet
    assert(edges === Set((1L, 2L), (2L, 1L)),
      "only the within-cap shared chunk links; boilerplate group is capped")
  }
}
