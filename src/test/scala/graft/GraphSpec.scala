package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain + clique + isolated pair resolve to min-id components") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain
      (10L, 11L), (11L, 12L), (10L, 12L),             // triangle
      (20L, 21L)))                                     // pair
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges (pointer jumping beats diameter)") {
    // 60-node path: plain propagation would need 60 rounds > maxIter;
    // neighbor-min + double jump must close it within the default cap
    val labels = cc((0L until 60L).map(i => (i, i + 1)))
    assert(labels.size == 61 && labels.values.forall(_ == 0L))
  }

  test("reversed ids and duplicate edges are harmless") {
    val labels = cc(Seq((5L, 3L), (3L, 5L), (5L, 3L), (9L, 5L)))
    assert(labels == Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  test("empty edge set yields empty labels") {
    val empty = Seq.empty[(Long, Long)]
    assert(cc(empty).isEmpty)
  }

  test("contraction on and off produce identical labels") {
    val edges = ((0L until 40L).map(i => (i, i + 1)) ++       // path
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 300L))).toDF("a", "b")
    val always = Graph.connectedComponents(edges, "a", "b",
        contractMinEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val never = Graph.connectedComponents(edges, "a", "b",
        contractMinEdges = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(always === never)
  }
}
