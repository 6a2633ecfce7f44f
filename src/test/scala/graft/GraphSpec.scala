package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // default path — these sizes all take the one-task local finish
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // forced THROUGH the distributed BSP loop (no local finish)
  private def ccDist(edges: Seq[(Long, Long)],
                     contractMinEdges: Long = 500000L,
                     localFinishEdges: Long = 0L): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b",
        contractMinEdges = contractMinEdges,
        localFinishEdges = localFinishEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val mixed = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain
    (10L, 11L), (11L, 12L), (10L, 12L),                 // triangle
    (20L, 21L))                                          // pair
  private val mixedExpect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)

  test("null/unparseable endpoint ids fail LOUDLY on both size paths") {
    // a silent cast-to-null would crash the local finish's non-nullable
    // encoder (opaque) but ride the distributed path as a (null, null)
    // label row that never equi-joins — components back SPLIT, no error.
    // Same input must fail the same named way regardless of edge count.
    val junk = Seq(("1", "2"), ("doc_17", "3")).toDF("a", "b")
    val eLocal = intercept[IllegalArgumentException] {
      Graph.connectedComponents(junk, "a", "b").collect()
    }
    assert(eLocal.getMessage.contains("unparseable"))
    val eDist = intercept[IllegalArgumentException] {
      Graph.connectedComponents(junk, "a", "b",
        localFinishEdges = 0L).collect()
    }
    assert(eDist.getMessage.contains("unparseable"))
  }

  test("chain + clique + isolated pair resolve to min-id components") {
    assert(cc(mixed) == mixedExpect)
  }

  test("distributed loop matches the local finish on the same graph") {
    assert(ccDist(mixed) == mixedExpect)
  }

  test("long chain converges distributed (pointer jumping beats diameter)") {
    // 60-node path: plain propagation would need 60 rounds > maxIter;
    // neighbor-min + double jump must close it within the default cap
    val labels = ccDist((0L until 60L).map(i => (i, i + 1)))
    assert(labels.size == 61 && labels.values.forall(_ == 0L))
  }

  test("reversed ids and duplicate edges are harmless (both paths)") {
    val edges = Seq((5L, 3L), (3L, 5L), (5L, 3L), (9L, 5L))
    val expect = Map(3L -> 3L, 5L -> 3L, 9L -> 3L)
    assert(cc(edges) == expect)
    assert(ccDist(edges) == expect)
  }

  test("empty edge set yields empty labels") {
    val empty = Seq.empty[(Long, Long)]
    assert(cc(empty).isEmpty)
  }

  test("contraction on and off produce identical labels") {
    val edges = ((0L until 40L).map(i => (i, i + 1)) ++       // path
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 300L)))
    val always = ccDist(edges, contractMinEdges = 0L)
    val never = ccDist(edges, contractMinEdges = Long.MaxValue)
    assert(always === never)
  }

  test("contract-then-local-tail composes the remaining merges") {
    // contraction fires every round (contractMinEdges=0); a small
    // localFinishEdges lets the LOCAL TAIL take over mid-loop once the
    // super-graph shrinks under it — labels must still be the exact
    // min-id components (the 41-node-path shape that pins jump
    // consistency under contraction)
    val edges = ((0L until 41L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (200L, 300L)))
    val tailed = ccDist(edges, contractMinEdges = 0L, localFinishEdges = 10L)
    val reference = ccDist(edges, contractMinEdges = Long.MaxValue)
    assert(tailed === reference)
    assert(tailed.values.toSet === Set(0L, 100L, 200L))
  }

  test("reliable-checkpoint mode matches local-checkpoint labels (both paths)") {
    // the cluster mode: every per-round lineage truncation goes through
    // setCheckpointDir + checkpoint() instead of executor-pinned blocks.
    // Same graph through the BSP loop AND the forced-contraction path in
    // both modes must label identically; without a checkpoint dir the
    // flag must fail fast instead of dying mid-loop in round 1.
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    val chain = (0L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L))
    def ccReliable(contract: Long): Map[Long, Long] =
      Graph.connectedComponents(chain.toDF("a", "b"), "a", "b",
          contractMinEdges = contract, localFinishEdges = 0L,
          reliableCheckpoint = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    intercept[IllegalArgumentException] { ccReliable(0L) } // no dir yet
    spark.sparkContext.setCheckpointDir(dir.toString)
    def rddDirs(): Seq[String] = {
      val buf = scala.collection.mutable.ListBuffer.empty[String]
      val s = java.nio.file.Files.walk(dir)
      try s.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("rdd-")) buf += n
      }
      finally s.close()
      buf.toList
    }
    try {
      assert(ccReliable(Long.MaxValue) === ccDist(chain)) // plain BSP
      // the reliable rounds hit the configured dir, and the
      // PeriodicCheckpointer cleanup kept ONLY the returned table's
      // backing file — an unmanaged loop leaves 2 dirs per round
      assert(rddDirs().size === 1, rddDirs())
      assert(ccReliable(0L) ===
        ccDist(chain, contractMinEdges = 0L)) // contraction engaged
      assert(rddDirs().size === 2, rddDirs()) // one more, not round-many
      // abort path: a no-fixpoint failure cleans up EVERYTHING it wrote
      // (labels queue AND the edge-checkpoint slot) instead of leaking
      // round-many reliable dirs on the checkpoint filesystem
      intercept[IllegalArgumentException] {
        Graph.connectedComponents(chain.toDF("a", "b"), "a", "b",
          maxIter = 1, contractMinEdges = 0L, localFinishEdges = 0L,
          reliableCheckpoint = true).collect()
      }
      assert(rddDirs().size === 2, rddDirs()) // unchanged by the abort
    } finally spark.sparkContext.setCheckpointDir(null)
  }
}
