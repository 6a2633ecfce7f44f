package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak probe for the connected-components family: builds the d09-shaped
  * simhash pair graph (hamming ≤ 8 over documents) at the given lake dir,
  * prints edge volume, then runs [[graft.operators.Graph.connectedComponents]]
  * VERBOSE so the per-round phase timings, contraction firings, and the
  * local-tail handoff are visible — the artifact behind SCALING.md's
  * round-count/contraction validation rows.
  *
  * args: [sfDir] [maxHamming] [localFinishEdges] [reliable]
  *
  * 4th arg `reliable`: also run the SAME graph through
  * `reliableCheckpoint = true` (checkpoint dir under /tmp) and print
  * both walls — the measured cost of the executor-loss-safe mode's
  * per-round filesystem round-trip (SCALING.md "reliable checkpoint").
  */
object CcSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1_synth")
    val maxHamming = args.lift(1).map(_.toInt).getOrElse(8)
    val localFinish = args.lift(2).map(_.toLong).getOrElse(200000L)
    val alsoReliable = args.lift(3).contains("reliable")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[soak] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Lake.table(spark, sfDir, "documents")
    val pairs = graft.operators.Dedup.simhashPairs(
      graft.operators.Dedup.simhash(docs, "doc_id", "text"), "doc_id",
      maxHamming = maxHamming)
    val p = time("pairs")(pairs.localCheckpoint())
    println("[soak] n_edges=" + p.count())
    val cc = time("cc")(graft.operators.Graph.connectedComponents(
      p, "a_id", "b_id", verbose = true, localFinishEdges = localFinish))
    println("[soak] n_vertices=" + cc.count())
    println("[soak] n_components=" + cc.select("label").distinct().count())
    if (alsoReliable) {
      val dir = java.nio.file.Files.createTempDirectory("graft_cc_soak_ckpt")
      spark.sparkContext.setCheckpointDir(dir.toString)
      val ccR = time("cc-reliable")(graft.operators.Graph.connectedComponents(
        p, "a_id", "b_id", verbose = true, localFinishEdges = localFinish,
        reliableCheckpoint = true))
      println("[soak] reliable n_components=" +
        ccR.select("label").distinct().count())
      // warm local rerun: the first cc run pays JIT + cold page cache,
      // so compare reliable against THIS wall, not the first one
      val cc2 = time("cc-local-warm")(graft.operators.Graph
        .connectedComponents(p, "a_id", "b_id",
          localFinishEdges = localFinish))
      println("[soak] warm n_components=" +
        cc2.select("label").distinct().count())
    }
    spark.stop()
  }
}
