package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}

/** d09's contraction tier, measured: run the CC loop over the 10×-lake
  * pair graph with contraction OFF (contractMinEdges = ∞ — what sf0.1
  * exercises, where edge volume never crosses the default 500k
  * threshold) and with contraction ON at the given threshold, assert the
  * label sets identical, and report both wall times + the edge/round
  * profile. `runMain graft.tools.ContractionBench [lakeDir] [threshold]`.
  */
object ContractionBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1_synth")
    val threshold = args.lift(1).map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = graft.Lake.table(spark, dir, "documents")
    println(s"DOCS ${docs.count()}")
    val pairs = Dedup.simhashPairs(
        Dedup.simhash(docs, "doc_id", "text"), "doc_id", maxHamming = 8)
      .persist()
    println(s"EDGES ${pairs.count()}")
    def cc(minEdges: Long, label: String): Set[(Long, Long)] = {
      val t0 = System.nanoTime()
      val out = Graph.connectedComponents(pairs, "a_id", "b_id",
          verbose = true, contractMinEdges = minEdges)
        .select("id", "label").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"CC $label ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(${out.size} vertices, ${out.map(_._2).size} labels)")
      out
    }
    val off = cc(Long.MaxValue, "contraction=off")
    val on = cc(threshold, s"contraction>=$threshold")
    require(off == on, "contracted CC must produce identical labels")
    println(s"COMPONENTS ${off.map(_._2).toSet.size} — labels identical")
    spark.stop()
  }
}
