package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** One-off stage-level breakdown of the LSH/Jaccard pipelines — finds which
  * stage of d03/d04 dominates wall-clock at a given SF.
  */
object Stages {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = graft.Lake.table(spark, sfDir, "documents")
    docs.count()

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep (d03 breakdown)")
      val sets = time("shingleSets+persist") {
        val s = Dedup.shingleSets(docs, "doc_id", "text", 5).persist()
        s.count(); s
      }
      val sigs = time("minhashFromSets+persist") {
        val s = Dedup.minhashFromSets(sets, "doc_id").persist()
        s.count(); s
      }
      val cands = time("lshCandidates") {
        val c = Dedup.lshCandidates(sigs, "doc_id").persist()
        println("  n_cands=" + c.count()); c
      }
      time("jaccardVerifySets") {
        println("  n_out=" + Dedup.jaccardVerifySets(cands, sets, "doc_id").count())
      }
      println(s"--- rep $rep (d04 extra stages)")
      val sh = sets.select(col("doc_id"), explode(col("hs")).as("h"))
      val rare = time("rare-df-agg") {
        val r = sh.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 50).select("h").persist()
        println("  n_rare=" + r.count()); r
      }
      val shr = time("shr semi+persist") {
        val s = sh.join(rare, "h", "left_semi").persist()
        println("  n_shr=" + s.count()); s
      }
      val c4 = time("d04 cand self-join") {
        val c = shr.as("l").join(shr.as("r"),
            col("l.h") === col("r.h") && col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
          .distinct().persist()
        println("  n_cands=" + c.count()); c
      }
      time("d04 verify") {
        println("  n_out=" + Dedup.jaccardVerifySets(c4, sets, "doc_id")
          .filter(col("jaccard") >= 0.8).count())
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
