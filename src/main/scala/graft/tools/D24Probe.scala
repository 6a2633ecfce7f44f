package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns
import graft.operators.Dedup

/** One-off wall breakdown of the d24 pipeline's sequential barriers —
  * which of the chained materializations owns the ~2.5 s wall. Scratch
  * measurement tool (round 21), same spirit as [[Stages]].
  */
object D24Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"D24 $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val d = graft.Lake.spread(
      graft.Lake.table(spark, sfDir, "documents"), col("doc_id"))
    d.limit(1).count()
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val hashed = time("hashed-ckpt") {
        d.select(col("doc_id"), col("text"),
          md5(col("text")).as("content_hash")).localCheckpoint()
      }
      val exact = hashed.groupBy("content_hash")
        .agg(min("doc_id").as("rep_id"))
      val mapped = hashed.select("doc_id", "content_hash")
        .join(exact, "content_hash").select("doc_id", "rep_id")
      val reps = hashed.join(
        exact.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      val pairs = time("pairs-build") { Dedup.simhashPairs(
        Dedup.simhash(reps, "doc_id", "text"), "doc_id", maxHamming = 4) }
      val cc = time("cc") { graft.operators.Graph
        .connectedComponents(pairs, "a_id", "b_id") }
      val scored = reps
        .select(col("doc_id"), TextFns.words(col("text")).as("__ws"))
        .select(col("doc_id"),
          TextFns.qualityScoreFromWords(col("__ws")).as("quality_score"))
        .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("label"), col("doc_id")))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("quality_score").desc, col("doc_id").asc)
      val repInfo = scored
        .withColumn("keeper_id", first("doc_id").over(w))
        .select(col("doc_id").as("rep_id"), col("cluster_id"),
          col("keeper_id"))
      val out = mapped.join(repInfo, "rep_id")
        .select(col("doc_id"), col("rep_id"), col("cluster_id"),
          col("keeper_id"), (col("doc_id") === col("keeper_id")).as("survives"))
        .orderBy("doc_id")
      time("final-save") {
        out.write.mode("overwrite").format("noop").save()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
