package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Scratch micro-benchmarks (s05 centroid stage variants). */
object Scratch {
  def t[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
    val ev = graft.Lake.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        VectorFns.toDoubleArray(col("embedding")).as("vec"))
    t("ev.count")(ev.count())
    val dims = ev.select(col("label"), posexplode(col("vec")).as(Seq("pos", "x")))
    t("posexplode.count")(println("  n=" + dims.count()))
    t("group-sum-double") {
      dims.groupBy("label", "pos").agg(sum(col("x"))).count()
    }
    t("group-sum-decimal") {
      dims.groupBy("label", "pos")
        .agg(sum(col("x").cast("decimal(28,12)"))).count()
    }
    t("group-sum-decimal18") {
      dims.groupBy("label", "pos")
        .agg(sum(col("x").cast("decimal(18,12)"))).count()
    }
    (1 to 3).foreach { i =>
      t(s"s05-full-$i") {
        println("  rows=" + graft.queries.DataQueries2
          .s05CentroidClassify(spark, sfDir).count())
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
