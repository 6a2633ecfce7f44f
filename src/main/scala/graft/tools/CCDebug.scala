package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}

/** One-off d09/s05 breakdown: stage costs and CC round count. */
object CCDebug {
  def t[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = graft.Lake.table(spark, sfDir, "documents")
    docs.count()
    val pairs = t("simhashPairs") {
      val p = Dedup.simhashPairs(
        Dedup.simhash(docs, "doc_id", "text"), "doc_id", maxHamming = 8)
        .persist()
      println("  n_pairs=" + p.count()); p
    }
    val labels = t("cc-loop") {
      Graph.connectedComponents(pairs, "a_id", "b_id", verbose = true)
    }
    t("nComp") {
      println("  nComp=" + labels.select("label").distinct().count())
    }

    // s05 breakdown
    import graft.functions.VectorFns
    VectorFns.register(spark)
    val ev = graft.Lake.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        VectorFns.toDoubleArray(col("embedding")).as("vec"))
    val carr = t("s05-centroids") {
      val cent = ev.select(col("label"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg((sum(col("x").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("m"))
      val c = cent.groupBy("label")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvec"))
        .select(col("label").cast("long").as("centroid_id"), col("cvec"))
        .persist()
      println("  n_centroids=" + c.count()); c
    }
    val assigned = t("s05-assign") {
      val a = graft.operators.Similarity.ivfAssign(
        ev.select(col("vec_id"), col("vec")), carr)
      println("  n_assigned=" + a.count()); a
    }
    t("s05-confusion") {
      println("  n=" + assigned.select(col("vec_id"), col("centroid_id"))
        .join(ev.select(col("vec_id"), col("label")), "vec_id")
        .groupBy(col("label").cast("int").as("label"),
          col("centroid_id").cast("int").as("pred_label"))
        .agg(count(lit(1)).as("n")).count())
    }
    spark.stop()
  }
}
