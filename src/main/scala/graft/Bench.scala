package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, ONE JSON line on stdout.
  *
  * Each query is timed best-of-2 with the SQL cache cleared between runs:
  * the build box is multi-tenant (observed 3× swings run-to-run for
  * identical code), so a single cold sample conflates external load with
  * query cost; the min of two cold runs is a far tighter estimator. The
  * second run is skipped once a query exceeds 20 s — the repeat exists to
  * de-noise, not to double the wall-clock of the slowest entries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-footer paths so the first measured
    // query isn't charged session startup.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      graft.Lake.tableNames.foreach(t =>
        graft.Lake.table(spark, sfDir, t).limit(1).count())
    } catch { case _: Throwable => () }
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink: fully evaluates every output column. A bare count()
      // would let Catalyst PRUNE the computed projections of narrow
      // row-local queries and time little more than the scan.
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache() // keep every run cold
      t
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t1 = once(fn)
      name -> (if (t1 < 20.0) math.min(t1, once(fn)) else t1)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
