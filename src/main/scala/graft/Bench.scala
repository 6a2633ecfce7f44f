package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, ONE JSON line on stdout.
  *
  * Self-diagnosing: the build box is multi-tenant (observed 3× swings
  * run-to-run for identical code), so the artifact records the 1-minute
  * load average at start/end and EVERY raw sample per query — a reader can
  * spot external-load noise without re-running. Each query is timed
  * best-of-2 with the SQL cache cleared between runs; a query whose best
  * is still > 20 s gets a THIRD sample (slow samples are exactly the ones
  * that need de-noising — the round-2 harness skipped the repeat above
  * 20 s and turned the noisiest entries into single-shot numbers).
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
    // ERROR, not WARN: repeated session-level WARNs (function re-register,
    // nanos-timestamp notes) land on stdout and compete with the contract
    // line for the consumer's bounded tail window
    spark.sparkContext.setLogLevel("ERROR")
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadAvg
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
    def fmt(d: Double): String = f"$d%.3f"
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val two = Seq(once(fn), once(fn))
      val samples = if (two.min > 20.0) two :+ once(fn) else two
      (name, samples.min, samples)
    }
    val qs = results.map { case (k, v, _) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", "}")
    val samplesJson = results
      .map { case (k, _, s) => s"\"$k\":[${s.map(fmt).mkString(",")}]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val loadEnd = loadAvg
    // The raw-sample blob goes to a SIDE FILE, not the stdout line: the
    // driver captures only a bounded tail of stdout, and a 74-query samples
    // map pushed the round-3 JSON line past that window — the driver then
    // failed to parse any bench result at all. The stdout contract line
    // stays small (per-query best times only) and prints FIRST: a failed
    // side-file write must never cost the contract line a full bench run
    // already paid for.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","load_avg_start":${fmt(loadStart)},"load_avg_end":${fmt(loadEnd)},"samples_file":"BENCH_SAMPLES.json"}""")
    try
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SAMPLES.json"),
        s"""{"sf":"$sfDir","load_avg_start":${fmt(loadStart)},"load_avg_end":${fmt(loadEnd)},"samples":$samplesJson}""".getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"BENCH_SAMPLES.json write failed: $e") }
    spark.stop()
  }
}
