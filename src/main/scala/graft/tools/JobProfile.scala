package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import graft.SparkEntry

/** Per-query cost anatomy: wall seconds, number of Spark jobs (sequential
  * action round-trips), number of tasks, and summed executor task time.
  * Separates "many sequential actions" (store protocols) from "heavy
  * compute" (task time ~ wall × cores) from "driver/planning overhead"
  * (wall ≫ task time with few jobs). `runMain graft.tools.JobProfile
  * [reps] [query...]` — no args profiles every SparkEntry query.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Lake.tableNames.foreach(t =>
      graft.Lake.table(spark, sfDir, t).limit(1).count())
    println("query,wall_s,jobs,tasks,task_time_s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val samples = (1 to reps).map { _ =>
        jobs.set(0); tasks.set(0); taskTimeMs.set(0L)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        // listener bus is async; give it a beat to drain before reading
        Thread.sleep(150)
        (wall, jobs.get, tasks.get, taskTimeMs.get / 1e3)
      }
      val best = samples.minBy(_._1)
      println(f"PROF,$name,${best._1}%.3f,${best._2},${best._3},${best._4}%.2f")
    }
    spark.stop()
  }
}
