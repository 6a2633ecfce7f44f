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
    val verbose = sys.env.get("GRAFT_PROFILE_VERBOSE").contains("1")
    val jobs = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      private val jobStartNs =
        new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          jobStartNs.put(j.jobId, System.nanoTime())
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (verbose) Option(jobStartNs.remove(j.jobId)).foreach { t0 =>
          jobLog.add(f"JOB ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
        }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (verbose) jobLog.add(
          s"  STAGE ${s.stageInfo.stageId} ${s.stageInfo.numTasks}t " +
            s"[${s.stageInfo.name.take(60)}] " +
            s.stageInfo.details.linesIterator
              .filter(l => l.contains("graft.") ||
                l.contains("BroadcastExchange") || l.contains("executeTake") ||
                l.contains("SchemaMergeUtils") || l.contains("localCheckpoint"))
              .take(4).mkString(" <- "))
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (verbose) jobLog.add(
          f"  DONE  ${s.stageInfo.stageId} ${s.stageInfo.numTasks}t " +
            f"run=${s.stageInfo.taskMetrics.executorRunTime / 1e3}%.2fs " +
            f"cpu=${s.stageInfo.taskMetrics.executorCpuTime / 1e9}%.2fs " +
            f"[${s.stageInfo.name.take(60)}]")
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
        if (verbose) { Thread.sleep(200); jobLog.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        // listener bus is async; poll until the counters are stable
        // across two reads (round-20 advice: a fixed 150 ms nap
        // undercounts on a loaded box) — bounded so a stuck bus can't
        // hang the profiler
        var prev = (-1, -1, -1L)
        var spins = 0
        while (prev != ((jobs.get, tasks.get, taskTimeMs.get)) && spins < 40) {
          prev = (jobs.get, tasks.get, taskTimeMs.get)
          Thread.sleep(100)
          spins += 1
        }
        (wall, jobs.get, tasks.get, taskTimeMs.get / 1e3)
      }
      val best = samples.minBy(_._1)
      println(f"PROF,$name,${best._1}%.3f,${best._2},${best._3},${best._4}%.2f")
      if (verbose) {
        jobLog.forEach(l => println(l))
        jobLog.clear()
      }
    }
    spark.stop()
  }
}
