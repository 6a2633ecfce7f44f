package graft.tools

import org.apache.spark.SparkEnv
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Failure-injection gate for the INGEST store path — the executor-kill
  * analogue of [[CcFailover]], aimed at [[graft.streaming.Ingest
  * .ingestBatchCommit]] + [[graft.sources.AtomicStore]] instead of the CC
  * loop. The ingest commit's whole durability story (data files first,
  * manifest by atomic rename, CAS against a racing base, idempotent
  * replay via the novelty probes) is argued in the docs and pinned by
  * single-JVM specs; this gate provides the real-process evidence: a
  * `local-cluster[2,1,1536]` session (separate executor JVMs) feeds
  * waves of documents — planted exact duplicates, sub-gate short docs —
  * through the durable wave commit, and once the loop is mid-flight a
  * killer job `System.exit`s whichever task lands on executor 0. Task
  * retries land on the surviving executor, a replacement JVM joins, any
  * wave whose JOB died is replayed by the driver (the checkpointed-
  * streaming contract: replay is idempotent because committed docs fail
  * the novelty probe), and the final store must equal the clean
  * [[graft.streaming.Ingest.ingestFold]] of the same arrivals exactly —
  * row for row, including wave attribution.
  *
  * Exits nonzero (an assertion) if the stores differ OR no executor was
  * actually removed (the kill must land mid-run to count — rerun with a
  * lower killAfterJobs if the loop finished first). Same launch contract
  * as CcFailover:
  *
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt -batch "runMain graft.tools.IngestFailover"
  * }}}
  *
  * Two regimes via the 4th arg (task retry budget):
  *  - default (4): Spark absorbs the kill INSIDE the wave job — task
  *    retries land on the surviving executor, the commit publishes, and
  *    the driver replay path stays cold (replays=0 is expected);
  *  - 1: the first lost task aborts the whole wave job, so the kill is
  *    guaranteed to surface as a FAILED wave and the driver-level replay
  *    (the streaming runtime's checkpoint-replay contract) must carry the
  *    run — the gate asserts replays >= 1 in this mode.
  *
  * args: [nDocs] [nWaves] [killAfterJobs] [taskMaxFailures]
  */
object IngestFailover {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(40000)
    val nWaves = args.lift(1).map(_.toInt).getOrElse(6)
    val killAfterJobs = args.lift(2).map(_.toInt).getOrElse(8)
    val taskMaxFailures = args.lift(3).map(_.toInt).getOrElse(4)
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster needs SPARK_HOME (the worker launches executor JVMs " +
        "through it): SPARK_HOME=/opt/spark sbt ...")
    val storeDir = java.nio.file.Files.createTempDirectory("graft_ing_failover")
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1536]")
      .appName("ingest-failover")
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" "))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.task.maxFailures", taskMaxFailures)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobsDone = 0
    @volatile var executorsRemoved = 0
    @volatile var processKilled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobsDone += 1
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        executorsRemoved += 1
        println(s"[ing-failover] executor ${e.executorId} removed: ${e.reason}")
      }
      override def onTaskStart(e: org.apache.spark.scheduler
          .SparkListenerTaskStart): Unit = {
        // replay regime: the kill must land while a wave TASK is in
        // flight, or Spark has nothing to fail — a separate killer JOB
        // can't do that on 1-core executors (its task queues behind the
        // wave task it means to interrupt), so the driver destroys the
        // executor OS processes directly at a task-start instant. Both
        // backends die → the in-flight task fails → maxFailures=1 aborts
        // the wave job → the driver-level replay must carry the run.
        if (taskMaxFailures == 1 && !processKilled &&
            jobsDone >= killAfterJobs) {
          processKilled = true
          import scala.jdk.CollectionConverters._
          // the driver JVM's only java child processes in this run ARE
          // the two launched executor backends (the worker runs
          // in-process), so no command-line class filter is needed —
          // and /proc cmdline inspection proved unreliable for one
          val desc = ProcessHandle.current().descendants().iterator()
            .asScala.toList
            .filter(_.info().command().orElse("").endsWith("java"))
          println(s"[ing-failover] task-start kill: destroying " +
            s"${desc.size} executor JVMs (${desc.map(_.pid).mkString(", ")})")
          desc.foreach(_.destroyForcibly())
        }
      }
    })

    // one-shot killer for the DEFAULT regime, identical discipline to
    // CcFailover: the replacement executor gets a fresh id and is never
    // targeted. (In the replay regime the task-start listener above is
    // the kill instead.)
    val killer = new Thread(() => {
      while (jobsDone < killAfterJobs) Thread.sleep(100)
      println(s"[ing-failover] $jobsDone jobs done - killing executor 0")
      try spark.sparkContext.parallelize(1 to 64, 32).foreach { _ =>
        if (SparkEnv.get.executorId == "0") {
          System.err.println("[ing-failover] task killing this executor JVM")
          System.exit(137)
        }
      } catch { case t: Throwable =>
        println(s"[ing-failover] killer job: ${t.getClass.getSimpleName} (ok)")
      }
    })
    killer.setDaemon(true)

    // Deterministic corpus: text is a pure function of gid = doc_id % G,
    // so every G-collision is a planted exact duplicate (first-wins in
    // its wave, probe-rejected in later waves); every 11th doc is a
    // 2-token short that the quality gate drops. 25 generated tokens
    // clear the default minTokens = 20.
    val uniqueTexts = nDocs / 4
    val docs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        when(col("id") % 11 === 0, lit("short text"))
          .otherwise(expr(s"""concat_ws(' ', transform(sequence(0, 24),
            j -> concat('t', pmod((id % $uniqueTexts) * 131 + j * 17, 99991))))"""))
          .as("text"))
      // NO caching/localCheckpoint here: local-checkpoint blocks live on
      // executors and die with them (exactly what this gate does), while
      // the pure range->expr lineage recomputes identically on any JVM


    val t0 = System.nanoTime()
    if (taskMaxFailures != 1) killer.start()

    // the DURABLE loop under fire: one ingestBatchCommit per wave; a wave
    // whose job the kill aborts is replayed (the streaming runtime's
    // checkpoint replay), and replay must be idempotent
    var replays = 0
    (0 until nWaves).foreach { w =>
      val wave = docs.filter(col("doc_id") % nWaves === w)
      var done = false
      var attempts = 0
      while (!done) {
        attempts += 1
        try {
          graft.streaming.Ingest.ingestBatchCommit(
            spark, storeDir.toString, wave, batchId = w.toLong)
          done = true
        } catch {
          case t: Throwable if attempts < 4 =>
            replays += 1
            println(s"[ing-failover] wave $w attempt $attempts failed " +
              s"(${t.getClass.getSimpleName}) - replaying")
        }
      }
    }
    val wall = (System.nanoTime() - t0) / 1e9
    killer.join(10000)

    // ground truth: the same arrivals through the clean in-memory fold
    // (post-kill, on the recovered cluster — determinism is the point)
    val expected = graft.streaming.Ingest.ingestFold(
        spark, docs, col("doc_id") % nWaves, nWaves)
      .select("doc_id", "batch", "content_hash", "simhash")
      .collect().map(_.toSeq).toSet
    val got = graft.sources.AtomicStore.read(spark, storeDir.toString)
      .select("doc_id", "batch", "content_hash", "simhash")
      .collect().map(_.toSeq).toSet

    val missing = expected -- got
    val extra = got -- expected
    println(f"[ing-failover] wall=$wall%.1fs store=${got.size} " +
      s"expected=${expected.size} replays=$replays " +
      s"executors_removed=$executorsRemoved")
    assert(missing.isEmpty && extra.isEmpty,
      s"store diverged from the clean fold after executor loss: " +
        s"${missing.size} missing (e.g. ${missing.take(3).mkString("; ")}), " +
        s"${extra.size} extra (e.g. ${extra.take(3).mkString("; ")})")
    assert(executorsRemoved >= 1,
      "no executor was removed - the kill landed after the loop finished; " +
        "raise nDocs or lower killAfterJobs and rerun")
    if (taskMaxFailures == 1)
      assert(replays >= 1,
        "replay mode (taskMaxFailures=1): the kill must abort a wave job " +
          "and exercise the driver-level replay; it did not - rerun")
    println("[ing-failover] PASS - durable ingest survived executor loss")
    spark.stop()
    Fs.deleteRec(storeDir.toString)
  }
}
