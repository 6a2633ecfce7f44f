package graft.tools

import org.apache.spark.SparkEnv
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Failure-injection gate for `Graph.connectedComponents(reliableCheckpoint
  * = true)` — the mode's entire purpose is surviving executor loss, so the
  * gate LOSES one: a `local-cluster[2,1,1536]` session (real separate
  * executor JVMs, unlike local[n]) runs the CC loop on a 300-chain ×
  * 1000-vertex graph with a closed-form answer, and once the loop is
  * mid-rounds a killer job `System.exit`s whichever task lands on executor
  * 0 — cached label blocks and shuffle outputs on that JVM are gone, the
  * standalone master relaunches a replacement, and the loop must recover
  * from the RELIABLE checkpoint files alone and still produce exactly
  * `label(v) = v - v % 1000`.
  *
  * Exits nonzero (an assertion) if labels are wrong OR no executor was
  * actually removed (the kill must land mid-run to count as evidence —
  * rerun on a slow box if the loop finished first). Needs SPARK_HOME
  * (the standalone worker builds the executor launch command from it)
  * and SPARK_SCALA_VERSION (the release-layout launcher probes source
  * build dirs without it):
  *
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt -batch "runMain graft.tools.CcFailover"
  * }}}
  *
  * args: [nChains] [chainLen] [killAfterJobs]
  */
object CcFailover {
  def main(args: Array[String]): Unit = {
    val nChains = args.headOption.map(_.toInt).getOrElse(300)
    val chainLen = args.lift(1).map(_.toInt).getOrElse(1000)
    val killAfterJobs = args.lift(2).map(_.toInt).getOrElse(8)
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster needs SPARK_HOME (the worker launches executor JVMs " +
        "through it): SPARK_HOME=/opt/spark sbt ...")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_cc_failover")
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1536]")
      .appName("cc-failover")
      // executor JVMs are launched fresh by the worker: they need this
      // driver's full classpath (graft classes + spark jars) and the
      // JDK17 module opens the sbt harness injects for the driver
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)

    @volatile var jobsDone = 0
    @volatile var executorsRemoved = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobsDone += 1
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        executorsRemoved += 1
        println(s"[failover] executor ${e.executorId} removed: ${e.reason}")
      }
    })

    // the kill: once the CC loop is `killAfterJobs` jobs deep (mid-rounds
    // — each round runs several jobs), a concurrent job exits the JVM of
    // whichever of its tasks lands on executor 0. One-shot: the
    // replacement executor gets a fresh id and is never targeted.
    val killer = new Thread(() => {
      while (jobsDone < killAfterJobs) Thread.sleep(100)
      println(s"[failover] $jobsDone jobs done - killing executor 0")
      try spark.sparkContext.parallelize(1 to 64, 32).foreach { _ =>
        if (SparkEnv.get.executorId == "0") {
          System.err.println("[failover] task killing this executor JVM")
          System.exit(137)
        }
      } catch { case t: Throwable =>
        println(s"[failover] killer job: ${t.getClass.getSimpleName} (ok)")
      }
    })
    killer.setDaemon(true)

    // 300 chains x 1000 vertices: worst-case diameter for min-label
    // propagation (the double-jump + contraction path does real rounds),
    // answer in closed form: label(v) = v - v % chainLen
    val n = nChains.toLong * chainLen
    val edges = spark.range(n).filter(col("id") % chainLen =!= (chainLen - 1))
      .select(col("id").as("a"), (col("id") + 1).as("b"))

    val t0 = System.nanoTime()
    killer.start()
    val labels = graft.operators.Graph.connectedComponents(
      edges, "a", "b", maxIter = 40, verbose = true,
      contractMinEdges = 100000L, localFinishEdges = 10000L,
      reliableCheckpoint = true)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    val wall = (System.nanoTime() - t0) / 1e9
    killer.join(10000)

    val bad = got.filter { case (v, l) => l != v - v % chainLen }
    println(f"[failover] wall=$wall%.1fs vertices=${got.length} " +
      s"bad=${bad.length} executors_removed=$executorsRemoved")
    assert(got.length == n,
      s"expected $n labeled vertices, got ${got.length}")
    assert(bad.isEmpty,
      s"wrong labels after executor loss, e.g. ${bad.take(5).mkString(", ")}")
    assert(executorsRemoved >= 1,
      "no executor was removed - the kill landed after the loop finished; " +
        "raise the graph size or lower killAfterJobs and rerun")
    println("[failover] PASS - reliable-checkpoint CC survived executor loss")
    spark.stop()
    Fs.deleteRec(ckptDir.toString)
  }
}
