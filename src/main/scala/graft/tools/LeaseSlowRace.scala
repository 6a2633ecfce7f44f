package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.AtomicStore

/** Lease-protocol race gate under the [[SlowFs]] object-store cost
  * model — the lease-specific edges the spec suite runs on an instant
  * local FS, re-run where every LIST/HEAD/open pays a synthetic latency
  * so the windows between a claimant's list, create, and verify widen
  * by orders of magnitude (25 ms/op ≈ 3 orders over the dentry cache).
  * The composed refresh-race gate (AnnStoreScale `race`) already runs
  * one scenario under latency; this one isolates the PROTOCOL:
  *
  *  1. two-breaker barrier — two claimants forced coincident on the
  *     same crashed lease, many rounds; exactly one may win each round
  *     (the round-14 delete-then-create hole, now under slow metadata);
  *  2. contention soak — N threads claim/release in a loop; no two
  *     holders may ever overlap inside the lease, and every op must
  *     eventually acquire (liveness: verify back-out and marker-
  *     before-GC ordering must not deadlock when ops are slow).
  *
  * args: [opLatencyMs] [barrierRounds] [soakThreads] [soakOps]
  *
  * Exit 0 + `LEASERACE ... PASS` on success — a RoundGates gate.
  */
object LeaseSlowRace {
  def main(args: Array[String]): Unit = {
    val latencyMs = args.headOption.map(_.toLong).getOrElse(25L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(10)
    val soakThreads = args.lift(2).map(_.toInt).getOrElse(4)
    val soakOps = args.lift(3).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[SlowFs].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_leaserace")
      .toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.isInstanceOf[SlowFs],
      s"SlowFs not engaged for the file scheme: ${fs.getClass}")
    SlowFs.opLatencyMs = latencyMs
    println(s"LEASERACE op_latency_ms=$latencyMs (SlowFs engaged)")
    type Busy = java.util.ConcurrentModificationException

    // ---- phase 1: two coincident breakers of the same crashed lease
    val lp1 = s"$dir/.lease_barrier"
    var barrierOk = true
    val t1 = System.nanoTime()
    (1 to rounds).foreach { r =>
      val crashed = AtomicStore.claimLease(spark, lp1, 1000L, s"crashed $r")
      fs.setTimes(crashed, System.currentTimeMillis() - 600000L, -1L)
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val winners = new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.hadoop.fs.Path]()
      val unexpected =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map { t =>
        new Thread(() => {
          barrier.await()
          try winners.add(
            AtomicStore.claimLease(spark, lp1, 60000L, s"claimant $t"))
          catch {
            case _: Busy => ()
            case other: Throwable => unexpected.add(other)
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      val held = AtomicStore.leaseHeld(spark, lp1)
      if (!unexpected.isEmpty || winners.size != 1 || !held) {
        barrierOk = false
        println(s"LEASERACE barrier round $r: winners=${winners.size} " +
          s"held=$held err=${Option(unexpected.peek())}")
      }
      Option(winners.poll()).foreach(AtomicStore.releaseLease(spark, _))
    }
    val dtBarrier = (System.nanoTime() - t1) / 1e9

    // ---- phase 2: contention soak — overlap and liveness under latency
    val lp2 = s"$dir/.lease_soak"
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlaps = new java.util.concurrent.atomic.AtomicInteger(0)
    val acquired = new java.util.concurrent.atomic.AtomicInteger(0)
    val soakErrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t2 = System.nanoTime()
    val soak = (1 to soakThreads).map { t =>
      new Thread(() => {
        try (1 to soakOps).foreach { _ =>
          val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
          var l: org.apache.hadoop.fs.Path = null
          while (l == null) {
            try l = AtomicStore.claimLease(spark, lp2, 600000L, s"soak $t")
            catch {
              case _: Busy if System.nanoTime() < deadline =>
                Thread.sleep(10)
            }
          }
          if (inside.incrementAndGet() > 1) overlaps.incrementAndGet()
          acquired.incrementAndGet()
          Thread.sleep(2)
          inside.decrementAndGet()
          AtomicStore.releaseLease(spark, l)
        } catch { case other: Throwable => soakErrs.add(other) }
      })
    }
    soak.foreach(_.start()); soak.foreach(_.join(600000))
    val dtSoak = (System.nanoTime() - t2) / 1e9

    val ok = barrierOk && soakErrs.isEmpty && overlaps.get == 0 &&
      acquired.get == soakThreads * soakOps
    println(f"LEASERACE latency_ms=$latencyMs barrier_rounds=$rounds " +
      f"barrier_wall=$dtBarrier%.1fs soak_acquired=${acquired.get}/" +
      f"${soakThreads * soakOps} overlaps=${overlaps.get} " +
      f"soak_wall=$dtSoak%.1fs soak_err=${Option(soakErrs.peek())} " +
      (if (ok) "PASS" else "FAIL"))
    SlowFs.opLatencyMs = 0L
    Fs.deleteRec(dir)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
