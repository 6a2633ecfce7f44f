package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures DocIndexStore's write-path contract at a given lake: seed the
  * persisted signature index with the full corpus, then land a small
  * incremental batch — committed bytes must scale with the BATCH, not
  * the corpus (the same claim BulkScale measures for the tag delta-log).
  *
  * args: [sfDir] [batchDocs] [waves] [opLatencyMs]
  *
  * `opLatencyMs` > 0 engages [[SlowFs]]: every Hadoop-FS metadata op
  * (list/stat/open) against the store pays that synthetic latency — the
  * object-store round-trip model the `compactAboveDirs` threshold
  * actually exists to bound. The latency turns on AFTER the corpus
  * fixtures are checkpointed, so only store traffic is taxed.
  */
object SigStoreScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchDocs = args.lift(1).map(_.toInt).getOrElse(100)
    val opLatencyMs = args.lift(3).map(_.toLong).getOrElse(0L)
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    val spark = (if (opLatencyMs > 0)
        builder.config("spark.hadoop.fs.file.impl",
          classOf[SlowFs].getName)
      else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Lake.table(spark, sfDir, "documents")
    val nDocs = docs.count()
    val sim = graft.operators.Dedup.simhash(docs, "doc_id", "text")
      .localCheckpoint()
    val mh = graft.operators.Dedup.minhashFromSets(
      graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 5), "doc_id")
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft_sigscale").toString
    if (opLatencyMs > 0) {
      SlowFs.opLatencyMs = opLatencyMs
      println(s"SIGSTORE op_latency_ms=$opLatencyMs (SlowFs engaged)")
    }
    val t0 = System.nanoTime()
    graft.operators.DocIndexStore.write(root,
      graft.operators.DocIndexStore.Components(sim, mh))
    val dtSeed = (System.nanoTime() - t0) / 1e9
    val seeded = Fs.dirBytes(root)
    println(f"SIGSTORE docs=$nDocs%7d seed        wall=$dtSeed%6.2fs bytes=$seeded")
    // incremental batch: signatures for `batchDocs` docs (re-stamped ids
    // so they read as NEW ingest rows)
    val batchSim = sim.limit(batchDocs)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val batchMh = mh.limit(batchDocs)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val t1 = System.nanoTime()
    graft.operators.DocIndexStore.appendSimhash(root, batchSim)
    graft.operators.DocIndexStore.appendMinhash(root, batchMh)
    val dtApp = (System.nanoTime() - t1) / 1e9
    println(f"SIGSTORE docs=$nDocs%7d append_$batchDocs%-4d wall=$dtApp%6.2fs " +
      f"batch_bytes=${Fs.dirBytes(root) - seeded} total_bytes=${Fs.dirBytes(root)}")

    // steady-state decay + compaction: land `waves` more small appends
    // (the ingest loop's shape — one manifest + one small batch dir per
    // wave), measure the probe join against the accumulated store, fold
    // it with DocIndexStore.compact, measure again. The claim under test:
    // post-compaction probe cost is flat in wave count (the uncompacted
    // probe pays file listing + open per WAVE, not per byte).
    val waves = args.lift(2).map(_.toInt).getOrElse(40)
    // compactAboveDirs = 0: this loop MEASURES the uncompacted decay, so
    // the write-path auto-fold (default threshold 64) must not fire
    // mid-benchmark and silently turn probe_uncompacted into a probe of
    // a folded store (and bill full-store rewrites to append wall-time)
    (1 to waves).foreach { w =>
      val off = 20000000L + w * 100000L
      graft.operators.DocIndexStore.appendSimhash(root,
        sim.limit(20).withColumn("doc_id", col("doc_id") + lit(off)),
        compactAboveDirs = 0)
      graft.operators.DocIndexStore.appendMinhash(root,
        mh.limit(20).withColumn("doc_id", col("doc_id") + lit(off)),
        compactAboveDirs = 0)
    }
    def census(part: String): (Int, Int) = {
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      (fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$part", "data")).length,
       fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$part", "_commits")).length)
    }
    def probe(): Double = {
      // best-of-2 (multi-tenant box): the incremental near-dup probe —
      // a fresh batch's signatures against the LOADED persisted index
      (0 until 2).map { _ =>
        val t = System.nanoTime()
        val ix = graft.operators.DocIndexStore.load(spark, root)
        graft.operators.Dedup.simhashPairsBetween(
          batchSim, ix.simhash.filter(col("simhash").isNotNull),
          "doc_id", maxHamming = 4).count()
        graft.operators.Dedup.lshCandidatesBetween(
          batchMh, ix.minhashSigs, "doc_id").count()
        (System.nanoTime() - t) / 1e9
      }.min
    }
    val (d0, m0) = census("simhash")
    val pUn = probe()
    println(f"SIGSTORE waves=$waves%3d probe_uncompacted wall=$pUn%6.2fs " +
      f"sim_dirs=$d0 sim_manifests=$m0")
    val tc = System.nanoTime()
    graft.operators.DocIndexStore.compact(spark, root, graceMs = 0L)
    Seq("simhash", "minhash").foreach(p => graft.sources.AtomicStore
      .vacuum(spark, s"$root/$p", keepVersions = 1, graceMs = 0L))
    val dtC = (System.nanoTime() - tc) / 1e9
    val (d1, m1) = census("simhash")
    val pC = probe()
    println(f"SIGSTORE waves=$waves%3d probe_compacted   wall=$pC%6.2fs " +
      f"sim_dirs=$d1 sim_manifests=$m1 compact_wall=$dtC%6.2fs")

    // third regime: the WIRED write-path fold (compactAboveDirs — 16 here
    // so several folds fire within the wave budget). The claim: appends
    // self-maintain, so the dir census stays bounded by the threshold and
    // the probe stays at the compacted cost with NO explicit maintenance
    // call, at an amortized fold cost folded into append wall-time.
    // the cost driver is the dir set the MANIFEST references (that's
    // what every probe's load lists and opens) — physical dirs linger
    // up to vacuum's grace window by design (concurrent-reader safety),
    // so census() would overcount what a probe pays
    def refDirs(part: String): Int = {
      val t = s"$root/$part"
      graft.sources.AtomicStore.currentVersion(spark, t)
        .map(v => graft.sources.AtomicStore.filesAt(spark, t, v).size)
        .getOrElse(0)
    }
    val tA = System.nanoTime()
    var maxRef = 0
    (1 to waves).foreach { w =>
      val off = 40000000L + w * 100000L
      graft.operators.DocIndexStore.appendSimhash(root,
        sim.limit(20).withColumn("doc_id", col("doc_id") + lit(off)),
        compactAboveDirs = 16)
      graft.operators.DocIndexStore.appendMinhash(root,
        mh.limit(20).withColumn("doc_id", col("doc_id") + lit(off)),
        compactAboveDirs = 16)
      maxRef = math.max(maxRef, refDirs("simhash"))
    }
    val dtAuto = (System.nanoTime() - tA) / 1e9
    val pA = probe()
    println(f"SIGSTORE waves=$waves%3d probe_autofold    wall=$pA%6.2fs " +
      f"ref_dirs=${refDirs("simhash")} max_ref_dirs=$maxRef " +
      f"append_total=$dtAuto%6.2fs")
    Fs.deleteRec(root)
    spark.stop()
  }

}
