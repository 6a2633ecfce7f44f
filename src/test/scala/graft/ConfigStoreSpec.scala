package graft

import org.apache.spark.sql.functions._
import graft.sched.ConfigStore

/** A14 store CRUD: md5 identity, supersede, delete/purge, persistence. */
class ConfigStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(String, String, String, String, String, Long)]) =
    rows.toDF("config_uuid", "config_type", "template_id", "included_uris",
        "config_status", "version")
      .withColumn("refresh_mode", lit("AUTO"))
      .withColumn("scheduling_status", lit("READY"))
      .withColumn("refresh_frequency_minutes", lit(60L))
      .withColumn("next_run", to_timestamp(lit("2024-03-01 10:00:00")))

  private val store = mk(Seq(
    ("c1", "DYNAMIC_TAG_TABLE", "gov", "u1", "ACTIVE", 1L),
    ("c2", "STATIC_TAG_ASSET", "ops", "u2", "ACTIVE", 1L)))

  test("create supersedes same-content configs; re-create restarts at v1") {
    val next = ConfigStore.create(store,
      mk(Seq(("c3", "DYNAMIC_TAG_TABLE", "gov", "u1", "ACTIVE", 0L))))
    val byUuid = next.select("config_uuid", "config_status", "version")
      .as[(String, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byUuid("c1") === ("INACTIVE", 1L))
    // reference re-creates at 'version': 1 (TagEngineStoreHandler.py:420)
    // — version counts RUNS of one document, not re-creations
    assert(byUuid("c3") === ("ACTIVE", 1L))
    assert(byUuid("c2") === ("ACTIVE", 1L))
  }

  test("a many-run old config still loses to its version-1 re-create") {
    // c1 has launched 40 times (version 41 via increment_version_next_run);
    // the reference's supersede is an EXPLICIT flip of the old doc
    // (:382-391), not a version comparison — a version-ordered window
    // would keep the stale v41 config ACTIVE and discard the re-create
    val veteran = mk(Seq(("c1", "DYNAMIC_TAG_TABLE", "gov", "u1", "ACTIVE", 41L)))
    val next = ConfigStore.create(veteran,
      mk(Seq(("c9", "DYNAMIC_TAG_TABLE", "gov", "u1", "ACTIVE", 0L))))
    val byUuid = next.select("config_uuid", "config_status", "version")
      .as[(String, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byUuid("c1") === ("INACTIVE", 41L))
    assert(byUuid("c9") === ("ACTIVE", 1L))
  }

  test("delete removes one doc; purge removes only INACTIVE of a type") {
    assert(ConfigStore.deleteConfig(store, "c1")
      .select("config_uuid").as[String].collect().toSeq === Seq("c2"))
    // reference purge (TagEngineStoreHandler.py:1330) filters
    // config_status == INACTIVE: an ACTIVE config of the type survives
    val mixed = store.unionByName(mk(Seq(
      ("c4", "STATIC_TAG_ASSET", "ops", "u4", "INACTIVE", 1L),
      ("c5", "DYNAMIC_TAG_TABLE", "gov", "u5", "INACTIVE", 2L))))
    assert(ConfigStore.purge(mixed, "STATIC_TAG_ASSET")
      .select("config_uuid").as[String].collect().sorted
      === Seq("c1", "c2", "c5"))
    // config_type ALL purges INACTIVE across every collection
    assert(ConfigStore.purge(mixed, "ALL")
      .select("config_uuid").as[String].collect().sorted === Seq("c1", "c2"))
  }

  test("append-log: deltas append (existing files untouched), latest wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_log").toString
    def files: Map[String, (Long, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(s => s.getPath.getName -> ((s.getLen, s.getModificationTime)))
        .toMap
    }
    ConfigStore.appendDelta(store, dir, batchId = 0L)
    val batch0Files = files
    assert(batch0Files.nonEmpty)
    // batch 1: update c1, create c3, tombstone c2 — ONLY the delta rows
    val delta = mk(Seq(("c1", "DYNAMIC_TAG_TABLE", "gov", "u1b", "ACTIVE", 2L)))
      .unionByName(mk(Seq(("c3", "DYNAMIC_TAG_COLUMN", "prof", "u3", "ACTIVE", 1L))))
      .unionByName(ConfigStore.tombstone(store, "c2"))
    ConfigStore.appendDelta(delta, dir, batchId = 1L)
    // append-only contract: every batch-0 file is byte-identical in place
    val after = files
    batch0Files.foreach { case (name, sig) => assert(after(name) === sig) }
    assert(after.size > batch0Files.size)
    // latest-wins view: c1 at version 2 with the new uris, c3 present,
    // c2 tombstoned away
    val latest = ConfigStore.readLatest(spark, dir)
      .select("config_uuid", "included_uris", "version")
      .as[(String, String, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(latest === Map("c1" -> (("u1b", 2L)), "c3" -> (("u3", 1L))))
    // compact folds the log into a snapshot + batch-0 log, same view
    val snap = java.nio.file.Files.createTempDirectory("graft_cfg_snap").toString
    ConfigStore.compact(spark, dir, snap)
    val compacted = ConfigStore.readLatest(spark, dir)
      .select("config_uuid", "included_uris", "version")
      .as[(String, String, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(compacted === latest)
  }

  test("readLatest: a NULL config_status row is not a tombstone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_null").toString
    ConfigStore.appendDelta(
      mk(Seq(("c1", "DYNAMIC_TAG_TABLE", "gov", "u1", "ACTIVE", 1L)))
        .withColumn("config_status", lit(null).cast("string")),
      dir, batchId = 0L)
    // same NULL rule as purge(): only an explicit DELETED row hides a
    // config — a status-less log row must still surface
    assert(ConfigStore.readLatest(spark, dir)
      .select("config_uuid").as[String].collect().toSeq === Seq("c1"))
  }

  test("compact: the live log is never empty mid-fold (rename swap)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_atomic").toString
    val snap = java.nio.file.Files.createTempDirectory("graft_cfg_asnap").toString
    ConfigStore.appendDelta(store, dir, batchId = 0L)
    // Crash-injection: make the publish rename fail by pre-seeding the
    // temp path as an unrenameable target is filesystem-dependent, so
    // instead pin the OBSERVABLE contract — after a compact the live dir
    // exists with a complete batch-0 log and the temp sibling is gone.
    // The trash copy DELIBERATELY survives as the reader grace copy (a
    // reader readablePath routed to it during the swap may still be
    // mid-scan); the NEXT compact reclaims it.
    ConfigStore.compact(spark, dir, snap)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".__compact_tmp")))
    // grace copy on disk, but the LIVE path wins resolution
    assert(ConfigStore.readLatest(spark, dir).count() === 2)
    // second compact: reclaims the previous grace copy, leaves its own
    val snap2 = java.nio.file.Files.createTempDirectory("graft_cfg_asnap2").toString
    ConfigStore.compact(spark, dir, snap2)
    assert(ConfigStore.readLatest(spark, dir).count() === 2)
  }

  test("compact crash between renames self-heals on the next read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_heal").toString
    ConfigStore.appendDelta(store, dir, batchId = 0L)
    // simulate the crash state: live moved aside, replacement never
    // promoted — the log survives only at <dir>.__compact_old
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".__compact_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    // a READER serves from the trash copy without renaming (a reader
    // rename could race an in-flight compact's own promote)
    assert(ConfigStore.readLatest(spark, dir).count() === 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    // the next WRITE-side compact promotes the copy back and proceeds
    // (leaving its OWN aside copy as the reader grace copy — the live
    // path wins resolution)
    val snap = java.nio.file.Files.createTempDirectory("graft_cfg_hsnap").toString
    ConfigStore.compact(spark, dir, snap)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir)))
    assert(ConfigStore.readLatest(spark, dir).count() === 2)
  }

  test("compact: a held lease makes a second compactor fail loudly, store intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_lease").toString
    ConfigStore.appendDelta(store, dir, batchId = 0L)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val lease = new org.apache.hadoop.fs.Path(dir + ".__compact_lease")
    fs.create(lease, false).close() // a live concurrent compactor
    val snap = java.nio.file.Files.createTempDirectory("graft_cfg_lsnap").toString
    intercept[java.util.ConcurrentModificationException] {
      ConfigStore.compact(spark, dir, snap)
    }
    // the loser touched nothing: log intact, no half-swap residue
    assert(ConfigStore.readLatest(spark, dir).count() === 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".__compact_tmp")))
    // holder releases → the next compact proceeds and releases its own
    fs.delete(lease, false)
    ConfigStore.compact(spark, dir, snap)
    assert(ConfigStore.readLatest(spark, dir).count() === 2)
    assert(!fs.exists(lease), "winner must release the lease")
  }

  test("compact: a crashed holder's stale lease is broken after TTL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_ttl").toString
    ConfigStore.appendDelta(store, dir, batchId = 0L)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val lease = new org.apache.hadoop.fs.Path(dir + ".__compact_lease")
    fs.create(lease, false).close()
    fs.setTimes(lease, System.currentTimeMillis() - 60000L, -1L)
    val snap = java.nio.file.Files.createTempDirectory("graft_cfg_tsnap").toString
    // TTL 1s: the minute-old lease is a crash residue, not a holder
    ConfigStore.compact(spark, dir, snap, leaseTtlMs = 1000L)
    assert(ConfigStore.readLatest(spark, dir).count() === 2)
    assert(!fs.exists(lease))
  }

  test("racing compactors: any overlap loses loudly, store intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg_race").toString
    ConfigStore.appendDelta(store, dir, batchId = 0L)
    val snaps = Seq(
      java.nio.file.Files.createTempDirectory("graft_cfg_rsnap1").toString,
      java.nio.file.Files.createTempDirectory("graft_cfg_rsnap2").toString)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val outcomes =
      new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Unit]]()
    val threads = snaps.map { snap =>
      new Thread(() => {
        barrier.await()
        try { ConfigStore.compact(spark, dir, snap); outcomes.add(Right(())) }
        catch { case t: Throwable => outcomes.add(Left(t)) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    val results = scala.jdk.CollectionConverters
      .CollectionHasAsScala(outcomes).asScala.toSeq
    assert(results.size === 2)
    val losers = results.collect { case Left(t) => t }
    // the ONLY legal failure is the lease conflict — never a swap error
    // or corrupted-log read; serialized runs (both win) are legal too
    losers.foreach(t => assert(
      t.isInstanceOf[java.util.ConcurrentModificationException],
      s"unexpected failure class: $t"))
    assert(results.count(_.isRight) >= 1, "at least one compactor must win")
    // the store survived the race intact, and no lease is left behind
    assert(ConfigStore.readLatest(spark, dir).count() === 2)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".__compact_lease")))
  }

  test("write/read round-trips the store as a lake table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg").toString
    ConfigStore.write(ConfigStore.withIdentity(store), dir)
    val back = ConfigStore.read(spark, dir)
    assert(back.count() === 2)
    assert(back.columns.contains("content_md5"))
    // identity is deterministic across write/read
    val md5s = ConfigStore.withIdentity(store)
      .select("config_uuid", "content_md5").as[(String, String)].collect().toMap
    val backM = back.select("config_uuid", "content_md5")
      .as[(String, String)].collect().toMap
    assert(md5s === backM)
  }
}
