package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TagFamilyStore

/** ROUND-GATE: the tag-family cut's whole crash story under object-store
  * latency ([[SlowFs]]), the family sibling of AnnStoreScale's
  * `ann_swap_crash` regime. Lake-derived tag batches (one job per wave
  * over a distinct `orders` slice, plus a shared asset every wave
  * updates — latest-wins teeth) land through the REAL
  * [[TagFamilyStore.commitJob]] path while two mid-run jobs are killed
  * at each inter-commit point (after the tag commit; after the history
  * commit — both tables committed, the single cut publish never
  * reached). PASS requires all of:
  *
  *  1. after EACH crash, the served tags AND history equal the pre-crash
  *     state row-for-row and the cut version is unchanged — none of the
  *     crashed job's commits visible anywhere;
  *  2. the crashed jobs' re-runs land EXACTLY ONCE (orphan suffixes
  *     truncated, never adopted — no phantom history, no doubled rows);
  *  3. the final store equals a crash-free replay of the same jobs into
  *     a clean family store, tags and history both;
  *  4. a cut pinned at the first job's boundary still time-travels
  *     bit-identically after every later job AND a full fold.
  *
  * {{{
  * runMain graft.tools.TagFamilyCrash <sfDir> [waves] [opLatencyMs]
  * }}}
  */
object TagFamilyCrash {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val waves = args.lift(1).map(_.toInt).getOrElse(6)
    val opLatencyMs = args.lift(2).map(_.toLong).getOrElse(0L)
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (opLatencyMs > 0)
        builder.config("spark.hadoop.fs.file.impl", classOf[SlowFs].getName)
      else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = graft.Lake.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).localCheckpoint()
    def incoming(w: Int): DataFrame =
      orders.filter(col("o_orderkey") % waves === w)
        .select(concat(lit("a/t"), col("o_orderkey")).as("asset_uri"),
          lit("").as("column"), lit("gov").as("template_id"),
          lit("total").as("field_id"), lit("string").as("field_type"),
          col("o_totalprice").cast("string").as("field_value"))
        // the shared asset: every wave overwrites it, so a crashed
        // wave that leaked WOULD move this value — teeth for (1)
        .unionByName(spark.range(1).select(
          lit("a/shared").as("asset_uri"), lit("").as("column"),
          lit("gov").as("template_id"), lit("last_wave").as("field_id"),
          lit("string").as("field_type"),
          lit(s"wave-$w").as("field_value")))
        .localCheckpoint()
    def history(w: Int, inc: DataFrame): DataFrame =
      inc.select(to_timestamp(lit("2026-01-05 00:00:00")).as("event_time"),
        col("asset_uri").as("asset_name"), lit(s"wave-$w").as("job_uuid"))

    def diff(a: DataFrame, b: DataFrame): Long =
      a.exceptAll(b).count() + b.exceptAll(a).count()

    val root = java.nio.file.Files.createTempDirectory("graft_tagfam_g")
      .toString
    val cleanRoot = java.nio.file.Files.createTempDirectory("graft_tagfam_c")
      .toString
    if (opLatencyMs > 0) {
      SlowFs.opLatencyMs = opLatencyMs
      println(s"TAGFAM op_latency_ms=$opLatencyMs (SlowFs engaged)")
    }
    val t0 = System.nanoTime()
    val crashWaves = Map(waves / 2 -> "tags", waves / 2 + 1 -> "history")
    var cut1: Long = -1L
    var pinnedTags: DataFrame = null
    var crashesOk = true
    var rerunsOk = true

    (0 until waves).foreach { w =>
      val inc = incoming(w)
      val hist = history(w, inc)
      crashWaves.get(w) match {
        case Some(stage) =>
          val cutBefore = TagFamilyStore.currentCutVersion(spark, root)
          val tagsBefore = TagFamilyStore.readTags(spark, root)
            .localCheckpoint()
          val histBefore = TagFamilyStore.readHistory(spark, root)
            .localCheckpoint()
          TagFamilyStore.setTestMidJobHook(root, s =>
            if (s == stage) throw new RuntimeException("injected job crash"))
          val crashed =
            try { TagFamilyStore.commitJob(spark, root, inc, hist); false }
            catch { case e: RuntimeException
                if e.getMessage == "injected job crash" => true }
            finally TagFamilyStore.clearTestMidJobHook(root)
          val dTags = diff(TagFamilyStore.readTags(spark, root), tagsBefore)
          val dHist = diff(TagFamilyStore.readHistory(spark, root), histBefore)
          val cutSame =
            TagFamilyStore.currentCutVersion(spark, root) == cutBefore
          println(s"TAGFAM wave=$w crash_at=$stage crashed=$crashed " +
            s"tags_diff=$dTags hist_diff=$dHist cut_unchanged=$cutSame")
          crashesOk &&= crashed && dTags == 0 && dHist == 0 && cutSame
          // the re-run: exactly once
          TagFamilyStore.commitJob(spark, root, inc, hist)
          val histN = TagFamilyStore.readHistory(spark, root)
            .filter(col("job_uuid") === s"wave-$w").count()
          val expectN = hist.count()
          rerunsOk &&= histN == expectN
          if (histN != expectN)
            println(s"TAGFAM wave=$w rerun history rows $histN != $expectN")
        case None =>
          // clean-wave commit wall = the family cut's per-job price at
          // this latency rung (evaluation excluded — inc/hist are
          // checkpointed): 3 commits + 1 cut publish of metadata ops
          val tW = System.nanoTime()
          TagFamilyStore.commitJob(spark, root, inc, hist)
          println(f"TAGFAM wave=$w commit_wall=" +
            f"${(System.nanoTime() - tW) / 1e9}%.2fs")
      }
      TagFamilyStore.commitJob(spark, cleanRoot, inc, hist)
      if (w == 0) {
        cut1 = TagFamilyStore.currentCutVersion(spark, root).get
        pinnedTags = TagFamilyStore.readTags(spark, root).localCheckpoint()
      }
    }

    // (3) crash-free replay equivalence, after a full fold on both
    TagFamilyStore.compact(spark, root)
    val dFinalTags = diff(TagFamilyStore.readTags(spark, root),
      TagFamilyStore.readTags(spark, cleanRoot))
    val dFinalHist = diff(TagFamilyStore.readHistory(spark, root),
      TagFamilyStore.readHistory(spark, cleanRoot))
    val sharedVal = TagFamilyStore.readTags(spark, root)
      .filter(col("asset_uri") === "a/shared")
      .select("field_value").head().getString(0)
    // (4) the wave-0 pin survives every later job and the fold
    val dPinned = diff(TagFamilyStore.readTagsAt(spark, root, cut1),
      pinnedTags)
    val served = TagFamilyStore.readTags(spark, root).count()
    val wall = (System.nanoTime() - t0) / 1e9

    val ok = crashesOk && rerunsOk && dFinalTags == 0 && dFinalHist == 0 &&
      sharedVal == s"wave-${waves - 1}" && dPinned == 0
    println(f"TAGFAM waves=$waves latency_ms=$opLatencyMs wall=$wall%.2fs " +
      f"crashes_ok=$crashesOk reruns_ok=$rerunsOk final_tags_diff=" +
      f"$dFinalTags final_hist_diff=$dFinalHist shared=$sharedVal " +
      f"pinned_diff=$dPinned served=$served " +
      (if (ok) "PASS" else "FAIL"))
    SlowFs.opLatencyMs = 0L
    Fs.deleteRec(root)
    Fs.deleteRec(cleanRoot)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
