package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{FieldSpec, TagConfig}
import graft.operators.{TagFamilyStore, TagStore}
import graft.sources.{AtomicStore, StoreCut}

/** The tag-engine FAMILY cut (round 18): tags + history (+ reports)
  * published under one atomic manifest — crash injection at every
  * inter-commit point must leave readers on the pre-job state for ALL
  * tables, recovery must land the re-run exactly once (orphan suffixes
  * truncated, never adopted), and pinned cuts must time-travel.
  */
class TagFamilyStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_tagfam").toString

  private def mkIncoming(rows: Seq[(String, String, String)]): DataFrame =
    rows.toDF("asset_uri", "field_id", "field_value")
      .select(col("asset_uri"), lit("").as("column"),
        lit("gov").as("template_id"), col("field_id"),
        lit("string").as("field_type"), col("field_value"))

  private def mkHistory(jobUuid: String,
                        rows: Seq[(String, String)]): DataFrame =
    rows.toDF("asset_name", "n_rows")
      .select(to_timestamp(lit("2026-01-05 00:00:00")).as("event_time"),
        col("asset_name"), lit(jobUuid).as("job_uuid"), col("n_rows"))

  private def tagSet(df: DataFrame): Set[String] =
    df.select("asset_uri", "field_id", "field_value")
      .collect().map(_.mkString("|")).toSet

  private def histUuids(df: DataFrame): Map[String, Long] =
    df.groupBy("job_uuid").count()
      .as[(String, Long)].collect().toMap

  private val j1Tags = Seq(
    ("a/orders", "env", "DEV"), ("a/orders", "n_rows", "100"),
    ("a/region", "n_rows", "5"))
  private val j2Tags = Seq(
    ("a/orders", "env", "PROD"), // update
    ("a/region", "n_rows", ""))  // all-empty instance → delete trigger

  test("commitJob publishes tags+history atomically and reads replay the merge semantics") {
    val root = freshRoot()
    val v1 = TagFamilyStore.commitJob(spark, root, mkIncoming(j1Tags),
      mkHistory("job-1", Seq(("a/orders", "100"), ("a/region", "5"))))
    assert(v1.keySet === Set("tags", "history", "manifest"))
    assert(tagSet(TagFamilyStore.readTags(spark, root)) === Set(
      "a/orders|env|DEV", "a/orders|n_rows|100", "a/region|n_rows|5"))

    TagFamilyStore.commitJob(spark, root, mkIncoming(j2Tags),
      mkHistory("job-2", Seq(("a/orders", "100"))))
    // update applied, delete-when-all-empty applied, untouched survives
    assert(tagSet(TagFamilyStore.readTags(spark, root)) === Set(
      "a/orders|env|PROD", "a/orders|n_rows|100"))
    assert(histUuids(TagFamilyStore.readHistory(spark, root)) ===
      Map("job-1" -> 2L, "job-2" -> 1L))
    // the history day-partition column rides along, sink-identical
    assert(TagFamilyStore.readHistory(spark, root).columns
      .contains("event_date"))
  }

  test("a crash at EVERY inter-commit point leaves readers on the pre-job state for ALL tables") {
    for (crashAt <- Seq("tags", "history", "reports")) {
      val root = freshRoot()
      TagFamilyStore.commitJob(spark, root, mkIncoming(j1Tags),
        mkHistory("job-1", Seq(("a/orders", "100"), ("a/region", "5"))),
        reports = Some(Seq(("a/orders", "gov"))
          .toDF("asset", "template")
          .withColumn("export_time", to_timestamp(lit("2026-01-05 00:00:00")))))
      val cutBefore = TagFamilyStore.currentCutVersion(spark, root)
      val tagsBefore = tagSet(TagFamilyStore.readTags(spark, root))
      val histBefore = histUuids(TagFamilyStore.readHistory(spark, root))

      TagFamilyStore.setTestMidJobHook(root, stage =>
        if (stage == crashAt) throw new RuntimeException("injected job crash"))
      val crashed =
        try {
          TagFamilyStore.commitJob(spark, root, mkIncoming(j2Tags),
            mkHistory("job-2", Seq(("a/orders", "100"))),
            reports = Some(Seq(("a/orders", "gov"))
              .toDF("asset", "template")
              .withColumn("export_time",
                to_timestamp(lit("2026-01-06 00:00:00")))))
          false
        } catch {
          case e: RuntimeException
              if e.getMessage == "injected job crash" => true
        } finally TagFamilyStore.clearTestMidJobHook(root)
      assert(crashed, s"the $crashAt injection must fire")

      // the cut never advanced; tags AND history AND reports serve the
      // pre-job state — none of the crashed job's commits visible
      assert(TagFamilyStore.currentCutVersion(spark, root) === cutBefore,
        s"crash at $crashAt must not advance the cut")
      assert(tagSet(TagFamilyStore.readTags(spark, root)) === tagsBefore,
        s"crash at $crashAt must not change served tags")
      assert(histUuids(TagFamilyStore.readHistory(spark, root)) === histBefore,
        s"crash at $crashAt must not change served history")
      assert(TagFamilyStore.readReports(spark, root,
        TagFamilyStore.readHistory(spark, root)).count() === 1L,
        s"crash at $crashAt must not change served reports")

      // recovery: the re-run lands EXACTLY ONCE — the crashed attempt's
      // orphan suffix is truncated, never adopted (no doubled history,
      // no phantom rows)
      TagFamilyStore.commitJob(spark, root, mkIncoming(j2Tags),
        mkHistory("job-2", Seq(("a/orders", "100"))))
      assert(tagSet(TagFamilyStore.readTags(spark, root)) === Set(
        "a/orders|env|PROD", "a/orders|n_rows|100"),
        s"re-run after $crashAt crash must apply the merge once")
      assert(histUuids(TagFamilyStore.readHistory(spark, root)) ===
        Map("job-1" -> 2L, "job-2" -> 1L),
        s"re-run after $crashAt crash must record job-2 exactly once")
    }
  }

  test("a crashed FIRST job on a fresh store leaves it unreadable-as-uncommitted, and the re-run repairs") {
    val root = freshRoot()
    TagFamilyStore.setTestMidJobHook(root, stage =>
      if (stage == "history") throw new RuntimeException("injected job crash"))
    try intercept[RuntimeException](
      TagFamilyStore.commitJob(spark, root, mkIncoming(j1Tags),
        mkHistory("job-1", Seq(("a/orders", "100")))))
    finally TagFamilyStore.clearTestMidJobHook(root)
    // no cut: the tag table's crash residue is deliberately unreadable
    assert(TagFamilyStore.currentCutVersion(spark, root).isEmpty)
    intercept[IllegalStateException](TagFamilyStore.readTags(spark, root))
    assert(TagFamilyStore.readTagsOr(spark, root,
      mkIncoming(j1Tags)).count() === 0L)
    // re-run: exactly once, orphan truncated
    TagFamilyStore.commitJob(spark, root, mkIncoming(j1Tags),
      mkHistory("job-1", Seq(("a/orders", "100"))))
    assert(tagSet(TagFamilyStore.readTags(spark, root)).size === 3)
    assert(histUuids(TagFamilyStore.readHistory(spark, root)) ===
      Map("job-1" -> 1L))
  }

  test("time travel: a pinned cut re-reads the job-boundary state bit-identically past later merges AND a fold") {
    val root = freshRoot()
    TagFamilyStore.commitJob(spark, root, mkIncoming(j1Tags),
      mkHistory("job-1", Seq(("a/orders", "100"), ("a/region", "5"))))
    val c1 = TagFamilyStore.currentCutVersion(spark, root).get
    val pinnedTags = tagSet(TagFamilyStore.readTags(spark, root))
    val pinnedHist = histUuids(TagFamilyStore.readHistory(spark, root))

    TagFamilyStore.commitJob(spark, root, mkIncoming(j2Tags),
      mkHistory("job-2", Seq(("a/orders", "100"))))
    // the fold REWRITES the tag log (latest-wins squash) and the history
    // chain — the adversarial part: if the pin leaked to current files,
    // the pinned read would see job-2's state
    val folded = TagFamilyStore.compact(spark, root, graceMs = 0L)
    assert(folded("tags").isDefined && folded("history").isDefined)

    assert(tagSet(TagFamilyStore.readTagsAt(spark, root, c1)) === pinnedTags)
    assert(histUuids(TagFamilyStore.readHistoryAt(spark, root, c1)) ===
      pinnedHist)
    // and current still serves the post-job-2 state, fold-invisibly
    assert(tagSet(TagFamilyStore.readTags(spark, root)) === Set(
      "a/orders|env|PROD", "a/orders|n_rows|100"))
    assert(histUuids(TagFamilyStore.readHistory(spark, root)) ===
      Map("job-1" -> 2L, "job-2" -> 1L))
    // the fold actually collapsed the served chains to one dir each
    val pins = StoreCut.cut(spark, root).get
    assert(AtomicStore.filesAt(spark, s"$root/tags", pins("tags")).size === 1)
    assert(AtomicStore.filesAt(spark, s"$root/history",
      pins("history")).size === 1)
  }

  test("the job lease serializes commits: a held lease refuses a second job loudly") {
    val root = freshRoot()
    val lease = AtomicStore.claimLease(spark, s"$root/_job_lease",
      AtomicStore.DefaultLeaseTtlMs, "spec holder")
    try intercept[java.util.ConcurrentModificationException](
      TagFamilyStore.commitJob(spark, root, mkIncoming(j1Tags),
        mkHistory("job-1", Seq(("a/orders", "100")))))
    finally AtomicStore.releaseLease(spark, lease)
    // released → the commit proceeds
    TagFamilyStore.commitJob(spark, root, mkIncoming(j1Tags),
      mkHistory("job-1", Seq(("a/orders", "100"))))
    assert(tagSet(TagFamilyStore.readTags(spark, root)).size === 3)
  }

  test("runJob: the config-evaluation path lands tags+history atomically with runJob-identical semantics") {
    Lake.registerAll(spark, sf)
    val catalog = Lake.tableNames.map(t => ("p", "lake", t))
      .toDF("project", "dataset", "table")
    val config = TagConfig(
      configType = "DYNAMIC_TAG_TABLE", templateId = "gov",
      fields = Seq(FieldSpec("n_rows", "double",
        Some("select count(*) from $table"))),
      includedUris = Seq("bigquery/project/p/dataset/lake/region",
        "bigquery/project/p/dataset/lake/nation"))
    val root = freshRoot()
    TagFamilyStore.runJob(spark, config, catalog, root,
      eventTime = to_timestamp(lit("2026-01-05 00:00:00")),
      jobUuid = lit("job-1"))
    val tags = TagFamilyStore.readTags(spark, root)
    val got = tags.select("asset_uri", "field_value")
      .as[(String, String)].collect().toMap
    assert(got("bigquery/project/p/dataset/lake/region") === "5")
    assert(got("bigquery/project/p/dataset/lake/nation") === "25")
    // history: one row per written tag instance, template fields pivoted
    val hist = TagFamilyStore.readHistory(spark, root)
    assert(histUuids(hist) === Map("job-1" -> 2L))
    assert(hist.columns.contains("n_rows"))

    // a second overwrite=false run skips the already-tagged assets: the
    // job still commits (cut advances — the reference's SUCCEEDED no-op
    // job) but produces zero new tag rows and zero history rows
    val cutBefore = TagFamilyStore.currentCutVersion(spark, root).get
    TagFamilyStore.runJob(spark, config.copy(overwrite = false), catalog,
      root, eventTime = to_timestamp(lit("2026-01-06 00:00:00")),
      jobUuid = lit("job-2"))
    assert(TagFamilyStore.currentCutVersion(spark, root).get > cutBefore)
    assert(tagSet(TagFamilyStore.readTags(spark, root)) ===
      tagSet(tags))
    assert(histUuids(TagFamilyStore.readHistory(spark, root)) ===
      Map("job-1" -> 2L))
  }

  test("a zombie job (lease broken mid-commit) aborts on its CAS'd cut publish instead of tearing the cut") {
    val root = freshRoot()
    TagFamilyStore.commitJob(spark, root, mkIncoming(j1Tags),
      mkHistory("job-1", Seq(("a/orders", "100"), ("a/region", "5"))))
    // the zombie: job-2's tables commit, then — before its single cut
    // publish — the cut MOVES (a successor legally broke the stalled
    // lease and published). A blind max-merge would adopt the zombie's
    // stale-parented table versions; the CAS must abort loudly instead.
    TagFamilyStore.setTestMidJobHook(root, stage =>
      if (stage == "history")
        StoreCut.advance(spark, root, Map("zz_breaker" -> 0L)))
    try intercept[java.util.ConcurrentModificationException](
      TagFamilyStore.commitJob(spark, root, mkIncoming(j2Tags),
        mkHistory("job-2", Seq(("a/orders", "100")))))
    finally TagFamilyStore.clearTestMidJobHook(root)
    // the zombie's commits are invisible — job-1 still serves
    assert(tagSet(TagFamilyStore.readTags(spark, root)) === Set(
      "a/orders|env|DEV", "a/orders|n_rows|100", "a/region|n_rows|5"))
    assert(histUuids(TagFamilyStore.readHistory(spark, root)) ===
      Map("job-1" -> 2L))
    // and the re-run truncates the zombie's orphans and lands once
    TagFamilyStore.commitJob(spark, root, mkIncoming(j2Tags),
      mkHistory("job-2", Seq(("a/orders", "100"))))
    assert(tagSet(TagFamilyStore.readTags(spark, root)) === Set(
      "a/orders|env|PROD", "a/orders|n_rows|100"))
    assert(histUuids(TagFamilyStore.readHistory(spark, root)) ===
      Map("job-1" -> 2L, "job-2" -> 1L))
  }

  test("standalone TagStore writers refuse a family-governed tags table") {
    val root = freshRoot()
    TagFamilyStore.commitJob(spark, root, mkIncoming(j1Tags),
      mkHistory("job-1", Seq(("a/orders", "100"))))
    // a direct merge would commit tag state the family's history never
    // records; a direct log fold's keep-2 vacuum would reclaim pinned
    // manifests — both refuse with the family remedy
    for ((what, op) <- Seq[(String, () => Any)](
        ("mergeCommit", () =>
          TagStore.mergeCommit(spark, s"$root/tags", mkIncoming(j2Tags))),
        ("appendMergeCommit", () =>
          TagStore.appendMergeCommit(spark, s"$root/tags",
            mkIncoming(j2Tags))),
        ("compactLog", () => TagStore.compactLog(spark, s"$root/tags")))) {
      val e = intercept[IllegalStateException](op())
      assert(e.getMessage.contains("TagFamilyStore"), s"$what must refuse")
    }
    // and a standalone store (no manifest sibling) keeps the direct path
    val lone = s"${freshRoot()}/tags"
    TagStore.appendMergeCommit(spark, lone, mkIncoming(j1Tags))
    TagStore.compactLog(spark, lone)
    assert(TagStore.readLatestState(spark, lone).count() === 3L)
  }

  test("readLatestStateAt: the standalone delta log time-travels symmetrically") {
    val root = s"${freshRoot()}/taglog"
    val v1 = TagStore.appendMergeCommit(spark, root, mkIncoming(j1Tags))
    val stateAtV1 = TagStore.readLatestState(spark, root)
      .collect().map(_.mkString("|")).toSet
    TagStore.appendMergeCommit(spark, root, mkIncoming(j2Tags))
    // the pinned version replays only the batches at or below it
    assert(TagStore.readLatestStateAt(spark, root, v1)
      .collect().map(_.mkString("|")).toSet === stateAtV1)
    assert(TagStore.readLatestState(spark, root)
      .collect().map(_.mkString("|")).toSet !== stateAtV1)
  }
}
