package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TagFamilyStore
import graft.queries.CoreQueries.Q

/** Tag-engine-parity queries, part 6 (round 18): the tag-engine FAMILY
  * cut — tags + history published under ONE atomic manifest
  * ([[graft.operators.TagFamilyStore]], the StoreCut shape extended to
  * the engine's busiest write family) under the oracle gate.
  *
  * q53 is q48's shape for the family: committed jobs interleaved with
  * jobs CRASHED at every inter-commit point (via the same injection
  * seam the crash specs and the `tag_family_crash` gate use), read back
  * through the cut — the crashed jobs' commits must be invisible in
  * BOTH tables, and the re-run must land exactly once (reference
  * analogue: the create/update RPC then the history insert,
  * DataCatalogController.py:1608–1652 → BigQueryUtils.py:391–440, which
  * simply tears there).
  *
  * q54 is s19's shape for tags: pin a cut at a job boundary, mutate and
  * FOLD the store, and the pinned read must still serve the original
  * state bit-identically — adversarial by construction, because the
  * fold rewrites the tag log to the CURRENT latest-wins state, so a
  * pin that leaked to current files would read PROD where the oracle
  * says DEV.
  */
object CoreQueries6 {

  /** One job's tag rows in the unified shape (q48's mk, family-sized). */
  private def mkIncoming(spark: SparkSession,
                         rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("asset_uri", "field_id", "field_value")
      .select(col("asset_uri"), lit("").as("column"),
        lit("gov").as("template_id"), col("field_id"),
        lit("string").as("field_type"), col("field_value"))
  }

  private def mkHistory(spark: SparkSession, jobUuid: String,
                        assets: Seq[String]): DataFrame = {
    import spark.implicits._
    assets.toDF("asset_name")
      .select(to_timestamp(lit("2026-01-05 00:00:00")).as("event_time"),
        col("asset_name"), lit(jobUuid).as("job_uuid"))
  }

  /** (phase, k, v) projections of the two family tables — the labeled
    * union both queries dump for the oracle compare.
    */
  private def tagRows(tags: DataFrame, phase: String): DataFrame =
    tags.select(lit(phase).as("phase"),
      concat(col("asset_uri"), lit("|"), col("field_id")).as("k"),
      col("field_value").as("v"))

  private def histRows(hist: DataFrame, phase: String): DataFrame =
    hist.groupBy("job_uuid").count()
      .select(lit(phase).as("phase"), col("job_uuid").as("k"),
        col("count").cast("string").as("v"))

  // --------------- family-cut job atomicity (q53)

  /** Four jobs against one family store: J1 commits; J2 crashes after
    * its TAG commit (history never landed, cut never advanced); J3
    * crashes after its HISTORY commit (both tables committed, the single
    * cut publish never reached — the widest tear window); J4 commits,
    * truncating the orphan suffixes. The dump captures the served state
    * after the crashes (must equal J1 exactly — no phantom tags, no
    * phantom history) and after J4 (J1+J4 merged, exactly once).
    */
  def q53JobAtomicity(spark: SparkSession, dir: String): DataFrame =
    CoreQueries.withTempDir(spark, "graft_q53") { rootPath =>
      val root = rootPath.toString
      def crashJob(stage: String, tags: Seq[(String, String, String)],
                   uuid: String): Unit = {
        TagFamilyStore.setTestMidJobHook(root, s =>
          if (s == stage) throw new RuntimeException("injected job crash"))
        try {
          TagFamilyStore.commitJob(spark, root, mkIncoming(spark, tags),
            mkHistory(spark, uuid, tags.map(_._1)))
          throw new IllegalStateException("q53: the injection must fire")
        } catch {
          case e: RuntimeException
              if e.getMessage == "injected job crash" => ()
        } finally TagFamilyStore.clearTestMidJobHook(root)
      }
      TagFamilyStore.commitJob(spark, root, mkIncoming(spark, Seq(
          ("a/orders", "env", "DEV"), ("a/orders", "n_rows", "100"),
          ("a/region", "n_rows", "5"))),
        mkHistory(spark, "job-1", Seq("a/orders", "a/region")))
      crashJob("tags", Seq(("a/orders", "env", "GONE")), "job-2x")
      crashJob("history", Seq(("a/orders", "env", "GONE2")), "job-3x")
      val afterCrash =
        tagRows(TagFamilyStore.readTags(spark, root), "after_crash_tags")
          .unionByName(histRows(TagFamilyStore.readHistory(spark, root),
            "after_crash_hist"))
      TagFamilyStore.commitJob(spark, root, mkIncoming(spark, Seq(
          ("a/orders", "env", "PROD"),
          ("a/region", "n_rows", ""))), // all-empty instance → delete
        mkHistory(spark, "job-4", Seq("a/orders")))
      afterCrash
        .unionByName(tagRows(TagFamilyStore.readTags(spark, root),
          "final_tags"))
        .unionByName(histRows(TagFamilyStore.readHistory(spark, root),
          "final_hist"))
        .orderBy("phase", "k")
    }

  val q53Oracle: String =
    """SELECT * FROM (VALUES
      |  ('after_crash_hist', 'job-1', '2'),
      |  ('after_crash_tags', 'a/orders|env', 'DEV'),
      |  ('after_crash_tags', 'a/orders|n_rows', '100'),
      |  ('after_crash_tags', 'a/region|n_rows', '5'),
      |  ('final_hist', 'job-1', '2'),
      |  ('final_hist', 'job-4', '1'),
      |  ('final_tags', 'a/orders|env', 'PROD'),
      |  ('final_tags', 'a/orders|n_rows', '100'))
      |  t(phase, k, v)
      |ORDER BY phase, k""".stripMargin

  // --------------- tag-store time travel (q54)

  /** Pin the cut at the first job's boundary, mutate (update + delete)
    * with a second job, FOLD the whole store (the tag log squashes to
    * the current latest-wins state; the pinned read must resolve the
    * PRE-fold chain through the retained cut manifest), then dump the
    * pinned state next to the current one.
    */
  def q54TagTimeTravel(spark: SparkSession, dir: String): DataFrame =
    CoreQueries.withTempDir(spark, "graft_q54") { rootPath =>
      val root = rootPath.toString
      TagFamilyStore.commitJob(spark, root, mkIncoming(spark, Seq(
          ("a/orders", "env", "DEV"), ("a/orders", "n_rows", "100"),
          ("a/region", "n_rows", "5"))),
        mkHistory(spark, "job-1", Seq("a/orders", "a/region")))
      val c1 = TagFamilyStore.currentCutVersion(spark, root).get
      TagFamilyStore.commitJob(spark, root, mkIncoming(spark, Seq(
          ("a/orders", "env", "PROD"),
          ("a/region", "n_rows", ""))),
        mkHistory(spark, "job-2", Seq("a/orders")))
      // grace 0: reclamation is immediate — ONLY the retained-cut floor
      // keeps the pinned chain readable, which is exactly the claim
      TagFamilyStore.compact(spark, root, graceMs = 0L)
      tagRows(TagFamilyStore.readTagsAt(spark, root, c1), "pinned")
        .unionByName(tagRows(TagFamilyStore.readTags(spark, root),
          "current"))
        .orderBy("phase", "k")
    }

  val q54Oracle: String =
    """SELECT * FROM (VALUES
      |  ('current', 'a/orders|env', 'PROD'),
      |  ('current', 'a/orders|n_rows', '100'),
      |  ('pinned', 'a/orders|env', 'DEV'),
      |  ('pinned', 'a/orders|n_rows', '100'),
      |  ('pinned', 'a/region|n_rows', '5'))
      |  t(phase, k, v)
      |ORDER BY phase, k""".stripMargin

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("q53_job_atomicity", q53JobAtomicity _, Some(q53Oracle)),
    ("q54_tag_time_travel", q54TagTimeTravel _, Some(q54Oracle)))
}
