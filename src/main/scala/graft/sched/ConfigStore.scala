package graft.sched

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent config store (SURVEY.md §2 A14;
  * TagEngineStoreHandler.py:366–1131): create / list / delete / purge over
  * a configs LAKE TABLE, with md5 content identity.
  *
  * The reference keeps configs as Firestore documents and, on every write,
  * queries for an existing doc with the same md5(uris)+template to mark it
  * INACTIVE (:366–392 `_check_config_type`/dedupe path). Here the store is
  * a DataFrame (backing table: parquet/Delta `configs`), identity is a
  * `content_md5` column computed from the semantic content, and the
  * supersede step is [[Scheduler.deactivateSuperseded]]'s window — newest
  * version per identity stays, older duplicates flip INACTIVE. All
  * operations are set-based transforms producing the NEXT state, so they
  * batch (1 config or 10⁶) and MERGE onto any ACID table format.
  */
object ConfigStore {

  /** Semantic identity (TagEngineStoreHandler.py:366–392: md5 over the
    * config's included uris + template): one deterministic hash column —
    * duplicate configs collide, re-creates of the same config supersede.
    */
  def contentMd5: Column =
    md5(concat_ws("|", col("template_id"), col("config_type"),
      col("included_uris")))

  def withIdentity(configs: DataFrame): DataFrame =
    configs.withColumn("content_md5", contentMd5)

  /** Create (append) configs: incoming rows get their identity hash and a
    * version one above the store's max for that identity, then older
    * same-identity rows are deactivated ([[Scheduler.deactivateSuperseded]]).
    * Returns the next store state (INACTIVE history rows retained, like the
    * reference's Firestore docs).
    */
  def create(store: DataFrame, incoming: DataFrame): DataFrame = {
    val cur = withIdentity(store)
    val maxV = cur.groupBy("content_md5").agg(max("version").as("__maxv"))
    val incV = withIdentity(incoming)
      .join(maxV, Seq("content_md5"), "left_outer")
      .withColumn("version", coalesce(col("__maxv"), lit(0L)) + 1)
      .drop("__maxv")
    Scheduler.deactivateSuperseded(
      cur.unionByName(incV.select(cur.columns.map(col): _*)))
  }

  /** List configs, optionally filtered by type and/or status
    * (TagEngineStoreHandler.py:1180–1201).
    */
  def listConfigs(store: DataFrame, configType: Option[String] = None,
                  status: Option[String] = None): DataFrame = {
    val byType = configType.map(t => store.filter(col("config_type") === t))
      .getOrElse(store)
    status.map(s => byType.filter(col("config_status") === s)).getOrElse(byType)
  }

  /** Delete one config document (TagEngineStoreHandler.py:  delete path). */
  def deleteConfig(store: DataFrame, configUuid: String): DataFrame =
    store.filter(col("config_uuid") =!= configUuid)

  /** Purge every config of a type (TagEngineStoreHandler.py purge path). */
  def purge(store: DataFrame, configType: String): DataFrame =
    store.filter(col("config_type") =!= configType)

  /** Persist / recover the store as a lake table. On a real lake this is a
    * Delta/Iceberg MERGE; plain parquet overwrite keeps the same contract
    * locally.
    */
  def write(store: DataFrame, path: String): Unit =
    store.write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
