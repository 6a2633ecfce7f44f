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

  test("create supersedes same-content configs and bumps version") {
    val next = ConfigStore.create(store,
      mk(Seq(("c3", "DYNAMIC_TAG_TABLE", "gov", "u1", "ACTIVE", 0L))))
    val byUuid = next.select("config_uuid", "config_status", "version")
      .as[(String, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byUuid("c1") === ("INACTIVE", 1L))
    assert(byUuid("c3") === ("ACTIVE", 2L))
    assert(byUuid("c2") === ("ACTIVE", 1L))
  }

  test("delete removes one doc; purge removes a type") {
    assert(ConfigStore.deleteConfig(store, "c1")
      .select("config_uuid").as[String].collect().toSeq === Seq("c2"))
    assert(ConfigStore.purge(store, "STATIC_TAG_ASSET")
      .select("config_uuid").as[String].collect().toSeq === Seq("c1"))
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
