package graft

import org.apache.spark.sql.functions._
import graft.sched.Scheduler

/** H1/H2 + config idempotence (A14). */
class SchedulerSpec extends SparkSpec {
  import spark.implicits._

  test("deactivateSuperseded keeps only the newest config per content hash") {
    val configs = Seq(
      ("c1", "m1", 1L, "ACTIVE"), ("c2", "m1", 2L, "ACTIVE"),
      ("c3", "m2", 1L, "ACTIVE"))
      .toDF("config_uuid", "content_md5", "version", "config_status")
    val out = Scheduler.deactivateSuperseded(configs)
      .select("config_uuid", "config_status").as[(String, String)]
      .collect().toMap
    assert(out === Map("c1" -> "INACTIVE", "c2" -> "ACTIVE", "c3" -> "ACTIVE"))
  }

  test("advanceNextRun only touches launched configs") {
    val configs = Seq(
      ("c1", 5L, "2024-03-01 11:00:00", 3L),
      ("c2", 5L, "2024-03-01 13:00:00", 1L))
      .toDF("config_uuid", "refresh_frequency_minutes", "nr", "version")
      .withColumn("next_run", to_timestamp($"nr")).drop("nr")
    val launched = Seq("c1").toDF("config_uuid")
    val out = Scheduler.advanceNextRun(configs, launched)
      .select($"config_uuid", $"next_run".cast("string"), $"version")
      .as[(String, String, Long)].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out("c1") === ("2024-03-01 11:05:00", 4L))
    assert(out("c2") === ("2024-03-01 13:00:00", 1L))
  }
}
