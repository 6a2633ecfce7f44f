package graft

import org.apache.spark.sql.functions._

import graft.operators.{QueryCookbook, UsageTracking}

/** Extension-parity details for the query-cookbook and usage-tracking
  * operators that the q41/q42 oracles can't see on their own:
  * the six-field cookbook surface (query_cookbook_config.json lists
  * top_joins alongside the five older dimensions), the excluded_accounts
  * log filter, and the start_date DAY-truncation window.
  */
class CookbookUsageSpec extends SparkSpec {
  import spark.implicits._

  test("cookbook covers all six reference template fields incl. top_joins") {
    // reference field_ids: query_cookbook_config.json fields[*].field_id
    assert(QueryCookbook.Dimensions ===
      Seq("top_users", "top_fields", "top_wheres", "top_joins",
        "top_groupbys", "top_functions"))
    val jobs = Seq(
      ("a1", "u1", "SELECT f1 FROM lake.t1 JOIN lake.t2 ON f1 = f1"),
      ("a1", "u2", "SELECT f1 FROM lake.t1 JOIN lake.t2 ON f1 = f1"),
      ("a1", "u1", "SELECT f2 FROM lake.t1 WHERE f3 > 10"),
      ("a1", "u2", "SELECT sum(f4) FROM lake.t1 GROUP BY f5"))
      .toDF("asset", "user_email", "query")
    val out = QueryCookbook.cookbookTagRows(jobs, "query_cookbook")
    val joins = out.filter($"field_id" === "top_joins")
      .select("field_value").as[String].collect()
    // join value is the whole FROM…JOIN…ON fragment (the joins prompt's
    // example answer shape), counted across the two identical queries
    assert(joins === Array("FROM lake.t1 JOIN lake.t2 ON f1 = f1:2"))
    assert(out.select("field_id").distinct().count() === 6)
  }

  test("excluded_accounts filters the LOG, so every dimension drops it") {
    val jobs = Seq(
      ("a1", "svc@robot", "SELECT f9 FROM lake.t1 GROUP BY f9"),
      ("a1", "human", "SELECT f1 FROM lake.t1"))
      .toDF("asset", "user_email", "query")
    val out = QueryCookbook.cookbookTagRows(jobs, "qc",
      excludedAccounts = Seq("svc@robot"))
    val byDim = out.select("field_id", "field_value").as[(String, String)]
      .collect().toMap
    assert(byDim("top_users") === "human:1")
    // the robot's f9 select and group-by vanish from the SQL dimensions
    // too — the reference applies the NOT IN to the jobs scan itself
    assert(byDim("top_fields") === "f1:1")
    assert(!byDim.contains("top_groupbys"))
  }

  test("start_date window uses the reference's DAY truncation semantics") {
    val audit = Seq(
      // 03:00 ON the start day: raw ts < midnight-anchored bound would
      // drop it, but timestamp_trunc(ts, DAY) >= start keeps it
      ("2024-03-02 03:00:00", UsageTracking.MethodTagCreate),
      ("2024-03-01 23:59:59", UsageTracking.MethodTagCreate),
      ("2024-03-03 00:00:00", UsageTracking.MethodTagUpdate))
      .toDF("ts", "method")
      .select(to_timestamp($"ts").as("event_time"), lit("p").as("project"),
        lit("u").as("user_email"), $"method", lit("e1").as("dc_entry"))
    val lookup = Seq(("e1", "p.d.t")).toDF("dc_entry", "bq_resource")
    val kept = UsageTracking
      .allUsageEvents(audit, lookup, startDate = Some("2024-03-02"))
      .select("event_time").as[java.sql.Timestamp].collect().map(_.toString)
    assert(kept.sorted === Array("2024-03-02 03:00:00.0", "2024-03-03 00:00:00.0"))
    // no window → all three
    assert(UsageTracking.allUsageEvents(audit, lookup).count() === 3)
  }
}
