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

  test("top_joins matches the joins prompt's aliased, qualified shape") {
    // the prompt's own example answer ("from oltp.A h join oltp.B i on
    // h.x = i.x") carries table aliases and dotted ON columns — the
    // extractor must accept both, and still match the unaliased form
    val jobs = Seq(
      ("a1", "u1", "select * from oltp.A h join oltp.B i on h.x = i.x"),
      ("a1", "u2", "SELECT f1 FROM lake.t1 JOIN lake.t2 ON f1 = f2"),
      ("a1", "u3", "SELECT c FROM d.t AS x JOIN d.u AS y ON x.k = y.k"))
      .toDF("asset", "user_email", "query")
    val joins = QueryCookbook.cookbookTagRows(jobs, "qc")
      .filter($"field_id" === "top_joins")
      .select("field_value").as[String].collect()
    assert(joins.length === 1)
    val vals = joins.head.split("<br>").toSet
    assert(vals === Set(
      "from oltp.A h join oltp.B i on h.x = i.x:1",
      "FROM lake.t1 JOIN lake.t2 ON f1 = f2:1",
      "FROM d.t AS x JOIN d.u AS y ON x.k = y.k:1"))
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

  test("start_date window is UTC, independent of the session timezone") {
    // BigQuery's timestamp_trunc(DAY) is UTC; a session-tz date_trunc
    // would shift the boundary by the zone offset. Pin with fixed
    // instants (timestamp_seconds is tz-independent) under a non-UTC
    // session tz: 2024-03-02T03:00:00Z is IN the 2024-03-02 window even
    // though in America/Los_Angeles it is still 2024-03-01 19:00 local.
    val tzKey = "spark.sql.session.timeZone"
    val oldTz = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/Los_Angeles")
      val audit = Seq(
        1709348400L, // 2024-03-02T03:00:00Z — in (UTC day = start day)
        1709337599L, // 2024-03-01T23:59:59Z — out (UTC day before)
        1709424000L) // 2024-03-03T00:00:00Z — in
        .toDF("sec")
        .select(timestamp_seconds($"sec").as("event_time"),
          lit("p").as("project"), lit("u").as("user_email"),
          lit(UsageTracking.MethodTagCreate).as("method"),
          lit("e1").as("dc_entry"))
      val lookup = Seq(("e1", "p.d.t")).toDF("dc_entry", "bq_resource")
      val kept = UsageTracking
        .allUsageEvents(audit, lookup, startDate = Some("2024-03-02"))
        .select(unix_seconds($"event_time")).as[Long].collect().sorted
      assert(kept === Array(1709348400L, 1709424000L))
    } finally spark.conf.set(tzKey, oldTz)
  }
}
