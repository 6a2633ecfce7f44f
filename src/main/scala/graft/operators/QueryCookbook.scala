package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-cookbook extension parity (extensions/query_cookbook/): compute
  * per-asset ACCESS-PATTERN tags from the warehouse query log — the
  * reference reads INFORMATION_SCHEMA.JOBS, takes top users by query
  * count (summarize_users/main.py: `group by user_email order by count(*)
  * desc limit N`) and extracts fields/wheres/group-bys/functions from the
  * raw query texts via `ML.GENERATE_TEXT` at temperature 0
  * (summarize_sql/main.py:118–147), formatting the top hits into a
  * `query_cookbook` tag.
  *
  * Spark-first deltas:
  *  - the per-asset, per-operation cloud-function calls become ONE pass
  *    over the log: extract all dimensions in a narrow projection, one
  *    map-side-combining count per (asset, dimension, value), one
  *    per-(asset, dimension) top-k window (groups are k-bounded — no
  *    global sort);
  *  - the LLM extraction step is STUBBED with a deterministic regex
  *    extractor (clearly-marked sandbox stand-in for `ML.GENERATE_TEXT`,
  *    exactly like Multimodal's codec stubs): the model isn't available
  *    here, and temperature-0 extraction of `SELECT f / WHERE f / GROUP
  *    BY f / function(` patterns is regex-shaped for the synthetic log.
  *    The plumbing around it — log scan, grouping, top-k, richtext
  *    formatting, tag-row melt — is the real workflow.
  */
object QueryCookbook {

  /** The six extraction dimensions the reference computes (top_users via
    * summarize_users; the rest via summarize_sql prompts — fields, wheres,
    * JOINS, group_bys, functions: query_cookbook_config.json lists all
    * six field_ids, and summarize_sql/main.py:62–75 routes a prompt per
    * operation including JOINS_PROMPT).
    */
  val Dimensions: Seq[String] =
    Seq("top_users", "top_fields", "top_wheres", "top_joins",
      "top_groupbys", "top_functions")

  /** STUB for the reference's ML.GENERATE_TEXT extraction (temperature 0,
    * summarize_sql/main.py:145–147): deterministic regex pulls of the
    * selected field, WHERE fragment, GROUP BY column and aggregate
    * function from one query text. Returns one column per dimension
    * (empty string = no hit, filtered out downstream).
    */
  def extractDims(query: Column, userEmail: Column): Seq[(String, Column)] =
    Seq(
      "top_users" -> userEmail,
      "top_fields" -> regexp_extract(query,
        "(?i)SELECT\\s+(?:\\w+\\()?(\\w+)", 1),
      "top_wheres" -> regexp_extract(query,
        "(?i)WHERE\\s+(\\w+\\s*[<>=]+\\s*\\w+)", 1),
      // the joins prompt's answer shape starts at FROM ("from oltp.A h
      // join oltp.B i on h.x = i.x", prompts/joins_prompt.txt example) —
      // so the pattern must accept an optional table alias on each side
      // and dotted qualified ON columns, or every realistically aliased
      // log row extracts "". No lookaheads (the oracle runs this same
      // pattern under RE2): on unaliased queries the optional alias slot
      // can't eat the JOIN/ON keyword because the mandatory literal that
      // follows would then fail, and the engine retries without it.
      // DELIBERATE broadening: the alias slot also consumes a join-TYPE
      // keyword, so "FROM t LEFT JOIN u ON ..." / "INNER JOIN" match with
      // the keyword in the alias position — qualified joins count toward
      // top_joins too, which is what the reference's LLM extraction would
      // return for those rows (an RE2-safe keyword exclusion would need a
      // lookahead, so the broadened match is the documented contract)
      "top_joins" -> regexp_extract(query,
        "(?i)(FROM\\s+\\S+(?:\\s+(?:AS\\s+)?\\w+)?\\s+JOIN\\s+\\S+" +
          "(?:\\s+(?:AS\\s+)?\\w+)?\\s+ON\\s+[\\w.]+\\s*=\\s*[\\w.]+)", 1),
      "top_groupbys" -> regexp_extract(query,
        "(?i)GROUP BY\\s+(\\w+)", 1),
      "top_functions" -> regexp_extract(query, "(?i)(\\w+)\\(", 1))

  /** Per-asset access-pattern tag rows: `jobs(asset, user_email, query)` →
    * one `query_cookbook` tag per asset with the top-`k` values per
    * dimension, formatted `value:count` and `<br>`-joined (the
    * reference's richtext HTML join, format_predictions). Deterministic:
    * count desc, value asc.
    */
  def cookbookTagRows(jobs: DataFrame, templateId: String,
                      k: Int = 3,
                      excludedAccounts: Seq[String] = Nil): DataFrame = {
    val dims = extractDims(col("query"), col("user_email"))
    // the reference's excluded_accounts knob filters the LOG rows
    // (`user_email not in (…)`, summarize_users/main.py:55–69 and
    // summarize_sql's identical clause), so service-account noise drops
    // out of every dimension, not just top_users
    val log =
      if (excludedAccounts.isEmpty) jobs
      else jobs.filter(!col("user_email").isin(excludedAccounts: _*))
    val dimRows = log.select(col("asset"),
        explode(array(dims.map { case (d, c) =>
          struct(lit(d).as("dim"), c.as("value"))
        }: _*)).as("e"))
      .select(col("asset"), col("e.dim"), col("e.value"))
      .filter(col("value").isNotNull && col("value") =!= "")
    val counts = dimRows.groupBy("asset", "dim", "value")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("asset", "dim")
      .orderBy(col("cnt").desc, col("value").asc)
    val top = counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    top.groupBy("asset", "dim")
      .agg(array_join(transform(
          sort_array(collect_list(struct(
            (-col("cnt")).as("neg"), col("value").as("v")))),
          e => concat(e.getField("v"), lit(":"),
            (-e.getField("neg")).cast("string"))), "<br>").as("field_value"))
      .select(col("asset").as("asset_uri"), lit("").as("column"),
        lit(templateId).as("template_id"), col("dim").as("field_id"),
        lit("richtext").as("field_type"), col("field_value"))
  }
}
