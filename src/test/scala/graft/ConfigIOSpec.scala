package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.ConfigIO

/** Reference-shaped config JSON decoding (FIXTURES.md §1). */
class ConfigIOSpec extends AnyFunSuite {

  test("dynamic_table_auto.json shape parses") {
    val cfg = ConfigIO.parse(
      """{
        |  "template_id": "cities_311", "template_project": "p", "template_region": "r",
        |  "fields": [
        |    {"field_id": "sum_total_requests", "field_type": "double",
        |     "query_expression": "select count(*) from $table"},
        |    {"field_id": "tag_snapshot_time", "field_type": "datetime",
        |     "query_expression": "select current_datetime"}
        |  ],
        |  "included_tables_uris": "bigquery/project/p/dataset/d/*",
        |  "excluded_tables_uris": "",
        |  "refresh_mode": "AUTO", "refresh_frequency": 5, "refresh_unit": "minutes",
        |  "tag_history": false
        |}""".stripMargin)
    assert(cfg.templateId === "cities_311")
    assert(cfg.fields.map(_.fieldId) ===
      Seq("sum_total_requests", "tag_snapshot_time"))
    assert(cfg.fields.head.queryExpression.get === "select count(*) from $table")
    assert(cfg.includedUris === Seq("bigquery/project/p/dataset/d/*"))
    assert(cfg.excludedUris === Nil)
    assert(cfg.refreshMode === "AUTO" && cfg.refreshFrequencyMinutes === 5L)
  }

  test("static asset config: field_value literals, hours unit, overwrite") {
    val cfg = ConfigIO.parse(
      """{"config_type": "STATIC_TAG_ASSET", "template_id": "gov",
        | "fields": [{"field_id": "env", "field_type": "enum", "field_value": "PROD"}],
        | "included_assets_uris": "gs://b/f1, gs://b/f2",
        | "overwrite": false,
        | "refresh_mode": "AUTO", "refresh_frequency": 2, "refresh_unit": "hours"}"""
        .stripMargin)
    assert(cfg.fields.head.fieldValue === Some("PROD"))
    assert(cfg.includedUris === Seq("gs://b/f1", "gs://b/f2"))
    assert(!cfg.overwrite)
    assert(cfg.refreshFrequencyMinutes === 120L)
  }

  test("AUTO refresh normalizes like validate_auto_refresh") {
    // TagEngineStoreHandler.py:623–646: zero/negative/junk frequency →
    // 24; a digits-only string passes; an unrecognized unit defaults to
    // DAYS (the reference's explicit else-branch), never minutes
    def freqOf(frag: String): Long = ConfigIO.parse(
      s"""{"template_id": "t", "refresh_mode": "AUTO", $frag}""")
      .refreshFrequencyMinutes
    assert(freqOf(""""refresh_frequency": 0, "refresh_unit": "hours"""") === 24L * 60)
    assert(freqOf(""""refresh_frequency": -3, "refresh_unit": "minutes"""") === 24L)
    assert(freqOf(""""refresh_frequency": "12", "refresh_unit": "hours"""") === 12L * 60)
    // Python isdigit rejects signs, spaces and decimals → 24
    assert(freqOf(""""refresh_frequency": "-5", "refresh_unit": "minutes"""") === 24L)
    assert(freqOf(""""refresh_frequency": "1.5", "refresh_unit": "minutes"""") === 24L)
    // unknown unit → days
    assert(freqOf(""""refresh_frequency": 2, "refresh_unit": "weeks"""") === 2L * 1440)
    // Python isdigit+int parses Unicode decimal digits ("١٢" = 12) — the
    // old forall(isDigit)+toLong crashed parse() here
    assert(freqOf(""""refresh_frequency": "١٢", "refresh_unit": "hours"""") === 12L * 60)
    // a frequency past Long.MaxValue clamps (effectively never) instead
    // of wrapping negative (= due immediately) — int or digit string,
    // through the unit multiply too
    assert(freqOf(""""refresh_frequency": 99999999999999999999, "refresh_unit": "hours"""") === Long.MaxValue)
    assert(freqOf(""""refresh_frequency": "99999999999999999999", "refresh_unit": "days"""") === Long.MaxValue)
    // all-zero digit string rides the same < 1 fallback as the int 0
    assert(freqOf(""""refresh_frequency": "00", "refresh_unit": "minutes"""") === 24L)
    // ON_DEMAND stores 0 ("N/A", TagEngineStoreHandler.py:443)
    assert(ConfigIO.parse("""{"template_id": "t", "refresh_mode": "ON_DEMAND"}""")
      .refreshFrequencyMinutes === 0L)
  }

  test("import header asset-type inference (main.py:3445-3461)") {
    assert(ConfigIO.inferAssetType(
      Seq("project", "dataset", "table", "column", "x")) === "bigquery")
    assert(ConfigIO.inferAssetType(
      Seq("project", "entry_group", "fileset", "f")) === "fileset")
    assert(ConfigIO.inferAssetType(
      Seq("project", "instance", "database", "table")) === "spanner")
    intercept[IllegalArgumentException](ConfigIO.inferAssetType(Seq("x")))
  }
}
