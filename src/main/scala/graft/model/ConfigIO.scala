package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config JSON decoding (SURVEY.md §1.1: "case classes decoded from JSON").
  *
  * Accepts the reference's config document shapes (FIXTURES.md §1 /
  * examples/configs/): `fields` with `field_id`/`field_type` and either
  * `query_expression` (dynamic) or `field_value` (static);
  * `included_*_uris` as a comma-separated string or array;
  * `refresh_mode/frequency/unit`; `overwrite`; `tag_history`. Unknown keys
  * are ignored (the reference's documents carry service metadata we don't
  * need). json4s ships with Spark — no extra dependency.
  */
object ConfigIO {

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case JInt(i)    => Some(i.toString)
    case JDouble(d) => Some(d.toString)
    case JBool(b)   => Some(b.toString)
    case _          => None
  }

  private def uris(v: JValue): Seq[String] = v match {
    case JString(s)  => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // same normalization as the comma-string form: a padded array entry
    // ("bigquery/.../orders ") would otherwise throw in AssetUri.parse or
    // silently match nothing as a glob fragment
    case JArray(els) => els.flatMap(str).map(_.trim).filter(_.nonEmpty)
    case _           => Nil
  }

  /** Minutes multiplier for the reference's refresh units
    * (TagEngineStoreHandler.py:637–644): an UNRECOGNIZED unit falls back
    * to DAYS (`else: … timedelta(days=delta)` — the reference's explicit
    * "default to days" branch), not minutes — a typo'd unit must slow a
    * schedule down, never turn a 24-day cadence into a 24-minute one.
    */
  private def unitMinutes(unit: String): Long =
    unit.toLowerCase(java.util.Locale.ROOT) match {
    case "minutes" => 1L
    case "hours"   => 60L
    case "days"    => 1440L
    case _         => 1440L
  }

  /** The reference's frequency normalization for AUTO configs
    * (validate_auto_refresh, TagEngineStoreHandler.py:623–635): a
    * positive int passes through; a string passes only if it is all
    * digits (Python isdigit — so "-5", "1.5", " 12 " all fall back);
    * everything else (zero, negative, junk) becomes 24.
    */
  private def normalizeAutoFrequency(v: org.json4s.JValue): Long = v match {
    // clamp a BigInt beyond Long range instead of toLong (which silently
    // WRAPS to a negative frequency — Python just keeps the huge value,
    // i.e. effectively-never; 24 would be the opposite)
    case JInt(i) if i > 0 =>
      if (i > Long.MaxValue) Long.MaxValue else i.toLong
    // Python isdigit+int() parses Unicode decimal digits too ("١٢" = 12),
    // so fold through Character.digit instead of toLong (which throws
    // NumberFormatException on non-ASCII digits, crashing parse() where
    // the reference succeeds); "0"/"00" normalize to 24 like Python's
    // `if frequency < 1` branch
    case JString(s) if s.nonEmpty && s.forall(_.isDigit) =>
      val v = s.foldLeft(BigInt(0))((acc, c) =>
        acc * 10 + Character.digit(c, 10))
      if (v > Long.MaxValue) Long.MaxValue
      else if (v > 0) v.toLong
      else 24L
    case _ => 24L
  }

  def parse(json: String): TagConfig = {
    val j = JsonMethods.parse(json)
    val fields = (j \ "fields") match {
      case JArray(els) => els.map { f =>
        FieldSpec(
          fieldId = str(f \ "field_id").getOrElse(
            throw new IllegalArgumentException("field without field_id")),
          fieldType = str(f \ "field_type").getOrElse("string"),
          queryExpression = str(f \ "query_expression"),
          fieldValue = str(f \ "field_value"))
      }
      case _ => Nil
    }
    val included = uris(j \ "included_tables_uris") ++
      uris(j \ "included_assets_uris")
    val excluded = uris(j \ "excluded_tables_uris") ++
      uris(j \ "excluded_assets_uris")
    val refreshMode = str(j \ "refresh_mode").getOrElse("ON_DEMAND")
    // AUTO configs normalize through validate_auto_refresh; ON_DEMAND
    // stores 0 ("N/A", TagEngineStoreHandler.py:443) — the reference's
    // API rejects an AUTO config missing either parameter
    // (get_refresh_parameters, main.py:1956–1978), and a missing unit
    // here rides the same default-to-days branch as an unrecognized one
    val freq =
      if (refreshMode == "AUTO") normalizeAutoFrequency(j \ "refresh_frequency")
      else 0L
    TagConfig(
      configType = str(j \ "config_type").getOrElse("DYNAMIC_TAG_TABLE"),
      templateId = str(j \ "template_id").getOrElse(""),
      fields = fields,
      includedUris = included,
      excludedUris = excluded,
      includedColumnsQuery = str(j \ "included_columns_query"),
      overwrite = (j \ "overwrite") match {
        case JBool(b) => b
        case _        => true
      },
      refreshMode = refreshMode,
      // saturating multiply: a clamped near-MaxValue frequency must stay
      // "effectively never", not wrap negative (= due immediately)
      refreshFrequencyMinutes = {
        val u = unitMinutes(str(j \ "refresh_unit").getOrElse(""))
        if (freq != 0L && freq > Long.MaxValue / u) Long.MaxValue
        else freq * u
      },
      tagHistory = (j \ "tag_history") match {
        case JBool(b) => b
        case _        => false
      })
  }

  /** Import-CSV asset-type inference from header keys (main.py:3446–3452):
    * `dataset` → bigquery; `entry_group`+`fileset` → fileset;
    * `instance`+`database` → spanner. EXACT key match like the
    * reference's `keys() >= {'dataset'}` — a lenient (lowercased) match
    * here would classify a mixed-case header whose key columns then fail
    * to resolve in the case-sensitive import melt, turning one clear
    * error into a misleading 'unknown fields' downstream. Note the
    * reference checks `dataset` FIRST, so a header carrying both
    * `dataset` and `entry_group`+`fileset` is bigquery there — mirrored
    * by the if-order here.
    */
  def inferAssetType(header: Seq[String]): String = {
    val h = header.toSet
    if (h.contains("dataset")) "bigquery"
    else if (h.contains("entry_group") && h.contains("fileset")) "fileset"
    else if (h.contains("instance") && h.contains("database")) "spanner"
    else throw new IllegalArgumentException(
      s"cannot infer asset type from header: ${header.mkString(",")}")
  }
}
