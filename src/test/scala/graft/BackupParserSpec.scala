package graft

import java.nio.file.Files
import graft.sources.BackupParser

/** A5/B7: JSONL backup restore — template filtering, time-field stripping,
  * nested-array surgery, flatten to tag rows.
  */
class BackupParserSpec extends SparkSpec {

  private val lines = Seq(
    // entry with a matching entry-level tag + one matching column tag
    """{"entryGroupId":"eg","id":"orders","locationId":"us","projectId":"p",
      |"createTime":"2024-01-01T00:00:00Z","updateTime":"2024-01-02T00:00:00Z",
      |"tags":[{"template":"gov","templateProject":"p","fields":[{"name":"env","type":"enum","value":"PROD"}]},
      |        {"template":"other","templateProject":"p","fields":[{"name":"x","type":"string","value":"drop me"}]}],
      |"columns":[{"name":"orders:o_total","tags":[{"template":"gov","templateProject":"p","fields":[{"name":"pii","type":"bool","value":"TRUE"}]}]},
      |           {"name":"orders:o_other","tags":[{"template":"other","templateProject":"q","fields":[{"name":"y","type":"string","value":"drop"}]}]}]}"""
      .stripMargin.replaceAll("\n", ""),
    // entry with no matching tags at all → dropped
    """{"entryGroupId":"eg","id":"nomatch","locationId":"us","projectId":"p",
      |"tags":[{"template":"other","templateProject":"p","fields":[]}],
      |"columns":[]}""".stripMargin.replaceAll("\n", ""))

  test("filterByTemplate keeps only matching tags and strips time fields") {
    val f = Files.createTempFile("backup", ".jsonl")
    Files.writeString(f, lines.mkString("\n"))
    val backup = BackupParser.read(spark, f.toString)
    val filtered = BackupParser.filterByTemplate(backup, "gov", "p")
    assert(filtered.count() === 1)
    assert(!filtered.columns.contains("createTime"))

    val rows = BackupParser.toTagRows(filtered)
      .select("entry_id", "column", "field_id", "field_value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(rows === Set(
      ("orders", "", "env", "PROD"),
      ("orders", "o_total", "pii", "TRUE")))
  }
}
