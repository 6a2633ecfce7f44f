package graft

import org.apache.spark.sql.functions._
import graft.functions.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val sample =
    "reach me at jane.doe+test@corp.example.org or 415-555-0199; " +
      "ssn on file 123-45-6789, backup mail bob@ex.co"

  test("findingCounts counts every rule's matches") {
    val df = Seq((1L, sample), (2L, "no pii here 12-34")).toDF("id", "text")
    val counts = Pii.findingCounts(col("text"))
      .map { case (n, c) => c.as(n) }
    val rows = df.select(col("id") +: counts: _*).orderBy("id").collect()
    assert(rows(0).getInt(1) == 2) // two emails
    assert(rows(0).getInt(2) == 1) // one phone
    assert(rows(0).getInt(3) == 1) // one ssn
    assert(rows(1).toSeq.drop(1) == Seq(0, 0, 0))
  }

  test("redact replaces each span with its infotype token") {
    val out = Seq(sample).toDF("text")
      .select(Pii.redact(col("text")).as("r")).head.getString(0)
    assert(out ==
      "reach me at [EMAIL_ADDRESS] or [PHONE_NUMBER]; " +
        "ssn on file [US_SSN], backup mail [EMAIL_ADDRESS]")
  }

  test("phone and ssn patterns are disjoint (redaction order can't matter)") {
    val both = "p 123-456-7890 s 123-45-6789"
    val out = Seq(both).toDF("text")
      .select(Pii.redact(col("text")).as("r")).head.getString(0)
    assert(out == "p [PHONE_NUMBER] s [US_SSN]")
  }

  test("EMAIL overlaps the numeric rules: counts are independent, redact is email-first") {
    // a phone-shaped local part matches BOTH rules (`\b` holds at '@');
    // the contract is independent per-rule counts + fixed email-first
    // redaction order (see the Rules scaladoc) — this pins it so a rule
    // reorder can't silently change redaction output
    val tricky = "call 555-123-4567@mail.com now"
    val df = Seq(tricky).toDF("text")
    val counts = df.select(Pii.findingCounts(col("text"))
      .map { case (n, c) => c.as(n) }: _*).head
    assert(counts.getInt(0) == 1) // EMAIL_ADDRESS
    assert(counts.getInt(1) == 1) // PHONE_NUMBER (same span, counted too)
    val out = df.select(Pii.redact(col("text")).as("r")).head.getString(0)
    assert(out == "call [EMAIL_ADDRESS] now") // email-first consumes the span
  }
}
