package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regex-rule PII inspection and redaction — the row-local core of the
  * reference's DLP-driven "sensitive column" flow (the reference submits
  * columns to the DLP API and classifies over the findings table,
  * /root/reference/DataCatalogController.py:882–928; here the inspector
  * itself is a Spark projection, so a 100 TB corpus is one narrow pass
  * with zero shuffle and the findings feed the same smallest-superset
  * classification joins).
  *
  * Every pattern is written in the common Java-regex ∩ RE2 subset (no
  * lookaround, no backreferences) so Spark and the DuckDB oracle match
  * the exact same spans.
  */
object Pii {

  /** (infotype, pattern) inspection rules. The two numeric shapes are
    * disjoint (a US_SSN 3-2-4 span can never also match the 3-3-4 phone
    * shape), but EMAIL is NOT disjoint from them — a phone/SSN-shaped
    * local part ("555-123-4567@x.com") matches both EMAIL and the
    * numeric rule, because `\b` holds at the `@`. findingCounts
    * therefore counts each rule independently (one span can contribute
    * to two infotypes, like a real DLP inspector reporting overlapping
    * findings), and [[redact]]'s output depends on rule ORDER: the
    * fixed Rules order is the contract, applied email-first so an
    * address redacts as one `[EMAIL_ADDRESS]` token, and the oracle
    * replays the same rules in the same order.
    */
  val Rules: Seq[(String, String)] = Seq(
    ("EMAIL_ADDRESS", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("PHONE_NUMBER", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"),
    ("US_SSN", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"))

  /** Per-rule match counts, one `(infotype, count column)` pair each —
    * codegen'd `regexp_count`, non-overlapping scan exactly like the
    * oracle's `regexp_extract_all` length.
    */
  def findingCounts(text: Column): Seq[(String, Column)] =
    Rules.map { case (name, re) => name -> regexp_count(text, lit(re)) }

  /** Replace every finding with its `[INFOTYPE]` token. */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (c, (name, re)) =>
      regexp_replace(c, re, s"[$name]")
    }
}
