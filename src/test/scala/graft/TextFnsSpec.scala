package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Edge semantics of the row-local text functions: zero-token and NULL
  * documents must not fall through argmax/ratio arithmetic (NULL text →
  * every stopword count NULL → an unguarded CASE chain labels it 'fr';
  * zero tokens → 0.0/0.0 = NaN, which sorts ABOVE every real double in
  * Spark and would win survivor selection).
  */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("langId: NULL, empty, and whitespace-only text → 'und', not 'fr'") {
    val rows = Seq((1L, null: String), (2L, ""), (3L, "   "),
        (4L, "le chat est un animal et la mer"))
      .toDF("id", "text")
      .select($"id", TextFns.langId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(rows(1L) === "und")
    assert(rows(2L) === "und")
    assert(rows(3L) === "und")
    assert(rows(4L) === "fr") // real French stopwords still win
  }

  test("newline-formatted text tokenizes like space-formatted text (the Ws contract)") {
    // real corpora are newline-heavy: a literal single-space split used
    // to merge line-straddling words into pseudo-tokens ("cat\nthe"),
    // silently defeating stopword matching (langId → 'und' on real
    // English), token counts, and fingerprints. All tokenizer consumers
    // must see \n and \t exactly as ' '.
    val spaced = "the cat sat and the dog ran of course it was the best"
    val lined = spaced.replaceAll("(\\w+ \\w+ \\w+) ", "$1\n")
      .replace("dog ", "dog\t")
    val rows = Seq((1L, spaced), (2L, lined)).toDF("doc_id", "text")
    val got = rows.select($"doc_id",
        TextFns.langId($"text").as("lang"),
        size(TextFns.words($"text")).as("n"),
        TextFns.fingerprint($"text").as("fp"),
        TextFns.wordNgramsNative($"text", 3).as("grams"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getString(3), r.getSeq[String](4))))
      .toMap
    assert(got(1L) === got(2L),
      "whitespace form must not change tokens, language, fingerprint, or grams")
    assert(got(2L)._1 === "en")
    assert(got(2L)._2 === 13)
    // vertical tab is NOT a separator: the contract is RE2's \s class
    // (what the DuckDB oracle's '\s+' evaluates), which excludes \v —
    // writing Java's \s on the Spark side would fork the engines here
    val vt = Seq((1L, "a\u000Bb c")).toDF("doc_id", "text")
      .select(TextFns.words($"text").as("ws"))
      .as[Seq[String]].head()
    assert(vt === Seq("a\u000Bb", "c"))
  }

  test("qualityScore: zero-token and NULL text score an explicit 0.0") {
    val rows = Seq((1L, null: String), (2L, ""), (3L, "   "),
        (4L, "the and is of"))
      .toDF("id", "text")
      .select($"id", TextFns.qualityScore($"text").as("q"))
      .as[(Long, Double)].collect().toMap
    assert(rows(1L) === 0.0)
    assert(rows(2L) === 0.0)
    assert(rows(3L) === 0.0)
    assert(!rows(4L).isNaN && rows(4L) > 0.0)
    // the hazard the guard removes: NaN would out-rank every real score
    assert(!rows.values.exists(_.isNaN))
  }
}
