package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Native WordNgrams expression vs the Column/HOF reference form: equal on
  * real corpus text and on the edge shapes (multi-space runs, too-short
  * text, empty string), plus the distinct variant's set semantics.
  */
class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  test("native == HOF reference on the real corpus, n = 2 and 5") {
    val d = Lake.table(spark, sf, "documents")
    Seq(2, 5).foreach { n =>
      // null-safe inequality: a null-blind `not(a === b)` filters out the
      // rows where exactly one side is null — the divergence it must catch
      val diff = d.select(
          TextFns.wordNgramsNative(col("text"), n).as("nat"),
          TextFns.wordNgramsBuiltin(TextFns.words(col("text")), n).as("hof"))
        .filter(not(col("nat") <=> col("hof")))
        .count()
      assert(diff === 0, s"n=$n")
    }
  }

  test("edge shapes: space runs, short text, empty, null") {
    val df = Seq("a  b   c d", "one two", "single", "", "  ")
      .toDF("t")
    val rows = df.select(
        TextFns.wordNgramsNative(col("t"), 3).as("nat"),
        TextFns.wordNgramsBuiltin(TextFns.words(col("t")), 3).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    // multi-space runs collapse to single-space joins
    assert(rows(0).getSeq[String](0) === Seq("a b c", "b c d"))
    val nulls = df.limit(1).select(
      TextFns.wordNgramsNative(lit(null).cast("string"), 2),
      TextFns.wordNgramsBuiltin(lit(null).cast("array<string>"), 2)).first()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("fuzz: native == HOF on random multibyte + whitespace soup") {
    // the native expression parses raw UTF-8 BYTES (WordNgrams.Ws.is(b));
    // multibyte continuation bytes must never read as separators and
    // token boundaries must land on codepoint edges — fuzz with 2/3/4-
    // byte codepoints (é, 中, 😀 is a surrogate PAIR in the String) mixed
    // with every Ws separator and a non-Ws unicode space (U+00A0 NBSP is
    // NOT a separator in either form; its UTF-8 tail byte 0xA0 must not
    // read as one)
    val alphabet: IndexedSeq[String] = IndexedSeq(
      "a", "bb", "é", "中", "😀", "\u00A0", ".",
      " ", "\t", "\n", "\f", "\r", "  ", " \t ")
    val rnd = new scala.util.Random(0x5eed)
    val strings = Seq.fill(300) {
      (0 until rnd.nextInt(12)).map(_ =>
        alphabet(rnd.nextInt(alphabet.size))).mkString
    }
    Seq(1, 2, 3).foreach { n =>
      val diff = strings.toDF("t").select(
          TextFns.wordNgramsNative(col("t"), n).as("nat"),
          TextFns.wordNgramsBuiltin(TextFns.words(col("t")), n).as("hof"))
        .filter(not(col("nat") <=> col("hof")))
        .collect()
      assert(diff.isEmpty,
        s"n=$n diverged on: ${diff.take(3).mkString(" | ")}")
    }
  }

  test("distinct variant keeps first occurrence of each gram") {
    val out = Seq("x y x y x y")
      .toDF("t")
      .select(TextFns.wordNgramsNative(col("t"), 2, distinct = true))
      .first().getSeq[String](0)
    assert(out === Seq("x y", "y x"))
  }
}
