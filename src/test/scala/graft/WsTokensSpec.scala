package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge => B}
import graft.functions.TextFns

/** The native tokenizer ([[graft.plans.WsTokens]], `TextFns.words`' new
  * body) must be value-identical to the HOF composition it replaces —
  * `filter(split(text, "[ \t\n\f\r]+"), w => length(w) > 0)` — element
  * order and multiplicity included, so every words()-derived oracle
  * (language id, quality, stopword ratios, fingerprints, n-grams) stays
  * valid by construction.
  */
class WsTokensSpec extends SparkSpec {
  import spark.implicits._

  private val hof =
    filter(split(col("text"), s"[${graft.plans.Ws.ClassBody}]+"),
      w => length(w) > 0)
  private val native = B.column(graft.plans.WsTokens(B.expression(col("text"))))

  test("WsTokens == filter(split) on the corpus plus edge cases") {
    val texts = Lake.table(spark, sf, "documents").select("text").union(Seq(
      "", " ", " \t\n\f\r ", "one", " lead", "trail ", "a  b\t\tc\n\nd",
      "verticaltab stays", // \v is NOT Ws — token character
      "αβγ δεζ  ηθι", "多字节 文本 mixed ascii", "a\rb\nc\fd\te f")
      .toDF("text"))
    val diff = texts.select(hof.as("a"), native.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0)
  }

  test("null text stays null; codegen compiles under CODEGEN_ONLY") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val rows = Seq[(java.lang.Long, String)]((1L, null), (2L, "x y"))
        .toDF("id", "text")
        .select(col("id"), native.as("ws"))
        .orderBy("id").collect()
      assert(rows(0).isNullAt(1))
      assert(rows(1).getSeq[String](1) === Seq("x", "y"))
      // non-nullable input path too (the ShingleExprsSpec codegen rule)
      val nn = spark.range(10)
        .select(concat(lit("a b "), col("id")).as("text"))
      assert(nn.select(native.as("ws")).collect()
        .forall(_.getSeq[String](0).length === 3))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
