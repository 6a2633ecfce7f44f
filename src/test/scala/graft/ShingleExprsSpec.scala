package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge => B}
import graft.functions.TextFns
import graft.operators.Dedup
import graft.plans.{MinhashFromSet, ShingleHashSet, ShingleMinHash}

/** The native shingle expressions must be value-identical to the
  * Column-composed HOF forms they replace (up to set order for the hash
  * set) — swapping them in is then a pure plan optimization and the
  * DuckDB oracles stay valid.
  */
class ShingleExprsSpec extends SparkSpec {
  import spark.implicits._

  private def texts = Lake.table(spark, sf, "documents")
    .select("doc_id", "text").union(Seq(
      (9001L, "abc"), (9002L, "abcd"), (9003L, "abcde"), (9004L, "aaaaaaa"))
      .toDF("doc_id", "text"))

  test("ShingleHashSet == sorted array_distinct(transform(charShingles, hash28))") {
    val hof = array_sort(array_distinct(
      transform(TextFns.charShingles(col("text"), 5), s => TextFns.hash28(s))))
    val native = B.column(ShingleHashSet(B.expression(col("text")), 5))
    val diff = texts.select(hof.as("a"), native.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0)
  }

  test("ShingleMinHash == per-permutation array_min of the HOF form") {
    val mins = array((0 until 8).map(i =>
      array_min(transform(TextFns.charShingles(col("text"), 5),
        s => (lit(Dedup.MinhashA(i)) * TextFns.hash28(s) +
          lit(Dedup.MinhashB(i))) % lit(Dedup.MinhashP)))): _*)
    val native = B.column(ShingleMinHash(B.expression(col("text")), 5,
      Dedup.MinhashA, Dedup.MinhashB, Dedup.MinhashP))
    // HOF form yields array(null,...) for len<5; native yields null — both
    // mean "no shingles", normalize via the same guard
    val hofNorm = when(length(col("text")) >= 5, mins)
    val diff = texts.select(hofNorm.as("a"), native.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0)
  }

  test("codegen compiles with a NON-nullable input (no interpreter fallback)") {
    // concat(lit, cast(id)) is non-nullable; CODEGEN_ONLY turns the silent
    // interpreter fallback into a hard failure, so this test proves the
    // generated code actually compiles (round-2 defect: nullable inherited
    // from the child made `ev.isNull` the literal `false`, an invalid
    // assignment target).
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val nn = spark.range(100)
        .select(concat(lit("document body text "), col("id")).as("text"),
          // also exercise the null-producing branch: short non-null text
          concat(lit("ab"), lit("")).as("short_text"))
      assert(!nn.schema("text").nullable)
      val mh = B.column(ShingleMinHash(B.expression(col("text")), 5,
        Dedup.MinhashA, Dedup.MinhashB, Dedup.MinhashP))
      val mhShort = B.column(ShingleMinHash(B.expression(col("short_text")), 5,
        Dedup.MinhashA, Dedup.MinhashB, Dedup.MinhashP))
      val hs = B.column(ShingleHashSet(B.expression(col("text")), 5))
      val mfs = B.column(MinhashFromSet(B.expression(
        B.column(ShingleHashSet(B.expression(col("short_text")), 5))),
        Dedup.MinhashA, Dedup.MinhashB, Dedup.MinhashP))
      val out = nn.select(mh.as("mh"), mhShort.as("mh_short"), hs.as("hs"),
        mfs.as("mfs")).collect()
      assert(out.forall(r => !r.isNullAt(0) && r.isNullAt(1) && !r.isNullAt(2)
        && r.isNullAt(3)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("MinhashFromSet over the hash set == ShingleMinHash over the text") {
    val fromText = B.column(ShingleMinHash(B.expression(col("text")), 5,
      Dedup.MinhashA, Dedup.MinhashB, Dedup.MinhashP))
    val fromSet = B.column(MinhashFromSet(
      B.expression(B.column(ShingleHashSet(B.expression(col("text")), 5))),
      Dedup.MinhashA, Dedup.MinhashB, Dedup.MinhashP))
    val diff = texts.select(fromText.as("a"), fromSet.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0)
  }

  test("StridedShingleHashes == hash60 over the strided charShingles HOF") {
    // d27's fused form: per-window hashes in order, with multiplicity;
    // multibyte text exercises the char-vs-byte offset map, the short
    // texts the below-k empty arm, repeated windows the multiplicity
    val all = texts.union(Seq(
      (9101L, "αβγδε βγδεζ γδεζη δεζηθ εζηθι ζηθικ"), // multibyte > k
      (9102L, ("na " * 40).trim), (9103L, " \t\n\f\r "))
      .toDF("doc_id", "text"))
    for ((k, stride) <- Seq((5, 3), (40, 20), (7, 7), (4, 1))) {
      val hof = transform(TextFns.charShingles(col("text"), k, stride),
        w => TextFns.hash60(w))
      val native = B.column(graft.plans.StridedShingleHashes(
        B.expression(col("text")), k, stride, nibbles = 15))
      val diff = all.select(hof.as("a"), native.as("b"))
        .filter(not(col("a") <=> col("b"))).count()
      assert(diff === 0, s"(k=$k, stride=$stride)")
    }
  }
}
