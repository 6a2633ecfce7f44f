package graft

import org.apache.spark.sql.functions._
import graft.operators.Clean

/** Boilerplate removal: df-threshold drop + position-ordered reassembly. */
class CleanSpec extends SparkSpec {
  import spark.implicits._

  private val segs = Seq(
    // doc 1: unique body, shared footer, unique tail
    (1L, 0, "alpha body one"), (1L, 1, "shared footer"), (1L, 2, "tail one"),
    // doc 2: unique body, shared footer
    (2L, 0, "beta body two"), (2L, 1, "shared footer"),
    // doc 3: shared footer only — all segments dropped
    (3L, 0, "shared footer"),
    // doc 4: repeated segment WITHIN one doc counts once toward df
    (4L, 0, "solo repeat"), (4L, 1, "solo repeat"), (4L, 2, "gamma body")
  ).toDF("doc_id", "pos", "seg")

  test("segments at df >= minDf drop; survivors reassemble in pos order") {
    val out = Clean.removeBoilerplate(segs, "doc_id", "pos", "seg", minDf = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (1L, "alpha body one tail one", 2L, 1L),
      (2L, "beta body two", 1L, 1L),
      // every segment boilerplate → NULL, the string_agg-FILTER
      // zero-rows semantics the t16 oracle compares against
      (3L, null, 0L, 1L),
      // df("solo repeat") = 1 doc < 3 → kept, both copies
      (4L, "solo repeat solo repeat gamma body", 3L, 0L)))
  }

  test("minDf above every df is a no-op reassembly") {
    val out = Clean.removeBoilerplate(segs, "doc_id", "pos", "seg", minDf = 99)
    assert(out.agg(sum("n_dropped")).head.getLong(0) === 0L)
    assert(out.filter(col("doc_id") === 1)
      .head.getString(1) === "alpha body one shared footer tail one")
  }

  test("matches a driver-side reference on random segment tables") {
    val rnd = new scala.util.Random(23)
    val pool = Vector("nav", "footer", "body one", "body two", "unique x",
      "ad block", "menu", "content")
    (1 to 3).foreach { trial =>
      val rows = (1L to 10L).flatMap { doc =>
        (0 until rnd.nextInt(6) + 1).map(p =>
          (doc, p, pool(rnd.nextInt(pool.length))))
      }
      val minDf = rnd.nextInt(4) + 2
      // reference: df per distinct segment (distinct docs), drop >= minDf,
      // reassemble by pos
      val df = rows.groupBy(_._3).map { case (s, rs) =>
        s -> rs.map(_._1).distinct.size }
      val expected = rows.groupBy(_._1).map { case (doc, rs) =>
        val sorted = rs.sortBy(_._2)
        val kept = sorted.filter(r => df(r._3) < minDf)
        (doc, if (kept.isEmpty) null else kept.map(_._3).mkString(" "),
          kept.size.toLong, (sorted.size - kept.size).toLong)
      }.toSet
      val got = Clean.removeBoilerplate(
        rows.toDF("doc_id", "pos", "seg"), "doc_id", "pos", "seg", minDf)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === expected, s"trial $trial minDf=$minDf")
    }
  }
}
