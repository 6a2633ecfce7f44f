package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** URL canonicalization edges (t19's row-local kernel). */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(TextFns.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("canonicalUrl: scheme/fragment stripped, utm dropped, params sorted") {
    assert(canon(
      "https://a.example/p",
      "http://a.example/p#frag",
      "https://a.example/p?utm_source=x",
      "https://a.example/p?b=2&a=1",
      "https://a.example/p?a=1&utm_campaign=c&b=2#frag"
    ) === Seq(
      "a.example/p",
      "a.example/p",
      "a.example/p",          // only-utm query → no query at all
      "a.example/p?a=1&b=2",  // params sorted
      "a.example/p?a=1&b=2")) // permutation + utm + fragment collide
  }

  test("canonicalUrl: permutations and tracking variants share one key") {
    val variants = Seq(
      "https://h.example/x?id=7&utm_source=feed",
      "http://h.example/x?id=7",
      "https://h.example/x?utm_campaign=z&id=7#top")
    assert(canon(variants: _*).distinct === Seq("h.example/x?id=7"))
  }
}
