package graft

import graft.operators.Bpe

/** BPE merge training: pair argmax, tie rule, non-overlapping merge. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic merges on a tiny corpus") {
    // "low low low lower newest newest" — 'lo' is the most frequent pair
    val docs = Seq("low low low lower", "newest newest").toDF("text")
    val m = Bpe.train(docs, "text", steps = 2).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // step 1: (l,o) and (o,w) both appear 4x; tie -> lexicographically
    // smaller left symbol wins
    assert(m(0) === ((1, "l", "o", "lo", 4L)))
    // step 2: after merging 'lo', (lo,w) appears 4x and wins the 3x pairs
    assert(m(1) === ((2, "lo", "w", "low", 4L)))
  }

  test("merge application is left-to-right non-overlapping") {
    // 'aaaa' repeated: pair (a,a) freq = 3 per word occurrence; after one
    // merge the word is [aa, aa], so step 2 must learn (aa, aa), not (a, a)
    val docs = Seq("aaaa aaaa b").toDF("text")
    val m = Bpe.train(docs, "text", steps = 2).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(m(0) === ((1, "aa", 6L)))
    assert(m(1) === ((2, "aaaa", 2L)))
  }

  test("stops early when every word is fully merged") {
    // after step 1 merges (a,b), the only multi-char word is a single
    // symbol — no pairs remain, so step 2 is skipped, not a crash
    val docs = Seq("a b c a b ab").toDF("text")
    val m = Bpe.train(docs, "text", steps = 2).orderBy("step").collect()
    assert(m.length === 1)
    assert(m(0).getString(3) === "ab")
  }

  test("matches a driver-side reference BPE on random corpora") {
    // in-memory reference: same algorithm, plain Scala collections
    def refTrain(texts: Seq[String], steps: Int): Seq[(String, String, Long)] = {
      var vocab = texts.flatMap(_.split(" ").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, ws) =>
          (w.map(_.toString).toVector, ws.size.toLong) }.toVector
      val out = Vector.newBuilder[(String, String, Long)]
      var continue = true
      var step = 0
      while (step < steps && continue) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.sliding(2).foreach {
            case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
            case _ => ()
          }
        }
        if (counts.isEmpty) continue = false
        else {
          val ((a, b), f) = counts.minBy { case ((x, y), n) => (-n, x, y) }
          out += ((a, b, f))
          vocab = vocab.map { case (syms, fr) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                merged += a + b; i += 2
              } else { merged += syms(i); i += 1 }
            }
            (merged.result(), fr)
          }
          step += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(11)
    val alphabet = "abcde"
    (1 to 3).foreach { trial =>
      val texts = (1 to 12).map(_ => (1 to rnd.nextInt(8) + 1)
        .map(_ => (1 to rnd.nextInt(5) + 1)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
        .mkString(" "))
      val expected = refTrain(texts, steps = 4)
      val got = Bpe.train(texts.toDF("text"), "text", steps = 4)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(got === expected, s"trial $trial corpus=$texts")
    }
  }

  test("encode applies ordered merges per rule, left-to-right, no re-merge") {
    // rules learned in order: (a,b)->ab then (ab,c)->abc. Applying to
    // 'abcab': pass 1 merges both 'ab's -> [ab, c, ab]; pass 2 merges
    // the LEADING (ab,c) only -> [abc, ab]. 'aab': only the second a
    // starts a merge -> [a, ab]; rule 2 finds no (ab,c) tail -> same.
    val enc = Bpe.encode(Seq("abcab aab b").toDF("text"), "text",
        Seq(("a", "b"), ("ab", "c")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc("abcab") === Seq("abc", "ab"))
    assert(enc("aab") === Seq("a", "ab"))
    assert(enc("b") === Seq("b")) // singleton survives both passes
    // empty merge list = plain character split
    val plain = Bpe.encode(Seq("abc").toDF("text"), "text", Seq.empty)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(plain("abc") === Seq("a", "b", "c"))
  }

  test("encodeTyped == encode on random corpora; holds at 500 rules") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abcd"
    def randText() = (1 to 10).map(_ => (1 to rnd.nextInt(6) + 1)
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString).mkString(" ")
    // small rule tables: the two encoders must agree exactly
    (1 to 3).foreach { trial =>
      val texts = (1 to 8).map(_ => randText()).toDF("text")
      val rules = Seq(("a", "b"), ("c", "d"), ("ab", "cd"), ("b", "a"))
      def keyed(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(keyed(Bpe.encodeTyped(texts, "text", rules)) ===
        keyed(Bpe.encode(texts, "text", rules)), s"trial $trial")
    }
    // supplementary characters: Spark's substr seeds by CODE POINT, so a
    // non-BMP char (here U+1F600) must be ONE symbol in both encoders —
    // a UTF-16 split would seed it as two surrogate halves in the typed
    // form only and the rule ("😀","a") could never fire there
    locally {
      val texts = Seq("😀a b😀").toDF("text")
      val rules = Seq(("😀", "a"))
      def keyed(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val typed = keyed(Bpe.encodeTyped(texts, "text", rules))
      assert(typed("😀a") === Seq("😀a"))
      assert(typed("b😀") === Seq("b", "😀"))
      assert(typed === keyed(Bpe.encode(texts, "text", rules)))
    }
    // production-shaped rule count (500 — far beyond what nested
    // expressions can plan): verified against an independent driver fold
    val manyRules = (1 to 500).map { i =>
      (alphabet(i % 4).toString, alphabet((i / 4) % 4).toString)
    }
    def refEncode(w: String): Seq[String] =
      manyRules.foldLeft(w.map(_.toString).toList) { case (syms, (ml, mr)) =>
        syms.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == ml && x == mr)
            acc.init :+ (ml + mr)
          else acc :+ x
        }
      }
    val words = Seq("abcd", "aabb", "dcba", "abcabc", "a")
    val got = Bpe.encodeTyped(Seq(words.mkString(" ")).toDF("text"),
        "text", manyRules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach(w => assert(got(w) === refEncode(w), s"word $w"))
  }
}
