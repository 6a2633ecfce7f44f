package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.expand.Expander
import graft.functions.Coerce
import graft.model.AssetUri

/** Property tests promised by SURVEY.md §5: the coercion type rules (§1.2)
  * and the URI wildcard algebra (A1/B2). Raw ScalaCheck generators with a
  * fixed seed (no scalatestplus bridge in the offline cache); each property
  * is evaluated as ONE batched Spark job over all samples — a per-sample
  * Spark action would take minutes.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("glob fragments semantics == contains-all reference model") {
    val name = Gen.listOfN(6, Gen.oneOf('a', 'b', 'c', '*')).map(_.mkString)
    val exprs = samples(name, 30)
    val candidates = samples(name, 30).filterNot(_.contains("*"))
    val pairs = for (e <- exprs; c <- candidates) yield (e, c)
    val df = pairs.toDF("expr", "cand")
    // evaluate all (expr, cand) pairs in one job: build a per-expr predicate
    val results = exprs.distinct.map { e =>
      val got = df.filter(col("expr") === e)
        .filter(Expander.globPredicate(col("cand"), e))
        .select("cand").as[String].collect().toSet
      val expected = candidates.filter { c =>
        AssetUri.globFragments(e) match {
          case None        => c == e
          case Some(frags) => frags.forall(c.contains)
        }
      }.toSet
      (e, got, expected)
    }
    results.foreach { case (e, got, expected) =>
      assert(got === expected, s"expr=$e")
    }
  }

  test("timestamp heuristic: valid len-10 dates parse to midnight, garbage nulls") {
    val dates = samples(for {
      y <- Gen.choose(1990, 2030); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield f"$y%04d-$m%02d-$d%02d", 40)
    val parsed = dates.toDF("v")
      .select(col("v"), Coerce.timestamp(col("v")).cast("string").as("t"))
      .as[(String, String)].collect()
    parsed.foreach { case (v, t) => assert(t === v + " 00:00:00") }

    val garbage = samples(Gen.alphaStr, 60)
      .filter(g => g.length != 10 && g.length != 19 && g.nonEmpty)
    val nulls = garbage.toDF("v").select(Coerce.timestamp(col("v"))).collect()
    nulls.foreach(r => assert(r.isNullAt(0)))
  }

  test("bool coercion: exactly case-insensitive 'true' variants are true") {
    val strs = samples(Gen.oneOf(Gen.alphaStr,
      Gen.oneOf("TRUE", "true", "True", " TRUE ", "truely", "false")), 60)
    val out = strs.toDF("v")
      .select(col("v"), Coerce.bool(col("v")).as("b"))
      .as[(String, Boolean)].collect()
    out.foreach { case (v, b) =>
      assert(b === v.trim.equalsIgnoreCase("true"), s"input='$v'")
    }
  }

  test("connected components == union-find reference on random graphs") {
    import graft.operators.Graph
    val edgeGen = for {
      n <- Gen.choose(5, 24)                    // vertices 0..n-1
      m <- Gen.choose(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield es.filter { case (a, b) => a != b }
    samples(edgeGen, 4).filter(_.nonEmpty).foreach { edges =>
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      // find() roots are the min id of each set because unions always
      // attach the larger root under the smaller one. Default path:
      // graphs this small take the one-task LOCAL union-find.
      val got = Graph.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"edges=$edges")
      // the distributed BSP loop (local finish disabled) must agree
      val dist = Graph.connectedComponents(edges.toDF("a", "b"), "a", "b",
          localFinishEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist === expected, s"distributed: edges=$edges")
      // forced per-round contraction + mid-loop local tail must agree
      // (the at-scale composition: contraction shrinks the super-graph,
      // the tail union-find resolves the rest through the label map)
      val contracted = Graph.connectedComponents(edges.toDF("a", "b"),
          "a", "b", contractMinEdges = 0L, localFinishEdges = 10L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(contracted === expected, s"contract+tail: edges=$edges")
      // forced contraction with NO local tail (pure distributed at-scale
      // path; its convergence test runs post-jump, not at neighbor-min)
      val contractedDist = Graph.connectedComponents(edges.toDF("a", "b"),
          "a", "b", contractMinEdges = 0L, localFinishEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(contractedDist === expected, s"contracted: edges=$edges")
    }
  }

  test("affine minhash permutations stay in [0, P) and are injective-ish on samples") {
    import graft.operators.Dedup
    val hs = samples(Gen.choose(0L, (1L << 28) - 1), 200)
    val perms = for (i <- 0 until 8; h <- hs)
      yield (Dedup.MinhashA(i) * h + Dedup.MinhashB(i)) % Dedup.MinhashP
    assert(perms.forall(p => p >= 0 && p < Dedup.MinhashP))
    // distinct inputs map to distinct outputs per permutation (mod-prime affine)
    val p0 = hs.map(h => (Dedup.MinhashA.head * h + Dedup.MinhashB.head) % Dedup.MinhashP)
    assert(p0.distinct.size === hs.distinct.size)
  }

  test("native intersect count == Set intersection on random long sets") {
    import org.apache.spark.sql.graft.{Bridge => B}
    import graft.plans.LongSetIntersectSize
    val setGen = for {
      n <- Gen.choose(0, 60)
      vs <- Gen.listOfN(n, Gen.oneOf(Gen.choose(-50L, 50L), Gen.long))
    } yield vs.distinct
    val pairs = samples(Gen.zip(setGen, setGen), 120)
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"), B.column(LongSetIntersectSize(
        B.expression(col("a")), B.expression(col("b")))).as("n"))
      .as[(Seq[Long], Seq[Long], Int)].collect()
    out.foreach { case (a, b, n) =>
      assert(n === a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
  }

  test("native simhash == exploded aggregation on random token strings") {
    import graft.operators.Dedup
    val word = Gen.oneOf("data", "spark", "the", "café", "0", "x",
      "zzz", "ému", "a b".trim)
    val docGen = for {
      n <- Gen.choose(1, 30)
      ws <- Gen.listOfN(n, word)
      pad <- Gen.oneOf("", " ", "  ") // extra separators must not matter
    } yield ws.mkString(" " + pad)
    val docs = samples(docGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = Dedup.simhash(docs, "doc_id", "text")
    val agg = Dedup.simhashAgg(docs, "doc_id", "text")
    assert(native.exceptAll(agg).count() === 0)
    assert(agg.exceptAll(native).count() === 0)
  }

  test("KMV finish == (min(k, distinct), k-th smallest distinct) on random multisets") {
    import graft.functions.KmvDistinct
    val agg = new KmvDistinct(16)
    val multisetGen = for {
      n <- Gen.choose(0, 120)
      // duplicate-heavy domain so dedup is actually exercised
      vs <- Gen.listOfN(n, Gen.choose(0L, 40L))
    } yield vs
    samples(multisetGen, 120).foreach { vs =>
      // fold order is arbitrary — split and merge both ways too
      val (l, r) = vs.splitAt(vs.length / 2)
      val direct = vs.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val d = vs.distinct.sorted
      val expected = (math.min(16, d.size),
        if (d.isEmpty) 0L else d.take(16).last)
      assert(agg.finish(direct) === expected, s"direct vs=$vs")
      assert(agg.finish(merged) === expected, s"merged vs=$vs")
    }
  }

  test("band join is lossless at radius <= maxHamming on random 60-bit sigs") {
    import graft.operators.Dedup
    // signatures drawn near a shared base so hamming ≤ 4 pairs exist:
    // flip 0–6 random bits of one of three base patterns
    val base = Gen.oneOf(0x0FEDCBA987654321L & ((1L << 60) - 1),
      0x0123456789ABCDEFL & ((1L << 60) - 1), (1L << 59) | 0x5555L)
    val sigGen = for {
      b <- base
      k <- Gen.choose(0, 6)
      bits <- Gen.listOfN(k, Gen.choose(0, 59))
    } yield bits.foldLeft(b)((acc, i) => acc ^ (1L << i))
    val sigs = samples(sigGen, 90).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = sigs.toDF("doc_id", "simhash")
    val got = Dedup.simhashPairs(df, "doc_id", maxHamming = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 4
    } yield (ia, ib)).toSet
    assert(got === brute)
  }
}
