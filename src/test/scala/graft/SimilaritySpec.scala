package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ivfAssign contract: empty centroid sets fail fast with a clear message,
  * and the broadcast-join fallback above the inline bound assigns the same
  * (vec_id → centroid_id) map as the literal-inlined argmax.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Lake.table(spark, sf, "embeddings")
    .select(col("vec_id"),
      graft.functions.VectorFns.toDoubleArray(col("embedding")).as("vec"))

  test("lshTopK convenience form equals lshTopKIndexed over derived signatures") {
    val hyperplanes = emb.filter(col("vec_id").between(1, 4))
      .select((col("vec_id") - 1).as("hp_id"), col("vec").as("hvec"))
    val inline = Similarity.lshTopK(emb, hyperplanes, queryId = 0L, k = 10)
      .collect().map(_.mkString("|"))
    val indexed = Similarity.lshTopKIndexed(emb,
        Similarity.hyperplaneSignatures(emb, hyperplanes), queryId = 0L, k = 10)
      .collect().map(_.mkString("|"))
    assert(inline.toSeq === indexed.toSeq)
  }

  test("hyperplaneSignatures rejects bit positions that wrap or hit the sign bit") {
    // shiftleft(1L, n) wraps mod 64, and the bits combine via sum(): an
    // hp_id >= 64 aliases a low bit whose carry silently corrupts EVERY
    // signature; hp_id = 63 sets the sign bit, breaking the positive-Long
    // signature convention the banded consumers share. Must fail fast.
    val hp63 = emb.limit(1).select(lit(63L).as("hp_id"), col("vec").as("hvec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.hyperplaneSignatures(emb, hp63)
    }
    assert(e.getMessage.contains("[0, 62]"))
    val dup = emb.limit(2).select(lit(5L).as("hp_id"), col("vec").as("hvec"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.hyperplaneSignatures(emb, dup)
    }
    assert(e2.getMessage.contains("unique"))
    // the full legal range works and stays non-negative
    val hpMax = emb.filter(col("vec_id") < 63)
      .select(col("vec_id").as("hp_id"), col("vec").as("hvec"))
    val sigs = Similarity.hyperplaneSignatures(emb.limit(20), hpMax)
    assert(sigs.filter(col("bucket_sig") < 0).count() === 0L)
  }

  test("lshTopKIndexed prunes to the bucket BEFORE touching the corpus (broadcast join)") {
    // the at-scale promise: a query costs one bucket's worth of scoring —
    // the signature table prunes first and the surviving ids broadcast
    // into a hash join against emb, never a corpus-by-corpus shuffle join
    val hyperplanes = emb.filter(col("vec_id").between(1, 4))
      .select((col("vec_id") - 1).as("hp_id"), col("vec").as("hvec"))
    val plan = Similarity.lshTopKIndexed(emb,
        Similarity.hyperplaneSignatures(emb, hyperplanes), queryId = 0L,
        k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket ids must broadcast into the emb join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-by-corpus shuffle join on the query path:\n$plan")
  }

  test("ivfAssignMulti rejects reserved passenger columns on BOTH paths") {
    // without the guard a passenger `centroid_id` works at <= 64
    // centroids (inline path) and dies with an ambiguous-reference
    // AnalysisException the day the centroid count crosses the bound —
    // a scale-triggered failure; it must fail fast at any scale
    val cents = (0L to 2L).map(i => (i, Array(i.toDouble, 1.0)))
      .toDF("centroid_id", "cvec")
    val bad = emb.withColumn("centroid_id", lit(7L))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfAssignMulti(bad, cents, nprobe = 2)
    }
    assert(e.getMessage.contains("centroid_id"))
  }

  test("pqTopK validates the split contract against the codebook and query") {
    val codebook = Seq(Array(0.0, 0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0, 1.0))
    val codes = Seq((0L, 0, 1)).toDF("vec_id", "code_0", "code_1")
    // numSub that floor-truncates subDim: every approximate distance
    // would be silently wrong — must throw instead
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(codes, codebook, numSub = 3,
        query = Array(0.5, 0.5, 0.5, 0.5), k = 1)
    }
    assert(e.getMessage.contains("not divisible"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.pqTopK(codes, codebook, numSub = 2,
        query = Array(0.5, 0.5), k = 1)
    }
    assert(e2.getMessage.contains("query length"))
  }

  test("empty centroid set fails fast, not with scored.head on Array()") {
    val empty = Seq.empty[(Long, Array[Double])].toDF("centroid_id", "cvec")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfAssign(emb, empty)
    }
    assert(e.getMessage.contains("centroid set is empty"))
  }

  test("large centroid set takes the broadcast-join path and matches inline") {
    // 100 centroids (> MaxInlineCentroids = 64) force the broadcast-join
    // fallback; the inline path runs on the first 50 of the same set. The
    // two paths are then compared only on vectors whose best-of-100 winner
    // lands inside the shared 50-centroid prefix — on those the best-of-50
    // answer must agree exactly (same argmax, same tie rule).
    val base = emb.limit(100).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val small = base.take(50).toSeq.toDF("centroid_id", "cvec")
    val large = base.toSeq.toDF("centroid_id", "cvec")

    val inline = Similarity.ivfAssign(emb, small)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    // force the fallback by feeding >64 centroids, then compare only
    // assignments that land in the shared 50-centroid prefix both ways
    val joined = Similarity.ivfAssign(emb, large)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(joined.size === inline.size)
    // every vector whose best-of-100 centroid is within the first 50 must
    // agree with the best-of-50 inline assignment
    val smallIds = base.take(50).map(_._1).toSet
    joined.foreach { case (v, c) =>
      if (smallIds.contains(c)) assert(inline(v) === c, s"vec $v")
    }
  }

  test("fallback path is an equi-free broadcast + keyed max, no sort/window") {
    val cents = emb.limit(70).select(col("vec_id").as("centroid_id"),
      col("vec").as("cvec"))
    val plan = Similarity.ivfAssign(emb, cents).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "expected a broadcast of the centroid side")
    assert(!plan.contains("Window"), "no window in the fallback argmax")
  }

  test("pqEncode picks the argmin code per subspace and sums chosen errors") {
    // 4-dim vectors, 2 subspaces of 2; codebook of two 4-dim entries
    val cb = Seq(Array(0.0, 0.0, 10.0, 10.0), Array(5.0, 5.0, 0.0, 0.0))
    val vs = Seq(
      (1L, Array(0.1, 0.1, 0.2, 0.1)),  // sub0 → code0, sub1 → code1
      (2L, Array(5.0, 5.0, 10.0, 10.0)) // sub0 → code1 (exact), sub1 → code0 (exact)
    ).toDF("vec_id", "vec")
    val out = Similarity.pqEncode(vs, cb, numSub = 2).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((1L, 0L, 1L, 0.1 * 0.1 + 0.1 * 0.1 + 0.2 * 0.2 + 0.1 * 0.1)))
    assert(out(1) === ((2L, 1L, 0L, 0.0)))
  }

  test("pqEncode tie breaks to the smaller code id") {
    val cb = Seq(Array(1.0, 1.0), Array(3.0, 1.0))
    // vec equidistant from both codes in the single subspace
    val vs = Seq((7L, Array(2.0, 1.0))).toDF("vec_id", "vec")
    val out = Similarity.pqEncode(vs, cb, numSub = 1).head
    assert(out.getLong(1) === 0L)
    assert(out.getDouble(2) === 1.0)
  }

  test("pqEncode is one narrow projection: no join, no exchange") {
    val cb = (0 until 4).map(j =>
      Array.tabulate(64)(i => (i * (j + 1)).toDouble / 64))
    val plan = Similarity.pqEncode(emb, cb, numSub = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "PQ encode must not shuffle")
    assert(!plan.toLowerCase.contains("join"), "PQ encode must not join")
  }

  test("the quadratic exact baseline is opt-in only") {
    // the BNLJ plan must be unreachable by accident: default call throws
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(emb, threshold = 0.4)
    }
    assert(e.getMessage.contains("allowQuadratic"))
    // the opt-in keeps the oracle-baseline contract intact
    assert(Similarity.cosineNearDupPairs(emb, 0.4, allowQuadratic = true)
      .columns.toSeq === Seq("a_id", "b_id", "cosine"))
  }

  test("mmrRerank enforces the shortlist-collect bound (n cap, k <= n)") {
    // an oversized n must fail loudly, never silently become a quadratic
    // driver collect; same for k beyond the shortlist
    val q = emb.filter(col("vec_id") === 0).select(col("vec").as("qvec"))
    val big = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(emb, q, n = Similarity.MaxMmrShortlist + 1, k = 5,
        lambda = 0.7)
    }
    assert(big.getMessage.contains("shortlist"))
    val kBig = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(emb, q, n = 10, k = 11, lambda = 0.7)
    }
    assert(kBig.getMessage.contains("k="))
  }

  test("multi-probe near-dup: nprobe=1 == single-probe; nprobe=2 ⊇ nprobe=1") {
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("vec").as("cvec"))
    val single = Similarity.bucketedNearDupPairs(emb, centroids, 0.4)
    val multi1 = Similarity.bucketedNearDupPairsMulti(emb, centroids, 0.4, 1)
    assert(multi1.exceptAll(single).count() === 0)
    assert(single.exceptAll(multi1).count() === 0)
    // more probes only ADD recall: the pair set grows monotonically
    val multi2 = Similarity.bucketedNearDupPairsMulti(emb, centroids, 0.4, 2)
    assert(multi1.exceptAll(multi2).count() === 0)
    assert(multi2.count() >= multi1.count())
  }

  test("ivfPqTopK with nprobe = #centroids degenerates to plain ADC") {
    // probing every bucket removes the IVF restriction entirely, so the
    // composed search must return exactly pqTopK over the full code table
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("vec").as("cvec"))
    val codebook = emb.filter(col("vec_id") < 4).orderBy("vec_id")
      .select("vec").collect().map(_.getSeq[Double](0).toArray).toSeq
    val query = emb.filter(col("vec_id") === 0)
      .select("vec").head.getSeq[Double](0).toArray
    val full = Similarity.pqTopK(
      Similarity.pqEncode(emb, codebook, 8), codebook, 8, query, 10,
      excludeId = Some(0L))
    val composed = Similarity.ivfPqTopK(emb, centroids, codebook, 8, query,
      10, nprobe = 8, excludeId = Some(0L))
    assert(composed.collect().toSeq === full.collect().toSeq)
    // and a restricted probe returns a SUBSET of the corpus, ranked by
    // the same ADC distance (ranks re-numbered within the probed set)
    val pruned = Similarity.ivfPqTopK(emb, centroids, codebook, 8, query,
      10, nprobe = 2, excludeId = Some(0L)).collect()
    val fullD2 = full.collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    pruned.foreach { r =>
      fullD2.get(r.getLong(1)).foreach(d2 => assert(d2 === r.getDouble(2)))
    }
  }

  test("refine with an all-bucket full-size shortlist == exact L2 top-k") {
    // nprobe = #centroids and kCoarse = corpus size remove both pruning
    // stages, so the refine must return exactly the exact-L2 ranking —
    // the degenerate case that pins the re-rank arithmetic
    import org.apache.spark.sql.functions.{aggregate => aggr, _}
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("vec").as("cvec"))
    val codebook = emb.filter(col("vec_id") < 4).orderBy("vec_id")
      .select("vec").collect().map(_.getSeq[Double](0).toArray).toSeq
    val query = emb.filter(col("vec_id") === 0)
      .select("vec").head.getSeq[Double](0).toArray
    val n = emb.count().toInt
    val refined = Similarity.ivfPqRefineTopK(emb, centroids, codebook, 8,
      query, k = 10, kCoarse = n, nprobe = 8, excludeId = Some(0L))
    val d2 = aggr(
      zip_with(col("vec"), lit(query), (a, b) => (a - b) * (a - b)),
      lit(0.0d), _ + _)
    val exact = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), round(d2, 6).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(refined.orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq === exact.toSeq)
  }

  test("s13 recall eval: 10 retrieved per method, recall = hits/10 in [0,1]") {
    // the eval's own arithmetic must be trustworthy before its recall
    // numbers mean anything: every method retrieves exactly k, hits never
    // exceed retrieved, and the recall column is literally n_hits/10
    val rows = graft.queries.DataQueries5.s13PqRecall(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("ivfpq_p2", "ivfpq_p4", "pq_adc"))
    rows.foreach { r =>
      assert(r.getLong(1) === 10L)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10L)
      assert(r.getDouble(3) === r.getLong(2) / 10.0)
    }
  }
}
