package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The scale ratchet for forced broadcasts: a `broadcast()` hint overrides
  * Spark's size threshold UNCONDITIONALLY, so hinting a corpus-derived
  * frame (anything that grows with the documents/embeddings tables —
  * fingerprint sets, vocabularies, df tables) builds a corpus-sized hash
  * relation on every executor at 100 TB. Round 8 shipped four such hints
  * (d08 train fingerprints, t05 vocabulary, t10 document frequency, t21
  * encoded vocabulary); round 9 removed them, and this spec keeps them
  * removed: every SparkEntry query's analyzed plan is scanned for
  * ResolvedHint(BROADCAST) nodes whose subtree reads the corpus tables,
  * and the flagged set must EXACTLY equal the audited allowlist below —
  * a new forced corpus broadcast fails loudly, and so does a stale
  * allowlist entry.
  *
  * Allowlisted hints are bounded by construction — the hinted subtree
  * collapses the corpus to model-sized data (k centroids, a 1-row query
  * vector, a k-row shortlist, a 2-value band model) — so the broadcast is
  * O(model), not O(corpus). Unhinted joins stay legal everywhere: AQE
  * broadcasts by MEASURED size, which is exactly the behavior that
  * survives a 100x scale-up.
  */
class BroadcastGuardSpec extends SparkSpec {

  /** Queries whose forced broadcast of a corpus-derived frame is bounded;
    * each entry documents the bound. Kept in sync by exact-set equality.
    */
  private val boundedAllowlist: Map[String, String] = Map(
    // the hinted frame filters the embeddings scan to vec_id === 0: ONE
    // query vector crossJoin'd to every corpus row — O(1) build side
    "s01_ann_topk" -> "1-row query vector (vec_id === 0 filter)",
    // same 1-row query vector, plus its 16-bit hyperplane signature — both
    // single-row frames; the hyperplanes themselves are a fixed constant
    "s03_ann_hyperplane" -> "1-row query vector + its 1-row LSH signature",
    // flagged via the LogicalRDD (checkpoint-barrier) rule: the shared
    // AnnEval index materializes centroids/assignments behind a
    // localCheckpoint; the hinted frames are the k=8 centroid set and the
    // nprobe-row probed-bucket list — model data by the IVF contract
    "s02_ann_ivf" -> "k=8 checkpointed centroids + nprobe-row probe list",
    // the kCoarse-row ADC shortlist broadcast back to the corpus for the
    // exact refine — k-row by construction (ivfPqRefineTopKFromCodes
    // requires kCoarse >= k, both call-site constants)
    "s14_ivfpq_refine" -> "kCoarse-row checkpointed refine shortlist",
    // the 2-value perplexity band model row (quantile edges), checkpointed
    // then crossJoin'd to every doc — O(1) build side
    "t17_perplexity_band" -> "1-row band-edge model (2 quantile values)")

  private def scansCorpus(plan: LogicalPlan): Boolean = plan.exists {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.exists { p =>
        val s = p.toString
        s.contains("documents") || s.contains("embeddings")
      }
      case _ => false
    }
    // a localCheckpoint TRUNCATES lineage (LogicalRDD) — provenance is
    // unknowable from the plan, and the repo's checkpoint barriers sit
    // exactly on corpus-derived frames (t05's vocab, t10's tf, shingle
    // sets), so an unknown-provenance broadcast build counts as
    // corpus-derived unless explicitly allowlisted with its bound
    case _: org.apache.spark.sql.execution.LogicalRDD => true
    case _ => false
  }

  private def corpusBroadcastHints(df: DataFrame): Seq[ResolvedHint] =
    df.queryExecution.analyzed.collectWithSubqueries {
      case h: ResolvedHint
        if h.hints.strategy.contains(BROADCAST) && scansCorpus(h.child) => h
    }

  test("no query force-broadcasts a corpus-derived frame beyond the audited bounds") {
    val flagged = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hints = corpusBroadcastHints(fn(spark, sf))
        if (hints.nonEmpty) Some(name -> hints.size) else None
    }.toMap

    val unexpected = flagged.keySet -- boundedAllowlist.keySet
    val stale = boundedAllowlist.keySet -- flagged.keySet
    assert(unexpected.isEmpty,
      s"forced corpus-scale broadcast hints in: ${unexpected.toSeq.sorted}" +
        " — drop the hint (AQE broadcasts when it fits) or document the" +
        " bound in boundedAllowlist")
    assert(stale.isEmpty,
      s"stale allowlist entries (no corpus broadcast found): ${stale.toSeq.sorted}")

    // the four round-8 offenders must never come back
    Seq("d08_contamination", "t05_unigram_logprob", "t10_tfidf",
      "t21_bpe_encode").foreach { q =>
      assert(!flagged.contains(q), s"$q regressed to a forced corpus broadcast")
    }
  }
}
