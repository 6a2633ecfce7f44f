package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Lake
import graft.functions.TextFns
import graft.operators.Similarity
import graft.queries.CoreQueries.Q

/** Round-4 training-data pipeline operators: benchmark decontamination by
  * word-n-gram overlap (the GPT-3-appendix-C / PaLM procedure), bigram
  * Shannon entropy as a text-diversity quality signal, and ANN recall
  * evaluation (the measurement loop every approximate index needs).
  * Parity discipline as elsewhere: md5-derived splits, decimal-rounded
  * double sums, deterministic ORDER BY everywhere.
  */
object DataQueries3 {

  import Shared.{docs, emb, cosSql, sqlList}

  // ----------------------------------------- n-gram decontamination (d13)

  /** Benchmark decontamination: for every held-out document, the fraction
    * of its DISTINCT word 5-grams that occur anywhere in the train split
    * (GPT-3 appendix C measures 13-gram overlap the same way; 5 here so
    * the short synthetic docs produce usable signal). Train membership is
    * the d08 content-hash split — reshuffle-proof. Scale shape: the train
    * side collapses to a DISTINCT n-gram set (map-side-combined), the
    * held-out side explodes and probes it with one hash equi-join on the
    * gram — no all-pairs doc comparison anywhere; at 100 TB the join key
    * could drop to [[TextFns.hash60]] of the gram to shrink shuffle width
    * without changing semantics.
    */
  def d13DecontamNgram(spark: SparkSession, dir: String): DataFrame = {
    val n = 5
    val d = docs(spark, dir).select(
      col("doc_id"),
      when(TextFns.hash28(col("text")) % 100 < 80, "train")
        .otherwise("held").as("split"),
      TextFns.wordNgramsNative(col("text"), n, distinct = true).as("grams"))
    val train = d.filter(col("split") === "train")
      .select(explode(col("grams")).as("gm")).distinct()
    d.filter(col("split") === "held")
      .select(col("doc_id"), explode(col("grams")).as("gm"))
      .join(train.withColumn("hit", lit(1)), Seq("gm"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_matched"))
      .select(col("doc_id"), col("n_shingles"), col("n_matched"),
        round(col("n_matched") * lit(1.0) / col("n_shingles"), 4)
          .as("overlap_frac"),
        (col("n_matched") * lit(1.0) / col("n_shingles") >= 0.2)
          .as("contaminated"))
      .orderBy("doc_id")
  }

  val d13Oracle: String =
    """WITH d AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(text,'\s+'), w -> length(w)>0) AS ws,
      |    CASE WHEN ('0x'||substr(md5(text),1,7))::BIGINT % 100 < 80
      |         THEN 'train' ELSE 'held' END AS split FROM documents),
      |g AS (SELECT doc_id, split,
      |    CASE WHEN len(ws) >= 5 THEN list_distinct(
      |      [array_to_string(ws[i:i+4], ' ') FOR i IN range(1, len(ws)-3)])
      |    ELSE [] END AS grams FROM d),
      |tr AS (SELECT DISTINCT unnest(grams) AS gm FROM g WHERE split='train'),
      |he AS (SELECT doc_id, unnest(grams) AS gm FROM g WHERE split='held'),
      |m AS (SELECT doc_id, count(*) AS n_shingles, count(tr.gm) AS n_matched
      |      FROM he LEFT JOIN tr ON he.gm = tr.gm GROUP BY doc_id)
      |SELECT doc_id, n_shingles, n_matched,
      |  round(n_matched*1.0/n_shingles, 4) AS overlap_frac,
      |  n_matched*1.0/n_shingles >= 0.2 AS contaminated
      |FROM m ORDER BY doc_id""".stripMargin

  // --------------------------------------------- bigram entropy (t08)

  /** Per-document Shannon entropy over word bigrams — the text-diversity
    * quality signal (low entropy = templated/repetitive text, a standard
    * pretraining filter axis alongside t07's Gopher repetition ratios).
    * H = ln T − (Σ c·ln c)/T from one keyed count; each c·ln c term is
    * rounded into decimal(18,10) BEFORE the sum so the aggregation is
    * order-independent and engine-exact (the t05 discipline). Two
    * map-side-combined aggregations on (doc_id[, gram]) — no windows, no
    * driver state; partitions by doc hash at any scale.
    */
  def t08BigramEntropy(spark: SparkSession, dir: String): DataFrame = {
    docs(spark, dir)
      .select(col("doc_id"),
        explode(TextFns.wordNgramsNative(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        (log(sum(col("c"))) -
          sum((col("c") * log(col("c"))).cast("decimal(18,10)"))
            .cast("double") / sum(col("c"))).as("entropy"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
        round(col("entropy"), 6).as("entropy"))
      .orderBy("doc_id")
  }

  val t08Oracle: String =
    """WITH d AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(text,'\s+'), w -> length(w)>0) AS ws
      |  FROM documents),
      |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
      |       FROM d, unnest(generate_series(1, len(ws)-1)) AS t(i)),
      |c AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  count(*) AS n_distinct,
      |  round(ln(sum(c)) -
      |    CAST(sum(CAST(c*ln(c) AS DECIMAL(18,10))) AS DOUBLE)/sum(c), 6)
      |    AS entropy
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------- ANN recall eval (s07)


  /** ANN index evaluation: recall@10 of the IVF (s02 configuration,
    * nprobe=2) and hyperplane-LSH (s03 configuration) indexes against the
    * brute-force ground truth for query 0 — the measurement loop that
    * makes an approximate index tunable (FAISS-style recall/probes
    * curves). Every side reuses the production operators; the truth set
    * is 10 rows, so the comparison joins are broadcasts by size.
    */
  def s07AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val ix = AnnEval.index(spark, dir)
    val e = ix.emb
    val query = {
      import spark.implicits._
      Seq(Tuple1(ix.query.toSeq)).toDF("qvec")
    }
    val centroids = ix.centroids
    // each result is ≤ k rows but drags a full-corpus lineage; without a
    // barrier every comparison join below re-runs the index scan (truth
    // alone is referenced three times → 3 brute-force passes). One
    // localCheckpoint per k-row result caps the whole eval at one pass
    // per index regardless of how many comparisons consume it.
    val truth = Similarity.bruteForceTopK(e, query, k = 10, excludeId = Some(0L))
      .select(col("vec_id")).localCheckpoint()
    val ivf = Similarity.ivfTopK(ix.assigned, centroids,
      query, k = 10, nprobe = 2, excludeId = Some(0L)).localCheckpoint()
    val lsh = Similarity.lshTopKIndexed(e, ix.sigs, queryId = 0L, k = 10)
      .localCheckpoint()
    def scoreOf(name: String, got: DataFrame): DataFrame =
      got.select(col("vec_id"))
        .join(truth.withColumn("hit", lit(1)), Seq("vec_id"), "left")
        .agg(count(lit(1)).as("n_retrieved"), count(col("hit")).as("n_hits"))
        .select(lit(name).as("method"), col("n_retrieved"), col("n_hits"),
          round(col("n_hits") * lit(1.0) / lit(10.0), 4).as("recall_at_10"))
    scoreOf("brute", truth).unionByName(scoreOf("ivf", ivf))
      .unionByName(scoreOf("lsh", lsh))
      .orderBy("method")
  }


  val s07Oracle: String = {
    val embCte =
      """e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)""".stripMargin
    s"""WITH $embCte,
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |truth AS (SELECT vec_id FROM (
       |  SELECT vec_id, row_number() OVER (
       |    ORDER BY ${cosSql("e.v", "q.qv")} DESC, vec_id) AS rank
       |  FROM e, q WHERE e.vec_id <> 0) WHERE rank <= 10),
       |cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
       |assign AS (SELECT vec_id, centroid_id FROM (
       |  SELECT e.vec_id, c.centroid_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.centroid_id) AS rn
       |  FROM e CROSS JOIN cent c) WHERE rn = 1),
       |probed AS (SELECT centroid_id FROM (
       |  SELECT c.centroid_id, row_number() OVER (
       |    ORDER BY ${cosSql("c.cv", "q.qv")} DESC, c.centroid_id) AS crank
       |  FROM cent c, q) WHERE crank <= 2),
       |ivf AS (SELECT vec_id FROM (
       |  SELECT e.vec_id, row_number() OVER (
       |    ORDER BY ${cosSql("e.v", "q.qv")} DESC, e.vec_id) AS rank
       |  FROM e JOIN (SELECT a.vec_id FROM assign a JOIN probed p
       |               USING (centroid_id) WHERE a.vec_id <> 0) cand
       |    USING (vec_id), q) WHERE rank <= 10),
       |hp AS (SELECT vec_id - 1 AS hp_id, v AS hvec FROM e
       |       WHERE vec_id BETWEEN 1 AND 4),
       |sigs AS (SELECT e.vec_id,
       |    CAST(sum(CASE WHEN ${cosSql("e.v", "hp.hvec")} >= 0
       |                  THEN (1::BIGINT << CAST(hp.hp_id AS INT)) ELSE 0 END)
       |         AS BIGINT) AS bucket_sig
       |  FROM e CROSS JOIN hp GROUP BY e.vec_id),
       |lsh AS (SELECT vec_id FROM (
       |  SELECT e.vec_id, row_number() OVER (
       |    ORDER BY ${cosSql("e.v", "q.qv")} DESC, e.vec_id) AS rank
       |  FROM e JOIN (SELECT s.vec_id FROM sigs s,
       |                 (SELECT bucket_sig AS q_sig FROM sigs WHERE vec_id = 0) qs
       |               WHERE s.bucket_sig = qs.q_sig AND s.vec_id <> 0) cand
       |    USING (vec_id), q) WHERE rank <= 10),
       |scored AS (
       |  SELECT 'brute' AS method, count(*) AS n_retrieved,
       |    count(t.vec_id) AS n_hits
       |  FROM truth g LEFT JOIN truth t ON g.vec_id = t.vec_id
       |  UNION ALL
       |  SELECT 'ivf', count(*), count(t.vec_id)
       |  FROM ivf g LEFT JOIN truth t ON g.vec_id = t.vec_id
       |  UNION ALL
       |  SELECT 'lsh', count(*), count(t.vec_id)
       |  FROM lsh g LEFT JOIN truth t ON g.vec_id = t.vec_id)
       |SELECT method, n_retrieved, n_hits,
       |  round(n_hits*1.0/10.0, 4) AS recall_at_10
       |FROM scored ORDER BY method""".stripMargin
  }

  // ------------------------------------------- semantic dedup (d14)

  /** SemDeDup (Abbas et al. 2023): semantic near-duplicate removal in
    * EMBEDDING space — IVF-bucketed cosine pairs (e02's multi-probe
    * nprobe=2 equi-join candidates, no nested-loop join anywhere; the
    * recall default the e03 eval measured), connected components to
    * close the pair set transitively (d09's pointer-jumping machinery),
    * min-id keeper per cluster. Output is the apply decision: every
    * clustered vector with its cluster, size, and whether it survives.
    * The min-label CC labels a component with its minimum vertex id, so
    * the keeper test is label equality — no extra window over the corpus.
    */
  def d14SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    // SERVED index (AnnEval): the nprobe=2 assignment is checkpointed
    // once per session and self-joined from those partitions — no
    // per-run centroid re-assign (the round-9 regression: recall's
    // nprobe=2 doubled an assignment this query then rebuilt every run).
    val ix = AnnEval.index(spark, dir)
    val pairs = Similarity.bucketedNearDupPairsFromAssigned(
      ix.assignedMulti2, ix.emb, threshold = 0.4)
    graft.operators.Graph.connectedComponents(pairs, "a_id", "b_id")
      .select(col("id").as("vec_id"), col("label").as("cluster_id"))
      .withColumn("is_keeper", col("vec_id") === col("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")))
      .orderBy("vec_id")
  }

  val d14Oracle: String = {
    val embCte =
      """e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)""".stripMargin
    s"""WITH RECURSIVE $embCte,
       |cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
       |assign AS (SELECT vec_id, centroid_id FROM (
       |  SELECT e.vec_id, c.centroid_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.centroid_id) AS rn
       |  FROM e CROSS JOIN cent c) WHERE rn <= 2),
       |cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
       |  FROM assign l JOIN assign r
       |    ON l.centroid_id = r.centroid_id AND l.vec_id < r.vec_id),
       |pairs AS (SELECT a, b FROM cand
       |  JOIN e le ON le.vec_id = a
       |  JOIN e re ON re.vec_id = b
       |  WHERE ${cosSql("le.v", "re.v")} >= 0.4),
       |edges AS (SELECT a AS u, b AS v FROM pairs
       |          UNION SELECT b, a FROM pairs),
       |reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
       |comp AS (SELECT u AS vec_id, least(u, min(v)) AS cluster_id
       |         FROM reach GROUP BY u)
       |SELECT vec_id, cluster_id, vec_id = cluster_id AS is_keeper,
       |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
       |    AS cluster_size
       |FROM comp ORDER BY vec_id""".stripMargin
  }

  // --------------------------------- stream-static enrichment (st07)

  /** Stream-static enrichment, batch form: events joined to the customer
    * dimension (broadcast — the stream partitioning is untouched), then
    * the shared 5-minute window aggregation per market segment. The
    * streaming form of the identical transform is exercised by
    * StreamingSpec (dimension re-read per micro-batch).
    */
  def st07EnrichedWindow(spark: SparkSession, dir: String): DataFrame = {
    val dim = Lake.table(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    graft.streaming.Streams
      .enrichedWindowCounts(
        Lake.spread(Lake.table(spark, dir, "events"), col("event_id")), dim)
      .orderBy("window_start", "segment")
  }

  val st07Oracle: String =
    """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
      |  c_mktsegment AS segment, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2 ORDER BY window_start, segment""".stripMargin

  // ------------------------------------ composite quality filter (t14)


  /** The C4/Gopher-style filter STACK as one verdict operator: language
    * (t01's stopword-argmax langid must say 'en'), length bounds, mean
    * word length, distinct-token fraction (repetition), stopword
    * fraction — each rule a flag, keep = every rule passes. All ratio
    * rules use cross-multiplied INTEGER arithmetic (e.g. `10·distinct ≥
    * 3·wc` instead of `distinct/wc ≥ 0.3`) — exact in both engines and no
    * division-by-zero edge. Entirely row-local: one narrow pass at any
    * corpus size, the filter stack a pretraining pipeline runs before any
    * dedup stage.
    */
  def t14FilterPipeline(spark: SparkSession, dir: String): DataFrame = {
    // token array staged once (HOF subtrees are CSE-exempt — see
    // TextFns.langIdFromWords): the one-Column langId alone re-split the
    // text ~10× per row, plus once per stat below
    val ws = col("__ws")
    val en = TextFns.stopwords("en")
    TextFns.langIdFromWords(
        docs(spark, dir).select(col("doc_id"),
          TextFns.words(col("text")).as("__ws")),
        "__ws", "pred_lang")
      .select(col("doc_id"),
        col("pred_lang"),
        size(ws).as("wc"),
        aggregate(transform(ws, w => length(w)), lit(0L), _ + _).as("wchars"),
        size(array_distinct(ws)).as("wdistinct"),
        TextFns.stopwordHits(ws, en).cast("long").as("stophits"))
      .select(col("doc_id"),
        (col("pred_lang") === "en").as("r_lang"),
        col("wc").between(20, 1000).as("r_len"),
        (lit(2) * col("wc") <= col("wchars") &&
          col("wchars") <= lit(12) * col("wc")).as("r_wordlen"),
        (lit(10) * col("wdistinct") >= lit(3) * col("wc")).as("r_distinct"),
        (lit(20) * col("stophits") >= col("wc")).as("r_stopword"))
      .withColumn("keep",
        col("r_lang") && col("r_len") && col("r_wordlen") &&
          col("r_distinct") && col("r_stopword"))
      .orderBy("doc_id")
  }

  val t14Oracle: String = {
    val scores = Seq("de", "en", "es", "fr").map { l =>
      s"len(list_filter(ws, w -> list_contains(${sqlList(TextFns.stopwords(l))}, w))) AS s_$l"
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '\\s+'), w -> length(w) > 0) AS ws
       |  FROM documents),
       |s AS (SELECT doc_id, ws, len(ws) AS wc,
       |    CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)
       |      AS BIGINT) AS wchars,
       |    len(list_distinct(ws)) AS wdistinct, $scores
       |  FROM d),
       |f AS (SELECT doc_id,
       |    (CASE WHEN coalesce(s_de + s_en + s_es + s_fr, 0) = 0 THEN 'und'
       |          WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       |          WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       |          WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END) = 'en' AS r_lang,
       |    wc BETWEEN 20 AND 1000 AS r_len,
       |    2 * wc <= wchars AND wchars <= 12 * wc AS r_wordlen,
       |    10 * wdistinct >= 3 * wc AS r_distinct,
       |    20 * CAST(s_en AS BIGINT) >= wc AS r_stopword
       |  FROM s)
       |SELECT doc_id, r_lang, r_len, r_wordlen, r_distinct, r_stopword,
       |  r_lang AND r_len AND r_wordlen AND r_distinct AND r_stopword AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------- incremental-ingest dedup (d15)

  /** Incremental ingestion dedup: an incoming batch (doc_id ≡ 8,9 mod 10 —
    * a deterministic ~20% slice) is checked against the EXISTING corpus's
    * content-fingerprint store, then within itself. Status per incoming
    * doc: dup_of_existing (fingerprint already in the store — an anti-join
    * miss), dup_within_batch (repeat inside the increment, min-doc_id
    * survivor), new_unique. The existing side collapses to a distinct
    * fingerprint set probed by ONE hash equi-join — the daily-crawl
    * ingestion shape: the store is keyed state, the increment is small,
    * nothing rescans the historical corpus text.
    */
  def d15IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("fp", md5(col("text")))
    val existing = d.filter(col("doc_id") % 10 < 8).select("fp").distinct()
    val incoming = d.filter(col("doc_id") % 10 >= 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    incoming.join(existing.withColumn("seen", lit(1)), Seq("fp"), "left")
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"),
        when(col("seen") === 1, "dup_of_existing")
          .when(col("rn") > 1, "dup_within_batch")
          .otherwise("new_unique").as("status"))
      .orderBy("doc_id")
  }

  val d15Oracle: String =
    """WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |ex AS (SELECT DISTINCT fp FROM d WHERE doc_id % 10 < 8),
      |inc AS (SELECT doc_id, fp,
      |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |  FROM d WHERE doc_id % 10 >= 8)
      |SELECT doc_id,
      |  CASE WHEN ex.fp IS NOT NULL THEN 'dup_of_existing'
      |       WHEN rn > 1 THEN 'dup_within_batch'
      |       ELSE 'new_unique' END AS status
      |FROM inc LEFT JOIN ex ON inc.fp = ex.fp
      |ORDER BY doc_id""".stripMargin

  // ------------------------------- matryoshka truncation energy (s08)

  /** Matryoshka-style dimensionality reduction (Kusupati et al. 2022):
    * truncate each embedding to its 16-dim prefix and report the retained
    * L2 energy — the quality signal that decides how far an MRL index can
    * cut storage. Entirely row-local (one narrow pass, zero shuffle
    * besides the presentation sort); the dot products accumulate
    * left-to-right exactly like DuckDB's `list_dot_product`, the parity
    * discipline every cosine in this repo already relies on.
    */
  def s08MatryoshkaEnergy(spark: SparkSession, dir: String): DataFrame = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val e = emb(spark, dir)
    val t = slice(col("vec"), 1, 16)
    e.select(col("vec_id"), size(col("vec")).as("n_dims"),
        sqrt(dot(col("vec"), col("vec"))).as("fn"),
        sqrt(dot(t, t)).as("tn"))
      .select(col("vec_id"), col("n_dims"), lit(16).as("trunc_dims"),
        round(col("fn"), 6).as("full_norm"),
        round(col("tn"), 6).as("trunc_norm"),
        round(col("tn") / col("fn"), 6).as("energy_retained"))
      .orderBy("vec_id")
  }

  val s08Oracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      |n AS (SELECT vec_id, len(v) AS n_dims,
      |    sqrt(list_dot_product(v, v)) AS fn,
      |    sqrt(list_dot_product(v[1:16], v[1:16])) AS tn
      |  FROM e)
      |SELECT vec_id, n_dims, 16 AS trunc_dims,
      |  round(fn, 6) AS full_norm, round(tn, 6) AS trunc_norm,
      |  round(tn / fn, 6) AS energy_retained
      |FROM n ORDER BY vec_id""".stripMargin

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("d13_decontam_ngram", d13DecontamNgram _, Some(d13Oracle)),
    ("t08_bigram_entropy", t08BigramEntropy _, Some(t08Oracle)),
    ("s07_ann_recall", s07AnnRecall _, Some(s07Oracle)),
    ("d14_semantic_dedup", d14SemanticDedup _, Some(d14Oracle)),
    ("st07_enriched_window", st07EnrichedWindow _, Some(st07Oracle)),
    ("t14_filter_pipeline", t14FilterPipeline _, Some(t14Oracle)),
    ("d15_incremental_dedup", d15IncrementalDedup _, Some(d15Oracle)),
    ("s08_matryoshka_energy", s08MatryoshkaEnergy _, Some(s08Oracle)))
}
