package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit salting
  * is for the pathological key — e.g. the empty-string `column` key of
  * entry-level tags, or a near-universal shingle — where one reducer would
  * otherwise receive a large fraction of the table. The big side's rows are
  * spread across `salts` sub-keys by a deterministic hash of a unique
  * column; the small side is replicated ×salts. Result is IDENTICAL to the
  * plain join (verified by SkewSpec); only the shuffle key changes from
  * `key` to `(key, salt)`.
  */
object Skew {

  /** Inner equi-join `big ⋈ small on keys`, salted. `bigUnique` is any
    * column of `big` that spreads rows (a row id, not the join key).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, bigUnique: Column): DataFrame =
    // salts <= 1 = plain join, the same guard as Dedup.saltedSides:
    // [[chooseSalts]] legitimately returns 0 ("below the bar"), and
    // feeding that here unguarded would pmod by zero — a silent
    // zero-row result (NULL salt matches nothing) or an ANSI
    // DIVIDE_BY_ZERO, depending on mode
    if (salts <= 1) big.join(small, keys)
    else {
      // reserved-column guard (the ivfAssign rule): withColumn would
      // silently OVERWRITE a user __salt column and drop it from the
      // output — breaking the documented result-identical-to-plain-join
      // contract with silent data loss instead of a named error
      require(!big.columns.contains("__salt") &&
        !small.columns.contains("__salt"),
        "saltedJoin: inputs must not carry a __salt column (reserved)")
      val bigS = big.withColumn("__salt",
        pmod(xxhash64(bigUnique), lit(salts.toLong)))
      val smallS = small.withColumn("__salt",
        explode(sequence(lit(0L), lit(salts.toLong - 1))))
      bigS.join(smallS, keys :+ "__salt").drop("__salt")
    }

  /** Pick the salt factor for a bucketed SELF-join from its observed key
    * histogram — the decision rule `tools.SaltProbe`'s measurements
    * calibrate (SCALING.md "salting crossover").
    *
    * Cost model: a bucket of size c costs c² comparisons; the shuffle
    * spreads whole buckets over P partitions, so the unsalted bottleneck
    * partition carries ~max(c_max², W/P) with W = Σ c². Salting by s cuts
    * the top bucket to c_max²/s but replicates one join side ×s — a cost
    * proportional to the WHOLE base job (measured ~0.2× per salt at the
    * 10× lake), not to the one hot bucket. So salting pays only when the
    * top bucket's square alone dwarfs a fair partition share:
    * c_max² > hotFactor × W/P. Below the bar: 0 (AQE's runtime skew
    * split stays the only mitigation — measured strictly faster).
    * Above it: the smallest s bringing c_max²/s back under the bar,
    * capped at `maxSalts` (replication cost is linear in s, so past the
    * cap the job has a partitioning problem salting cannot fix).
    *
    * `hotFactor` default 16: SaltProbe's 10× point (c_max=13.4k,
    * W=1.81e9, ratio c_max²/(W/P) = 3.2) measured salts=4 at 1.35–1.8×
    * the unsalted wall — firmly negative — so the bar sits 5× above
    * that measured-negative ratio; a boilerplate corpus whose top
    * bucket holds millions of rows sits orders of magnitude past it.
    * Round-13 calibrated BOTH sides of the bar on a synthetic dominant
    * bucket (`SaltProbe boiler:8000:3000`, SCALING.md): ratio 12.8 →
    * 0 correct (salting ~neutral there — AQE's runtime skew split
    * already covers the below-bar regime), ratio 51 → salting clearly
    * positive, CONFIRMING engagement — but the bar-clearing s=4 was
    * measured no better than unsalted while s=2 won by ~15%: AQE's
    * split composes with the salt, so the formula's "restore the bar
    * exactly" magnitude over-replicates. The magnitude is therefore
    * HALF the bar-clearing factor (min 2 — one salt is no split),
    * matching the measured optimum at ratio 51 and still scaling with
    * the ratio for the orders-of-magnitude-past-it corpus.
    */
  def chooseSalts(bucketSizes: Seq[Long], partitions: Int,
                  hotFactor: Double = 16.0, maxSalts: Int = 64): Int = {
    require(partitions > 0, "chooseSalts: partitions must be positive")
    if (bucketSizes.isEmpty) return 0
    val w = bucketSizes.iterator.map(c => c.toDouble * c).sum
    val cmax = bucketSizes.max.toDouble
    salted(cmax, w, partitions, hotFactor, maxSalts)
  }

  /** The shared decision: 0 below the bar; above it, half the
    * bar-clearing split factor (≥2), capped.
    */
  private def salted(cmax: Double, w: Double, partitions: Int,
                     hotFactor: Double, maxSalts: Int): Int = {
    val bar = hotFactor * w / partitions
    if (cmax * cmax <= bar || bar == 0.0) 0
    else math.min(maxSalts.toDouble,
      math.max(2.0, math.ceil(cmax * cmax / (2.0 * bar)))).toInt
  }

  /** [[chooseSalts]] from the bucketed rows themselves: ONE distributed
    * aggregation derives (c_max, W) — the histogram never reaches the
    * driver, so the decision costs a metadata-sized job at any corpus
    * size. `keyCols` are the join's bucket key columns exactly as the
    * join shuffles on them (the SaltProbe discipline: measure the
    * buckets the join actually uses).
    */
  def chooseSalts(bucketed: DataFrame, keyCols: Seq[String],
                  partitions: Int, hotFactor: Double,
                  maxSalts: Int): Int = {
    // square in DOUBLE: ANSI mode makes a Long c*c past ~3e9 rows THROW
    // (overflow), and a degenerate boilerplate key at corpus scale is
    // exactly when this helper must answer, not crash
    val h = bucketed.groupBy(keyCols.map(col): _*).count()
      .agg(max(col("count")).as("cmax"),
        sum(col("count").cast("double") * col("count")).as("w"))
      .head()
    if (h.isNullAt(0)) 0 // empty input
    else salted(h.getLong(0).toDouble, h.getDouble(1), partitions,
      hotFactor, maxSalts)
  }
}
