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
                 salts: Int, bigUnique: Column): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(xxhash64(bigUnique), lit(salts.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
