package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.{Bridge => B}
import org.apache.spark.sql.types.BinaryType

/** Broadcast Bloom-filter membership pruning — the runtime-filter shape
  * Spark's own `InjectRuntimeFilter` rule builds for shuffle-heavy joins,
  * exposed as an operator for incremental dedup pipelines.
  *
  * Scale rationale: probing a 100 TB incoming batch against an indexed
  * fingerprint corpus with a plain anti-join shuffles the ENTIRE batch on
  * the fingerprint key. A Bloom filter of the corpus is O(bits) — megabytes
  * for billions of keys — and ships to every executor as a literal, so the
  * overwhelmingly-novel majority of the batch is resolved scan-side with
  * zero shuffle; only Bloom-positive candidates (true dups + the fpp tail)
  * reach the exact verify join. No false negatives ⇒ the two-phase result
  * is exactly the anti-join's (BloomSpec holds them equal).
  *
  * Built on Spark's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (codegen'd, XxHash64-keyed).
  * `DataFrameStatFunctions.bloomFilter` is NOT a way around the
  * aggregate's ceiling clamp: in Spark 4 it routes through the same
  * aggregate (measured: an 80M-bit request came back 67M-bit clamped,
  * and an empty corpus NPE'd its readFrom) — so the build runs in a
  * PRIVATE child session whose conf carries the raised ceilings.
  */
object Bloom {

  /** Build a Bloom filter over `key` (hashed with XxHash64, matching the
    * probe side) and return its serialized bytes. The sketch is model
    * data by contract — O(numBits), independent of row count — the same
    * driver-sized footprint as a broadcast join's build side, collected
    * through one map-side-combined aggregation.
    */
  def build(df: DataFrame, key: Column, expectedItems: Long,
            numBits: Long): Array[Byte] = {
    // BloomFilterAggregate refuses/clamps requests above the session's
    // runtime-filter ceilings (defaults: 4M items / 67M bits ≈ 8 MB —
    // confirmed in the shipped 4.1.2 bytecode: a checkInputDataTypes
    // require AND a lazy Math.min, both reading SQLConf.get). Sized-from-
    // the-corpus callers would sail past that around ~8M docs and the
    // fpp would quietly climb toward 1, refilling the exact verify join
    // this operator exists to drain. RAISE the ceilings in a PRIVATE
    // child session (fresh SQLConf, shared SparkContext) and re-root the
    // ANALYZED plan there: the caller's session conf is never mutated,
    // so concurrently planned queries can't see raised ceilings
    // (InjectRuntimeFilter would size injected filters by them) and
    // overlapping builds can't race a save/restore.
    val owner = df.sparkSession
    val session = owner.newSession()
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits)
      .foreach { case (k, v) =>
        if (session.conf.get(k).toLong < v) session.conf.set(k, v.toString)
      }
    val isolated = B.ofRows(session, df.queryExecution.analyzed)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(B.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // an EMPTY corpus aggregates to a null sketch; [[mightContain]] maps
    // that back to "definitely absent" rather than letting the SQL NULL
    // swallow both branches of a cand / !cand split
    isolated.select(B.column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
  }

  /** Membership probe: true ⇒ key MAY be in the indexed set (verify
    * exactly); false ⇒ key is DEFINITELY absent. Row-local, codegen'd,
    * pushes to the scan like any other predicate. A null sketch (empty
    * indexed corpus — [[build]]) means NO key is present: the probe is a
    * constant false, so `!cand` correctly classifies everything as novel
    * and the two-phase == anti-join contract holds on the empty edge too (`BloomFilterMightContain(null, …)` would instead
    * return SQL NULL and silently drop every row from BOTH branches).
    */
  def mightContain(filter: Array[Byte], key: Column): Column =
    if (filter == null) org.apache.spark.sql.functions.lit(false)
    else B.column(BloomFilterMightContain(Literal(filter, BinaryType),
      new XxHash64(Seq(B.expression(key)))))
}
