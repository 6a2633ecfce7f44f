package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup pipelines.
  *
  * Near-duplicate detection yields PAIRS; acting on them (keep one doc per
  * duplicate group) needs the transitive closure — connected components.
  * At 100 TB the component structure is exactly what union-find on a
  * single machine cannot hold, so this is the canonical "genuinely
  * distributed" dedup stage (cf. the alternating-star CC algorithms of
  * Kiveris et al., "Connected Components in MapReduce and Beyond").
  */
object Graph {

  /** One-task union-find over a SMALL edge set — the local tail of the
    * distributed loop, not a driver collect: the edges coalesce into a
    * single executor partition and the component labels come back as a
    * Dataset. Union-by-min (the larger root links under the smaller)
    * keeps every root the minimum id of its component, matching the
    * min-label contract of the distributed rounds exactly. Emitted
    * vertices = edge endpoints, the same universe the distributed loop
    * labels.
    *
    * Both call sites pass a PERSISTED-and-counted edge frame, so the
    * `coalesce(1)` single task reads cached blocks — it never pulls the
    * upstream pair pipeline's computation into one task.
    */
  private def localFinish(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("u"), col("v")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) {
            val n = parent(c); parent(c) = r; c = n
          }
          r
        }
        val verts = scala.collection.mutable.LinkedHashSet.empty[Long]
        it.foreach { case (u, v) =>
          verts += u; verts += v
          val ru = find(u); val rv = find(v)
          if (ru != rv) {
            if (ru < rv) parent(rv) = ru else parent(ru) = rv
          }
        }
        verts.iterator.map(v => (v, find(v)))
      }
      .toDF("id", "label")
  }

  /** Connected components by iterative min-label propagation: every vertex
    * repeatedly adopts the smallest label among itself and its neighbors
    * until fixpoint. Output: `(id, component)` with `component` = the
    * minimum vertex id of the component — a deterministic canonical
    * representative (the "keeper" under a min-id survivor rule).
    *
    * Scale shape: each iteration is one equi-join (edges ⨝ labels, keyed
    * on vertex id) plus one map-side-combined `min` aggregation — both
    * shuffle-partitioned by vertex id, so a cluster co-partitions them
    * and the per-iteration cost is linear in |E|. Iteration count is the
    * graph diameter; near-dup clusters are dense (diameter 2–4), so the
    * loop converges in a handful of rounds. For adversarial long-chain
    * graphs switch to the alternating large-star/small-star contraction,
    * which converges in O(log n) rounds; plain propagation is the right
    * trade for dedup workloads.
    *
    * The driver loop is orchestration only (no data on the driver): each
    * round materializes the new label table EAGERLY with
    * `localCheckpoint()` and probes convergence with a `limit(1)`
    * existence join. The checkpoint is load-bearing, not an optimization:
    * `next` references `labels` twice (union + join), so without lineage
    * truncation the logical plan doubles per round and Catalyst analysis
    * goes exponential by iteration ~10 — the standard iterative-DataFrame
    * trap (GraphX/ML checkpoint for the same reason).
    *
    * `reliableCheckpoint = true` swaps every per-round `localCheckpoint()`
    * for a RELIABLE `checkpoint()` against the configured
    * `spark.sparkContext.setCheckpointDir` — the cluster mode: a local
    * checkpoint pins blocks to the executors that computed them, so one
    * lost executor aborts a long CC job mid-loop; a reliable checkpoint
    * survives executor loss at the cost of one filesystem round-trip per
    * round (GraphX's `checkpointInterval` exists for the same reason).
    * Local mode has no executor-loss failure domain, so the default
    * stays local; the label evolution is identical either way
    * (GraphSpec runs the same graph through both modes).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25,
                          verbose: Boolean = false,
                          contractMinEdges: Long = 500000L,
                          localFinishEdges: Long = 200000L,
                          reliableCheckpoint: Boolean = false): DataFrame = {
    require(!reliableCheckpoint ||
        edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "connectedComponents(reliableCheckpoint=true) needs " +
        "spark.sparkContext.setCheckpointDir(...) configured first")
    // reliable mode bookkeeping (the GraphX PeriodicCheckpointer
    // discipline): Spark never deletes reliable checkpoint files — not
    // on unreference, not on job end — so an unmanaged loop leaks two
    // label-table-sized dirs per round until the checkpoint filesystem
    // fills. Track every file this invocation writes and keep only the
    // 2 newest mid-loop (the 2nd-newest can still back a cached
    // contracted edge set's lineage under executor loss); the final
    // cleanup below keeps just the returned table's backing file.
    val ckptFiles = scala.collection.mutable.Queue.empty[String]
    def dropCkpt(file: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(file)
      p.getFileSystem(edges.sparkSession.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    // both checkpoint forms are EAGER (materialize now) and truncate
    // lineage; they differ only in where the materialized blocks live
    def ckpt(df: DataFrame): DataFrame =
      if (!reliableCheckpoint) df.localCheckpoint()
      else {
        // persist first: checkpoint()'s eager count materializes the
        // plan, but the checkpoint WRITE is a second job that would
        // otherwise recompute every partition from scratch (the RDD
        // .checkpoint contract) — for the prop/jump rounds that second
        // pass is the whole nmin join again. unpersist in finally: a
        // FAILED checkpoint write is exactly when the transient blocks
        // must not linger in the cache
        df.persist()
        val out =
          try df.checkpoint()
          finally df.unpersist()
        out.queryExecution.analyzed match {
          case r: org.apache.spark.sql.execution.LogicalRDD =>
            r.rdd.getCheckpointFile.foreach(ckptFiles.enqueue(_))
          case _ => ()
        }
        while (ckptFiles.size > 2) dropCkpt(ckptFiles.dequeue())
        out
      }
    // the contracted edge set lives for ALL later rounds, so in reliable
    // mode it cannot lean on the label queue: its lineage would point at
    // a label checkpoint the keep-2 GC deletes two rounds later, and an
    // executor loss after that aborts the job this mode exists to
    // survive. It gets its own slot — one file, replaced per contraction
    // (contractions are rare: once or twice per job), dropped at exit.
    var edgeCkptFile: Option[String] = None
    def ckptEdges(df: DataFrame): DataFrame = {
      df.persist() // same write-from-cache discipline as ckpt()
      val out =
        try df.checkpoint()
        finally df.unpersist()
      val newFile = out.queryExecution.analyzed match {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.getCheckpointFile
        case _ => None
      }
      edgeCkptFile.foreach(dropCkpt)
      edgeCkptFile = newFile
      out
    }
    def finishCkpts(): Unit = {
      while (ckptFiles.size > 1) dropCkpt(ckptFiles.dequeue())
      edgeCkptFile.foreach(dropCkpt)
      edgeCkptFile = None
    }
    def abortCkpts(): Unit = {
      while (ckptFiles.nonEmpty) dropCkpt(ckptFiles.dequeue())
      edgeCkptFile.foreach(dropCkpt)
      edgeCkptFile = None
    }
    // Cleanup must survive ANY exit: normal return and the no-fixpoint
    // abort below, but also a mid-loop job failure, executor OOM surfacing
    // as a SparkException, or a user cancel — each would otherwise leak up
    // to three reliable checkpoint dirs on the checkpoint filesystem
    // (Spark never deletes them itself) PLUS the persisted edge frames
    // (|E|-sized cache blocks that would otherwise sit until the
    // ContextCleaner's eventual GC). `completed` flips only on the
    // success exits (which already ran finishCkpts and their own
    // unpersists); every other unwind aborts both. The frames are
    // hoisted so the finally can see them.
    var completed = false
    var e0: DataFrame = null
    var sym: DataFrame = null
    var e: DataFrame = null
    try {
      // persist the edge input BEFORE symmetrizing: the union's two branches
      // would otherwise each evaluate the (often expensive) upstream pair
      // pipeline; the count() barrier stops the branches racing the cold cache.
      // try_cast + null filter with a LOUD count check: a plain cast would
      // turn an unparseable id (or a null endpoint) into a null that either
      // crashes the local-finish path's non-nullable tuple encoder (an
      // opaque error far from the bad input) or — worse — silently rides
      // the distributed path, where null never equi-joins and components
      // come back SPLIT with no error. Same input must fail the same way
      // on both size-adaptive paths.
      e0 = edges.select(expr(s"try_cast(`$aCol` as long)").as("u"),
        expr(s"try_cast(`$bCol` as long)").as("v")).persist()
      // one aggregate doubles as the cache barrier AND the null census
      val eStats = e0.agg(count(lit(1)).as("n"),
        count(when(col("u").isNull || col("v").isNull, 1)).as("bad")).first()
      require(eStats.getLong(1) == 0L,
        s"connectedComponents: ${eStats.getLong(1)} edge(s) have null/" +
          s"unparseable endpoint ids in ($aCol, $bCol) — clean or cast " +
          "the edge input explicitly before calling")
      val e0Count = eStats.getLong(0)
      // SIZE-ADAPTIVE local finish (the move every production distributed-CC
      // makes — BSP rounds are for graphs that don't fit one task): an edge
      // set this small is pure fixed job overhead to iterate on (measured:
      // a 658-edge chain forest cost 9 rounds × ~0.75 s of scheduling to
      // converge distributed, 0.3 s locally). ~200k edges ≈ a few MB in one
      // executor partition — broadcast-threshold-order, not "the data on
      // the driver". Big graphs take the distributed rounds + contraction
      // below, and the contraction path re-checks this threshold as the
      // super-graph shrinks, so the long tail of a 100 TB run finishes in
      // one task instead of log-many near-empty rounds.
      if (e0Count <= localFinishEdges) {
        val r = ckpt(localFinish(e0)) // materialize before unpersist
        e0.unpersist()
        finishCkpts()
        completed = true
        return r
      }
      var eSize = e0Count * 2
      // lazy over the persisted input: sym is only consumed through round 1
      // (nmin + the first contraction), and each consumption is a narrow
      // in-memory concat — a second persist would just buy an extra
      // materialization pass
      sym = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      var labels = ckpt(sym.select(col("u").as("id")).distinct()
        .withColumn("label", col("id")))
      // pointer jumping: adopt the label OF one's label (labels are always
      // vertex ids, so the self-join resolves; identical subplans share one
      // exchange via ReuseExchange)
      def jump(df: DataFrame): DataFrame =
        df.as("p").join(
            df.select(col("id").as("lid"), col("label").as("llabel")).as("pl"),
            col("p.label") === col("pl.lid"), "left")
          .select(col("p.id").as("id"),
            coalesce(col("pl.llabel"), col("p.label")).as("label"))
      // labels decrease monotonically per element, so the exact decimal SUM
      // of labels is a fixpoint detector: unchanged sum ⇔ unchanged labels —
      // one narrow aggregation per round instead of a change-probe join
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      var converged = labels.head(1).isEmpty // no edges → nothing to do
      var prevSum = if (converged) null else labelSum(labels)
      var it = 0
      e = sym
      var hasContracted = false
      def phase[T](label: String)(f: => T): T =
        if (!verbose) f else {
          val t0 = System.nanoTime()
          val r = f
          System.err.println(f"[cc]   $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
          r
        }
      while (!converged && it < maxIter) {
        // neighbor minima first, then a left join back onto labels (`least`
        // skips nulls for isolated-this-round vertices). Formulated WITHOUT
        // a self-referencing union: Union children sharing a checkpointed
        // relation trip a Catalyst constraint-rewrite bug ("key not found"
        // in UnionBase.rewriteConstraints). Round 1 skips the join: labels
        // are the identity map there, so neighbor-min is a plain groupBy
        // over the symmetrized edges.
        val nmin =
          if (it == 0) e.groupBy(col("u").as("id")).agg(min("v").as("nmin"))
          else e.join(
              labels.select(col("id").as("nid"), col("label").as("nlabel")),
              e("v") === col("nid"))
            .groupBy(e("u").as("id")).agg(min("nlabel").as("nmin"))
        // materialized BEFORE the convergence probe and the jumps:
        // jump(jump(prop)) references prop 4×, and each re-derivation would
        // repeat the nmin edge-join aggregation — measured 2× the whole
        // query when this checkpoint is dropped
        val prop = phase("prop-ckpt")(ckpt(labels.as("l")
          .join(nmin.as("nm"), col("l.id") === col("nm.id"), "left")
          .select(col("l.id").as("id"),
            least(col("l.label"), col("nm.nmin")).as("label"))))
        // Convergence detection depends on whether the edges have been
        // contracted. UNCONTRACTED (e is the original graph): a neighbor-min
        // fixpoint over the FULL edge set means every edge joins equal
        // labels ⇒ labels are constant per true component, and the
        // component-min vertex always keeps its own id ⇒ prop == labels ==
        // the final answer — so the test runs on PROP and the confirm round
        // skips both pointer jumps. CONTRACTED: prop only proves stability
        // on the SUPER-graph; non-representative vertices may still hold
        // stale pointers that exactly the jumps resolve (a 41-node path
        // under forced contraction returns labels like 24→4 with
        // label(4)=0 if the loop stops at prop — GraphSpec pins this), so
        // the test must run on the post-jump labels, where an unchanged
        // sum additionally proves pointer self-consistency. Labels decrease
        // monotonically, so equal decimal sums ⇔ equal label tables.
        var next: DataFrame = null
        if (!hasContracted) {
          val sProp = phase("labelSum")(labelSum(prop))
          converged = sProp.compareTo(prevSum) == 0
          if (converged) { next = prop; prevSum = sProp }
        }
        if (!converged) {
          // neighbor-min + two jumps ≈ 4× the propagation distance per round:
          // O(log diameter) rounds. NOT more jumps: each jump references its
          // input twice (the p/pl self-join), so k chained jumps cost 2^k−1
          // joins — measured slower than the rounds they save from k=3 up.
          next = phase("jump-ckpt")( // eager: materializes AND truncates lineage
            ckpt(jump(jump(prop))))
          val sNext = phase("labelSum")(labelSum(next))
          if (hasContracted) converged = sNext.compareTo(prevSum) == 0
          prevSum = sNext
        }
        if (!converged && eSize >= contractMinEdges) {
          // contract the edge set through the new labels: intra-cluster
          // edges (the vast majority once dense near-dup cliques collapse)
          // vanish, so later rounds join against a rapidly-shrinking
          // super-graph instead of the full |E|. ADAPTIVE: below
          // `contractMinEdges` the per-round rewrite-join + materialization
          // costs more than the full-|E| nmin join it saves — fixed job
          // overhead dominates small graphs — so contraction engages only
          // when the edge volume is what the rounds actually pay for (the
          // 100 TB regime; the label evolution and fixpoint are identical
          // either way, GraphSpec covers both sides of the threshold).
          val lmU = next.select(col("id").as("cu"), col("label").as("lu"))
          val lmV = next.select(col("id").as("cv"), col("label").as("lv"))
          val contracted = e.join(lmU, e("u") === col("cu"))
            .join(lmV, e("v") === col("cv"))
            .select(col("lu").as("u"), col("lv").as("v"))
            .filter(col("u") =!= col("v")).distinct()
          // local mode: persist is enough (no executor-loss domain, blocks
          // stay evictable); reliable mode: the super-graph must survive
          // executor loss on its own file, not via the label queue
          val newE =
            if (reliableCheckpoint) ckptEdges(contracted)
            else contracted.persist()
          eSize = phase("contract")(newE.count())
          if (e ne sym) e.unpersist()
          e = newE
          hasContracted = true
          // the super-graph just shrank through `next`, so edges and labels
          // are CONSISTENT here (every remaining merge is between current
          // label values): once it fits one task, finish it locally and
          // compose — tail(label) resolves the remaining merges, vertices
          // whose cluster has no external edges left keep their label.
          if (eSize <= localFinishEdges) {
            val tail = phase("local-tail")(localFinish(e))
            next = ckpt(next.as("l")
              .join(tail.select(col("id").as("tid"), col("label").as("tlabel")),
                col("l.label") === col("tid"), "left")
              .select(col("l.id").as("id"),
                coalesce(col("tlabel"), col("l.label")).as("label")))
            converged = true
          }
        }
        labels = next
        it += 1
        if (verbose) System.err.println(s"[cc] round $it sum=$prevSum")
      }
      if (e ne sym) e.unpersist()
      e0.unpersist() // sym itself was never persisted — only e0 is
      if (!converged)
        throw new IllegalArgumentException(
          s"requirement failed: connectedComponents: no fixpoint after $maxIter iterations")
      finishCkpts() // keep only the returned table's backing file
      completed = true
      labels
    } finally {
      // best-effort: when the unwind IS a filesystem outage, the cleanup
      // deletes fail too — swallowing them (NonFatal only: a VM error
      // must still fly, and an interrupt must re-flag the thread) keeps
      // the original exception, the one the caller can act on, from
      // being masked by the finally
      if (!completed) {
        def quietly(f: => Unit): Unit =
          try f catch {
            case _: InterruptedException => Thread.currentThread().interrupt()
            case scala.util.control.NonFatal(_) => ()
          }
        quietly(abortCkpts())
        if (e != null && (e ne sym)) quietly(e.unpersist())
        if (e0 != null) quietly(e0.unpersist())
      }
    }
  }
}
