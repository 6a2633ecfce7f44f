package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args: only dump these queries (fast iteration)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    gatesFreshnessCheck(outDir)
    storeCutHealth(outDir)
    spark.stop()
  }

  /** Surface the store-cut layer's silent-swallow ops signal (see
    * `StoreCut.swallowedAdvances`): a best-effort cut advance abandoned
    * after a durable commit is correct but previously invisible — a
    * store whose EVERY advance fails (IAM break, throttle storm) would
    * silently lag its cut forever. The verify run is the round's one
    * always-executed porcelain, so the totals land here, loud when
    * non-zero, machine-readable either way.
    */
  private def storeCutHealth(outDir: String): Unit = try {
    val n = graft.sources.StoreCut.swallowedAdvances.get()
    val last = graft.sources.StoreCut.lastSwallow.getOrElse("")
    val byRoot = graft.sources.StoreCut.swallowedByRoot
    val governFails = graft.sources.AtomicStore.cutGovernProbeFailures.get()
    if (n > 0)
      println(s"[verify] storecut: $n swallowed best-effort cut " +
        s"advance(s) this run — committed batches were left unpublished " +
        s"(adopted by the next append/fold); last: $last; by root: " +
        byRoot.map { case (r, c) => s"$r=$c" }.mkString(", "))
    else println("[verify] storecut: 0 swallowed cut advances")
    if (governFails > 0)
      println(s"[verify] storecut: $governFails cut-governance probe " +
        "failure(s) — the standalone-writer guard was degraded (fails " +
        "open) for those calls; check store IO health")
    // truncated JSON keys get a hash suffix: two roots sharing a
    // 200-char prefix must not collapse into one duplicate key that
    // silently drops an entry for JSON consumers (round-19 advice)
    def keyq(s: String): String =
      if (s.length <= 200) q(s)
      else q(s.take(200) + f"#${s.hashCode}%08x")
    val byRootJson = byRoot.toSeq.sortBy(_._1)
      .map { case (r, c) => s"${keyq(r)}: $c" }
      .mkString("{", ", ", "}")
    // the family porcelain: every family store this run committed,
    // with where its last cut landed (per-part versions + job count)
    val families = graft.operators.TagFamilyStore.publishedFamilies
    val familiesJson = families.toSeq.sortBy(_._1)
      .map { case (r, s) => s"${keyq(r)}: ${q(s.take(300))}" }
      .mkString("{", ", ", "}")
    if (families.nonEmpty)
      println(s"[verify] storecut: ${families.size} family store(s) " +
        "published this run (see storecut_health.json family_cuts)")
    // the orphan-suffix bound, as an ASSERTION (round-19 verdict #7): a
    // family suffix larger than what crashed attempts committed means
    // the truncation contract leaked — fail the run, don't just print
    val orphanViolations =
      graft.operators.TagFamilyStore.orphanSuffixViolations
    val violationsJson = orphanViolations.toSeq.sortBy(_._1)
      .map { case (r, s) => s"${keyq(r)}: ${q(s.take(300))}" }
      .mkString("{", ", ", "}")
    Files.writeString(Paths.get(s"$outDir/storecut_health.json"),
      s"""{
         |  "swallowed_advances": $n,
         |  "swallowed_by_root": $byRootJson,
         |  "govern_probe_failures": $governFails,
         |  "family_cuts": $familiesJson,
         |  "orphan_suffix_violations": $violationsJson,
         |  "last": ${q(last.take(400))}
         |}
         |""".stripMargin)
    if (orphanViolations.nonEmpty)
      throw new IllegalStateException(
        s"[verify] ORPHAN-SUFFIX BOUND VIOLATED at " +
          s"${orphanViolations.keys.toSeq.sorted.mkString(", ")} — a " +
          "family store served more crash residue than its recovery " +
          "contract allows (see storecut_health.json)")
  } catch {
    case e: IllegalStateException
        if e.getMessage != null && e.getMessage.contains("ORPHAN-SUFFIX") =>
      throw e // the one storecut condition that must FAIL the run
    case scala.util.control.NonFatal(e) =>
      println(s"[verify] storecut: health dump errored: $e")
  }

  /** Failure-injection gate freshness (runs every Verify, i.e. every
    * round): the latest committed `GATES_r<N>.json` must (a) exist,
    * (b) report ok, and (c) have run against a tree whose src/ +
    * build.sbt match HEAD (`git diff --name-only <gates.git_head>..HEAD`
    * empty over those paths). A gate artifact that was simply not
    * re-run after code changes — previously an invisible absence — now
    * prints a loud GATES_STALE/GATES_MISSING verdict in the round's
    * verify log AND writes it machine-readably as
    * `<outDir>/gates_freshness.json` next to oracle_sql.json, so
    * anything consuming the verify output (not just a log grep) sees
    * it. Diagnostic, not fatal: correctness dumping must not be held
    * hostage by gate housekeeping, the judge reads the verdict.
    */
  /** JSON string escape (emits the surrounding quotes): backslash,
    * quote, and ALL control chars (<0x20) — a tab or CR in
    * builder-authored SQL would otherwise make the driver's json.load
    * fail and silently zero the round's correctness. Shared by the
    * oracle dump and the gates-freshness artifact.
    */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def gatesFreshnessCheck(outDir: String): Unit = try {
    // truncate BEFORE escaping: a cut landing inside an escape pair
    // would leave a trailing lone backslash that swallows the closing
    // quote and makes the whole file unparseable
    def jq(s: String): String = q(s.take(400))
    def emit(verdict: String, gatesFile: String, gitHead: String,
             detail: String): Unit = {
      println(s"[verify] gates: $verdict — " +
        Seq(gatesFile, detail).filter(_.nonEmpty).mkString(": "))
      try Files.writeString(Paths.get(s"$outDir/gates_freshness.json"),
        s"""{
           |  "verdict": ${jq(verdict)},
           |  "gates_file": ${jq(gatesFile)},
           |  "git_head": ${jq(gitHead)},
           |  "detail": ${jq(detail)}
           |}
           |""".stripMargin)
      catch { case scala.util.control.NonFatal(e) =>
        println(s"[verify] gates: could not write gates_freshness.json: $e")
      }
    }
    var p = Paths.get(sys.props("user.dir")).toAbsolutePath
    while (p.getParent != null && !Files.exists(p.resolve("build.sbt")))
      p = p.getParent
    val gates = Option(p.toFile.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .flatMap { f =>
        val m = "GATES_r(\\d+)\\.json".r.findFirstMatchIn(f.getName)
        m.map(_.group(1).toInt -> f)
      }.sortBy(_._1).lastOption
    gates match {
      case None =>
        emit("GATES_MISSING", "", "",
          s"no GATES_r<N>.json at $p; run `sbt \"runMain " +
            "graft.tools.RoundGates <N>\"`")
      case Some((n, f)) =>
        val body = Files.readString(f.toPath)
        val ok = "\"ok\"\\s*:\\s*(true|false)".r.findFirstMatchIn(body)
          .exists(_.group(1) == "true")
        val head = "\"git_head\"\\s*:\\s*\"([0-9a-f]{40})\"".r
          .findFirstMatchIn(body).map(_.group(1))
        def git(args: String*): Option[String] = try {
          val pb = new ProcessBuilder(("git" +: args): _*)
          pb.directory(p.toFile)
          val pr = pb.start()
          val out = new String(pr.getInputStream.readAllBytes(), "UTF-8")
          if (pr.waitFor() == 0) Some(out.trim) else None
        } catch { case scala.util.control.NonFatal(_) => None }
        val staleFiles = head match {
          case None => Some("artifact predates git_head stamping")
          case Some(h) =>
            git("diff", "--name-only", s"$h..HEAD",
                "--", "src/main", "build.sbt") match {
              case None => Some(s"cannot diff $h..HEAD (unknown commit?)")
              case Some("") =>
                // committed tree matches — but UNCOMMITTED src edits are
                // invisible to a commit-range diff, and gates run against
                // the working tree's compiled classes. A dirty src/ means
                // the evidence may describe code that no longer exists.
                // NUL-terminated porcelain (-z): entries are "XY path",
                // renames carry the origin path as a SECOND NUL field and
                // paths are never quoted — so rename entries and paths
                // with spaces list exactly, instead of the "R  old ->
                // new" / quoted forms a line split renders oddly
                git("status", "--porcelain", "-z", "--",
                    "src/main", "build.sbt")
                  .filter(_.nonEmpty)
                  .map { dirty =>
                    val fields = dirty.split('\u0000').filter(_.nonEmpty)
                    val paths = scala.collection.mutable.ArrayBuffer[String]()
                    var i = 0
                    while (i < fields.length) {
                      val f = fields(i)
                      // an entry field is "XY path" (2 status chars + a
                      // space) — except the FIRST one, whose leading
                      // space status char (" M") the process helper's
                      // trim may have eaten; a rename/copy's origin
                      // path arrives as the NEXT bare field — list it
                      // as "old -> new"
                      val trimmedFirst =
                        i == 0 && !(f.length > 2 && f.charAt(2) == ' ')
                      val status =
                        if (trimmedFirst) " " + f.take(1) else f.take(2)
                      val path = if (trimmedFirst) f.drop(2) else f.drop(3)
                      // renames/copies on EITHER side of the XY token
                      // carry an origin-path field: staged is "R "/"C ",
                      // worktree-side is " R"/" C" — a startsWith check
                      // missed the latter and mis-parsed the origin path
                      // as a fresh entry with 3 chars eaten
                      if ((status.contains("R") || status.contains("C"))
                          && i + 1 < fields.length) {
                        paths += s"${fields(i + 1)} -> $path"
                        i += 2
                      } else { paths += path; i += 1 }
                    }
                    "uncommitted src changes since gates ran: " +
                      paths.take(5).mkString(", ")
                  }
              case Some(files) =>
                Some(s"src changed since gates ran: " +
                  files.linesIterator.take(5).mkString(", "))
            }
        }
        (ok, staleFiles) match {
          case (false, _) =>
            emit("GATES_FAILING", f.getName, head.getOrElse(""), "ok=false")
          case (true, Some(why)) =>
            emit("GATES_STALE", f.getName, head.getOrElse(""),
              s"$why; re-run `sbt \"runMain graft.tools.RoundGates $n\"`")
          case (true, None) =>
            emit("fresh", f.getName, head.getOrElse(""),
              "ok=true, fresh vs HEAD")
        }
    }
  } catch { case scala.util.control.NonFatal(e) =>
    println(s"[verify] gates: freshness check errored: $e")
  }
}
