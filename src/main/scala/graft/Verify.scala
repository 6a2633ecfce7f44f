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
    spark.stop()
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
                // porcelain lines are "XY path"; strip the status token
                // rather than a fixed offset — git()'s trim eats the
                // first line's leading status space
                git("status", "--porcelain", "--", "src/main", "build.sbt")
                  .filter(_.nonEmpty)
                  .map(dirty => "uncommitted src changes since gates ran: " +
                    dirty.linesIterator.take(5)
                      .map(_.trim.replaceFirst("^\\S{1,2}\\s+", ""))
                      .mkString(", "))
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
