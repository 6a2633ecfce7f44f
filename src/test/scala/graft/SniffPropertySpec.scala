package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.model.TagConfig
import graft.operators.{ConfigDispatch, EngineInputs}

/** Adversarial property test for the ENTRY_CREATE format-sniff chain
  * (ConfigDispatch.entryCreate): the input space is user-controlled
  * files, and round 10 already caught one real sniff bug there (the
  * Avro ctor stream leak), so the chain gets a generator-driven sweep —
  * junk bytes wearing format magic, empty files under every extension,
  * half-binary jsonlines — with PINNED classifications. The invariant:
  * every file classifies deterministically by its generator case, junk
  * is SKIPPED (never a crash, never a tag), and partially-valid jsonl
  * counts only its parseable rows. Fixed seeds, one applyConfig pass
  * over the whole generated directory (the PropertySpec batching
  * discipline — per-file dispatch calls would take minutes).
  */
class SniffPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1337L + i)))

  // expected classification per generated file: None = skipped, else
  // (type, num_rows, num_cols)
  private type Expect = Option[(String, Long, Long)]

  test("adversarial files classify deterministically; junk never crashes the chain") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sniff_prop")

    // -- case A: junk bytes wearing real format magic, honest extension.
    // Parquet checks the FOOTER (trailing "PAR1" + garbage length), ORC
    // the postscript at the tail, Avro the header ("Obj\u0001" + a
    // garbage metadata map) — all three must throw into the Try chain
    // and classify as skipped, never tag and never escape the sniff.
    val junkBytes: Gen[Array[Byte]] = Gen.choose(8, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    val magicJunk: Gen[(String, Array[Byte], Expect)] = for {
      (magic, ext) <- Gen.oneOf(
        ("PAR1".getBytes("UTF-8"), "parquet"),
        ("ORC".getBytes("UTF-8"), "orc"),
        (Array[Byte]('O', 'b', 'j', 1), "avro"))
      junk <- junkBytes
    } yield (ext, magic ++ junk ++ magic, None)

    // -- case B: the empty file, under every extension the chain knows
    // (and one it doesn't). Zero bytes parse as nothing: the footer
    // formats throw, CSV infers a zero-column schema (rejected), JSON
    // infers no fields (rejected), .txt matches no sniff.
    val emptyFile: Gen[(String, Array[Byte], Expect)] =
      Gen.oneOf("parquet", "orc", "avro", "csv", "jsonl", "txt")
        .map(ext => (ext, Array.empty[Byte], None))

    // -- case C: half-binary jsonlines — valid records interleaved with
    // junk lines (letters + raw control/high bytes; never valid JSON,
    // never a newline). The file TAGS as JSONL, but num_rows counts the
    // parseable records only and num_cols sees just the real fields.
    val jsonLine: Gen[String] =
      Gen.choose(0, 999).map(v => s"""{"a":$v,"b":"x$v"}""")
    val junkLine: Gen[String] = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('q', 'z', '%', '\u0001', 'ÿ'))
        .map(_.mkString))
    val halfBinary: Gen[(String, Array[Byte], Expect)] = for {
      valid <- Gen.choose(1, 5).flatMap(Gen.listOfN(_, jsonLine))
      junk <- Gen.choose(1, 5).flatMap(Gen.listOfN(_, junkLine))
    } yield {
      val mixed = valid.zipAll(junk, "", "").flatMap {
        case (v, j) => Seq(v, j).filter(_.nonEmpty)
      }
      ("jsonl", mixed.mkString("\n").getBytes("UTF-8"),
        Some(("JSONL", valid.size.toLong, 2L)))
    }

    val generated =
      (samples(magicJunk, 8) ++ samples(emptyFile, 6) ++
        samples(halfBinary, 8)).zipWithIndex.map {
        case ((ext, bytes, expect), i) =>
          val name = s"gen$i.$ext"
          java.nio.file.Files.write(dir.resolve(name), bytes)
          s"gen$i" -> expect
      }.toMap

    // -- fixed adversarial point the generator can't produce: a REAL
    // parquet file with zero rows — valid footer, empty table; must tag
    // (it IS a table), with num_rows 0 and the true schema width.
    Lake.table(spark, sf, "region").limit(0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_stage_pq")
    val fs = new org.apache.hadoop.fs.Path(dir.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_stage_pq"))
      .map(_.getPath).find(p => p.getName.startsWith("part-")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/zerorow.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_stage_pq"), true)
    val expected: Map[String, Expect] =
      generated + ("zerorow" -> Some(("PARQUET", 0L,
        Lake.table(spark, sf, "region").schema.size.toLong)))

    import spark.implicits._
    val base = EngineInputs(
      Lake.tableNames.map(t => ("p", "lake", t))
        .toDF("project", "dataset", "table"),
      Seq.empty[(String, String, String, String, String)]
        .toDF("asset_uri", "column", "template_id", "field_id", "field_value"))
    val out = ConfigDispatch.applyConfig(spark,
      TagConfig("ENTRY_CREATE", "file_metadata", Nil,
        includedUris = Seq(s"$dir/*")),
      base)
      .collect().map(r => (r.getString(0), r.getString(3), r.getString(5)))

    val got: Map[String, (String, Long, Long)] = out
      .map(_._1.stripPrefix("fileset/")).distinct.map { id =>
        def f(fid: String) =
          out.collectFirst { case (u, `fid`, v) if u == s"fileset/$id" => v }.get
        id -> ((f("type"), f("num_rows").toDouble.toLong,
          f("num_cols").toDouble.toLong))
      }.toMap
    expected.foreach { case (id, expect) =>
      assert(got.get(id) === expect, s"file $id")
    }
    assert(got.keySet === expected.filter(_._2.isDefined).keySet)
  }
}
