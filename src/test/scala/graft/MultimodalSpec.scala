package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Multimodal plumbing: binary payload schema + per-partition feature
  * extraction with the stubbed decoder.
  */
class MultimodalSpec extends SparkSpec {

  test("media table has opaque binary + typed metadata; features extract per partition") {
    implicit val s = spark
    import s.implicits._
    val media = Multimodal.toMediaTable(Lake.table(spark, sf, "documents"))
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("content") === "binary")
    assert(schema("media_type") === "string")
    assert(schema("width") === "integer")

    val feats = Multimodal.extractFeatures(media.as[MediaRecord]).collect()
    assert(feats.length === media.count())
    val byId = feats.map(f => f.doc_id -> f).toMap
    // deterministic fake decode: first feature dim is byte length
    assert(byId(0L).feature(0) === byId(0L).n_bytes.toDouble)
    assert(feats.forall(_.feature.length === 4))
  }

  test("resize rewrites dims and shrinks payload to the pixel budget") {
    implicit val s = spark
    import s.implicits._
    val media = Multimodal
      .toMediaTable(Lake.table(spark, sf, "documents"))
      .as[MediaRecord].filter(_.width > 0)
    val resized = Multimodal.resize(media, targetW = 8, targetH = 8).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.width === 8 && r.height === 8))
    val src = media.collect().map(r => r.doc_id -> r).toMap
    resized.foreach { r =>
      assert(r.content.length <= src(r.doc_id).content.length)
      assert(r.content.length > 0)
    }
    // deterministic: same input → same bytes
    val again = Multimodal.resize(media, 8, 8).collect()
      .map(r => r.doc_id -> r.content.toSeq).toMap
    resized.foreach(r => assert(again(r.doc_id) === r.content.toSeq))
  }

  test("resize: upscaling a degenerate (0-pixel) source caps at the payload") {
    // w*h = 0 → srcPixels floor 1; a large-target upscale used to wrap
    // the Long byte budget through toInt BEFORE the length cap, going
    // negative and collapsing the payload to 1 byte instead of capping
    // at the source length
    val bytes = Array.tabulate(9600)(_.toByte)
    val out = Multimodal.fakeResize(bytes, 0, 0, 640, 480)
    assert(out.length === bytes.length,
      "upscale must cap at the source payload, not wrap negative")
    assert(out.toSeq === bytes.toSeq)
  }

  test("frame sampling fans each video into n evenly-spaced frames") {
    implicit val s = spark
    import s.implicits._
    val media = Multimodal.toMediaTable(Lake.table(spark, sf, "documents"))
      .as[MediaRecord].limit(10)
    val frames = Multimodal.sampleFrames(media, nFrames = 4).collect()
    assert(frames.length === 40) // 10 videos × 4 frames
    val per = frames.groupBy(_.doc_id)
    per.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq === Seq(0, 1, 2, 3))
      assert(fs.forall(_.frame_bytes.length <= 16))
    }
  }

  test("audio segmentation: integer-sum gate, island coalescing, tail drop") {
    implicit val s = spark
    import s.implicits._
    // handcrafted 4-sample windows, gate at rms >= 10 (sumsq >= 400):
    //   win0 [20,20,20,20]  sumsq 1600  ACTIVE ┐ one segment (0, len 2)
    //   win1 [10,10,10,10]  sumsq  400  ACTIVE ┘ (>= is inclusive)
    //   win2 [ 0, 0, 0, 0]  sumsq    0  silent — splits the runs
    //   win3 [30, 0, 0, 0]  sumsq  900  ACTIVE   second segment (3, len 1)
    //   +3 trailing samples: partial tail window must be DROPPED
    val bytes = (Array.fill(4)(20) ++ Array.fill(4)(10) ++ Array.fill(4)(0) ++
      (30 +: Array.fill(3)(0)) ++ Array.fill(3)(99)).map(_.toByte)
    val media = Seq(MediaRecord(7L, "audio/wav", bytes, 0, 0)).toDS()
    val segs = Multimodal.segmentAudio(media, windowSize = 4, minRms = 10.0)
      .collect().sortBy(_.seg_idx)
    assert(segs.map(g => (g.seg_idx, g.start_window, g.n_windows)).toSeq ===
      Seq((1, 0, 2), (2, 3, 1)))
    // per-segment rms from the SAME integer sums: sqrt((1600+400)/8)
    assert(segs(0).rms === math.sqrt(2000.0 / 8))
    assert(segs(1).rms === math.sqrt(900.0 / 4))
    // an all-silent payload yields no rows, not an empty segment
    val silent = Seq(MediaRecord(8L, "audio/wav",
      Array.fill(16)(1.toByte), 0, 0)).toDS()
    assert(Multimodal.segmentAudio(silent, 4, 10.0).count() === 0)
  }

  test("aHash60: mean gate per sampled value, single-flip locality, budget cut") {
    implicit val s = spark
    import s.implicits._
    // budget 120 → step 2: samples are the even positions 0,2,…,118.
    // Alternating 100/0 at sampled positions → total 3000, gate v≥50:
    // even sample idx (value 100) set, odd (value 0) clear.
    def payload(flip: Option[Int]): Array[Byte] =
      Array.tabulate(120) { p =>
        val v =
          if (p % 2 == 1) 77 // odd positions are never sampled — noise
          else if (flip.contains(p / 2)) 100
          else if ((p / 2) % 2 == 0) 100
          else 0
        v.toByte
      }
    val media = Seq(
      MediaRecord(1L, "image/png", payload(None), 0, 0),
      // sample 7 flipped 0→100: total 3100, gate v≥51.67 — every other
      // bit keeps its side of the gate, so hamming must be exactly 1
      MediaRecord(2L, "image/png", payload(Some(7)), 0, 0),
      // longer payload must be CUT to the budget before sampling: extra
      // tail bytes beyond 120 cannot change the hash
      MediaRecord(3L, "image/png", payload(None) ++ Array.fill(64)(127.toByte),
        0, 0)).toDS()
    val got = Multimodal.aHash60(media, budget = 120)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected1 = (0 until 60).filter(_ % 2 == 0)
      .map(1L << _).reduce(_ | _)
    assert(got(1L) === expected1)
    assert(java.lang.Long.bitCount(got(1L) ^ got(2L)) === 1)
    assert(got(3L) === got(1L))
  }

  test("resize of a zero-length payload is the empty payload, not a crash") {
    // an empty document encodes to 0 content bytes; the pixel-budget
    // floor max(1, ...) must not index into the empty array
    import graft.operators.Multimodal
    assert(Multimodal.fakeResize(Array.emptyByteArray, 4, 4, 2, 2).isEmpty)
    assert(Multimodal.fakeResize(Array[Byte](7), 1, 1, 2, 2).toSeq
      === Seq(7.toByte))
  }
}
