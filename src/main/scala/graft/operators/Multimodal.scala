package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus per-partition batch feature extraction.
  *
  * The container has no media codecs, so `decode` is a pluggable function
  * and the default is a clearly-marked deterministic FAKE — the Spark-side
  * contract (schema, partitioning, batch shape) is real and tested. In
  * production `decode` is the codec call and the partition size is tuned so
  * one batch of decoded frames fits executor memory.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata (FIXTURES-style). */
  final case class MediaRecord(doc_id: Long, media_type: String,
                               content: Array[Byte], width: Int, height: Int)

  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Int, feature: Array[Double])

  /** Build the media table from documents: payload = utf-8 bytes of the
    * text (stand-in for real media bytes), metadata derived
    * deterministically.
    */
  def toMediaTable(docs: DataFrame,
                   mediaType: String = "image/png"): DataFrame =
    docs
      // a NULL text row would produce NULL content/width/height, which
      // every downstream .as[MediaRecord] encoder (primitive Int /
      // Array[Byte] fields) kills with an opaque null-in-non-nullable
      // error mid-job — a document with no payload simply has no media
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(
        col("doc_id"),
        lit(mediaType).as("media_type"),
        encode(col("text"), "UTF-8").as("content"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))

  /** STUB decoder — deterministic fake: "decodes" the payload to a 4-dim
    * feature from byte prefixes. Replace with a real codec in production.
    */
  val fakeDecode: Array[Byte] => Array[Double] = bytes => {
    val n = bytes.length
    Array(
      n.toDouble,
      if (n > 0) bytes(0).toDouble else 0.0,
      if (n > 1) bytes(n / 2).toDouble else 0.0,
      if (n > 0) bytes(n - 1).toDouble else 0.0)
  }

  /** Per-partition batch feature extraction — the Scala analogue of a
    * Pandas-UDF `mapInPandas` stage: the decoder amortizes setup per
    * partition, rows stream through without driver involvement.
    */
  def extractFeatures(media: Dataset[MediaRecord],
                      decode: Array[Byte] => Array[Double] = fakeDecode)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec handles, model load)
      it.map(r => MediaFeatures(r.doc_id, r.media_type, r.content.length,
        decode(r.content)))
    }
  }

  /** STUB resize kernel — deterministic fake: resamples the payload bytes
    * by even-spaced index mapping to the target pixel budget. Replace with
    * the real scaler in production; the signature (payload + source dims +
    * target dims → payload) is the real contract.
    */
  val fakeResize: (Array[Byte], Int, Int, Int, Int) => Array[Byte] =
    (bytes, w, h, tw, th) =>
      // a zero-length payload resizes to itself — the max(1, …) floor on
      // outLen below would otherwise index bytes(0) of an empty array
      if (bytes.isEmpty) bytes
      else {
        // ALL of this stays in Long until after the length cap: tw*th in
        // Int can overflow, and a large Long quotient .toInt-wrapped
        // BEFORE .min went negative — an upscale of a degenerate source
        // (w*h = 0 → srcPixels 1) produced a 1-byte payload instead of
        // the intended source-length cap
        val srcPixels = math.max(1L, w.toLong * h)
        // cap the SCALE FACTOR before multiplying: bytes.length * (tw*th)
        // itself can wrap Long for a large payload x extreme target dims
        // (the exact silent 1-byte collapse the Long move fixed) — an
        // upscale never exceeds the source length anyway, so a target
        // area >= the source area short-circuits to the cap
        val tgtPixels = tw.toLong * th
        val outLen =
          if (tgtPixels >= srcPixels) math.max(1L, bytes.length.toLong).toInt
          else math.max(1L,
            (bytes.length.toLong * tgtPixels / srcPixels)
              .min(bytes.length.toLong)).toInt
        Array.tabulate(outLen)(i =>
          bytes((i.toLong * bytes.length / outLen).toInt))
      }

  /** Batch resize — 1 row in, 1 row out, payload and dims rewritten.
    * Same mapPartitions shape as [[extractFeatures]].
    */
  def resize(media: Dataset[MediaRecord], targetW: Int, targetH: Int,
             resizer: (Array[Byte], Int, Int, Int, Int) => Array[Byte] = fakeResize)
            (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => r.copy(
      content = resizer(r.content, r.width, r.height, targetW, targetH),
      width = targetW, height = targetH)))
  }

  /** One energy-gated segment of an audio payload. */
  final case class AudioSegment(doc_id: Long, seg_idx: Int, start_window: Int,
                                n_windows: Int, rms: Double)

  /** STUB PCM decode — deterministic fake: each payload byte as one
    * unsigned sample value. In production this is the audio codec call
    * (payload → PCM at the record's sample rate); the segmentation
    * arithmetic in [[segmentAudio]] is the real contract and does not
    * change when the codec is real.
    */
  val fakePcm: Array[Byte] => Array[Double] = bytes => {
    val out = new Array[Double](bytes.length)
    var i = 0
    while (i < out.length) { out(i) = (bytes(i) & 0xff).toDouble; i += 1 }
    out
  }

  /** Energy-gated segmentation — the VAD-shaped pass of audio pipelines
    * (silence trimming / speech-region extraction): the decoded sample
    * stream is cut into fixed `windowSize`-sample windows (partial tail
    * window dropped), a window is ACTIVE iff its RMS ≥ `minRms` — decided
    * on the integer sum of squares (sumsq ≥ minRms²·windowSize), so both
    * engines compare the same exact value — and runs of consecutive
    * active windows coalesce into segments. One media row in, one row per
    * segment out (`seg_idx` ordered by start); a segment's `rms` is
    * computed over ALL its windows' samples from the same integer sums.
    * Same mapPartitions/flatMap shape as [[extractFeatures]]: codec init
    * amortizes per partition, rows stream, fan-out is bounded by
    * payload-bytes / windowSize.
    */
  def segmentAudio(media: Dataset[MediaRecord], windowSize: Int,
                   minRms: Double,
                   decode: Array[Byte] => Array[Double] = fakePcm)
                  (implicit spark: SparkSession): Dataset[AudioSegment] = {
    import spark.implicits._
    require(windowSize > 0, s"segmentAudio: windowSize $windowSize must be > 0")
    // squaring would silently turn a negative threshold into |minRms|
    require(minRms >= 0, s"segmentAudio: minRms $minRms must be >= 0")
    val thresh = minRms * minRms * windowSize
    media.flatMap { r =>
      val samples = decode(r.content)
      val nWin = samples.length / windowSize
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
      var segStart = -1
      var segSum = 0.0
      var w = 0
      while (w < nWin) {
        var s = 0.0
        var i = w * windowSize
        val end = i + windowSize
        while (i < end) { s += samples(i) * samples(i); i += 1 }
        if (s >= thresh) {
          if (segStart < 0) { segStart = w; segSum = 0.0 }
          segSum += s
        } else if (segStart >= 0) {
          segs += ((segStart, w - segStart, segSum))
          segStart = -1
        }
        w += 1
      }
      if (segStart >= 0) segs += ((segStart, nWin - segStart, segSum))
      segs.iterator.zipWithIndex.map { case ((st, n, sum), idx) =>
        AudioSegment(r.doc_id, idx + 1, st, n,
          math.sqrt(sum / (n.toDouble * windowSize)))
      }
    }
  }

  /** STUB grayscale decode — deterministic fake: each payload byte as one
    * unsigned pixel value (the image analogue of [[fakePcm]]). In
    * production this is decode + grayscale conversion.
    */
  val fakeGray: Array[Byte] => Array[Double] = fakePcm

  /** 60-bit average-hash perceptual fingerprint (aHash — the classic
    * perceptual-dedup primitive behind pHash/PDQ-style pipelines): the
    * payload is cut to a fixed `budget`-byte thumbnail (the stub for
    * "resize to a fixed raster" — real aHash resizes every image to 8×8
    * precisely so fingerprints are position-comparable), 60 evenly-spaced
    * decoded values are sampled from it, and bit i is set iff
    * 60·v_i ≥ Σv — an integer compare, so engines agree exactly. 60 bits
    * (not 64) keeps the fingerprint in positive Long territory, matching
    * [[graft.plans.Simhash60]]'s convention, and makes the result
    * directly consumable by `Dedup.simhashPairs`' pigeonhole band join —
    * visual near-dup runs on the SAME candidate machinery (equi-join +
    * AQE/salting) as text simhash. Payloads shorter than `budget` sample
    * 0 beyond their length; gate them out upstream (a real decode always
    * fills the full raster — shortness is a stub artifact whose zero-tail
    * would otherwise concentrate a hot all-zero band bucket).
    */
  def aHash60(media: Dataset[MediaRecord], budget: Int = 240,
              gray: Array[Byte] => Array[Double] = fakeGray)
             (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(budget > 0 && budget % 60 == 0,
      s"aHash60: budget $budget must be a positive multiple of 60")
    val step = budget / 60
    media.map { r =>
      val thumb =
        if (r.content.length > budget) java.util.Arrays.copyOf(r.content, budget)
        else r.content
      val px = gray(thumb)
      val v = Array.tabulate(60) { i =>
        val p = i * step
        if (p < px.length) px(p) else 0.0
      }
      val total = v.sum
      var hash = 0L
      var i = 0
      while (i < 60) { if (v(i) * 60 >= total) hash |= 1L << i; i += 1 }
      (r.doc_id, hash)
    }.toDF("doc_id", "simhash")
  }

  /** One sampled frame of a video payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB frame extractor — deterministic fake: a 16-byte window around
    * the even-spaced position of frame i of n. In production this is the
    * demuxer seek + decode at timestamp i·duration/n.
    */
  val fakeFrame: (Array[Byte], Int, Int) => Array[Byte] =
    (bytes, i, n) => {
      val pos = (i.toLong * bytes.length / math.max(1, n)).toInt
      bytes.slice(pos, math.min(bytes.length, pos + 16))
    }

  /** Even-spaced frame sampling — 1 row in, `nFrames` rows out (the row
    * EXPANSION plumbing of video pipelines; partition sizing must budget
    * for the fan-out).
    */
  def sampleFrames(media: Dataset[MediaRecord], nFrames: Int,
                   frame: (Array[Byte], Int, Int) => Array[Byte] = fakeFrame)
                  (implicit spark: SparkSession): Dataset[Frame] = {
    // a miscomputed frame budget must fail loudly, not silently return
    // an empty dataset (the segmentAudio/aHash60/Bpe.train rule)
    require(nFrames >= 1, s"sampleFrames: nFrames $nFrames must be >= 1")
    import spark.implicits._
    media.flatMap(r =>
      (0 until nFrames).map(i => Frame(r.doc_id, i, frame(r.content, i, nFrames))))
  }
}
