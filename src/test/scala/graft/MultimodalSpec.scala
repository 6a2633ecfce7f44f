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
}
