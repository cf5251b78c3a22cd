package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def media = Seq(
    (1L, Array.fill[Byte](1000)('a')),
    (2L, Array.fill[Byte](513)('b')),
    (3L, Array.fill[Byte](20000)('c'))
  ).toDF("media_id", "content")

  test("decodeImages: stub metadata follows the documented formula, schema is typed") {
    val out = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toList == List(1L, 2L, 3L))
    assert(out(0).width == (1000 % 512) + 16 && out(0).height == (1000 / 512) % 512 + 16)
    assert(out(0).format == "png") // even length
    assert(out(1).format == "jpeg") // odd length
    val schema = Multimodal.decodeImages(media).toDF().schema
    assert(schema.fieldNames.toList == List("media_id", "width", "height", "format"))
  }

  test("sampleFrames: one frame per interval of stub duration, executor-side explode") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    // duration = 2*len; n frames = duration/1000 + 1
    val byId = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(byId(1L) == 2 * 1000 / 1000 + 1)
    assert(byId(3L) == 2 * 20000 / 1000 + 1)
    val f = frames.filter(_.media_id == 1L).sortBy(_.frame_idx)
    assert(f.map(_.ts_ms).toList == List(0L, 1000L, 2000L))
    assert(f.head.frame_bytes.length == 16)
  }

  test("extractFeatures: deterministic vectors of requested dim, consumable by ANN") {
    val feats = Multimodal.extractFeatures(media, dim = 16).toDF()
      .withColumnRenamed("feature", "embedding").withColumnRenamed("media_id", "vec_id")
    val rows = feats.collect()
    assert(rows.length == 3)
    assert(rows.head.getSeq[Float](rows.head.fieldIndex("embedding")).length == 16)
    // determinism across evaluations
    val again = Multimodal.extractFeatures(media, dim = 16).toDF().collect()
    assert(again.map(r => r.getSeq[Float](r.fieldIndex("feature")).toList).toSet ==
      rows.map(r => r.getSeq[Float](r.fieldIndex("embedding")).toList).toSet)
    // plumbing into the similarity operator
    val knn = Similarity.bruteForceTopK(feats, feats.filter(col("vec_id") === 1L), k = 2)
    assert(knn.count() == 2)
  }

  test("resizeImages keeps contract (id, w, h, resized bytes)") {
    val out = Multimodal.resizeImages(media, 224, 224).collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getAs[Int]("width") == 224 && r.getAs[Int]("height") == 224))
    assert(out.forall(_.getAs[Array[Byte]]("resized").nonEmpty))
  }
}
