package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a tiny document"),
    (2L, "another slightly longer payload with more bytes"),
    (3L, "third"))
    .toDF("doc_id", "text")

  test("fromText produces the media schema with real binary payloads") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "image")
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("content") == "binary")
    assert(schema("meta") == "map<string,string>")
    val first = media.filter($"media_id" === 1L).head()
    assert(new String(first.content, "UTF-8") == "a tiny document")
  }

  test("decodeImages is deterministic, drops payloads, preserves row count") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "image")
    val out1 = Multimodal.decodeImages(media, partitions = 3).collect().sortBy(_.media_id)
    val out2 = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq, "stub decode must not depend on partitioning")
    assert(out1.length == 3)
    assert(out1.forall(d => d.width >= 1 && d.height >= 1 && d.channels == 3))
    assert(out1.forall(d => d.n_pixels == d.width.toLong * d.height * d.channels))
  }

  test("sampleFrames explodes 1 row per sampled frame with monotone pts") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "video")
    val frames = Multimodal.sampleFrames(media, everyMs = 40L).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.keySet == Set(1L, 2L, 3L))
    byId.values.foreach { fs =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.pts_ms).toSeq == sorted.indices.map(_ * 40L))
    }
  }

  test("audioFeatures emits plausible deterministic features") {
    val media = Multimodal.fromText(docs, "doc_id", "text", "audio")
    val a = Multimodal.audioFeatures(media).collect().sortBy(_.media_id)
    assert(a.length == 3)
    assert(a.forall(f => f.sample_rate >= 8000 && f.rms >= 0.0 && f.rms <= 1.0))
    assert(a.map(_.n_samples).toSeq ==
      docs.orderBy("doc_id").select(length($"text") * 4).as[Long].collect().toSeq)
  }
}
