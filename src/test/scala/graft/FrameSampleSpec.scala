package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class FrameSampleSpec extends SparkSpec {

  test("sampleFrames: exact frame count, sizes, and step selection") {
    import spark.implicits._
    // 1000-byte payload, 256-byte frames -> frames 0..3 (last = 232 bytes);
    // step 2 keeps frames 0 and 2
    val payload = Array.fill[Byte](1000)(7)
    val df = Seq((1L, payload)).toDF("media_id", "payload")
    val got = Multimodal.sampleFrames(df, frameBytes = 256, step = 2)
      .orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(got.toSeq === Seq((0, 256), (2, 256)))
    // step 1 keeps all 4, last frame is the 232-byte remainder
    val all = Multimodal.sampleFrames(df, frameBytes = 256, step = 1)
      .orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(all.toSeq === Seq((0, 256), (1, 256), (2, 256), (3, 232)))
  }

  test("sampleFrames: frame hashes reassemble the original payload identity") {
    import spark.implicits._
    val payload = (0 until 600).map(_.toByte).toArray
    val df = Seq((9L, payload)).toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(df, frameBytes = 200, step = 1)
    assert(frames.count() === 3)
    // distinct content -> distinct hashes; deterministic across runs
    assert(frames.select("frame_sha256").distinct().count() === 3)
    val again = Multimodal.sampleFrames(df, frameBytes = 200, step = 1)
    assert(frames.exceptAll(again).isEmpty)
  }

  test("resizeVector: mean-pooling to a smaller dim") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 3f, 5f, 7f))).toDF("id", "v")
    val out = df.select(Multimodal.resizeVector(col("v"), inDim = 4, outDim = 2).as("r"))
      .head().getSeq[Float](0)
    assert(out === Seq(2f, 6f)) // mean(1,3), mean(5,7)
  }

  test("resizeVector: uneven dims use adaptive boundaries — no empty buckets / NULLs") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 2f, 3f, 4f))).toDF("id", "v")
    val out = df.select(Multimodal.resizeVector(col("v"), inDim = 4, outDim = 3).as("r"))
      .head().getSeq[Float](0)
    // buckets [0,1) [1,2) [2,4) -> 1, 2, mean(3,4)
    assert(out === Seq(1f, 2f, 3.5f))
  }

  test("extractFeaturesBatched equals unbatched and bounds batch sizes") {
    import graft.multimodal._
    val s2 = spark
    import s2.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val recs = Multimodal.asRecords(spark,
      Multimodal.synthesizePayload(docs, "doc_id", "text"))
    val plain = Multimodal.extractFeatures(recs, () => new DeterministicFakeDecoder(8))
      .collect().map(f => f.mediaId -> f.features.toSeq).toMap
    val batched = Multimodal.extractFeaturesBatched(recs,
      () => new DeterministicFakeDecoder(8), batchSize = 7)
      .collect().map(f => f.mediaId -> f.features.toSeq).toMap
    assert(batched == plain)
    // a recording decoder proves batches never exceed batchSize and cover all rows
    class Recorder extends MediaDecoder {
      override def decode(mediaType: String, payload: Array[Byte]): Array[Float] =
        Array(1f)
      override def decodeBatch(items: Seq[(String, Array[Byte])]): Seq[Array[Float]] = {
        require(items.nonEmpty && items.size <= 7, s"batch of ${items.size}")
        items.map(i => Array(items.size.toFloat))
      }
    }
    val sizes = Multimodal.extractFeaturesBatched(recs, () => new Recorder, batchSize = 7)
      .collect().map(_.features(0).toInt)
    assert(sizes.length == 50 && sizes.forall(sz => sz >= 1 && sz <= 7))
  }
}
