package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.SparkSpec
import graft.queries.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf001)

  test("synthesize yields a real BINARY payload column with media types") {
    val a = Multimodal.synthesize(docs)
    assert(a.schema("content").dataType === BinaryType)
    val types = a.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types === Set("image", "audio", "video"))
  }

  test("imperative mapPartitions decode agrees row-for-row with the declarative path") {
    val declarative = Multimodal.assets(docs)
      .select("asset_id", "media_type", "byte_len", "width", "height", "n_frames")
      .orderBy("asset_id").collect()
    val imperative = Multimodal
      .decodePartitions(spark, Multimodal.synthesize(docs))
      .select("asset_id", "media_type", "byte_len", "width", "height", "n_frames")
      .orderBy("asset_id").collect()
    assert(declarative.length === imperative.length)
    declarative.zip(imperative).foreach { case (d, i) => assert(d === i) }
  }

  test("stub codec golden values") {
    val d = Multimodal.StubCodec.decode("abc".getBytes("UTF-8"))
    assert(d.width === 64 + (3 * 7 + 'a'.toLong) % 1024)
    assert(d.height === 64 + (3 * 13 + 'c'.toLong) % 1024)
    assert(d.nFrames === 1) // 3 bytes / 100 + 1
  }

  test("frame sampling: ~4 frames per video asset, step floor(n/4)") {
    val frames = Multimodal.frameSample(Multimodal.assets(docs))
    val perAsset = frames.groupBy("asset_id").count().collect()
    assert(perAsset.nonEmpty)
    // step max(1, n/4) over n frames → between 4 and 7 samples when n ≥ 4
    assert(perAsset.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 7))
    // long docs get genuinely multi-frame samples
    assert(perAsset.exists(r => r.getLong(1) >= 4))
    // only video assets sampled
    val videoCount = docs.filter(col("doc_id") % 3 === 2).count()
    assert(perAsset.length === videoCount)
  }

  test("resize plan preserves aspect ratio toward the 256 target") {
    val m = Multimodal.metaQuery(docs).collect()
    m.foreach { r =>
      val (w, h, ow, oh) = (r.getLong(3), r.getLong(4), r.getLong(6), r.getLong(7))
      assert(ow <= Multimodal.ResizeTarget)
      if (w > Multimodal.ResizeTarget) {
        assert(ow === Multimodal.ResizeTarget)
        assert(math.abs(oh - h * 256.0 / w) <= 0.5 + 1e-9)
      } else {
        assert(ow === w && oh === h)
      }
    }
  }

  test("REAL image codec: decodePartitions recovers true PNG dimensions via javax.imageio") {
    val n = 64
    val imgs = Multimodal.synthesizeImages(spark, n)
    val out = Multimodal.decodePartitions(spark, imgs, Multimodal.ImageIoCodec)
      .orderBy("asset_id").collect()
    assert(out.length === n)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(3) === Multimodal.imageWidth(id).toLong, s"width of asset $id")
      assert(r.getLong(4) === Multimodal.imageHeight(id).toLong, s"height of asset $id")
      assert(r.getLong(5) === 1L) // stills: one frame
    }
    // and the payloads really are PNGs, not text blobs
    val magic = imgs.select("content").head().getAs[Array[Byte]](0).take(8)
    assert(magic.sameElements(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)))
  }

  test("REAL audio codec: WavCodec recovers rate/frames/RMS from synthesized WAVs " +
    "exactly, and the payloads are real RIFF/WAVE containers") {
    val n = 96
    val wavs = Multimodal.synthesizeAudio(spark, n)
    val out = Multimodal.audioFeatures(spark, wavs).orderBy("asset_id").collect()
    assert(out.length === n)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === Multimodal.audioSampleRate(id).toLong, s"rate of asset $id")
      assert(r.getLong(2) === Multimodal.audioNumSamples(id).toLong, s"frames of asset $id")
      assert(r.getDouble(3) ===
        Multimodal.audioNumSamples(id) * 1000.0 / Multimodal.audioSampleRate(id))
      // square wave → RMS == amplitude/32768 BIT-exactly (power-of-two
      // normalization + sqrt of an exact square; scaladoc on wavBytes)
      assert(r.getDouble(4) === Multimodal.audioAmplitude(id) / 32768.0,
        s"rms of asset $id")
    }
    // payloads really are WAV containers, not text blobs
    val magic = wavs.select("content").head().getAs[Array[Byte]](0)
    assert(new String(magic.take(4), "US-ASCII") === "RIFF")
    assert(new String(magic.slice(8, 12), "US-ASCII") === "WAVE")
  }

  test("feature vectors: 8 dims in [0,1), deterministic") {
    val f = Multimodal.features(Multimodal.assets(docs))
    assert(f.columns.toSeq === ("asset_id" +: (0 until 8).map(i => s"f$i")))
    val rows = f.collect()
    assert(rows.forall(r => (1 to 8).forall(i => r.getDouble(i) >= 0 && r.getDouble(i) < 1)))
    val again = Multimodal.features(Multimodal.assets(docs)).collect()
    assert(rows.map(_.toSeq).sameElements(again.map(_.toSeq)))
  }
}
