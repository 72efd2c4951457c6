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

  test("REAL video-like codec: GifCodec recovers true dimensions and frame " +
    "counts from synthesized animated GIFs, and the payloads are real GIF containers") {
    val n = 64
    val vids = Multimodal.synthesizeVideo(spark, n)
    val out = Multimodal.decodePartitions(spark, vids, Multimodal.GifCodec)
      .orderBy("asset_id").collect()
    assert(out.length === n)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(3) === Multimodal.videoWidth(id).toLong, s"width of asset $id")
      assert(r.getLong(4) === Multimodal.videoHeight(id).toLong, s"height of asset $id")
      assert(r.getLong(5) === Multimodal.videoFrames(id).toLong, s"frames of asset $id")
    }
    // payloads really are GIF containers, not text blobs
    val magic = vids.select("content").head().getAs[Array[Byte]](0)
    assert(new String(magic.take(6), "US-ASCII").startsWith("GIF8"))
  }

  test("frame sampling over REAL GIF decode: step floor(n/4) on the true frame count") {
    val n = 60 // covers every videoFrames residue 2..16
    val decoded = Multimodal.decodePartitions(
      spark, Multimodal.synthesizeVideo(spark, n), Multimodal.GifCodec)
    val perAsset = Multimodal.frameSample(decoded)
      .groupBy("asset_id").count().orderBy("asset_id").collect()
    assert(perAsset.length === n) // every asset is video → all sampled
    perAsset.foreach { r =>
      val id = r.getLong(0)
      val nf = Multimodal.videoFrames(id).toLong
      val step = math.max(1L, nf / 4)
      val expected = (nf - 1) / step + 1 // |sequence(0, nf-1, step)|
      assert(r.getLong(1) === expected, s"asset $id with $nf frames")
    }
    // multi-frame sampling genuinely happens (nf ≥ 8 → ≥ 4 samples)
    assert(perAsset.exists(_.getLong(1) >= 4))
    // manifest-metadata path still drives planning for non-video assets:
    // only video rows are sampled
    val mixed = Multimodal.frameSample(Multimodal.assets(docs))
    val videoCount = docs.filter(col("doc_id") % 3 === 2).count()
    assert(mixed.select("asset_id").distinct().count() === videoCount)
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
