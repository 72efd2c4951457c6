package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: opaque `BINARY` payloads + typed metadata, decode,
  * feature-extraction, resize planning, and frame sampling.
  *
  * All three media families decode for REAL with JDK-native codecs — no
  * external deps, no stubs: still images via [[ImageIoCodec]]
  * (javax.imageio PNG), multi-frame video-like containers via [[GifCodec]]
  * (javax.imageio animated GIF — same decode contract as a video library:
  * container → frame count + dimensions), audio via [[WavCodec]]
  * (javax.sound.sampled). Each runs through the per-partition imperative
  * decode path ([[decodePartitions]] / [[audioFeatures]], the Scala
  * analogue of a pandas `mapInPandas` batch UDF: one codec instance per
  * task, batched iteration, no per-row setup).
  *
  * Two metadata paths serve different layers:
  *  - [[assets]]: pure codegen'd expressions over MANIFEST metadata —
  *    deterministic functions of the payload, standing in for the
  *    dimensions an upstream catalog records; at 100 TB resize planning
  *    runs off the catalog without touching payload bytes, and this path
  *    is scan-fused and oracle-gated (`mm_meta`).
  *  - [[decodePartitions]] with a real codec: true decoded metadata from
  *    the container bytes — oracle-gated where the synthesis makes the
  *    decoded values closed-form in asset_id (`mm_frames` over GIF,
  *    `mm_audio_features` over WAV).
  */
object Multimodal {

  /** Decoded metadata a codec returns. */
  final case class Decoded(width: Long, height: Long, nFrames: Long)

  /** Codec contract a real binding (libjpeg/ffmpeg/soundfile…) would
    * implement per executor.
    */
  trait AssetCodec extends Serializable {
    def decode(bytes: Array[Byte]): Decoded
  }

  /** REAL multi-frame (video-like) codec over `javax.imageio`'s GIF
    * reader: parses the animated-GIF container and returns the true frame
    * count (`getNumImages(true)` walks every image block) and the first
    * frame's pixel dimensions — the JDK-native stand-in for a video
    * container library (same decode CONTRACT: container → frame count +
    * dimensions), completing the codec family after [[ImageIoCodec]]
    * (stills) and [[WavCodec]] (audio). No stub remains.
    */
  object GifCodec extends AssetCodec {
    def decode(b: Array[Byte]): Decoded = {
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "payload is not a decodable image container")
        val r = readers.next()
        try {
          r.setInput(iis)
          Decoded(
            width = r.getWidth(0).toLong,
            height = r.getHeight(0).toLong,
            nFrames = r.getNumImages(true).toLong)
        } finally r.dispose()
      } finally iis.close()
    }
  }

  /** REAL image codec over `javax.imageio` (JDK-only, no external deps):
    * decodes PNG/BMP/GIF/JPEG payload bytes to their true pixel dimensions.
    * Stills have one frame. Plugged into [[decodePartitions]] it exercises
    * the exact executor-side shape a JNI media library needs — and proves
    * the plumbing with genuinely decoded output, not stub arithmetic.
    */
  object ImageIoCodec extends AssetCodec {
    def decode(b: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      require(img != null, "payload is not a decodable image")
      Decoded(width = img.getWidth.toLong, height = img.getHeight.toLong, nFrames = 1L)
    }
  }

  /** Deterministic PNG payload: `w`×`h`, pixel (x,y) colored by a fixed
    * integer recurrence on (seed, x, y) — byte-stable across JVMs because
    * PNG is lossless and ImageIO's PNG writer is deterministic for RGB.
    */
  def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((seed * 31 + x) * 31 + y) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize n real PNG image assets — executor-side (one `range`
    * partition per task), dimensions a fixed function of asset_id so specs
    * can verify the decoded values independently.
    */
  def synthesizeImages(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n)
      .map { i => (i, pngBytes(imageWidth(i), imageHeight(i), i), "image") }
      .toDF("asset_id", "content", "media_type")
  }

  /** Expected dimensions of [[synthesizeImages]] asset `i`. */
  def imageWidth(i: Long): Int = 16 + (i % 17).toInt
  def imageHeight(i: Long): Int = 16 + (i % 13).toInt

  // ---- real video-like decode: deterministic animated-GIF synthesis +
  // ---- GifCodec (the multi-frame twin of the ImageIoCodec path)

  /** Number of synthesized video assets in the [[graft.SparkEntry]]
    * `mm_frames` query.
    */
  val VideoAssets = 200

  /** Synthesis parameters as fixed functions of asset_id — the oracle and
    * the spec recompute them independently of the decode path.
    */
  def videoWidth(i: Long): Int = 16 + (i % 17).toInt
  def videoHeight(i: Long): Int = 16 + (i % 13).toInt
  def videoFrames(i: Long): Int = 2 + (i % 15).toInt

  /** Deterministic animated-GIF payload: `nFrames` grayscale frames of
    * `w`×`h` written through ImageIO's sequence writer (one image block
    * per frame — exactly what [[GifCodec]]'s `getNumImages(true)` counts).
    * Pixel content is an arbitrary fixed recurrence; only the container
    * structure (dimensions, frame count) carries the oracle-checked
    * signal.
    */
  def gifBytes(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, ((seed * 31 + f * 17 + x * 7 + y * 3) & 0xff).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Synthesize n real animated-GIF video assets, executor-side. */
  def synthesizeVideo(spark: SparkSession, n: Int = VideoAssets): DataFrame = {
    import spark.implicits._
    spark.range(n)
      .map { i =>
        (i, gifBytes(videoWidth(i), videoHeight(i), videoFrames(i), i), "video")
      }
      .toDF("asset_id", "content", "media_type")
  }

  /** DuckDB oracle for [[frameSample]] over GIF-decoded [[synthesizeVideo]]
    * assets: frame counts are closed-form in asset_id, so the sampled frame
    * indices are pure arithmetic (`range(0, n, max(1, n//4))` ==
    * Spark's `sequence(0, n-1, step)`).
    */
  def videoFramesOracleSql(n: Int = VideoAssets): String =
    s"""SELECT i AS asset_id,
       |       unnest(range(0, 2 + i % 15, GREATEST(1, (2 + i % 15) // 4))) AS frame_idx
       |FROM range(0, $n) t(i)
       |ORDER BY asset_id, frame_idx""".stripMargin

  val ResizeTarget = 256

  // ---- real audio: deterministic WAV synthesis + javax.sound.sampled decode
  // ---- (the audio twin of the ImageIoCodec path; video remains the one
  // ---- honest stub — no container codec can parse it)

  /** Decoded audio metadata a real audio codec returns. */
  final case class DecodedAudio(sampleRate: Long, nSamples: Long, rms: Double)

  /** Number of synthesized audio assets in the [[audioFeatures]] query. */
  val AudioAssets = 500

  /** Synthesis parameters as fixed functions of asset_id — the oracle and
    * the spec recompute them independently of the decode path.
    */
  def audioSampleRate(i: Long): Int = Seq(8000, 16000, 32000)((i % 3).toInt)
  def audioNumSamples(i: Long): Int = 4000 + (i % 32).toInt * 250
  def audioAmplitude(i: Long): Int = 256 + (i % 64).toInt * 16

  /** Square-wave half-period in samples. */
  val AudioHalfPeriod = 4

  /** Deterministic WAV payload: hand-rolled RIFF/WAVE header + 16-bit LE
    * mono PCM square wave of the given amplitude — byte-stable across JVMs
    * by construction. A square wave because every sample has magnitude
    * `amplitude`, so RMS == amplitude/32768 EXACTLY (32768 is a power of
    * two → the normalization is exact in IEEE 754, and sqrt of the exact
    * square is exact), which makes the decoded RMS replayable in DuckDB SQL.
    */
  def wavBytes(nSamples: Int, sampleRate: Int, amplitude: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate = rate * blockAlign
    bb.putShort(2) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var j = 0
    while (j < nSamples) {
      val s = if ((j / AudioHalfPeriod) % 2 == 0) amplitude else -amplitude
      bb.putShort(s.toShort)
      j += 1
    }
    bb.array()
  }

  /** REAL audio codec over `javax.sound.sampled` (JDK-only, headless-safe):
    * parses the WAV container, returns true sample rate and frame count,
    * and computes RMS over the normalized 16-bit PCM samples.
    */
  object WavCodec extends Serializable {
    def decode(b: Array[Byte]): DecodedAudio = {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          "expected 16-bit mono PCM")
        val n = in.getFrameLength
        val data = in.readAllBytes()
        val order =
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
        val pcm = java.nio.ByteBuffer.wrap(data).order(order)
        var sumSq = 0.0
        var j = 0
        while (j < n) {
          val x = pcm.getShort(j * 2) / 32768.0
          sumSq += x * x
          j += 1
        }
        DecodedAudio(
          sampleRate = fmt.getSampleRate.toLong,
          nSamples = n,
          rms = if (n == 0) 0.0 else math.sqrt(sumSq / n))
      } finally in.close()
    }
  }

  /** Synthesize n real WAV audio assets, executor-side. */
  def synthesizeAudio(spark: SparkSession, n: Int = AudioAssets): DataFrame = {
    import spark.implicits._
    spark.range(n)
      .map { i =>
        (i, wavBytes(audioNumSamples(i), audioSampleRate(i), audioAmplitude(i)), "audio")
      }
      .toDF("asset_id", "content", "media_type")
  }

  /** Real audio feature extraction: WAV-decode each payload per partition
    * (one codec per task — the mapInPandas batch shape) → sample rate,
    * sample count, duration, RMS. Oracle-gated: every output value is a
    * fixed function of asset_id because the synthesis is deterministic and
    * the square wave makes RMS exact (see [[wavBytes]]).
    */
  def audioFeatures(spark: SparkSession, audioDf: DataFrame): DataFrame = {
    import spark.implicits._
    audioDf
      .select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, bytes) =>
          val d = WavCodec.decode(bytes)
          (id, d.sampleRate, d.nSamples, d.nSamples * 1000.0 / d.sampleRate, d.rms)
        }
      }
      .toDF("asset_id", "sample_rate", "n_samples", "duration_ms", "rms")
  }

  /** DuckDB oracle for [[audioFeatures]] over [[synthesizeAudio]]: pure
    * arithmetic on asset_id (no table needed — `range` is the generator).
    */
  def audioFeaturesOracleSql(n: Int = AudioAssets): String =
    s"""SELECT i AS asset_id,
       |       CAST([8000, 16000, 32000][CAST(i % 3 AS INT) + 1] AS BIGINT) AS sample_rate,
       |       CAST(4000 + (i % 32) * 250 AS BIGINT) AS n_samples,
       |       CAST(4000 + (i % 32) * 250 AS DOUBLE) * 1000.0
       |         / [8000, 16000, 32000][CAST(i % 3 AS INT) + 1] AS duration_ms,
       |       CAST(256 + (i % 64) * 16 AS DOUBLE) / 32768.0 AS rms
       |FROM range(0, $n) t(i)
       |ORDER BY asset_id""".stripMargin

  /** Synthesize binary assets from documents: payload = UTF-8 text bytes,
    * media type round-robins image/audio/video by doc_id.
    */
  def synthesize(docs: DataFrame): DataFrame =
    graft.queries.Tables.parallelismFloor(docs).select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"))

  private def byteLen: Column = octet_length(col("content")).cast("long")
  // first/last byte of the UTF-8 payload == ascii of first/last char for
  // this corpus (plain ASCII text) — expressed on the binary column via
  // substring+decode to stay byte-oriented.
  private def byteAt(posFromStart: Boolean): Column = {
    val oneByte =
      if (posFromStart) substring(col("content"), 1, 1)
      else substring(col("content"), -1, 1)
    coalesce(ascii(decode(oneByte, "UTF-8")).cast("long"), lit(0L))
  }

  /** Declarative MANIFEST metadata: assets + (byte_len, width, height,
    * n_frames) as deterministic functions of the payload — the catalog
    * columns an upstream ingest records, so resize/frame planning can run
    * scan-fused without decoding payload bytes (real decoded metadata is
    * [[decodePartitions]]' job). Pure integer/floor arithmetic → oracle-
    * replayable.
    */
  def assets(docs: DataFrame): DataFrame = {
    val base = synthesize(docs)
      .withColumn("byte_len", byteLen)
      .withColumn("width", lit(64L) + (col("byte_len") * 7 + byteAt(true)) % 1024)
      .withColumn("height", lit(64L) + (col("byte_len") * 13 + byteAt(false)) % 1024)
      .withColumn("n_frames", (col("byte_len") / 100).cast("long") + 1)
    base
  }

  /** Frame-sample plan for video assets: every ⌈n/4⌉-th frame index. */
  def frameSample(assetsDf: DataFrame): DataFrame = {
    val step = greatest(lit(1L), (col("n_frames") / 4).cast("long"))
    assetsDf
      .filter(col("media_type") === "video")
      .select(
        col("asset_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, step)).as("frame_idx"))
  }

  /** Deterministic fake feature vector (8 dims) from the payload digest —
    * the shape a real embedding model would emit, as array<double>.
    */
  def features(assetsDf: DataFrame, dims: Int = 8): DataFrame = {
    // digest the payload ONCE; 8 inline md5(content) copies would hash the
    // full binary per dimension (the alias survives because it is
    // referenced `dims` times — CollapseProject keeps multi-use non-cheap
    // aliases)
    val fs = (0 until dims).map { i =>
      (graft.dedup.Hashing.hash60(concat(col("__digest"), lit(s"_$i"))) % 1000000)
        .cast("double") / 1000000.0
    }
    assetsDf
      .select(col("asset_id"), md5(col("content")).as("__digest"))
      .select(col("asset_id") +: fs.zipWithIndex.map { case (f, i) => f.as(s"f$i") }: _*)
  }

  /** Imperative decode path: one codec per partition, batched iteration —
    * the Scala analogue of a pandas `mapInPandas` UDF. Returns the same
    * columns as [[assets]] computes declaratively.
    */
  def decodePartitions(
      spark: SparkSession,
      assetsDf: DataFrame,
      codec: AssetCodec): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte], String)] = assetsDf
      .select(col("asset_id"), col("content"), col("media_type"))
      .as[(Long, Array[Byte], String)]
    ds.mapPartitions { iter =>
      // real codecs initialize here, once per task, not per row
      iter.map { case (id, bytes, mt) =>
        val d = codec.decode(bytes)
        (id, mt, bytes.length.toLong, d.width, d.height, d.nFrames)
      }
    }.toDF("asset_id", "media_type", "byte_len", "width", "height", "n_frames")
  }

  // ---- DuckDB oracle generation (text is ASCII, so byte math == char math) ----

  private def metaSqlBase: String =
    s"""SELECT doc_id AS asset_id,
       |       CASE WHEN doc_id % 3 = 0 THEN 'image'
       |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       |       CAST(length(text) AS BIGINT) AS byte_len,
       |       64 + (CAST(length(text) AS BIGINT) * 7 + ascii(substr(text, 1, 1))) % 1024 AS width,
       |       64 + (CAST(length(text) AS BIGINT) * 13 + ascii(substr(text, -1, 1))) % 1024 AS height,
       |       CAST(length(text) AS BIGINT) // 100 + 1 AS n_frames
       |FROM documents""".stripMargin

  def metaOracleSql: String =
    s"""WITH meta AS ($metaSqlBase)
       |SELECT asset_id, media_type, byte_len, width, height, n_frames,
       |       LEAST(width, $ResizeTarget) AS out_w,
       |       CASE WHEN width > $ResizeTarget
       |            THEN GREATEST(1, CAST(floor(height * $ResizeTarget.0 / width + 0.5) AS BIGINT))
       |            ELSE height END AS out_h
       |FROM meta ORDER BY asset_id""".stripMargin

  def featuresOracleSql(dims: Int = 8): String = {
    val fs = (0 until dims)
      .map(i =>
        s"CAST(${graft.dedup.Hashing.hash60Sql(s"md5(text) || '_$i'")} % 1000000 AS DOUBLE)" +
          s" / 1000000.0 AS f$i")
      .mkString(",\n       ")
    s"""SELECT doc_id AS asset_id,
       |       $fs
       |FROM documents ORDER BY asset_id""".stripMargin
  }

  /** Declarative meta + resize plan (the oracle-checked query). */
  def metaQuery(docs: DataFrame): DataFrame = {
    val a = assets(docs)
    a.select(
      col("asset_id"), col("media_type"), col("byte_len"), col("width"), col("height"),
      col("n_frames"),
      least(col("width"), lit(ResizeTarget.toLong)).as("out_w"),
      when(col("width") > ResizeTarget,
        greatest(lit(1L),
          floor(col("height") * ResizeTarget / col("width") + 0.5).cast("long")))
        .otherwise(col("height")).as("out_h"))
  }
}
