package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: opaque `BINARY` payloads + typed metadata, decode,
  * feature-extraction, resize planning, and frame sampling.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * [[StubCodec]] derives deterministic fake dimensions from the payload
  * bytes. Everything around it is real and tested: the binary schema, the
  * per-partition imperative decode path ([[decodePartitions]], the Scala
  * analogue of a pandas `mapInPandas` batch UDF), the declarative metadata
  * expressions the oracle checks, and the array/struct plumbing for frames
  * and features.
  *
  * Two decode paths compute identical results by construction:
  *  - [[assets]]: pure codegen'd expressions (scan-fused, 100 TB-friendly);
  *  - [[decodePartitions]]: `mapPartitions` over the binary payloads — the
  *    shape a real codec (JNI/library call) needs: batched per partition,
  *    one codec instance per task, no per-row setup.
  * MultimodalSpec asserts they agree row-for-row; the oracle pins the
  * declarative one.
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

  /** STUB codec — stands in for a real AUDIO/VIDEO library (none ships in
    * this container). Dimensions are a deterministic function of payload
    * length and first/last byte, so specs and the SQL oracle can replay it.
    * For still images use [[ImageIoCodec]], which is real.
    */
  object StubCodec extends AssetCodec {
    def decode(b: Array[Byte]): Decoded = {
      val first = if (b.nonEmpty) (b(0) & 0xff).toLong else 0L
      val last = if (b.nonEmpty) (b(b.length - 1) & 0xff).toLong else 0L
      Decoded(
        width = 64 + (b.length * 7 + first) % 1024,
        height = 64 + (b.length * 13 + last) % 1024,
        nFrames = b.length / 100 + 1)
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

  val ResizeTarget = 256

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

  /** Declarative decode: assets + (byte_len, width, height, n_frames,
    * out_w, out_h) — the resize plan keeps aspect ratio toward
    * [[ResizeTarget]] and is pure integer/floor arithmetic.
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
      codec: AssetCodec = StubCodec): DataFrame = {
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

  def framesOracleSql: String =
    s"""WITH meta AS ($metaSqlBase)
       |SELECT asset_id, unnest(range(0, n_frames, GREATEST(1, n_frames // 4))) AS frame_idx
       |FROM meta WHERE media_type = 'video'
       |ORDER BY asset_id, frame_idx""".stripMargin

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
