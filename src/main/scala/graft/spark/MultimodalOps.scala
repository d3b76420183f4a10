package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as typed per-partition transforms over the blob column.
  *
  * Image rows carry REAL PNG payloads (synthesized deterministically,
  * decoded with ImageIO on the executor) and audio rows REAL 16-bit PCM WAV
  * payloads (synthesized and decoded with javax.sound.sampled) — both paths
  * use the real JDK codec, not a stub. Only video remains a clearly-marked
  * STUB (the JDK ships no video codec); its batching/schema/partitioning is
  * the real pipeline either way. */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, media_ref: String, media_kind: String,
      blob: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_kind: String, blob_len: Long,
      width: Int, height: Int, n_frames: Int, sample_rate: Int, n_samples: Long,
      feature: Seq[Float])

  /** Deterministic image dimensions per doc (SQL-predictable, so the DuckDB
    * oracle can verify the full encode→decode roundtrip). */
  def imgWidth(docId: Long): Int = (16 + docId % 32).toInt
  def imgHeight(docId: Long): Int = (16 + docId % 29).toInt

  /** Render a deterministic RGB PNG via the JDK encoder (ImageIO ships PNG/
    * JPEG/GIF/BMP in every JRE). Same inputs → byte-identical output. */
  def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((seed * 31 + x * 7 + y * 13) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real image decode: JDK ImageIO. Returns (width, height) or None when
    * the payload is not a decodable image. */
  def decodeImage(blob: Array[Byte]): Option[(Int, Int)] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))
      .map(i => (i.getWidth, i.getHeight))
    catch { case _: java.io.IOException => None }

  /** Deterministic audio parameters per doc (SQL-predictable, so the DuckDB
    * oracle verifies the WAV encode→decode roundtrip closed-form). */
  def audioSampleRate(docId: Long): Int = (8000 + (docId % 5) * 2000).toInt
  def audioNumSamples(docId: Long): Int = (400 + docId % 100).toInt

  /** Render a deterministic 16-bit mono PCM WAV via the JDK audio stack
    * (javax.sound.sampled ships WAV in every JRE — the real codec, like
    * ImageIO for PNG). Same inputs → byte-identical output. */
  def wavBytes(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((seed * 31 + i * 7919) % 65536) - 32768).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real audio decode: JDK javax.sound.sampled. Returns
    * (sampleRate, frameCount) or None when the payload is not decodable. */
  def decodeAudio(blob: Array[Byte]): Option[(Int, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      try Some((ais.getFormat.getSampleRate.toInt, ais.getFrameLength))
      finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Deterministic media table synthesized from documents.parquet: image
    * rows carry real PNG blobs, audio rows real 16-bit PCM WAV blobs (both
    * encoded executor-side in the same typed map a production loader would
    * use); video rows carry the text bytes as opaque payload stand-ins (no
    * video codec in the JDK). kind cycles image/audio/video. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    DocsTables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(lit("blob://"), col("doc_id")).as("media_ref"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_kind"),
        col("text").cast("binary").as("blob"))
      .as[MediaRow]
      .mapPartitions(_.map { m =>
        if (m.media_kind == "image")
          m.copy(blob = pngBytes(imgWidth(m.doc_id), imgHeight(m.doc_id), m.doc_id))
        else if (m.media_kind == "audio")
          m.copy(blob = wavBytes(audioSampleRate(m.doc_id), audioNumSamples(m.doc_id), m.doc_id))
        else m
      })
  }

  /** STUB feature extraction: deterministic 8-dim float vector from bytes
    * (a real audio/video featurizer would drop in here). */
  def featureStub(blob: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < blob.length) {
      out(i % dim) += (blob(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Frame sampling STUB for video rows: 1 + doc_id % 4 frames. */
  def frameCountStub(docId: Long): Int = (1 + docId % 4).toInt

  /** decode + feature-extract as one typed per-partition pass. Image rows go
    * through the real ImageIO decoder, audio rows through the real
    * javax.sound.sampled WAV decoder; video rows report no dimensions (-1)
    * and keep the stub features (only video remains stubbed — no codec in
    * the JDK). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        val (w, h) =
          if (m.media_kind == "image") decodeImage(m.blob).getOrElse((-2, -2))
          else (-1, -1)
        val (sr, ns) =
          if (m.media_kind == "audio") decodeAudio(m.blob).getOrElse((-2, -2L))
          else (-1, -1L)
        MediaFeatures(m.doc_id, m.media_kind, m.blob.length.toLong, w, h,
          if (m.media_kind == "video") frameCountStub(m.doc_id) else 1,
          sr, ns, featureStub(m.blob).toSeq)
      }
    }
  }

  /** Oracle-checkable projection: kind/frames are deterministic functions of
    * the source row; width/height for image rows verify the PNG
    * encode→ImageIO-decode roundtrip and sample_rate/n_samples for audio
    * rows the WAV encode→javax.sound-decode roundtrip, both against
    * closed-form values; blob_len is only predictable for the opaque
    * (video) payloads. */
  def mediaFeaturesQuery(spark: SparkSession, sfDir: String): DataFrame = {
    extractFeatures(mediaTable(spark, sfDir))
      .toDF()
      .select(col("doc_id"), col("media_kind"),
        when(col("media_kind") === "video", col("blob_len")).otherwise(lit(-1L)).as("blob_len"),
        col("width").cast("long"), col("height").cast("long"),
        col("n_frames").cast("long"),
        col("sample_rate").cast("long"), col("n_samples").cast("long"))
  }

  val mediaFeaturesOracle: String =
    """SELECT doc_id,
      | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
      | CAST(CASE WHEN doc_id % 3 = 2 THEN length(text) ELSE -1 END AS BIGINT) AS blob_len,
      | CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 32 ELSE -1 END AS BIGINT) AS width,
      | CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 29 ELSE -1 END AS BIGINT) AS height,
      | CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 4 ELSE 1 END AS BIGINT) AS n_frames,
      | CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 5) * 2000 ELSE -1 END AS BIGINT) AS sample_rate,
      | CAST(CASE WHEN doc_id % 3 = 1 THEN 400 + doc_id % 100 ELSE -1 END AS BIGINT) AS n_samples
      |FROM documents""".stripMargin
}
