package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as typed per-partition transforms over the blob column.
  *
  * Image rows carry REAL PNG payloads (synthesized deterministically with
  * ImageIO) and are decoded with ImageIO on the executor — the decode path
  * is the real JDK codec, not a stub. Audio/video decoding has no in-sandbox
  * codec, so those rows keep a clearly-marked STUB feature path; the
  * surrounding batching/schema/partitioning is the real pipeline either way. */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, media_ref: String, media_kind: String,
      blob: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_kind: String, blob_len: Long,
      width: Int, height: Int, n_frames: Int, feature: Seq[Float])

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

  /** Deterministic media table synthesized from documents.parquet: image
    * rows carry real PNG blobs (encoded executor-side in the same typed map
    * a production loader would use); audio/video rows carry the text bytes
    * as opaque payload stand-ins. kind cycles image/audio/video. */
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
    * through the real ImageIO decoder; audio/video report no dimensions
    * (-1) and keep the stub features. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        val (w, h) =
          if (m.media_kind == "image") decodeImage(m.blob).getOrElse((-2, -2))
          else (-1, -1)
        MediaFeatures(m.doc_id, m.media_kind, m.blob.length.toLong, w, h,
          if (m.media_kind == "video") frameCountStub(m.doc_id) else 1,
          featureStub(m.blob).toSeq)
      }
    }
  }

  /** Oracle-checkable projection: kind/frames are deterministic functions of
    * the source row; width/height for image rows verify the PNG
    * encode→ImageIO-decode roundtrip against the closed-form dimensions;
    * blob_len is only predictable for the non-image payloads. */
  def mediaFeaturesQuery(spark: SparkSession, sfDir: String): DataFrame = {
    extractFeatures(mediaTable(spark, sfDir))
      .toDF()
      .select(col("doc_id"), col("media_kind"),
        when(col("media_kind") === "image", lit(-1L)).otherwise(col("blob_len")).as("blob_len"),
        col("width").cast("long"), col("height").cast("long"),
        col("n_frames").cast("long"))
  }

  val mediaFeaturesOracle: String =
    """SELECT doc_id,
      | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
      | CAST(CASE WHEN doc_id % 3 = 0 THEN -1 ELSE length(text) END AS BIGINT) AS blob_len,
      | CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 32 ELSE -1 END AS BIGINT) AS width,
      | CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 29 ELSE -1 END AS BIGINT) AS height,
      | CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 4 ELSE 1 END AS BIGINT) AS n_frames
      |FROM documents""".stripMargin
}
