package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as typed per-partition transforms over the blob column.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs ship in
  * this sandbox): it derives deterministic pseudo-features from the bytes.
  * Everything around it — schema, blob batching, partitioning, the typed
  * Dataset signatures — is the real pipeline a codec would drop into. */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, media_ref: String, media_kind: String,
      blob: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_kind: String, blob_len: Long,
      width: Int, height: Int, n_frames: Int, feature: Seq[Float])

  /** Deterministic media table synthesized from documents.parquet: the text
    * bytes stand in for the binary payload; kind cycles image/audio/video. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    DocsTables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(lit("blob://"), col("doc_id")).as("media_ref"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_kind"),
        col("text").cast("binary").as("blob"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation would hand the blob to a codec
    * (e.g. ImageIO / ffmpeg) here; the surrounding batching stays intact. */
  def decodeStub(blob: Array[Byte]): (Int, Int) = {
    val h = java.util.Arrays.hashCode(blob)
    (64 + math.abs(h % 1024), 64 + math.abs((h >> 10) % 1024))
  }

  /** STUB feature extraction: deterministic 8-dim float vector from bytes. */
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

  /** decode + feature-extract as one typed per-partition pass (a codec
    * would batch within the partition exactly like this). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        val (w, h) = decodeStub(m.blob)
        MediaFeatures(m.doc_id, m.media_kind, m.blob.length.toLong, w, h,
          if (m.media_kind == "video") frameCountStub(m.doc_id) else 1,
          featureStub(m.blob).toSeq)
      }
    }
  }

  /** Oracle-checkable projection (blob length + kind + frame count are
    * deterministic functions of the source row). */
  def mediaFeaturesQuery(spark: SparkSession, sfDir: String): DataFrame = {
    extractFeatures(mediaTable(spark, sfDir))
      .toDF()
      .select(col("doc_id"), col("media_kind"), col("blob_len"), col("n_frames").cast("long"))
  }

  val mediaFeaturesOracle: String =
    """SELECT doc_id,
      | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
      | CAST(length(text) AS BIGINT) AS blob_len,
      | CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 4 ELSE 1 END AS BIGINT) AS n_frames
      |FROM documents""".stripMargin
}
