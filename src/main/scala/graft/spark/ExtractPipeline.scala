package graft.spark

import graft.extract.{Deduplicator, ExtractedDoc, Extraction, ExtractorOptions}
import graft.out.Serializers.Span
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Input row: the Iceberg-style interleaved document (BASELINE.json
  * input_hint): doc_id + ordered spans of kind html|image|… */
final case class DocRow(doc_id: String, spans: Seq[Span])

/** Output row: ordered extraction spans + flattened metadata + per-doc
  * lineage/metrics fields (ok flag, kernel micros). */
final case class ResultRow(
    doc_id: String,
    spans: Seq[Span],
    text: String,
    comments: String,
    title: String, author: String, url: String, hostname: String,
    description: String, sitename: String, date: String,
    categories: Seq[String], tags: Seq[String],
    fingerprint: String, license: String, language: String,
    image: String, pagetype: String,
    ok: Boolean, kernel_us: Long)

/** The Spark-native extraction pipeline: a typed `mapPartitions` transform
  * over `Dataset[DocRow]` (SURVEY §3.1 — the whole reference cascade is the
  * per-row kernel; the only cross-boundary points are the scan, the
  * doc_id-hash repartition, and the sink).
  *
  * Scale design (local[32] here; 1000-executor story):
  *  - the kernel is per-row pure Scala — embarrassingly parallel, no shuffle
  *    besides the explicit doc_id repartition for balanced task sizes;
  *  - mega-document skew (north rule) is routed explicitly: rows heavier than
  *    `skewThreshold` bytes are split into their own single-doc partitions so
  *    one 100 MB page cannot stall a 128 MB-input task (AQE cannot re-plan a
  *    map-only stage);
  *  - per-partition LRU dedup state lives inside the partition iterator,
  *    matching the reference's per-process cache semantics (SURVEY §7.4.3).
  */
object ExtractPipeline {

  /** Assemble the HTML payload of one interleaved doc: concatenate
    * kind="html" spans in offset order (FIXTURES.md §1). */
  def htmlPayload(spans: Seq[Span]): String = {
    val htmls = spans.filter(_.kind == "html").sortBy(_.offset)
    if (htmls.isEmpty) null
    else if (htmls.lengthCompare(1) == 0) htmls.head.text
    else htmls.map(_.text).mkString
  }

  /** The per-row kernel. Media spans pass through as trailing graphic spans
    * (kind context preserved, core.py:425-450 analogue). */
  def extractRow(row: DocRow, options: ExtractorOptions): ResultRow = {
    val t0 = System.nanoTime()
    val html = htmlPayload(row.spans)
    // MAX_FILE_SIZE / MIN_FILE_SIZE gates (cli_utils.py:388-393)
    val sizeOk = html != null && html.length >= options.config.minFileSize &&
      html.length <= options.config.maxFileSize
    val doc: ExtractedDoc =
      if (!sizeOk) null
      else Extraction.extractDoc(html, null, row.doc_id, options)
    val media = row.spans.filter(s => s.kind != "html" && s.kind != "text")
    if (doc == null) {
      ResultRow(row.doc_id, Seq.empty, null, null, null, null, null, null, null,
        null, null, Seq.empty, Seq.empty, null, null, null, null, null,
        ok = false, kernel_us = (System.nanoTime() - t0) / 1000)
    } else {
      val base = doc.spans
      val passthrough = media.zipWithIndex.map { case (m, i) =>
        Span("graphic", m.text, m.media_ref, base.length + i)
      }
      val m = doc.meta
      ResultRow(row.doc_id, base ++ passthrough, doc.text, doc.comments,
        m.title, m.author, m.url, m.hostname, m.description, m.sitename, m.date,
        m.categories, m.tags, m.fingerprint, m.license, m.language, m.image, m.pagetype,
        ok = true, kernel_us = (System.nanoTime() - t0) / 1000)
    }
  }

  /** Typed extraction transform. Options are captured in the task closure
    * (immutable); the dedup LRU is instantiated per partition. */
  def extractDocs(ds: Dataset[DocRow], options: ExtractorOptions): Dataset[ResultRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { iter =>
      val opts =
        if (options.dedup) options.copy(dedupCache = new Deduplicator())
        else options
      iter.map { row => ExtractPipeline.kernelDocCount.increment(); extractRow(row, opts) }
    }
  }

  /** DIAGNOSTIC (meaningful in local mode only): docs processed by
    * extractDocs since JVM start — lets probes count kernel executions
    * (ProbePipe used it to prove the pipeline cache is hit: 5000 docs on
    * build, 0 on every action). LongAdder: no shared-cache-line contention
    * in the kernel hot path (~ns per doc vs ~60 µs of kernel work). */
  val kernelDocCount = new java.util.concurrent.atomic.LongAdder

  /** Skew-aware variant: docs whose html payload exceeds `skewThresholdBytes`
    * are pulled into a salted, per-doc-balanced set of partitions; the bulk
    * path stays on the doc_id-hash layout. Both paths are one map stage. */
  def extractDocsSkewAware(ds: Dataset[DocRow], options: ExtractorOptions,
      skewThresholdBytes: Int = 1 << 20, bulkPartitions: Int = 0): Dataset[ResultRow] = {
    import ds.sparkSession.implicits._
    val spark = ds.sparkSession
    val shufflePartitions = if (bulkPartitions > 0) bulkPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val weighted = ds.withColumn("_w",
      aggregate(col("spans"), lit(0L), (acc, s) => acc + coalesce(length(s.getField("text")), lit(0))))
    val small = weighted.filter(col("_w") <= skewThresholdBytes).drop("_w").as[DocRow]
    val big = weighted.filter(col("_w") > skewThresholdBytes).drop("_w").as[DocRow]
    val smallOut = extractDocs(
      small.repartition(shufflePartitions, col("doc_id")), options)
    // round-robin the heavy docs so each lands in its own task
    val bigOut = extractDocs(big.repartition(shufflePartitions), options)
    smallOut.unionAll(bigOut)
  }

  // ------------------------------------------------------------- commit log

  /** Iceberg-snapshot emulation (no Iceberg jar in /opt/spark/jars): the run
    * is split into `buckets` by hash(doc_id); each bucket is written to its
    * own directory followed by an atomic JSON manifest recording lineage +
    * extraction metrics. A restarted run skips committed buckets — the north
    * rule's per-partition checkpointed resume.
    *
    * Scan economics: the raw input is staged ONCE as a bucket-partitioned
    * parquet table (the emulated `bucket(doc_id)` Iceberg layout). Every
    * bucket pass — including resume passes in a later process — reads only
    * its own `_bucket=N` partition directory, so total input scan volume is
    * 1x (the staging write) + 1/buckets per pass, never buckets× the raw
    * table. `htmlBackup=true` adds a SECOND read of the bucket for the
    * backup write (2/buckets per pass): re-reading the pruned parquet keeps
    * the memory profile flat, vs. caching a whole bucket of raw pages to
    * save a scan. Each manifest records the pruned path + files read. */
  /** `htmlBackup=true` mirrors the reference's HTML backup sink
    * (cli_utils.py:161-170: `--backup-dir` persists the raw page next to the
    * extraction output): each bucket's raw html payloads land in
    * `html-bucket-N`, committed by the same atomic manifest as the
    * extraction output. */
  def runWithCommitLog(spark: SparkSession, input: Dataset[DocRow],
      outDir: String, options: ExtractorOptions, buckets: Int = 8,
      skewThresholdBytes: Int = 0, htmlBackup: Boolean = false): Seq[String] = {
    import spark.implicits._
    val fs = new java.io.File(outDir)
    fs.mkdirs()
    new java.io.File(s"$outDir/_commits").mkdirs()
    // stage once: bucket-partitioned table, skipped when already committed.
    // The bucket count is part of the layout: a resume with a different
    // `buckets` against the same outDir must fail loudly, not mis-bucket.
    val stagedDir = s"$outDir/_staged"
    val bucketsMarker = java.nio.file.Paths.get(s"$outDir/_commits/_buckets")
    if (!new java.io.File(s"$stagedDir/_SUCCESS").exists()) {
      input.withColumn("_bucket", pmod(hash(col("doc_id")), lit(buckets)))
        .write.mode("overwrite").partitionBy("_bucket").parquet(stagedDir)
      // tmp + atomic rename: a crash between the staging write and a plain
      // marker write would leave a resumable staged table whose next run
      // throws NoSuchFileException instead of a diagnosable error
      val tmpMarker = java.nio.file.Paths.get(s"$outDir/_commits/._buckets.tmp")
      // the marker records the run LAYOUT: bucket count + whether the html
      // backup sink is part of each bucket's committed unit — a resume with
      // either changed must fail loudly (a flipped htmlBackup would silently
      // skip the backup for already-committed buckets)
      java.nio.file.Files.writeString(tmpMarker, s"$buckets\n$htmlBackup")
      java.nio.file.Files.move(tmpMarker, bucketsMarker,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      if (!java.nio.file.Files.exists(bucketsMarker))
        throw new IllegalStateException(
          s"commit log at $outDir has a staged table but no _buckets marker " +
            "(crash between staging and marker write?) — delete " +
            s"$stagedDir to restage, or restore _commits/_buckets")
      val markerLines = java.nio.file.Files.readString(bucketsMarker).trim
        .split("\n").map(_.trim)
      val staged = markerLines(0).toInt
      require(staged == buckets,
        s"commit log at $outDir was staged with buckets=$staged, got buckets=$buckets")
      val stagedBackup = markerLines.length > 1 && markerLines(1).toBoolean
      require(stagedBackup == htmlBackup,
        s"commit log at $outDir was staged with htmlBackup=$stagedBackup, " +
          s"got htmlBackup=$htmlBackup — committed buckets would be missing " +
          "(or carrying stale) html-bucket-N data")
    }
    val rowSchema = org.apache.spark.sql.Encoders.product[DocRow].schema
    val written = scala.collection.mutable.ListBuffer.empty[String]
    (0 until buckets).foreach { b =>
      val manifest = new java.io.File(s"$outDir/_commits/bucket-$b.json")
      if (!manifest.exists()) {
        val t0 = System.nanoTime()
        // path-level partition pruning: only this bucket's files are read
        val bucketPath = s"$stagedDir/_bucket=$b"
        val part =
          if (new java.io.File(bucketPath).exists())
            spark.read.schema(rowSchema).parquet(bucketPath).as[DocRow]
          else spark.emptyDataset[DocRow]
        val scannedFiles = part.inputFiles.length
        val out =
          if (skewThresholdBytes > 0) extractDocsSkewAware(part, options, skewThresholdBytes)
          else extractDocs(part, options)
        val target = s"$outDir/bucket-$b"
        out.write.mode("overwrite").parquet(target)
        if (htmlBackup) {
          import spark.implicits._
          part.map(r => (r.doc_id, htmlPayload(r.spans)))
            .toDF("doc_id", "html")
            .write.mode("overwrite").parquet(s"$outDir/html-bucket-$b")
        }
        // metrics read back from the committed files (cheap: parquet footers)
        val stats = spark.read.parquet(target)
          .agg(count(lit(1)), coalesce(sum(when(col("ok"), 1L).otherwise(0L)), lit(0L)),
            coalesce(sum(size(col("spans"))), lit(0L)), coalesce(sum(col("kernel_us")), lit(0L)))
          .collect()(0)
        val durMs = (System.nanoTime() - t0) / 1000000
        val json =
          s"""{"bucket":$b,"docs":${stats.getLong(0)},"ok":${stats.getLong(1)},""" +
            s""""spans":${stats.getLong(2)},"kernel_us":${stats.getLong(3)},""" +
            s""""wall_ms":$durMs,"input":"hash(doc_id) % $buckets == $b",""" +
            s""""scan_path":"$bucketPath","scanned_files":$scannedFiles}"""
        val tmp = new java.io.File(s"$outDir/_commits/.bucket-$b.json.tmp")
        java.nio.file.Files.writeString(tmp.toPath, json)
        tmp.renameTo(manifest) // atomic commit
        written += target
      }
    }
    written.toSeq
  }
}
