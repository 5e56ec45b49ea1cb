package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, and per-partition decode / feature-extract /
  * frame-sample operators.
  *
  * The container has no media codecs, so the decode kernel is a STUB — a
  * deterministic fake (byte histogram) clearly marked below — but everything
  * Spark-side is real: the binary column, the metadata schema, the
  * mapPartitions batch shape (the Scala analog of `mapInPandas` — one
  * iterator per partition so a real decoder would amortize model/codec init
  * across the partition, exactly how GPU/codec batching works at scale), and
  * the frame-sampling explode.
  *
  * The media payload is derived deterministically from `documents.text`
  * (UTF-8 bytes) since the testdata ships no true media; swapping in real
  * bytes changes no operator shape.
  *
  * Scale notes (100 TB): media rows are large — the featurize path carries
  * only (id, bytes) through the partition iterator and returns fixed-width
  * features, so shuffle volume is features not media; frame sampling emits
  * bounded slices via posexplode rather than materializing per-frame copies
  * of the whole payload.
  */
object Multimodal {

  /** One media record entering the decode kernel. */
  final case class MediaIn(doc_id: Long, media: Array[Byte], media_type: String)

  /** Decoded features leaving the kernel. */
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Int, features: Array[Float])

  /** The documents table lifted to a media table: binary payload + typed
    * metadata (simulated modality assignment — deterministic on doc_id).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      $"doc_id",
      encode($"text", "UTF-8").as("media"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod($"doc_id", lit(3)) + 1).cast("int")).as("media_type"))
  }

  private val mediaFilesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Land every document's payload as an individual `<doc_id>.bin` FILE —
    * the on-disk shape a real media corpus arrives in — and return the
    * directory. The landing is distributed (foreachPartition, one writer
    * per task, names keyed by the unique doc_id so retries are idempotent)
    * and memoized per (application, run-generation, corpus) like the other
    * landed-source operators.
    */
  private def mediaFilesDir(spark: SparkSession, dir: String): String =
    mediaFilesMemo.computeIfAbsent(
      s"${spark.sparkContext.applicationId}:${graft.Memos.runTag}:$dir", { _ =>
        val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
        val base = s"${sys.props("java.io.tmpdir")}/graft-mediafiles/" +
          s"${spark.sparkContext.applicationId}/${graft.Memos.runTag}/$safe"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
        // "distributed landing" was aspirational: documents is one parquet
        // row group, so without the spread every file write ran in ONE
        // task (Tables.spreadNarrowScan — exchange only for inputs too
        // small to split)
        Tables.spreadNarrowScan(Tables.documents(spark, dir)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text")))
          .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
            it.foreach { r =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(base, s"${r.getLong(0)}.bin"),
                r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
          }
        base
      })

  /** [[mediaTable]] sourced from REAL binary files through Spark's
    * `binaryFile` reader instead of a synthesized column: (path, length,
    * content) rows → the same (doc_id, media, media_type) schema, doc_id
    * recovered from the file name. MultimodalSpec proves byte-for-byte
    * equality with the synthesized table, so every kernel downstream runs
    * unchanged on either source — swapping in true image/audio bytes is a
    * landing change, not an operator change. (At scale the reader is the
    * right tool: it splits per-file, carries file metadata, and supports
    * `pathGlobFilter`/recursive discovery on object stores.)
    */
  def mediaTableFromFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = mediaFilesDir(spark, dir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(base)
      .select(
        regexp_extract($"path", "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        $"content".as("media"))
      .withColumn("media_type",
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")))
      .select($"doc_id", $"media", $"media_type")
  }

  /** Corpus modality mix — the one-look capacity report a multimodal
    * ingest keeps: items, byte volume, and size envelope per media type.
    * Storage planning, decode-fleet sizing, and batch-shape choices all
    * read this table first; at 100 TB it is one partial-aggregated
    * shuffle over (type, bytes) — the media bytes themselves never move.
    */
  def modalityMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"media_type", length($"media").as("n_bytes"))
      .groupBy($"media_type")
      .agg(
        count(lit(1)).as("n_items"),
        sum($"n_bytes".cast("bigint")).as("total_bytes"),
        max($"n_bytes").as("max_bytes"),
        (sum($"n_bytes".cast("bigint")) * lit(1.0) / count(lit(1)))
          .as("avg_bytes"))
      .orderBy($"media_type")
  }

  /** Typed metadata over the binary column — pure column expressions
    * (byte length, magic-prefix sniff), no decode needed.
    */
  def metadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).select(
      $"doc_id", $"media_type",
      length($"media").as("n_bytes"),
      hex(substring($"media", 1, 4)).as("magic_hex"))
      .orderBy($"doc_id")
  }

  /** Feature extraction through the per-partition decode kernel.
    *
    * ===== STUB BOUNDARY =====
    * `decodeKernel` is where a real image/audio decoder (JPEG decode →
    * resize → CNN features; PCM decode → mel spectrogram; ...) would run,
    * initialized ONCE per partition before the iterator is consumed. The
    * container ships no codecs, so the stand-in is a deterministic
    * 16-bin byte histogram, L1-normalized — fake features with the real
    * batch shape, signature, and schema.
    */
  private[graft] def decodeKernel(it: Iterator[MediaIn]): Iterator[MediaFeatures] = {
    // (real pipeline: val decoder = HeavyCodec.init() — once per partition)
    it.map { m =>
      val hist = new Array[Float](16)
      var i = 0
      while (i < m.media.length) {
        hist((m.media(i) & 0xff) >> 4) += 1f
        i += 1
      }
      val n = math.max(m.media.length, 1).toFloat
      var j = 0
      while (j < 16) { hist(j) /= n; j += 1 }
      MediaFeatures(m.doc_id, m.media_type, m.media.length, hist)
    }
  }

  def featurize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[MediaIn]
      .mapPartitions(decodeKernel _)
      .toDF()
      .orderBy($"doc_id")
  }

  /** Driver-checkable form of [[featurize]]: the feature vector flattened to
    * 16 scalar double columns (f00..f15). The driver's pandas comparator
    * row-sorts by every column and cannot hash an array column, so the
    * checked output must be all-scalar; internal consumers keep the
    * `Array[Float]` form from [[featurize]]. float→double cast is exact
    * widening, so the DuckDB oracle can reproduce it bit-for-bit with
    * float32 division then a DOUBLE cast.
    */
  def featurizeChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = (0 until 16).map(i =>
      element_at($"features", i + 1).cast("double").as(f"f$i%02d"))
    featurize(spark, dir)
      .select(Seq($"doc_id", $"media_type", $"n_bytes") ++ f: _*)
      .orderBy($"doc_id")
  }

  /** Resized payload leaving the resize kernel. */
  final case class MediaResized(doc_id: Long, media_type: String,
      n_bytes: Int, cells: Array[Float])

  /** Resize through the same per-partition kernel boundary: area-style
    * downsample of the payload to a fixed 16-cell grid — cell j averages
    * the bytes whose position maps to it (nearest-neighbor binning,
    * `p * 16 / n`). The real-codec analog is thumbnail resize: output width
    * is constant regardless of input size, so downstream row width (and
    * shuffle volume) is fixed no matter how large the media payload.
    * Cells a too-short payload never touches stay 0, like letterboxing.
    *
    * Float parity with the oracle: byte sums stay < 2^24 (exact in
    * float32), and the single float32 division is the same IEEE op in both
    * engines, so the widened DOUBLE output is bit-identical.
    */
  private[graft] def resizeKernel(it: Iterator[MediaIn]): Iterator[MediaResized] = {
    it.map { m =>
      val n = m.media.length
      val sums = new Array[Long](16)
      val counts = new Array[Long](16)
      var i = 0
      while (i < n) {
        val c = (i.toLong * 16 / n).toInt
        sums(c) += (m.media(i) & 0xff)
        counts(c) += 1
        i += 1
      }
      val cells = new Array[Float](16)
      var j = 0
      while (j < 16) {
        cells(j) = sums(j).toFloat / math.max(counts(j), 1L).toFloat
        j += 1
      }
      MediaResized(m.doc_id, m.media_type, n, cells)
    }
  }

  /** Driver-checkable resize (scalar r00..r15 doubles, like
    * [[featurizeChecked]]).
    */
  def resizeChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = (0 until 16).map(i =>
      element_at($"cells", i + 1).cast("double").as(f"r$i%02d"))
    mediaTable(spark, dir)
      .as[MediaIn]
      .mapPartitions(resizeKernel _)
      .toDF()
      .select(Seq($"doc_id", $"media_type", $"n_bytes") ++ r: _*)
      .orderBy($"doc_id")
  }

  /** Frame sampling: slice the payload into fixed [[FrameBytes]]-byte
    * frames and keep every 4th (the video-keyframe analog). posexplode
    * keeps the lineage columnar; at scale the slice bound keeps row width
    * fixed.
    */
  def frameSample(spark: SparkSession, dir: String,
      frameBytes: Int = FrameBytes, stride: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"doc_id", $"media_type",
        posexplode(expr(
          s"""transform(sequence(0, CAST(floor((length(media) - 1) / $frameBytes) AS INT)),
             |  f -> substring(media, f * $frameBytes + 1, $frameBytes))""".stripMargin)))
      .withColumnRenamed("pos", "frame_idx").withColumnRenamed("col", "frame")
      .filter(pmod($"frame_idx", lit(stride)) === 0)
      .select($"doc_id", $"media_type", $"frame_idx",
        length($"frame").as("frame_bytes"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Bytes per media frame — ONE definition shared by [[frameSample]],
    * [[audioEnergy]], and both their oracles (a frame-size literal edited
    * on one side only would silently desynchronize the twins).
    */
  val FrameBytes = 256

  /** One audio frame leaving the energy kernel. */
  final case class AudioFrame(doc_id: Long, frame_idx: Int, frame_bytes: Int,
      energy: Long, peak: Int)

  /** Per-frame energy over the audio-typed payloads: fixed-size byte frames,
    * energy = sum of unsigned byte values (the |PCM| magnitude analog that
    * is computable without codecs — a real decoder would map samples, not
    * bytes), peak = max byte. Completes the modality triple beside image
    * resize and video frame sampling. Same per-partition kernel boundary as
    * [[decodeKernel]] (decoder init amortized once per partition), and the
    * output is fixed-width per frame regardless of payload size — the
    * property that keeps downstream shuffle volume bounded at 100 TB.
    */
  private[graft] def audioKernel(it: Iterator[MediaIn]): Iterator[AudioFrame] =
    it.flatMap { m =>
      m.media.grouped(FrameBytes).zipWithIndex.map { case (frame, idx) =>
        var e = 0L
        var p = 0
        var i = 0
        while (i < frame.length) {
          val v = frame(i) & 0xff
          e += v
          if (v > p) p = v
          i += 1
        }
        AudioFrame(m.doc_id, idx, frame.length, e, p)
      }
    }

  def audioEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter($"media_type" === "audio")
      .as[MediaIn]
      .mapPartitions(audioKernel _)
      .toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Perceptual-hash media dedup (aHash): hash = one bit per resize-grid
    * cell, set when the cell exceeds the grid mean — visually-identical
    * payloads (re-encodes, small crops) collide even when their bytes
    * differ, which is exactly what exact fingerprint dedup
    * ([[graft.dedup.Dedup]]) cannot catch on media. Buckets on the 16-bit
    * hash, keeps the lowest doc_id per bucket (the curation keep-policy),
    * and emits the per-doc ledger (flag, not filter, so unique corpora
    * still verify).
    *
    * Float parity: grid cells are the [[resizeKernel]] float32 values
    * widened to double (exact); the mean is the FIXED left-associated sum
    * `r0 + r1 + … + r15` over exact values divided by 16; bit tests compare
    * identical doubles — so the DuckDB twin reproduces every hash.
    *
    * Scale: the kernel is the same per-partition decode boundary; the hash
    * is map-side; the bucket groupBy shuffles 2-byte hashes, not media.
    */
  def phashDedup(spark: SparkSession, dir: String): DataFrame =
    phashOn(spark, mediaTable(spark, dir))

  /** [[phashDedup]] driven end-to-end from the `binaryFile`-landed corpus
    * ([[mediaTableFromFiles]]) — the whole media pipeline (file discovery →
    * binary read → per-partition resize kernel → hash-bucket dedup) with
    * real file IO at the front. Bytes are deterministic, so the oracle is
    * [[phashDedup]]'s unchanged.
    */
  def phashDedupFromFiles(spark: SparkSession, dir: String): DataFrame =
    phashOn(spark, mediaTableFromFiles(spark, dir))

  private def phashOn(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val resized = media
      .as[MediaIn]
      .mapPartitions(resizeKernel _)
      .toDF()
    val cell = (i: Int) => element_at($"cells", i + 1).cast("double")
    val ph = resized
      .withColumn("m", (0 until 16).map(cell).reduce(_ + _) / lit(16.0))
      .withColumn("phash", (0 until 16).map(i =>
        when(cell(i) > $"m", lit(1 << i)).otherwise(lit(0))).reduce(_ + _))
      .select($"doc_id", $"media_type", $"phash")
      // checkpoint the (doc, hash) rows: ph feeds the bucket aggregate AND
      // the keeper join, and the opaque per-partition decode kernel would
      // otherwise re-read + re-decode every media payload per consumer —
      // decode once, fan out from the small rows (guide §8)
      .localCheckpoint(eager = false)
    val buckets = ph.groupBy($"phash")
      .agg(count(lit(1)).as("n_group"), min($"doc_id").as("keeper"))
    ph.join(buckets, "phash")
      .select($"doc_id", $"media_type", $"phash", $"n_group",
        ($"doc_id" === $"keeper").as("keep"))
      .orderBy($"doc_id")
  }

  // =====================================================================
  // r10: a REAL codec behind the stub seam — javax.imageio
  // =====================================================================

  /** Synthetic image geometry: [[ImgW]]×[[ImgW]] 8-bit grayscale; doc seeds
    * fold to [[ImgSeeds]] distinct images so the dedup stage sees real
    * collisions. ONE pixel formula — `(s*131 + y*17 + x*7) mod 256` —
    * shared verbatim between the image generator, the spec, and the DuckDB
    * oracle.
    */
  val ImgW = 16
  val ImgSeeds = 64L

  private val imageFilesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Land one REAL PNG per document: a TYPE_BYTE_GRAY image whose pixels
    * follow the seed formula, ENCODED BY javax.imageio on the executors
    * (the JDK ships PNG/BMP/GIF codecs even though the container has no
    * external media libraries — the r9 "no codecs" framing undersold it).
    * Distributed landing, idempotent names, memoized per (application,
    * run-generation, corpus) like [[mediaFilesDir]].
    */
  private def imageFilesDir(spark: SparkSession, dir: String): String =
    imageFilesMemo.computeIfAbsent(
      s"${spark.sparkContext.applicationId}:${graft.Memos.runTag}:$dir", { _ =>
        val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
        val base = s"${sys.props("java.io.tmpdir")}/graft-imagefiles/" +
          s"${spark.sparkContext.applicationId}/${graft.Memos.runTag}/$safe"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
        val w = ImgW
        val seeds = ImgSeeds
        // same single-row-group fix as [[mediaFilesDir]]: spread so the
        // per-doc ImageIO.write encodes run on every core
        Tables.spreadNarrowScan(
            Tables.documents(spark, dir).select(col("doc_id")))
          .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
            it.foreach { r =>
              val d = r.getLong(0)
              val s = d % seeds
              val img = new java.awt.image.BufferedImage(
                w, w, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val raster = img.getRaster
              var y = 0
              while (y < w) {
                var x = 0
                while (x < w) {
                  raster.setSample(x, y, 0, ((s * 131 + y * 17 + x * 7) % 256).toInt)
                  x += 1
                }
                y += 1
              }
              javax.imageio.ImageIO.write(img, "png",
                new java.io.File(base, s"$d.png"))
            }
          }
        base
      })

  /** Decoded-image perceptual hash, split into two 32-bit halves (both
    * always non-negative, so neither engine trips over the BIGINT sign
    * bit when reassembling bits as a sum).
    */
  final case class ImagePhash(doc_id: Long, width: Int, height: Int,
      phash_hi: Long, phash_lo: Long)

  /** The REAL decode kernel: `ImageIO.read` on the PNG bytes, then an 8×8
    * average-hash from the DECODED PIXELS — bit b set when its block's
    * pixel sum, scaled, exceeds the image total (`blockSum*64 > total` ≡
    * blockAvg > mean, exact in integers). PNG is lossless and the JDK gray
    * codec round-trips 8-bit samples exactly, so the hash is re-derivable
    * from the pixel formula alone — which is what lets DuckDB oracle-check
    * a pipeline whose Spark side genuinely decodes files. Same
    * per-partition iterator seam as [[decodeKernel]]: a heavier codec
    * would init once before the loop.
    */
  private[graft] def imageDecodeKernel(
      it: Iterator[(Long, Array[Byte])]): Iterator[ImagePhash] = {
    it.map { case (d, bytes) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"ImageIO failed to decode doc $d")
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val blocks = new Array[Long](64)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          blocks((y * 8 / h) * 8 + (x * 8 / w)) += raster.getSample(x, y, 0)
          x += 1
        }
        y += 1
      }
      var total = 0L
      var j = 0
      while (j < 64) { total += blocks(j); j += 1 }
      var lo = 0L
      var hi = 0L
      j = 0
      while (j < 64) {
        if (blocks(j) * 64 > total) {
          if (j < 32) lo |= (1L << j) else hi |= (1L << (j - 32))
        }
        j += 1
      }
      ImagePhash(d, w, h, hi, lo)
    }
  }

  /** [[phashDedupFromFiles]] with the stub REPLACED by the real codec:
    * land PNGs → `binaryFile` read → `ImageIO` decode → average-hash from
    * decoded pixels → hash-bucket dedup. The oracle recomputes every hash
    * from the pixel formula, so a green row proves the encode → file →
    * read → decode round trip preserved every sample. Scale shape
    * unchanged: media bytes stay inside the partition iterator; only
    * (doc_id, 2×int hash) shuffles.
    */
  def imageioPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = imageFilesDir(spark, dir)
    val ph = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(base)
      .select(
        regexp_extract($"path", "([0-9]+)\\.png$", 1).cast("long").as("_1"),
        $"content".as("_2"))
      .as[(Long, Array[Byte])]
      .mapPartitions(imageDecodeKernel _)
      .toDF()
      // decode once: same two-consumer fan-out as [[phashOn]], but here
      // each re-derivation was a full binaryFile re-read + ImageIO decode
      .localCheckpoint(eager = false)
    val buckets = ph.groupBy($"phash_hi", $"phash_lo")
      .agg(count(lit(1)).as("n_group"), min($"doc_id").as("keeper"))
    ph.join(buckets, Seq("phash_hi", "phash_lo"))
      .select($"doc_id", $"width", $"height", $"phash_hi", $"phash_lo",
        $"n_group", ($"doc_id" === $"keeper").as("keep"))
      .orderBy($"doc_id")
  }

  /** Energy-jump threshold between consecutive frames that opens a new
    * scene — ONE constant shared with the oracle (≈ the 65th percentile of
    * observed jumps, so segmentation is neither one-scene-per-doc nor
    * one-per-frame).
    */
  val SceneJump = 15000L

  /** Scene segmentation over the video payloads: per-frame energies from
    * the same byte kernel as [[audioEnergy]], then gaps-and-islands — a cut
    * opens where the energy jump between consecutive frames exceeds
    * [[SceneJump]], and `scene = running sum of cuts` labels each island.
    * Per scene: frame span, size, exact total energy, mean energy.
    *
    * Scale shape: the kernel is the per-partition decode boundary (fixed-
    * width rows out, media bytes never shuffle); both windows and the final
    * rollup share the `doc_id` partitioning, so the whole segmentation is
    * one shuffle.
    */
  def sceneSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = mediaTable(spark, dir)
      .filter($"media_type" === "video")
      .as[MediaIn]
      .mapPartitions(audioKernel _)
      .toDF()
    val wOrd = Window.partitionBy($"doc_id").orderBy($"frame_idx")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frames
      .withColumn("jump", abs($"energy" - lag($"energy", 1).over(wOrd)))
      .withColumn("cut",
        when($"jump".isNull || $"jump" > SceneJump, 1).otherwise(0))
      .withColumn("scene", sum($"cut").over(wRun))
      .groupBy($"doc_id", $"scene")
      .agg(
        min($"frame_idx").as("start_frame"),
        max($"frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum($"energy").as("scene_energy"))
      .select($"doc_id", $"scene", $"start_frame", $"end_frame", $"n_frames",
        $"scene_energy",
        ($"scene_energy" * lit(1.0) / $"n_frames").as("avg_energy"))
      .orderBy($"doc_id", $"scene")
  }

  /** Minimum plausible media payload (bytes): anything shorter cannot hold
    * a valid container header. One value, both engines.
    */
  val MinMediaBytes = 40

  /** Simulated decoder-failure rate: payloads whose salted h32 ≡ 0 mod this
    * are "undecodable" (~2.4%). Deterministic stand-in for the real
    * decoder's error path — the container ships no codecs.
    */
  val CorruptMod = 41

  /** Corrupt-media quarantine ledger — the validation gate a media ingest
    * runs BEFORE the expensive decode fleet: structural checks (payload too
    * short to hold a header) route around the decoder entirely; the decode
    * failures themselves are simulated deterministically (salted md5 ≡ 0
    * mod [[CorruptMod]]) where a real pipeline records the codec error.
    * Output: per (media_type, status) item/byte volume + share within the
    * type — the quarantine dashboard and decode-capacity discount in one.
    *
    * Scale shape: one pass, metadata-only predicates (length + one md5 of
    * bytes already in hand), aggregate keyed by (type, status) — partials
    * collapse map-side; media bytes never shuffle.
    */
  def corruptQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val typed = mediaTable(spark, dir)
      .withColumn("n_bytes", length($"media"))
      .withColumn("status",
        when($"n_bytes" < MinMediaBytes, "quarantined_short")
          .when(pmod(graft.functions.Md5Hash.h32(
            concat(lit("decode:"), $"media".cast("string"))),
            lit(CorruptMod)) === 0, "quarantined_decode")
          .otherwise("ok"))
    val perType = typed.groupBy($"media_type")
      .agg(count(lit(1)).as("n_total"))
    typed.groupBy($"media_type", $"status")
      .agg(count(lit(1)).as("n_items"),
        sum($"n_bytes".cast("bigint")).as("total_bytes"))
      .join(broadcast(perType), "media_type")
      .select($"media_type", $"status", $"n_items", $"total_bytes",
        graft.functions.GraftFunctions.round2(
          $"n_items" * lit(100.0) / $"n_total").as("pct_of_type"))
      .orderBy($"media_type", $"status")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_corrupt_quarantine" -> (corruptQuarantine _),
    "mm_scene_segments" -> (sceneSegments _),
    "mm_phash_dedup" -> (phashDedup _),
    "mm_binaryfile_phash" -> (phashDedupFromFiles _),
    "mm_imageio_phash" -> (imageioPhash _),
    "mm_audio_energy" -> (audioEnergy _),
    "mm_metadata" -> (metadata _),
    "mm_modality_mix" -> (modalityMix _),
    "mm_featurize" -> (featurizeChecked _),
    "mm_resize" -> (resizeChecked _),
    "mm_frame_sample" -> ((s: SparkSession, d: String) => frameSample(s, d)))

  // DuckDB cannot slice BLOBs, but this corpus is pure ASCII (asserted by
  // MultimodalSpec), so char-wise VARCHAR ops equal Spark's byte-wise ops.
  val oracle: Map[String, String] = Map(
    "mm_corrupt_quarantine" -> s"""WITH m AS (
  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
         octet_length(encode(text))::INT AS n_bytes,
         text
  FROM documents),
st AS (
  SELECT media_type, n_bytes,
         CASE WHEN n_bytes < $MinMediaBytes THEN 'quarantined_short'
              WHEN (${graft.functions.Md5Hash.h32Sql("'decode:' || text")})
                     % $CorruptMod = 0 THEN 'quarantined_decode'
              ELSE 'ok' END AS status
  FROM m),
tot AS (SELECT media_type, count(*)::BIGINT AS n_total FROM st GROUP BY 1)
SELECT s.media_type, s.status, count(*)::BIGINT AS n_items,
       sum(s.n_bytes)::BIGINT AS total_bytes,
       floor((count(*) * 100.0 / max(t.n_total)) * 100 + 0.5) / 100.0
         AS pct_of_type
FROM st s JOIN tot t ON s.media_type = t.media_type
GROUP BY s.media_type, s.status
ORDER BY s.media_type, s.status""",

    "mm_scene_segments" -> s"""WITH video AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
frames AS (
  SELECT doc_id, f::INT AS frame_idx,
         substring(text, f::INT * $FrameBytes + 1, $FrameBytes) AS fr
  FROM video, LATERAL (
    SELECT unnest(range(0,
      (octet_length(encode(text)) + ${FrameBytes - 1}) // $FrameBytes)) AS f)),
e AS (
  SELECT doc_id, frame_idx,
         list_sum(list_transform(string_split(fr, ''), c -> ascii(c)))::BIGINT
           AS energy
  FROM frames),
d AS (
  SELECT doc_id, frame_idx, energy,
         abs(energy - lag(energy) OVER (PARTITION BY doc_id
                                        ORDER BY frame_idx)) AS jump
  FROM e),
c AS (
  SELECT doc_id, frame_idx, energy,
         CASE WHEN jump IS NULL OR jump > $SceneJump THEN 1 ELSE 0 END AS cut
  FROM d),
s AS (
  SELECT doc_id, frame_idx, energy,
         CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS scene
  FROM c),
g AS (
  SELECT doc_id, scene, min(frame_idx) AS start_frame,
         max(frame_idx) AS end_frame, count(*)::BIGINT AS n_frames,
         CAST(sum(energy) AS BIGINT) AS scene_energy
  FROM s GROUP BY 1, 2)
SELECT doc_id, scene, start_frame, end_frame, n_frames, scene_energy,
       scene_energy * 1.0 / n_frames AS avg_energy
FROM g ORDER BY doc_id, scene""",
    // the corpus text is ASCII, so byte values = ascii(char) in DuckDB —
    // the same identity the featurize oracle relies on
    "mm_audio_energy" -> s"""WITH audio AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1),
frames AS (
  SELECT doc_id, f::INT AS frame_idx,
         substring(text, f::INT * $FrameBytes + 1, $FrameBytes) AS fr
  FROM audio, LATERAL (
    SELECT unnest(range(0,
      (octet_length(encode(text)) + ${FrameBytes - 1}) // $FrameBytes)) AS f))
SELECT doc_id, frame_idx,
       octet_length(encode(fr))::INT AS frame_bytes,
       list_sum(list_transform(string_split(fr, ''), c -> ascii(c)))::BIGINT
         AS energy,
       list_max(list_transform(string_split(fr, ''), c -> ascii(c)))::INT
         AS peak
FROM frames
ORDER BY doc_id, frame_idx""",

    "mm_modality_mix" -> """WITH m AS (
  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
         octet_length(encode(text))::INT AS n_bytes
  FROM documents)
SELECT media_type,
       count(*)::BIGINT AS n_items,
       sum(n_bytes)::BIGINT AS total_bytes,
       max(n_bytes)::INT AS max_bytes,
       sum(n_bytes)::BIGINT * 1.0 / count(*) AS avg_bytes
FROM m GROUP BY media_type
ORDER BY media_type""",

    "mm_metadata" -> """SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
         AS media_type,
       octet_length(encode(text))::INT AS n_bytes,
       hex(encode(substring(text, 1, 4))) AS magic_hex
FROM documents ORDER BY doc_id""",

    "mm_frame_sample" -> s"""WITH frames AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
         i AS frame_idx,
         octet_length(encode(substring(text, i * $FrameBytes + 1, $FrameBytes)))::INT AS frame_bytes
  FROM documents,
       LATERAL (SELECT unnest(range(0,
         CAST(floor((octet_length(encode(text)) - 1) / $FrameBytes) AS INT) + 1)) AS i))
SELECT doc_id, media_type, frame_idx::INT AS frame_idx, frame_bytes
FROM frames WHERE frame_idx % 4 = 0
ORDER BY doc_id, frame_idx""",

    // Resize twin: positional chars via range-unnest (string_split loses
    // position), binned by p*16//n; sums < 2^24 keep float32 exact, so the
    // FLOAT division then DOUBLE widen matches the kernel bit-for-bit.
    "mm_resize" -> resizeOracle,

    // the binaryFile-sourced run must land the SAME rows: one oracle text
    "mm_binaryfile_phash" -> phashOracle,

    // the decoded-pixel hash, recomputed from the pixel formula: proves
    // the ImageIO encode → binaryFile → decode round trip is sample-exact
    "mm_imageio_phash" -> s"""WITH seeds AS (
  SELECT DISTINCT doc_id % $ImgSeeds AS s FROM documents),
px AS (
  SELECT s, ty.y AS y, tx.x AS x,
         (s * 131 + ty.y * 17 + tx.x * 7) % 256 AS v
  FROM seeds, range($ImgW) ty(y), range($ImgW) tx(x)),
blocks AS (
  SELECT s, (y * 8 // $ImgW) * 8 + (x * 8 // $ImgW) AS b, sum(v)::BIGINT AS bs
  FROM px GROUP BY 1, 2),
tot AS (SELECT s, sum(bs)::BIGINT AS ts FROM blocks GROUP BY 1),
ph AS (
  SELECT blocks.s AS s,
         sum(CASE WHEN bs * 64 > ts AND b >= 32
                  THEN (1::BIGINT << (b - 32)::INT) ELSE 0 END)::BIGINT AS phash_hi,
         sum(CASE WHEN bs * 64 > ts AND b < 32
                  THEN (1::BIGINT << b::INT) ELSE 0 END)::BIGINT AS phash_lo
  FROM blocks JOIN tot ON blocks.s = tot.s GROUP BY 1),
docs AS (
  SELECT d.doc_id, ph.phash_hi, ph.phash_lo
  FROM documents d JOIN ph ON d.doc_id % $ImgSeeds = ph.s),
buckets AS (
  SELECT phash_hi, phash_lo, count(*)::BIGINT AS n_group,
         min(doc_id) AS keeper
  FROM docs GROUP BY 1, 2)
SELECT doc_id, $ImgW::INT AS width, $ImgW::INT AS height,
       docs.phash_hi, docs.phash_lo, n_group,
       (doc_id = keeper) AS keep
FROM docs JOIN buckets
  ON docs.phash_hi = buckets.phash_hi AND docs.phash_lo = buckets.phash_lo
ORDER BY doc_id""",
    // aHash twin over the shared resize chain: fixed-order grid mean,
    // one bit per above-mean cell, bucket stats by hash
    "mm_phash_dedup" -> phashOracle,

    // The decode stub's 16-bin high-nibble byte histogram IS
    // SQL-expressible over this pure-ASCII corpus: per-char unnest, bin by
    // ascii//16, then float32 division widened to DOUBLE matches the
    // kernel's float arithmetic bit-for-bit (counts < 2^24 stay exact in
    // float32). The `text <> ''` guard exists because string_split('','')
    // yields [''] (ascii 0) in DuckDB; no empty docs ship, but stay safe.
    "mm_featurize" -> featurizeOracle)

  private lazy val phashOracle: String = s"""WITH resized AS (
$resizeOracle
),
ph AS (
  SELECT doc_id, media_type,
         ${(0 until 16).map(c =>
        s"(CASE WHEN r${"%02d".format(c)} > m THEN ${1 << c} ELSE 0 END)")
        .mkString("\n         + ")} AS phash
  FROM (SELECT *,
          (${(0 until 16).map(c => s"r${"%02d".format(c)}").mkString(" + ")})
            / 16.0 AS m
        FROM resized)),
buckets AS (
  SELECT phash, count(*)::BIGINT AS n_group, min(doc_id) AS keeper
  FROM ph GROUP BY phash)
SELECT p.doc_id, p.media_type, p.phash, b.n_group,
       p.doc_id = b.keeper AS keep
FROM ph p JOIN buckets b USING (phash)
ORDER BY p.doc_id"""

  private lazy val resizeOracle: String = ("""WITH chars AS (
  SELECT doc_id,
         ((p * 16) // octet_length(encode(text))) AS cell,
         ascii(substring(text, p::INT + 1, 1)) AS b
  FROM documents,
       LATERAL (SELECT unnest(range(0, octet_length(encode(text)))) AS p)
  WHERE text <> ''
), grid AS (
  SELECT doc_id,
""" + (0 until 16).map(c =>
      s"    SUM(CASE WHEN cell = $c THEN b END) AS s$c,\n" +
      s"    COUNT(CASE WHEN cell = $c THEN 1 END) AS c$c").mkString(",\n") +
      """
  FROM chars GROUP BY doc_id
)
SELECT d.doc_id,
  CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
    AS media_type,
  octet_length(encode(d.text))::INT AS n_bytes,
""" + (0 until 16).map(c =>
      s"  (COALESCE(g.s$c, 0)::FLOAT / GREATEST(COALESCE(g.c$c, 0), 1)::FLOAT)::DOUBLE AS r${"%02d".format(c)}").mkString(",\n") +
      """
FROM documents d LEFT JOIN grid g USING (doc_id)
ORDER BY d.doc_id""")

  private lazy val featurizeOracle: String = ("""WITH chars AS (
  SELECT doc_id, ascii(c) // 16 AS bin
  FROM documents, UNNEST(string_split(text, '')) AS t(c)
  WHERE text <> ''
), hist AS (
  SELECT doc_id,
""" + (0 until 16).map(b =>
      s"    SUM(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS c$b").mkString(",\n") +
      """
  FROM chars GROUP BY doc_id
)
SELECT d.doc_id,
  CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
    AS media_type,
  octet_length(encode(d.text))::INT AS n_bytes,
""" + (0 until 16).map(b =>
      s"  (COALESCE(h.c$b, 0)::FLOAT / GREATEST(octet_length(encode(d.text)), 1)::FLOAT)::DOUBLE AS f${"%02d".format(b)}").mkString(",\n") +
      """
FROM documents d LEFT JOIN hist h USING (doc_id)
ORDER BY d.doc_id""")
}
