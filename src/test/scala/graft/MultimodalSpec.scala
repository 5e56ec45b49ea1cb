package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFeatures, MediaIn}
import org.apache.spark.sql.functions._

/** Multimodal plumbing semantics: the decode-kernel stub's contract (unit
  * level, no Spark), the mapPartitions path end-to-end, and frame-sampling
  * bounds.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binaryFile landing reproduces the synthesized media table byte-for-byte") {
    val fromFiles = Multimodal.mediaTableFromFiles(spark, sf)
      .select($"doc_id", hex(md5($"media")).as("h"), length($"media").as("n"),
        $"media_type")
    val synthesized = Multimodal.mediaTable(spark, sf)
      .select($"doc_id", hex(md5($"media")).as("h"), length($"media").as("n"),
        $"media_type")
    assert(fromFiles.count() === synthesized.count())
    assert(fromFiles.exceptAll(synthesized).isEmpty &&
        synthesized.exceptAll(fromFiles).isEmpty,
      "every landed file must round-trip its payload and doc identity")
    // and the source really is the binaryFile reader, not a parquet scan
    val scans = Multimodal.mediaTableFromFiles(spark, sf)
      .queryExecution.executedPlan.toString
    assert(scans.contains("binaryFile") || scans.contains("BinaryFile"),
      s"expected a binaryFile relation in:\n${scans.take(600)}")
  }

  test("decode kernel: histogram is L1-normalized over byte high-nibbles") {
    val bytes = Array[Byte](0x00, 0x10, 0x10, 0x7f, -1) // nibbles 0,1,1,7,15
    val out = Multimodal.decodeKernel(
      Iterator(MediaIn(7L, bytes, "image"))).toList
    assert(out.length == 1)
    val f = out.head
    assert(f.doc_id == 7L && f.n_bytes == 5 && f.media_type == "image")
    assert(math.abs(f.features.sum - 1.0f) < 1e-6)
    assert(f.features(0) == 0.2f && f.features(1) == 0.4f
      && f.features(7) == 0.2f && f.features(15) == 0.2f)
  }

  test("featurize runs the kernel distributed with correct schema and totals") {
    val out = Multimodal.featurize(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "features"))
    val rows = out.as[MediaFeatures].collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.features.length == 16)
      assert(math.abs(r.features.sum - 1.0f) < 1e-5)
    }
    // n_bytes must equal the metadata operator's byte length per doc
    val meta = Multimodal.metadata(spark, sf)
      .select($"doc_id", $"n_bytes").as[(Long, Int)].collect().toMap
    rows.foreach(r => assert(meta(r.doc_id) == r.n_bytes))
  }

  test("audio energy: frames tile the payload and conserve total byte mass") {
    import org.apache.spark.sql.functions._
    val frames = Multimodal.audioEnergy(spark, sf)
    // frame math: per doc, count = ceil(n_bytes / FrameBytes) and the byte
    // lengths sum back to the payload
    val meta = Multimodal.metadata(spark, sf)
      .filter($"media_type" === "audio")
      .select($"doc_id", $"n_bytes").as[(Long, Int)].collect().toMap
    val perDoc = frames.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_frames"), sum($"frame_bytes").as("b"),
        sum($"energy").as("e"), max($"peak").as("p"))
      .collect()
    assert(perDoc.length == meta.size)
    perDoc.foreach { r =>
      val n = meta(r.getLong(0))
      assert(r.getLong(1) == (n + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes)
      assert(r.getLong(2) == n)
      // ASCII text payload: every byte in [32, 127), so energy bounds hold
      assert(r.getLong(3) >= 32L * n && r.getLong(3) < 127L * n)
      assert(r.getInt(4) < 127)
    }
  }

  test("frame sampling keeps every 4th fixed-size frame and covers the payload") {
    val frames = Multimodal.frameSample(spark, sf).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getInt(2) % 4 == 0, "only sampled frames")
      assert(r.getInt(3) <= 256 && r.getInt(3) > 0)
    }
    // frame 0 exists for every document
    val docsWithFrame0 = frames.filter(_.getInt(2) == 0).map(_.getLong(0)).toSet
    assert(docsWithFrame0.size == Tables.documents(spark, sf).count())
  }

  test("resize kernel: fixed grid, block means, letterboxed short payloads") {
    // 32 bytes of value 10 then 32 of value 30: halves resolve to two bands
    val bytes = Array.fill[Byte](32)(10) ++ Array.fill[Byte](32)(30)
    val out = Multimodal.resizeKernel(
      Iterator(MediaIn(1L, bytes, "image"))).toList.head
    assert(out.cells.length == 16 && out.n_bytes == 64)
    assert(out.cells.take(8).forall(_ == 10f) && out.cells.drop(8).forall(_ == 30f))
    // payload shorter than the grid: untouched cells stay 0 (letterbox)
    val short = Multimodal.resizeKernel(
      Iterator(MediaIn(2L, Array[Byte](100, 100), "audio"))).toList.head
    assert(short.cells.count(_ != 0f) == 2)
    assert(short.cells.forall(c => c == 0f || c == 100f))
    // distributed path: fixed width, byte-range domain, deterministic
    val df = Multimodal.resizeChecked(spark, sf)
    val rows = df.collect()
    assert(df.columns.length == 3 + 16)
    val cellCols = df.columns.filter(_.startsWith("r"))
    assert(rows.forall(r => cellCols.forall { c =>
      val v = r.getAs[Double](c); v >= 0.0 && v <= 255.0
    }))
    assert(rows.map(_.toString).sameElements(
      Multimodal.resizeChecked(spark, sf).collect().map(_.toString)))
  }

  test("scene segments tile each video's frames contiguously") {
    val byDoc = Multimodal.sceneSegments(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, segs) =>
      val ordered = segs.sortBy(_.getLong(1))
      assert(ordered.head.getLong(1) == 1L) // first cut opens scene 1
      assert(ordered.head.getInt(2) == 0) // ... at frame 0
      ordered.foreach(s =>
        assert(s.getLong(4) == s.getInt(3) - s.getInt(2) + 1L))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) == a.getLong(1) + 1) // dense scene ids
          assert(b.getInt(2) == a.getInt(3) + 1) // contiguous frame spans
        case _ =>
      }
    }
  }

  test("ImageIO kernel decodes real PNG bytes back to the exact pixels") {
    import graft.multimodal.Multimodal
    // encode a known image with the landing formula, decode through the
    // kernel, and recompute the expected hash straight from the formula —
    // any lossy step (codec, sample depth, raster order) breaks equality
    val seed = 5L
    val w = Multimodal.ImgW
    val img = new java.awt.image.BufferedImage(
      w, w, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until w; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, ((seed * 131 + y * 17 + x * 7) % 256).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.imageDecodeKernel(
      Iterator((42L, bos.toByteArray))).toSeq
    assert(out.size == 1 && out.head.width == w && out.head.height == w)
    // expected hash from the formula, no codec involved
    val blocks = new Array[Long](64)
    for (y <- 0 until w; x <- 0 until w)
      blocks((y * 8 / w) * 8 + (x * 8 / w)) += (seed * 131 + y * 17 + x * 7) % 256
    val total = blocks.sum
    var lo = 0L; var hi = 0L
    for (j <- 0 until 64 if blocks(j) * 64 > total)
      if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
    assert(out.head.phash_lo == lo && out.head.phash_hi == hi,
      "decoded-pixel hash must equal the formula-derived hash")
  }

  test("corpus is pure ASCII (precondition for the VARCHAR-based oracle)") {
    // the DuckDB oracle slices VARCHAR (it cannot slice BLOBs); equality of
    // byte length and char length over the whole corpus is the precondition
    val nonAscii = Tables.documents(spark, sf)
      .filter(octet_length($"text") =!= length($"text")).count()
    assert(nonAscii == 0)
  }
}
