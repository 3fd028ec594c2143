package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * BINARY columns with typed metadata. The Spark side — schema,
  * partitioning, batch-shaped per-partition processing, feature
  * columns — is real and tested. The codec layer is a dispatch:
  * 8-bit grayscale BMP images decode for REAL ([[BmpCodec]], pure
  * JVM — fixed header + raw raster, no codec jars), and features/
  * resize then operate on the decoded raster; every other format
  * falls back to the honestly-labeled [[FakeDecoder]] stub
  * (deterministic synthetic decode: the image/audio libraries are
  * not in this container). Swap `FakeDecoder` for a real JNI/library
  * decoder on a cluster — the pipeline shape (iterator-to-iterator
  * mapPartitions, one codec context per partition, bounded batches)
  * is the production shape.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      bytes: Array[Byte],
      width: Int, // image/video
      height: Int,
      duration_ms: Int) // audio/video

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      byte_entropy: Double,
      mean_byte: Double,
      frames_sampled: Int,
      feature: Array[Float]) // stub embedding

  /** Pure-JVM 8-bit grayscale BMP codec — the one REAL decode kernel
    * (BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry grayscale
    * palette + 4-byte-padded raster; no codec jars needed).
    * encode→decode round-trips the raster byte-exactly (OpsSpec);
    * decode validates magic/size/depth/compression strictly and
    * returns None for anything that is not an uncompressed 8-bit BMP
    * — dispatchers then fall back to the stub, so non-BMP payloads
    * keep their historical (fake-decode) features.
    */
  object BmpCodec {
    private val HeaderSize = 14 + 40 + 256 * 4 // file + info + palette
    private def rowSize(w: Int): Int = (w + 3) / 4 * 4

    /** Raster is TOP-DOWN row-major, one byte per pixel. */
    def encode(width: Int, height: Int, raster: Array[Byte]): Array[Byte] = {
      require(width > 0 && height > 0 && raster.length == width * height,
        s"raster must be width*height bytes, got ${raster.length} for ${width}x$height")
      val rs = rowSize(width)
      val total = HeaderSize + rs * height
      val buf = java.nio.ByteBuffer.allocate(total)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte)
      buf.putInt(total).putInt(0).putInt(HeaderSize)
      buf.putInt(40).putInt(width).putInt(height) // positive = bottom-up
      buf.putShort(1).putShort(8) // planes, bits per pixel
      buf.putInt(0).putInt(rs * height) // BI_RGB, image size
      buf.putInt(2835).putInt(2835).putInt(256).putInt(0) // 72dpi, palette
      var i = 0
      while (i < 256) { // grayscale palette: BGR0 with B=G=R=index
        buf.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte)
        i += 1
      }
      var y = height - 1 // bottom-up rows, zero-padded to 4 bytes
      while (y >= 0) {
        buf.put(raster, y * width, width)
        var p = width
        while (p < rs) { buf.put(0.toByte); p += 1 }
        y -= 1
      }
      buf.array()
    }

    /** (width, height, top-down raster), or None if not an
      * uncompressed 8-bit BMP. Handles both bottom-up (positive
      * biHeight) and top-down (negative) rasters.
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (bytes.length < 54) return None
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (buf.get() != 'B'.toByte || buf.get() != 'M'.toByte) return None
      val bfSize = buf.getInt(); buf.getInt()
      val off = buf.getInt()
      val biSize = buf.getInt()
      val w = buf.getInt()
      val hRaw = buf.getInt()
      val planes = buf.getShort()
      val bits = buf.getShort()
      val comp = buf.getInt()
      // hRaw == Int.MinValue would defeat the abs below (abs(MinValue)
      // stays negative) and crash allocation — reject like any other
      // malformed header (ADVICE r5)
      if (bfSize != bytes.length || biSize != 40 || planes != 1 ||
        bits != 8 || comp != 0 || w <= 0 || hRaw == 0 ||
        hRaw == Int.MinValue) return None
      val h = math.abs(hRaw)
      val rs = rowSize(w)
      if (off < 54 || off.toLong + rs.toLong * h > bytes.length) return None
      // strict GRAYSCALE contract: an 8-bit BMP's pixels are palette
      // INDICES — treating them as luminance is only sound when the
      // palette is the identity ramp (B=G=R=index). Anything else
      // (inverted, tinted) falls back to the stub rather than
      // silently reporting index statistics as pixel statistics.
      if (off != 54 + 256 * 4) return None
      var pi = 0
      while (pi < 256) {
        val base = 54 + pi * 4
        if ((bytes(base) & 0xff) != pi || (bytes(base + 1) & 0xff) != pi ||
          (bytes(base + 2) & 0xff) != pi) return None
        pi += 1
      }
      val out = new Array[Byte](w * h)
      var row = 0
      while (row < h) {
        val srcRow = if (hRaw < 0) row else h - 1 - row
        System.arraycopy(bytes, off + srcRow * rs, out, row * w, w)
        row += 1
      }
      Some((w, h, out))
    }
  }

  /** STUB decoder — deterministic fake in place of a real codec. */
  object FakeDecoder {
    /** "Decode" = byte histogram + entropy + a fake 8-d feature
      * derived from byte statistics. Deterministic in the bytes.
      */
    def decode(row: MediaRow, frameSampleEvery: Int): MediaFeatures = {
      val bs = row.bytes
      val hist = new Array[Long](256)
      var i = 0
      var sum = 0L
      while (i < bs.length) {
        val b = bs(i) & 0xff
        hist(b) += 1
        sum += b
        i += 1
      }
      val n = math.max(bs.length, 1)
      var ent = 0.0
      var j = 0
      while (j < 256) {
        if (hist(j) > 0) {
          val p = hist(j).toDouble / n
          ent -= p * math.log(p) / math.log(2.0)
        }
        j += 1
      }
      val frames =
        if (row.modality == "image") 1
        else math.max(1, row.duration_ms / math.max(frameSampleEvery, 1))
      val feat = Array.tabulate[Float](8)(k =>
        (hist.slice(k * 32, (k + 1) * 32).sum.toDouble / n).toFloat)
      MediaFeatures(row.media_id, row.modality, bs.length.toLong, ent,
        sum.toDouble / n, frames, feat)
    }
  }

  /** Codec dispatch: image payloads that parse as 8-bit BMP compute
    * their features over the DECODED raster with the header's true
    * dims (the real kernel — n_bytes/entropy/mean describe pixels,
    * not file bytes); everything else keeps the stub. Strict header
    * validation makes the dispatch deterministic in the bytes.
    */
  private def decodeDispatch(row: MediaRow, frameSampleEvery: Int): MediaFeatures =
    (if (row.modality == "image") BmpCodec.decode(row.bytes) else None) match {
      case Some((w, h, raster)) =>
        FakeDecoder.decode(row.copy(bytes = raster, width = w, height = h),
          frameSampleEvery)
      case None => FakeDecoder.decode(row, frameSampleEvery)
    }

  /** Feature extraction over a media table: iterator-to-iterator
    * mapPartitions (never materializes a partition; one decoder
    * context per partition — the Pandas-UDF/mapInPandas batch shape,
    * expressed Dataset-native).
    */
  def extractFeatures(
      spark: SparkSession,
      media: Dataset[MediaRow],
      frameSampleEvery: Int = 1000): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts)
      it.map(decodeDispatch(_, frameSampleEvery))
    }
  }

  /** Nearest-neighbor resample of a top-down row-major raster; source
    * indexes past the buffer read as 0 (only reachable on the raw
    * fallback path, where metadata dims may exceed the payload).
    */
  private def nnResample(
      src: Array[Byte], w: Int, h: Int, newW: Int, newH: Int): Array[Byte] = {
    val out = new Array[Byte](newW * newH)
    var y = 0
    while (y < newH) {
      val sy = y * h / newH
      var x = 0
      while (x < newW) {
        val idx = sy * w + x * w / newW
        out(y * newW + x) = if (idx < src.length) src(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize an image payload with the same codec dispatch as
    * [[extractFeatures]]: a payload that parses as 8-bit BMP is
    * decoded, nearest-neighbor-resampled at the header's true dims,
    * and RE-ENCODED as a valid BMP (real end-to-end for that format);
    * any other image payload keeps the historical raw-byte-grid
    * resample over its metadata dims (the stub half — a real
    * deployment swaps in a codec-backed resampler). Plumbing —
    * iterator-to-iterator mapPartitions, dims updated in the typed
    * row, non-image rows passed through untouched — is the production
    * shape. Deterministic in (bytes, dims).
    */
  def resize(
      spark: SparkSession,
      media: Dataset[MediaRow],
      newW: Int,
      newH: Int): Dataset[MediaRow] = {
    require(newW > 0 && newH > 0,
      s"resize dims must be positive, got ${newW}x$newH")
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.modality != "image") r
        else BmpCodec.decode(r.bytes) match {
          case Some((w, h, raster)) =>
            r.copy(
              bytes = BmpCodec.encode(newW, newH, nnResample(raster, w, h, newW, newH)),
              width = newW, height = newH)
          case None if r.width > 0 && r.height > 0 =>
            r.copy(bytes = nnResample(r.bytes, r.width, r.height, newW, newH),
              width = newW, height = newH)
          case None => r
        }
      }
    }
  }

  /** Synthesize a media table from any (id, text) source: text bytes
    * as the opaque payload, modality cycled by id — lets the plumbing
    * run against the driver-provided tables with zero external data.
    */
  def synthesize(df: DataFrame): DataFrame =
    df.select(
      col("id").as("media_id"),
      expr("CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("modality"),
      encode(col("payload"), "utf-8").as("bytes"),
      when(col("id") % 3 === 0, (col("id") % 64 + 1) * 16).otherwise(0)
        .cast("int").as("width"),
      when(col("id") % 3 === 0, (col("id") % 48 + 1) * 16).otherwise(0)
        .cast("int").as("height"),
      when(col("id") % 3 =!= 0, (col("id") % 100 + 1) * 250).otherwise(0)
        .cast("int").as("duration_ms"))
}
