package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * BINARY columns with typed metadata. The Spark side — schema,
  * partitioning, batch-shaped per-partition processing, feature
  * columns — is real and tested; the actual codec step is STUBBED
  * behind [[FakeDecoder]] (deterministic synthetic decode: the
  * image/audio libraries are not in this container). Swap
  * `FakeDecoder` for a real JNI/library decoder on a cluster — the
  * pipeline shape (iterator-to-iterator mapPartitions, one codec
  * context per partition, bounded batches) is the production shape.
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
      it.map(FakeDecoder.decode(_, frameSampleEvery))
    }
  }

  /** Resize an image payload — nearest-neighbor over the byte grid
    * (bytes treated as a width×height single-channel raster). The
    * resampling KERNEL is the stub half (a real deployment swaps in a
    * codec-backed resampler); the plumbing — iterator-to-iterator
    * mapPartitions, dims updated in the typed row, non-image rows
    * passed through untouched — is the production shape, like
    * [[extractFeatures]]. Deterministic in (bytes, dims).
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
        if (r.modality != "image" || r.width <= 0 || r.height <= 0) r
        else {
          val out = new Array[Byte](newW * newH)
          var y = 0
          while (y < newH) {
            val sy = y * r.height / newH
            var x = 0
            while (x < newW) {
              val idx = sy * r.width + x * r.width / newW
              out(y * newW + x) = if (idx < r.bytes.length) r.bytes(idx) else 0
              x += 1
            }
            y += 1
          }
          r.copy(bytes = out, width = newW, height = newH)
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
