package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata.
  *
  * The Spark-side plumbing — schema, partition-preserving typed
  * transforms, batch shape — is real and tested; the actual media
  * decode is a clearly-marked deterministic STUB (no codec libraries in
  * this container). Swap [[Multimodal.decodeOne]] for a real decoder and
  * everything else holds.
  */
object Multimodal {

  case class MediaRow(doc_id: String, media_type: String, payload: Array[Byte])

  case class DecodedMedia(
      doc_id: String,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Double])

  /** Synthesize a media table from documents: payload = utf8 bytes of the
    * text (stand-in for real image/audio bytes), media_type round-robin. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("doc"), col("doc_id")).as("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: a deterministic fake standing in for e.g. JPEG decode /
    * audio resample / video frame-sampling. Header fields come from the
    * first payload bytes; "features" are a fixed-length reduction of
    * sampled bytes (the frame-sample shape: every 16th byte). */
  private def decodeOne(m: MediaRow): DecodedMedia = {
    val p = m.payload
    def at(i: Int): Int = if (p.length > i) p(i) & 0xff else 0
    val sampled = p.indices.collect { case i if i % 16 == 0 => p(i) & 0xff }
    // double math so the DuckDB oracle twin (double division) is
    // bit-identical — a float quotient re-rounded to 4dp can cross a
    // decimal boundary the double quotient doesn't
    val feats = Array.tabulate(8) { k =>
      val slice = sampled.drop(k).sliding(1, 8).flatten.toSeq
      if (slice.isEmpty) 0.0 else slice.sum / (255.0 * slice.size)
    }
    DecodedMedia(
      m.doc_id, m.media_type,
      byte_len = p.length,
      width = at(0), height = at(1),
      n_frames = sampled.length,
      features = feats)
  }

  /** Partition-parallel decode. `mapPartitions` keeps the batch shape an
    * external decode library wants (amortize per-batch init, e.g. codec
    * contexts) — the Scala analog of `mapInPandas` batches. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (codec context, model handle)
      rows.map(decodeOne)
    }
  }
}
