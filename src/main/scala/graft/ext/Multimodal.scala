package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads travel as opaque `binary`
  * columns with typed metadata extracted by a per-partition batch decoder.
  *
  * The decode itself is imperative by nature (codec libraries), so this is
  * the one place the engine deliberately leaves Catalyst: a typed
  * `mapPartitions` whose iterator shape lets a real implementation batch
  * frames into a native decoder. The decoder here is a clearly-marked
  * deterministic STUB (this container ships no image/audio codecs); the
  * Spark-side plumbing — binary column, schema, encoders, partition-batch
  * signature — is real and is what the 100 TB path needs: decode
  * parallelism = partition count, no driver involvement, columnar binary
  * at rest.
  */
object Multimodal {

  /** Typed media-metadata row produced by the decoder. */
  case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  /** STUB decoder: derives fake-but-deterministic media properties from an
    * md5 of the payload. A real build swaps `decodeBatch` for a codec call
    * with the identical signature; nothing upstream or downstream changes.
    */
  def decodeBatch(payloads: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    val md = MessageDigest.getInstance("MD5") // one instance per partition batch
    payloads.map { case (id, bytes) =>
      md.reset()
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val hv = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      MediaMeta(
        doc_id = id,
        n_bytes = bytes.length,
        width = (32 * (1 + hv % 8)).toInt,
        height = (32 * (1 + (hv / 8) % 8)).toInt,
        n_frames = (1 + hv % 16).toInt)
    }
  }

  /** Attach a binary payload column (here: utf-8 text bytes standing in
    * for image/audio payloads) and run the partition-batched decoder.
    */
  def extractMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
  }
}
