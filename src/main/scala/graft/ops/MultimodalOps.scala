package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque `binary`
  * plus typed metadata, with decode/feature-extract as per-partition batch
  * transforms (the Scala analog of `mapInPandas` batches).
  *
  * The actual codec decode is STUBBED (no image/audio libraries in this
  * environment — marked DETERMINISTIC FAKE below); everything Spark-side is
  * real: schema, encoders, partition-batched processing, and the metadata
  * arithmetic (oracle-checked via `multimodal_meta`).
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, checksum: Long)

  /** Attach a binary media column (here: the utf-8 text bytes stand in for
    * image payloads) + mime metadata. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      lit("image/fake").as("mime"))

  /** DETERMINISTIC FAKE decode: derives "image" dimensions and a checksum
    * from the bytes alone. A real deployment swaps `decodeOne` for a codec
    * call; the partition-batched plumbing (one iterator pass per partition,
    * no per-row driver involvement, codec state reusable per partition) is
    * the part that matters at scale and is what the spec asserts. */
  def decodeOne(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
    (64 + n % 512, 64 + (n * 7) % 512, 3, sum)
  }

  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would initialize a codec here, once
      rows.map { r =>
        val (w, h, c, sum) = decodeOne(r.media)
        MediaFeatures(r.doc_id, r.media.length, w, h, c, sum)
      }
    }
  }
}
