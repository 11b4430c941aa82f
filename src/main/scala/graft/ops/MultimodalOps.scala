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

  /** One sampled "video" frame. `frame` carries the payload slice; the
    * metadata columns are what the oracle compares. */
  case class Frame(doc_id: Long, frame_idx: Long, pts_ms: Long, frame_len: Int,
      frame: Array[Byte])

  /** DETERMINISTIC FAKE demux: fixed 256-byte frames at 25 fps (40 ms pts
    * step), sampled every `everyNth` starting at frame 0. A real deployment
    * swaps the byte slicing for a demuxer call; the Spark-side shape is the
    * part that matters — a lazy per-partition flatMap fan-out (one row in,
    * 0..n frame rows out, demuxer state initialized once per partition),
    * never a driver-side loop or a collected frame list. */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    media.mapPartitions { rows =>
      // per-partition setup would initialize a demuxer here, once
      rows.flatMap { r =>
        val n = r.media.length
        val nFrames = (n + 255) / 256
        Iterator.range(0, nFrames, everyNth).map { i =>
          val start = i * 256
          val len = math.min(256, n - start)
          Frame(r.doc_id, i.toLong, i * 40L, len,
            java.util.Arrays.copyOfRange(r.media, start, start + len))
        }
      }
    }
  }

  /** Per-frame content fingerprint for scene-cut detection. */
  case class FrameFp(doc_id: Long, frame_idx: Long, fp: Long)

  /** DETERMINISTIC FAKE content measure: the scaled mean byte value of the
    * frame payload — the integer analog of the mean-luminance signal real
    * scene-cut detectors difference frame-to-frame. A real deployment swaps
    * this for a decoded-histogram distance; the pipeline downstream (keyed
    * lag + boundary cumsum over the frame fan-out) is the part that
    * matters at scale and is exactly what ships either way. Integer
    * arithmetic ((Σ bytes)·1000 div len) keeps the fingerprint — and
    * therefore every scene boundary — engine- and order-exact. */
  def frameFingerprints(frames: Dataset[Frame]): Dataset[FrameFp] = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      var s = 0L
      var i = 0
      while (i < f.frame.length) { s += (f.frame(i) & 0xff); i += 1 }
      FrameFp(f.doc_id, f.frame_idx,
        if (f.frame.length == 0) 0L else s * 1000 / f.frame.length)
    }
  }

  /** One sliding audio window. `samples` carries the payload slice; the
    * metadata columns are what the oracle compares. */
  case class AudioChunk(doc_id: Long, chunk_idx: Long, start_ms: Long,
      win_samples: Int, samples: Array[Byte])

  /** DETERMINISTIC FAKE PCM framing: the payload read as 16-bit mono
    * @16 kHz (n_samples = bytes/2, 16 samples per ms), segmented into
    * SLIDING windows of `winSamples` every `hopSamples` (overlapping when
    * hop < win — the ASR featurization shape, distinct from the video
    * demux's disjoint frames). Last windows truncate at the payload end; a
    * window starting past the end is never emitted. Same scale contract as
    * [[sampleFrames]]: lazy per-partition flatMap, 1 row in → 0..n window
    * rows out, decoder state initializable once per partition. */
  def chunkAudio(media: Dataset[MediaRow], winSamples: Int,
      hopSamples: Int): Dataset[AudioChunk] = {
    import media.sparkSession.implicits._
    require(winSamples >= 1 && hopSamples >= 1,
      s"window/hop must be >= 1, got $winSamples/$hopSamples")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nSamples = r.media.length / 2
        val nChunks = (nSamples + hopSamples - 1) / hopSamples
        Iterator.range(0, nChunks).map { i =>
          val start = i * hopSamples
          val len = math.min(winSamples, nSamples - start)
          AudioChunk(r.doc_id, i.toLong, start.toLong / 16L, len,
            java.util.Arrays.copyOfRange(r.media, start * 2, (start + len) * 2))
        }
      }
    }
  }

  /** Per-chunk energy for VAD — same DETERMINISTIC FAKE contract as
    * [[frameFingerprints]]: the scaled mean byte of the window payload
    * stands in for RMS energy; integer arithmetic keeps every threshold
    * decision engine- and order-exact. */
  case class ChunkEnergy(doc_id: Long, chunk_idx: Long, start_ms: Long, energy: Long)

  def chunkEnergies(chunks: Dataset[AudioChunk]): Dataset[ChunkEnergy] = {
    import chunks.sparkSession.implicits._
    chunks.map { c =>
      var s = 0L
      var i = 0
      while (i < c.samples.length) { s += (c.samples(i) & 0xff); i += 1 }
      ChunkEnergy(c.doc_id, c.chunk_idx, c.start_ms,
        if (c.samples.length == 0) 0L else s * 1000 / c.samples.length)
    }
  }

  case class Resized(doc_id: Long, media: Array[Byte], width: Int, height: Int)

  /** DETERMINISTIC FAKE resize into a `maxDim` bounding box: dimensions
    * scale preserving aspect ratio; the "re-encoded" payload is the byte
    * prefix proportional to the pixel-count change (a stand-in for the
    * smaller encoded artifact). Media that already fit pass through
    * unchanged — byte-identical, no re-encode. */
  def resizeMedia(media: Dataset[MediaRow], maxDim: Int): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _, _) = decodeOne(r.media)
        val long = math.max(w, h)
        if (long <= maxDim) Resized(r.doc_id, r.media, w, h)
        else {
          val nw = math.max(1, w * maxDim / long)
          val nh = math.max(1, h * maxDim / long)
          val keep = math.max(1,
            (r.media.length.toLong * nw * nh / (w.toLong * h)).toInt)
          Resized(r.doc_id, java.util.Arrays.copyOfRange(r.media, 0, keep), nw, nh)
        }
      }
    }
  }
}
