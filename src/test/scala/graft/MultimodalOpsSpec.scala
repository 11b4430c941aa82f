package graft

import org.apache.spark.sql.functions.{col, lit}

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.{MediaFeatures, MediaRow}

/** N4: binary media plumbing — schema, encoders, partition-batched decode. */
class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asMedia produces binary payload + mime metadata") {
    val m = MultimodalOps.asMedia(Tables.documents(spark, sfDir).limit(10))
    val row = m.head()
    assert(row.getAs[Array[Byte]]("media").nonEmpty)
    assert(row.getAs[String]("mime") == "image/fake")
    assert(m.schema("media").dataType.typeName == "binary")
  }

  test("extractFeatures is a distributed per-partition pass with stable output") {
    val media = MultimodalOps.asMedia(Tables.documents(spark, sfDir))
      .as[MediaRow].repartition(4)
    val f1 = MultimodalOps.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = MultimodalOps.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.length == 500)
    assert(f1.sameElements(f2), "decode must be deterministic across runs/partitionings")
    f1.foreach { f: MediaFeatures =>
      assert(f.width == 64 + f.n_bytes % 512)
      assert(f.height == 64 + (f.n_bytes * 7) % 512)
      assert(f.channels == 3)
    }
  }

  test("decode stub checksum depends on content, not just length") {
    val a = MultimodalOps.decodeOne("abcd".getBytes)
    val b = MultimodalOps.decodeOne("abce".getBytes)
    assert(a._4 != b._4 && a._1 == b._1)
  }

  test("frame sampling at every-1 losslessly reassembles the payload") {
    val media = MultimodalOps.asMedia(Tables.documents(spark, sfDir).limit(20))
      .as[MediaRow].repartition(3)
    val byDoc = MultimodalOps.sampleFrames(media, 1).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    val originals = media.collect().map(m => m.doc_id -> m.media).toMap
    // empty payloads yield zero frames; all testdata docs are non-empty
    assert(byDoc.keySet == originals.filter(_._2.nonEmpty).keySet)
    byDoc.foreach { case (id, frames) =>
      assert(frames.map(_.frame_idx).toSeq == frames.indices.map(_.toLong))
      assert(frames.map(_.pts_ms).toSeq == frames.indices.map(_ * 40L))
      assert(frames.flatMap(_.frame).toSeq == originals(id).toSeq,
        s"doc $id: concatenated frames must equal the original bytes")
      assert(frames.init.forall(_.frame_len == 256) &&
        frames.last.frame_len == ((originals(id).length - 1) % 256) + 1)
    }
  }

  test("every-3rd sampling keeps exactly the 0,3,6,... frames") {
    val media = MultimodalOps.asMedia(Tables.documents(spark, sfDir).limit(20))
      .as[MediaRow]
    val all = MultimodalOps.sampleFrames(media, 1).collect()
    val sampled = MultimodalOps.sampleFrames(media, 3).collect()
    val expect = all.filter(_.frame_idx % 3 == 0)
      .map(f => (f.doc_id, f.frame_idx, f.frame_len)).sorted.toSeq
    assert(sampled.map(f => (f.doc_id, f.frame_idx, f.frame_len)).sorted.toSeq == expect)
  }

  test("audio chunks: overlapping windows tile the payload; slices match their metadata") {
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        lit("audio/fake").as("mime")).as[MediaRow]
    val bytes = media.collect().map(m => m.doc_id -> m.media).toMap
    val chunks = MultimodalOps.chunkAudio(media, 64, 48).collect()
      .groupBy(_.doc_id)
    assert(chunks.keySet == bytes.keySet)
    chunks.foreach { case (id, cs) =>
      val nSamples = bytes(id).length / 2
      val sorted = cs.sortBy(_.chunk_idx)
      assert(sorted.map(_.chunk_idx).toSeq == (0L until sorted.length.toLong))
      sorted.foreach { c =>
        val start = c.chunk_idx.toInt * 48
        assert(c.win_samples == math.min(64, nSamples - start))
        assert(c.samples.length == c.win_samples * 2, "slice length != metadata")
        assert(c.start_ms == c.chunk_idx * 3)
        // the slice IS the payload bytes at its offset
        assert(java.util.Arrays.equals(c.samples,
          java.util.Arrays.copyOfRange(bytes(id), start * 2,
            start * 2 + c.win_samples * 2)))
      }
      // consecutive windows overlap by win - hop = 16 samples
      assert(sorted.size == (nSamples + 47) / 48)
    }
  }

  test("resize bounds the long edge, keeps aspect order, passes small media through") {
    val media = MultimodalOps.asMedia(Tables.documents(spark, sfDir))
      .as[MediaRow]
    val dims = media.collect().map(m => m.doc_id -> MultimodalOps.decodeOne(m.media)).toMap
    val out = MultimodalOps.resizeMedia(media, 128).collect()
    assert(out.length == dims.size)
    out.foreach { r =>
      val (w, h, _, _) = dims(r.doc_id)
      if (math.max(w, h) <= 128) {
        assert(r.width == w && r.height == h, "small media must pass through")
      } else {
        assert(math.max(r.width, r.height) <= 128)
        assert((w >= h) == (r.width >= r.height), "aspect order must survive")
        assert(r.media.length >= 1)
      }
    }
    // deterministic across runs
    val again = MultimodalOps.resizeMedia(media, 128).collect()
    assert(out.map(r => (r.doc_id, r.width, r.height, r.media.toSeq)).sortBy(_._1).toSeq ==
      again.map(r => (r.doc_id, r.width, r.height, r.media.toSeq)).sortBy(_._1).toSeq)
  }

  test("frameFingerprints: scaled mean byte value, exact per frame") {
    val media = Seq(MediaRow(7L, Array.fill[Byte](300)(65), "video/fake"))
      .toDS()
    val fps = MultimodalOps
      .frameFingerprints(MultimodalOps.sampleFrames(media, 1))
      .collect().sortBy(_.frame_idx)
    // frame 0: 256 bytes of 'A' (65) -> 65*256*1000/256 = 65000
    // frame 1: 44 bytes of 'A'       -> 65*44*1000/44   = 65000
    assert(fps.map(f => (f.frame_idx, f.fp)).toSeq == Seq((0L, 65000L), (1L, 65000L)))
  }

  test("multimodal_video_scenes: scenes tile each doc's frames exactly") {
    val rows = Queries.byName("multimodal_video_scenes").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      // scene indexes are contiguous from 0, first scene starts at pts 0
      assert(sorted.map(_._2).toSeq == (0L until sorted.length.toLong))
      assert(sorted.head._4 == 0L, s"doc $doc first scene must start at 0 ms")
      // scene frame counts sum to the doc's total frame count
      val nFrames = sorted.map(_._3).sum
      val starts = sorted.map(_._4 / 40)
      // each scene starts exactly where the previous one's frames end
      assert(starts.toSeq == sorted.map(_._3).scanLeft(0L)(_ + _).init.toSeq,
        s"doc $doc scenes must tile without gaps")
      assert(nFrames > 0)
    }
  }
}
