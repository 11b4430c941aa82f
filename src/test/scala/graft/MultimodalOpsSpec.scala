package graft

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
}
