package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.{DedupOps, ParseOps}

/** SURVEY.md §5.2.3 property-based suite (raw ScalaCheck — sbt runs
  * Properties natively). Each property evaluates a whole generated batch in
  * ONE Spark job to keep runtime sane.
  */
object ParseProps extends Properties("graft.parse") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val salaryCase: Gen[(Int, Int, Boolean)] = for {
    lo <- Gen.choose(1, 50000)
    delta <- Gen.choose(0, 30000)
    hourly <- Gen.oneOf(true, false)
  } yield (lo, lo + delta, hourly)

  property("salary ranges round-trip; hourly scales by 160; min <= max") =
    forAll(Gen.listOfN(25, salaryCase)) { cases =>
      val texts = cases.map { case (lo, hi, hourly) =>
        if (hourly) s"$lo-$hi zł/h" else s"$lo–$hi zł"
      }
      val (mn, mx) = ParseOps.salaryParse(col("t"))
      val got = texts.toDF("t").select(mn, mx).collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      got.toSeq == cases.map { case (lo, hi, hourly) =>
        if (hourly) (lo * 160, hi * 160) else (lo, hi)
      } && got.forall { case (a, b) => a <= b }
    }

  property("truncation output length bounded and is a prefix") =
    forAll(Gen.listOfN(25, Gen.alphaNumStr.map(_.take(60)))) { strs =>
      val out = strs.toDF("s")
        .select(col("s"), ParseOps.truncateVarchar(col("s"), 20).as("t"))
        .collect()
      out.forall(r => r.getString(1).length <= 20 &&
        r.getString(0).startsWith(r.getString(1)))
    }

  property("dedup idempotence: dropDuplicates∘dropDuplicates = dropDuplicates") =
    forAll(Gen.listOfN(30, Gen.choose(1L, 8L))) { keys =>
      val df = keys.map(k => (k, s"v$k")).toDF("k", "v")
      val once = df.dropDuplicates("k").count()
      val twice = df.dropDuplicates("k").dropDuplicates("k").count()
      once == twice && once == keys.distinct.size
    }

  property("minhash estimate is 1.0 for identical docs, bounded in [0,1]") =
    forAll(Gen.listOfN(6, Gen.choose(0, 30)), Gen.choose(2L, 5L)) { (tokIds, n) =>
      val text = tokIds.map(i => s"tok$i").mkString(" ") + " tail one two"
      val docs = (1L to n).map(i => (i, text)).toDF("doc_id", "text")
      val pairs = DedupOps.minhashPairs(docs, 16, 4).collect()
      pairs.length == (n * (n - 1) / 2) &&
        pairs.forall(r => r.getDouble(2) == 1.0)
    }

  property("native minhash_sig ≡ the plain-Scala splitmix64 ref, incl. empty arrays") =
    forAll(Gen.listOfN(10,
      Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)))) { hashLists =>
      val df = hashLists.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }
        .toDF("id", "hashes")
      val rows = df.select(col("hashes"),
        DedupOps.minhashSignature(col("hashes"), 16).as("native")).collect()
      rows.forall { r =>
        r.getAs[scala.collection.Seq[Long]](1) ==
          DedupOps.minhashSignatureRef(r.getAs[scala.collection.Seq[Long]](0).toSeq, 16)
      }
    }

  property("int8 quantization: codes in [-127,127], reconstruction within scale/2") =
    forAll(Gen.listOfN(8,
      Gen.listOfN(12, Gen.choose(-1e3f, 1e3f).suchThat(f => !f.isNaN)))) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val rows = graft.ops.VectorOps.quantize(df)
        .select(col("embedding"), col("q_scale"), col("q_vec")).collect()
      rows.forall { r =>
        val emb = r.getAs[scala.collection.Seq[Float]](0)
        val s = r.getDouble(1)
        val q = r.getAs[scala.collection.Seq[Long]](2)
        q.forall(c => c >= -127 && c <= 127) &&
          emb.zip(q).forall { case (v, c) =>
            math.abs(v.toDouble - c * s) <= s / 2 + 1e-9
          }
      }
    }
}
