package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** winnow_mins must equal the HOF formulation it replaced in doc_winnowing
  * — property-fuzzed (the deque sliding-min is the kind of code an
  * off-by-one silently breaks). */
object WinnowMinsSpec extends Properties("graft.winnow_mins") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(40)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def hofRef(g: Seq[Long], w: Int): Seq[Long] = {
    val mins =
      if (g.size >= w) (0 to g.size - w).map(j => g.slice(j, j + w).min)
      else g
    mins.distinct
  }

  private def native(g: Seq[Long], w: Int): Seq[Long] =
    Seq(Tuple1(g)).toDF("g")
      .select(graft.functions.WinnowMins(col("g"), w))
      .collect().head.getSeq[Long](0).toSeq

  property("native ≡ array_distinct(window mins) on arbitrary arrays") =
    forAll(Gen.chooseNum(0, 30).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L)))) { g =>
      native(g, 4) == hofRef(g, 4)
    }

  property("duplicate-heavy / monotone shapes") = {
    Seq(
      Seq.fill(20)(7L),
      (1L to 20L).toSeq,
      (1L to 20L).reverse.toSeq,
      Seq(5L, 5L, 1L, 5L, 5L, 1L, 5L),
      Seq.empty[Long]
    ).forall(g => native(g, 4) == hofRef(g, 4))
  }

  property("extreme magnitudes (Long.Min/Max boundaries)") =
    forAll(Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n,
        Gen.oneOf(Gen.const(Long.MinValue), Gen.const(Long.MaxValue),
          Gen.chooseNum(Long.MinValue + 1, Long.MaxValue - 1))))) { g =>
      native(g, 4) == hofRef(g, 4)
    }

  property("null array element fails loudly (never a silent 0-hash)") = {
    val df = Seq(Tuple1(Seq[java.lang.Long](1L, null, 3L, 4L, 5L)))
      .toDF("g")
    val t = scala.util.Try(
      df.select(graft.functions.WinnowMins(col("g"), 2)).collect())
    t.isFailure && {
      var c: Throwable = t.failed.get
      while (c.getCause != null && !c.getMessage.contains("winnow_mins"))
        c = c.getCause
      c.getMessage.contains("null array element")
    }
  }
}
