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
}
