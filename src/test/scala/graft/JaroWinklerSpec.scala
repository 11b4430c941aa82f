package graft

import org.apache.spark.sql.functions._

import graft.functions.{JaroWinkler, JaroWinklerKernel}
import org.apache.spark.unsafe.types.UTF8String

/** Native jaro_winkler expression: textbook values, DuckDB-convention
  * edges (empty → 0, integer-halved transpositions, 0.7 boost threshold,
  * ≤4-char prefix), codegen/kernel parity, SQL registration. The full
  * cross-engine check is the `text_jaro_winkler` oracle (462 blocked name
  * pairs vs DuckDB's independent implementation, 6 dp). */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook pairs match the published values") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
  }

  test("edges follow the DuckDB convention the oracle compares against") {
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0, "empties score 0, not 1")
    assert(jw("a", "a") == 1.0)
    assert(jw("ab", "ba") == 0.0, "window 0 finds no matches on a swap")
    // below the 0.7 boost threshold the shared prefix must NOT boost:
    // jaro(aXXXXX, aYYYYY) = 4/9 stays 4/9
    assert(jw("aXXXXX", "aYYYYY") == 4.0 / 9)
    // odd out-of-order count (unequal lengths): transpositions are halved
    // with integer division — 9 matches, 3 out of order, t = 1 not 1.5
    assert(jw("larg gear", "large gear") == {
      val j = (1.0 + 9.0 / 10 + 8.0 / 9) / 3; j + 0.1 * 4 * (1 - j)
    })
    // prefix boost caps at 4 chars even on long shared prefixes
    val j5 = jw("abcdeXY", "abcdeZW")
    val jaro = (5.0 / 7 + 5.0 / 7 + 1.0) / 3
    assert(j5 == jaro + 0.1 * 4 * (1 - jaro))
  }

  test("expression, SQL registration, and kernel agree; nulls propagate") {
    val df = Seq(("martha", "marhta"), ("small ring", "small rng"))
      .toDF("a", "b")
    val viaCol = df.select(JaroWinkler(col("a"), col("b"))).as[Double].collect()
    val viaSql = df.selectExpr("jaro_winkler(a, b)").as[Double].collect()
    val direct = Seq(jw("martha", "marhta"), jw("small ring", "small rng"))
    assert(viaCol.toSeq == direct && viaSql.toSeq == direct)
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("kernel invariants: symmetry, [0,1] bounds, identity, monotone prefix boost") {
    val names = Tables.part(spark, sfDir).select("p_name").distinct()
      .collect().map(_.getString(0))
    val pairs = for (a <- names.take(40); b <- names.take(40)) yield (a, b)
    pairs.foreach { case (a, b) =>
      val j = jw(a, b)
      assert(j >= 0.0 && j <= 1.0, s"out of bounds: $a|$b -> $j")
      assert(j == jw(b, a), s"asymmetric: $a|$b")
      if (a == b) assert(j == 1.0)
    }
  }

  test("whole-stage codegen path matches the interpreted kernel on real names") {
    val names = Tables.part(spark, sfDir).select(col("p_name")).limit(200)
    val a = names.select(col("p_name").as("na"))
    val b = names.select(col("p_name").as("nb"))
    val pairs = a.crossJoin(b).limit(5000)
    val viaPlan = pairs.select(col("na"), col("nb"),
      JaroWinkler(col("na"), col("nb")).as("j")).collect()
    viaPlan.foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    }
  }
}
