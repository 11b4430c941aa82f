package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.DedupOps

/** Property suite for the graph/pair operators: the distributed algorithms
  * must agree with trivially-correct driver-side reference implementations
  * on arbitrary random inputs — the strongest correctness evidence available
  * for operators whose production inputs are unbounded graphs.
  */
object GraphProps extends Properties("graft.graph") {

  // each case spins several Spark jobs (CC rounds); 10 random graphs is
  // plenty of coverage at sane runtime
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Reference union-find, path-halving, min-label roots. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    for ((a, b) <- pairs) {
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private val edgeGen: Gen[(Long, Long)] = for {
    a <- Gen.choose(0L, 40L)
    b <- Gen.choose(0L, 40L)
  } yield (a, b)

  property("connectedComponents equals driver-side union-find on random graphs") =
    forAll(Gen.listOfN(25, edgeGen)) { pairs =>
      val expected = unionFind(pairs.filter(p => p._1 != p._2))
      val got = DedupOps.connectedComponents(pairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }

  property("jaccardPairs (guard disabled) equals brute-force token-set jaccard") =
    forAll(Gen.listOfN(8, Gen.listOfN(5, Gen.choose(0, 12)))) { docsToks =>
      val docs = docsToks.zipWithIndex.map { case (ts, i) =>
        (i.toLong, ts.map(t => s"tok$t").mkString(" "))
      }
      val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }.toMap
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = sets(a).intersect(sets(b)).size
        j = inter.toDouble / sets(a).union(sets(b)).size if inter > 0
      } yield (a, b) -> BigDecimal(j)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
      val got = DedupOps.jaccardPairs(docs.toDF("doc_id", "text"),
          maxDf = Long.MaxValue, minJaccard = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      got == expected
    }

  /** Reference driver-side BFS: level-synchronous frontier over a map. */
  private def bfsRef(edges: Seq[(Long, Long)], source: Long,
      maxHops: Int): Map[Long, Int] = {
    val adj = edges.filter(e => e._1 != e._2).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = scala.collection.mutable.Map(source -> 0)
    var frontier = Seq(source)
    for (h <- 1 to maxHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      frontier.foreach(n => dist(n) = h)
    }
    dist.toMap
  }

  property("bfsHops equals driver-side BFS on random directed graphs") =
    forAll(Gen.listOfN(25, edgeGen), Gen.choose(1, 4)) { (pairs, maxHops) =>
      val expected = bfsRef(pairs, source = 0L, maxHops)
      val got = graft.ops.GraphOps
        .bfsHops(pairs.toDF("src", "dst"), source = 0L, maxHops)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      got == expected
    }
}
