package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class CoOccurrenceSpec extends AnyFunSuite with SparkTestBase {

  test("itemSimilarity: exact cos2, min support, repeat-interaction dedup, degree cap") {
    import spark.implicits._
    val rows = Seq(
      // u1..u3 all touch A and B; u1 touches A twice (must dedup)
      ("u1", "A"), ("u1", "A"), ("u1", "B"),
      ("u2", "A"), ("u2", "B"),
      ("u3", "A"), ("u3", "B"), ("u3", "C"),
      // (B, C) co-occurs once — below minSupport 2
      // power user touches everything incl. the otherwise-unlinked D
      ("pw", "A"), ("pw", "B"), ("pw", "C"), ("pw", "D"), ("pw", "E")
    ).toDF("user", "item")
    val got = CoOccurrence.itemSimilarity(rows, "user", "item",
        minSupport = 2L, maxItemsPerUser = 4)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // power user dropped whole: c_A=3 c_B=3 c_C=1; only (A,B) survives
    assert(got.keySet == Set(("A", "B")), s"got ${got.keySet}")
    // cos² = 3²·10⁴/(3·3) = 10000 — a perfect co-occurrence
    assert(got(("A", "B")) == ((3L, 3L, 3L, 10000L)))
  }

  test("frequentTriples: A-Priori lattice — exact supports, subset " +
      "pruning, and candidate generation blocked by an infrequent pair") {
    import spark.implicits._
    // users 1-3 buy {10,20,30} (triple support 3); user 4 buys {10,20}
    // (pair (10,20) support 4); items 40/50 frequent alone but the pair
    // (40,50) has support 2 < 3, so no triple containing both can even
    // be a candidate; {10,20,40} reaches candidacy (all three pairs
    // frequent? (10,40): users 5,6 only = 2 — NOT frequent → pruned)
    val rows =
      Seq(1, 2, 3).flatMap(u => Seq((u.toLong, 10L), (u.toLong, 20L), (u.toLong, 30L))) ++
      Seq((4L, 10L), (4L, 20L)) ++
      Seq((5L, 40L), (5L, 50L), (6L, 40L), (6L, 50L), (7L, 40L), (8L, 50L))
    val inter = rows.toDF("user_id", "item")
    val got = CoOccurrence.frequentTriples(inter, "user_id", "item",
        minSupport = 3L, maxItemsPerUser = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    assert(got == Map((10L, 20L, 30L) -> 3L), s"got $got")
  }
}
