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
}
