package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class AsOfSpec extends AnyFunSuite with SparkTestBase {

  test("as-of join picks the latest right row at or before each left time") {
    import spark.implicits._
    val quotes = Seq( // key, time, price
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "t", "price")
    val trades = Seq(
      ("A", 5L, 100L), // before any quote → null
      ("A", 20L, 101L), // exactly simultaneous → matches the 20L quote (<=)
      ("A", 25L, 102L), // between → 20L quote
      ("A", 99L, 103L), // after all → 30L quote
      ("B", 16L, 104L), // other key
      ("C", 50L, 105L) // key with no right rows → null
    ).toDF("sym", "t", "trade_id")

    val out = AsOf.join(trades, quotes, "sym", "t")
      .select($"trade_id", $"asof.price")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      100L -> None, 101L -> Some(2.0), 102L -> Some(2.0),
      103L -> Some(3.0), 104L -> Some(9.0), 105L -> None))
  }

  test("as-of join output keeps exactly the left rows") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i % 5, i.toLong, i)).toDF("k", "t", "id")
    val right = Seq((0, 50L, "x"), (1, 10L, "y")).toDF("k", "t", "v")
    val out = AsOf.join(left, right, "k", "t")
    assert(out.count() == 100)
    assert(out.columns.toSet == Set("k", "t", "id", "asof"))
  }
}
