package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class DataQualitySpec extends AnyFunSuite with SparkTestBase {

  test("checks count violations exactly; null FKs are not orphans") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(
      (Some(1L), 5.0, "A"), (Some(2L), 55.0, "B"),
      (Some(9L), 7.0, "Z"),            // orphan fk, out-of-set flag
      (None, -1.0, "A")                // null fk → NOT an orphan; range viol
    ).toDF("fk", "v", "flag")
    def one(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      (r.getLong(1), r.getLong(2), r.getBoolean(3))
    }
    assert(one(DataQuality.orphans(child, "fk", parent, "pk", "fk")) ==
      ((4L, 1L, false)))
    assert(one(DataQuality.inRange(child, "v", lit(0.0), lit(50.0), "r")) ==
      ((4L, 2L, false)))
    assert(one(DataQuality.accepted(child, "flag", Seq("A", "B"), "a")) ==
      ((4L, 1L, false)))
    assert(one(DataQuality.notNull(child, "fk", "n")) == ((4L, 1L, false)))
    assert(one(DataQuality.unique(child.select(col("flag")), "flag", "u")) ==
      ((4L, 1L, false)))  // "A" appears twice → one surplus row
    assert(one(DataQuality.unique(parent, "pk", "u2")) == ((2L, 0L, true)))
  }
}
