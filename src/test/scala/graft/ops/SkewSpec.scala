package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("salted join equals plain inner join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one key — the classic hot-key shape
    val big = ((1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))).toDF("key", "v")
    val small = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "weight")

    val plain = big.join(small, "key")
      .agg(sum(col("v") * col("weight")), count(lit(1))).head()
    val salted = Skew.saltedJoin(big, small, "key", salt = 8)
      .agg(sum(col("v") * col("weight")), count(lit(1))).head()
    assert(plain == salted)
  }

  test("salted two-phase sum equals direct groupBy sum") {
    import spark.implicits._
    val df = ((1 to 5000).map(_ => "hot") ++ (1 to 500).map(i => s"k${i % 7}"))
      .zipWithIndex.map { case (k, i) => (k, i.toDouble % 97) }.toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSum(df, "key", "v", salt = 16)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n)
      assert(math.abs(salted(k)._1 - s) < 1e-6)
    }
  }

  test("salted join scatters the hot key across reducers") {
    import spark.implicits._
    val big = (1 to 10000).map(i => ("hot", i)).toDF("key", "v")
    val small = Seq(("hot", 1)).toDF("key", "w")
    val parts = Skew.saltedJoin(big, small, "key", salt = 8)
      .withColumn("p", spark_partition_id())
      .select("p").distinct().count()
    assert(parts > 1, "hot key should span multiple partitions after salting")
  }
}
