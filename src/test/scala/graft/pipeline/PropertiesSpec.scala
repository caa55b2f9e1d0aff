package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Property-style invariants the reference never states but its semantics
  * imply (SURVEY.md §5): dedup idempotence, merge commutativity,
  * prefix ⊇ exact containment.
  */
class PropertiesSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new scala.util.Random(1234)
  private def randomWords(n: Int): Seq[String] =
    Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)

  private def canonical(df: DataFrame): Seq[(String, String, String, Seq[String])] =
    df.select(graft.sql.functions.hexLower(col("hash")), col("preimage"),
        col("algorithm"), col("sources"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getSeq[String](3)))
      .toSeq.sorted(Ordering.by((t: (String, String, String, Seq[String])) => (t._1, t._3)))

  test("property: build(words ++ words) == build(words) — dedup idempotence") {
    import spark.implicits._
    val words = randomWords(200)
    val d1 = tmpDb(); val d2 = tmpDb()
    BuildJob.run(spark, words.toDS(), d1, BuildJob.Config(Seq("md5", "blake3")))
    BuildJob.run(spark, (words ++ words ++ words.reverse).toDS(), d2,
      BuildJob.Config(Seq("md5", "blake3")))
    assert(canonical(spark.read.parquet(d1)) == canonical(spark.read.parquet(d2)))
  }

  test("property: append order does not change the merged record set") {
    import spark.implicits._
    val a = randomWords(80)
    val b = randomWords(80) ++ a.take(20) // overlap
    val ab = tmpDb(); val ba = tmpDb()
    BuildJob.run(spark, a.toDS(), ab, BuildJob.Config(Seq("sha256"), sourceName = "A"))
    BuildJob.run(spark, b.toDS(), ab,
      BuildJob.Config(Seq("sha256"), sourceName = "B", append = true))
    BuildJob.run(spark, b.toDS(), ba, BuildJob.Config(Seq("sha256"), sourceName = "B"))
    BuildJob.run(spark, a.toDS(), ba,
      BuildJob.Config(Seq("sha256"), sourceName = "A", append = true))
    // sources are set-semantic (sorted), so both orders converge
    assert(canonical(spark.read.parquet(ab)) == canonical(spark.read.parquet(ba)))
  }

  test("property: prefix query results always contain the exact-match results") {
    import spark.implicits._
    val db = tmpDb()
    BuildJob.run(spark, randomWords(300).toDS(), db, BuildJob.Config(Seq("sha256")))
    val some = spark.read.parquet(db)
      .select(graft.sql.functions.hexLower(col("hash"))).as[String]
      .take(20)
    some.foreach { full =>
      val exact = QueryJob.run(spark, db, QueryJob.Params(full, limit = 1000))
        .select("preimage").as[String].collect().toSet
      (2 to 8 by 2).foreach { prefLen =>
        val prefix = QueryJob.run(spark, db,
            QueryJob.Params(full.take(prefLen), limit = 100000))
          .select("preimage").as[String].collect().toSet
        assert(exact.subsetOf(prefix), s"prefix ${full.take(prefLen)} ⊉ exact $full")
      }
    }
  }

  test("property: digest length and hex round-trip across the whole registry") {
    import spark.implicits._
    import graft.sql.functions._
    val words = randomWords(50).toDF("w")
    graft.core.Hashers.all.foreach { h =>
      val rows = words.select(digest(h.name, col("w")).as("b"),
        digestHex(h.name, col("w")).as("hx")).collect()
      rows.foreach { r =>
        val b = r.getAs[Array[Byte]](0)
        assert(b.length == h.digestLength)
        assert(graft.core.Hashers.hex(b) == r.getString(1))
      }
    }
  }

  private def tmpDb(): String =
    Files.createTempDirectory("graft-prop").toString + "/db"
}
