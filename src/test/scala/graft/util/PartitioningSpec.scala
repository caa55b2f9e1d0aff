package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class PartitioningSpec extends AnyFunSuite with SparkTestBase {

  test("fanOut spreads a single-split scan to the session parallelism") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val fanned = Partitioning.fanOut(docs)
    // AQE may coalesce the tiny fixture's shuffle at runtime; the contract
    // is that the repartition exists in the plan for the scheduler to use
    assert(fanned.queryExecution.optimizedPlan.toString.contains("Repartition"),
      fanned.queryExecution.optimizedPlan.toString)
  }

  test("fanOut leaves an already-parallel frame alone (no shuffle inserted)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism + 2)
    val out = Partitioning.fanOut(docs)
    assert(out eq docs, "fanOut must return the frame unchanged")
    // and therefore no extra Exchange in the plan
    assert(out.queryExecution.optimizedPlan.toString ==
      docs.queryExecution.optimizedPlan.toString)
  }
}
