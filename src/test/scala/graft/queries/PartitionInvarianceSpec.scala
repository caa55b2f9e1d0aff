package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Distributed-correctness property: query results must be identical
  * regardless of shuffle parallelism — the invariance that lets the same
  * plan run on local[4] and a 1000-executor cluster. Exercised on the
  * queries with the most shuffle stages.
  */
class PartitionInvarianceSpec extends AnyFunSuite with SparkTestBase {

  private val probes = Seq(
    "q_dedup_minhash_lsh", "q_hashdb_merge_sources", "q_events_sessions",
    "q5_snowflake_join", "q_sim_topk_bruteforce",
    // round-3 additions with their own shuffle/checkpoint structure
    "q_dedup_incremental", "q_text_cms_topk", "q_sim_rp_topk",
    // multi-join funnel and vocabulary-join tf-idf
    "q_events_funnel", "q_text_tfidf",
    // checkpointed iteration, grid+ffill window, inverted-index verify
    "q_text_textrank", "q_events_resample", "q_dedup_containment",
    // round-5 second batch: bloom bit-set build + broadcast probe fold,
    // per-key cumulative cusum windows, two-stage rerank windows, the
    // quantized doremi driver loop, and the first-fail attrition funnel
    "q_dedup_bloom_screen", "q_events_cusum", "q_text_rerank",
    "q_text_doremi_mix", "q_pipeline_attrition")

  private def results(name: String): Seq[String] =
    Registry.all(name).build(spark, sf()).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("results are invariant under shuffle partition count (1, 7, 32)") {
    val original = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val runs = Seq("1", "7", "32").map { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        n -> probes.map(q => q -> results(q)).toMap
      }
      val baseline = runs.head._2
      runs.tail.foreach { case (n, byQuery) =>
        probes.foreach { q =>
          assert(byQuery(q) == baseline(q),
            s"$q differs between partitions=1 and partitions=$n")
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", original)
  }
}
