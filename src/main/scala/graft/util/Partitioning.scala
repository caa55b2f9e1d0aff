package graft.util

import org.apache.spark.sql.DataFrame

/** Partitioning helpers shared by the shingle/explode pipelines. */
object Partitioning {

  /** Fan `df` out to the cluster's parallelism ONLY when the scan has
    * fewer splits than there are slots. The small-fixture case (one
    * parquet file → one task) must spread before a ~50× explode into
    * hash-heavy consumers; a production corpus already split into
    * thousands of files must NOT pay a full shuffle of every row just to
    * reshuffle what is already parallel — at 100 TB that shuffle would
    * dwarf the work it enables. Inspecting the scan's partition count
    * costs plan analysis only (file listing), no job.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition() else df
  }

  /** Mark `df` as a corpus-scaled "index side" of an equi-join —
    * vocabulary tables, per-doc count tables, bucket-occupancy tables,
    * the gram frame itself — forcing a PARTITIONED (shuffled-hash)
    * join instead of leaving the strategy to Catalyst's estimate.
    *
    * Why the estimate cannot be trusted here: these frames descend from
    * an explode (`Generate`), and the size-only estimator carries the
    * CHILD's sizeInBytes through Generate unchanged, then scales it
    * DOWN by the narrow projection's row-width ratio — a 25M-row gram
    * frame plans as "3.5 MB". The static planner then build-broadcasts
    * the corpus-sized side (measured on the char-minhash growth curve
    * at 40×: 1.5 GB and 2.9 GB hash relations on an 8 GB heap —
    * broadcast-build OOM; at cluster scale, an executor OOM on every
    * near-dup job). AQE cannot repair it: the build side is a cached
    * frame with no shuffle boundary, so runtime stats never replace
    * the estimate. Every table marked with this helper scales WITH the
    * corpus (vocabulary, docs, buckets), so at 100 TB a broadcast is
    * wrong regardless of what any estimator says — the hint encodes
    * that invariant, and costs only a bounded per-partition hash build
    * (partitions sized by spark.sql.shuffle.partitions; AQE skew-split
    * applies to shuffled-hash joins too). SHUFFLE_HASH over MERGE:
    * same partitioned shape, no sort of the gram stream.
    */
  def indexSide(df: DataFrame): DataFrame = df.hint("shuffle_hash")

  /** Per-op join-side policy, anchored to the corpus scan's FILE bytes —
    * the one size signal in these pipelines that can be trusted. When
    * the corpus is provably small (every plan leaf is a file-source
    * relation and their summed estimate — actual file bytes — is ≤
    * `graft.indexSide.maxBroadcastCorpusBytes`, default 32 MB), the
    * gram/vocab/count frames it generates are broadcast-buildable by
    * construction (grams ≈ 3–5× corpus bytes, HashedRelation ≈ 3× that,
    * decompression ≤ ~5×) and Catalyst's choices are left alone — at
    * test/interactive scale a forced shuffle would just tax every small
    * job. In every other case the index sides are hinted partitioned
    * ([[indexSide]]): past the bound a broadcast of a corpus-derived
    * side is wrong regardless of what any estimator says, and a
    * NON-file-backed corpus (range-generated, localCheckpoint'ed,
    * in-memory) gets no trust at all — its estimate uses default
    * per-type column widths (strings count as 20 bytes no matter how
    * long), which measured 5–50× low on exactly the synthetic and
    * checkpointed-intermediate corpora where the broadcast OOM was
    * reproduced. Reading the anchor costs plan analysis only, no job.
    */
  def indexSideFor(corpus: DataFrame): DataFrame => DataFrame = {
    val bound = corpus.sparkSession.conf
      .get("graft.indexSide.maxBroadcastCorpusBytes", (32L << 20).toString)
      .toLong
    val leaves = corpus.queryExecution.optimizedPlan.collectLeaves()
    val allFileBacked = leaves.nonEmpty && leaves.forall {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.isInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      case _ => false
    }
    if (allFileBacked &&
        leaves.map(_.stats.sizeInBytes).sum <= bound) identity
    else indexSide
  }
}
