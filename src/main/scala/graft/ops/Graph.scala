package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as DataFrame loops — the distributed
  * power-method family (PageRank/TextRank centrality).
  *
  * Scale shape: one equi-join (edges × ranks on the source key) plus one
  * grouped aggregation (contributions by destination) per iteration —
  * the classic Pregel-as-joins formulation. The rank frame is
  * `localCheckpoint`ed every round so lineage (and Catalyst re-analysis
  * cost) stays flat regardless of iteration count, the same discipline
  * as the dedup cluster propagation and BPE training loops. Edges are
  * the big side and stream through a hash join keyed on `u`; ranks are
  * vertex-sized. Iteration count is fixed (power method converges
  * geometrically — 4-10 rounds is the standard working range).
  *
  * Engine-replayability: the per-vertex contribution sum folds in a
  * PINNED order (sort by source vertex, then left-fold in double from
  * 0.0) via `aggregate(sort_array(collect_list(...)))` — bit-equal to a
  * SQL `list_reduce(list(c ORDER BY u), (a,b) -> a+b)`, which is what
  * lets the DuckDB oracle replay the whole training loop exactly (the
  * k-means IVF / BPE trick). A plain `sum()` would leave float
  * accumulation order to each engine's aggregation tree.
  */
object Graph {

  /** Weighted PageRank over `edges` (columns `u`, `v`, `w`: directed
    * u→v with positive weight). Returns (tok, r) after `iters` rounds of
    *   r'(v) = (1 - damping) + damping · Σ_u r(u) · w(u,v) / W(u)
    * with W(u) the total out-weight of u, starting from r ≡ 1. Vertices
    * are the edge endpoints that have in-edges (an undirected graph —
    * edges present in both directions — keeps every vertex).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val outW = edges.groupBy("u").agg(sum(col("w")).as("wu"))
    val withShare = edges.join(outW, "u")
      .select(col("u"), col("v"), col("w"), col("wu"))
      .localCheckpoint(true)
    var ranks = edges.select(col("u").as("tok")).distinct()
      .withColumn("r", lit(1.0))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      ranks = withShare
        .join(ranks, withShare("u") === ranks("tok"))
        .select(col("v"),
          struct(col("u"), (col("r") * col("w") / col("wu")).as("c")).as("uc"))
        .groupBy("v")
        .agg(aggregate(sort_array(collect_list(col("uc"))), lit(0.0),
          (acc, x) => acc + x.getField("c")).as("s"))
        .select(col("v").as("tok"),
          (lit(1.0 - damping) + lit(damping) * col("s")).as("r"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** TextRank keyword scoring: PageRank over the corpus's word-adjacency
    * graph (undirected — each adjacent-token pair contributes an edge in
    * both directions, weighted by corpus co-occurrence count). The graph
    * is vocabulary-sized regardless of corpus size: one corpus-stream
    * bigram aggregation builds it, then the iteration cost is independent
    * of the data volume. High-rank words are central to the corpus's
    * co-occurrence structure — a corpus-level keyword signal that, unlike
    * raw frequency, rewards connectivity over repetition. Self-edges
    * (a token adjacent to itself — "la la la") are dropped, as in the
    * published algorithm: a self-loop feeds rank back to its source and
    * lets pure repetition impersonate centrality.
    */
  def textRank(docs: DataFrame, iters: Int = 4, damping: Double = 0.85): DataFrame = {
    // aggregate to corpus level BEFORE mirroring: the undirected doubling
    // then only touches the vocabulary-sized pair table, not the per-doc
    // gram stream
    val pairs = TextAnalysis.ngramCounts(docs, 2)
      .groupBy("gram").agg(sum(col("c")).as("w"))
      .select(split(col("gram"), " ").as("uv"), col("w"))
      .select(element_at(col("uv"), 1).as("a"),
        element_at(col("uv"), 2).as("b"), col("w"))
      .filter(col("a") =!= col("b"))
    val edges = pairs.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionByName(pairs.select(col("b").as("u"), col("a").as("v"), col("w")))
      .groupBy("u", "v").agg(sum(col("w")).as("w"))
    pageRank(edges, iters, damping)
  }
}
