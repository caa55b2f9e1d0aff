package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-item co-occurrence similarity — the counting core of
  * neighborhood collaborative filtering ("users who touched i also
  * touched j"): distinct (user, item) interactions, within-user item
  * pairs, and a squared-cosine score kept EXACT by squaring instead of
  * rooting — cos²(i,j)·10⁴ = c_ij²·10⁴ / (c_i·c_j) ranks identically
  * to cosine (both sides nonnegative) with zero transcendental calls,
  * so any engine replays every score bit-for-bit.
  *
  * Scale shape: one distinct on (user, item) — map-side combinable;
  * the pair generator is a self-equi-join on user, whose fan-out is
  * items-per-user² — bounded by `maxItemsPerUser` (power users are
  * dropped whole, the standard CF guard: a user touching everything
  * relates nothing). Pair rows then collapse into an item²-bounded
  * table (the item vocabulary is small by assumption — catalog-sized,
  * not corpus-sized), and the count join-backs are broadcasts of that
  * same small table. Corpus growth widens only the first distinct.
  */
object CoOccurrence {

  /** Similar-item pairs (i < j) with support counts and exact
    * squared-cosine basis points: (i, j, c_i, c_j, c_ij, cos2_bp).
    * `minSupport` prunes coincidence pairs; `maxItemsPerUser` bounds
    * the per-user pair fan-out.
    */
  def itemSimilarity(
      interactions: DataFrame, userCol: String, itemCol: String,
      minSupport: Long = 3L, maxItemsPerUser: Int = 64
  ): DataFrame = {
    val ui = interactions.select(col(userCol).as("u"), col(itemCol).as("it"))
      .distinct()
    val eligible = ui.groupBy("u").agg(count(lit(1)).as("_deg"))
      .filter(col("_deg") <= maxItemsPerUser)
      .select("u")
    val kept = ui.join(eligible, "u")
    val itemCounts = kept.groupBy(col("it")).agg(count(lit(1)).as("c"))
    val pairs = kept.select(col("u"), col("it").as("i"))
      .join(kept.select(col("u"), col("it").as("j")), "u")
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("c_ij"))
      .filter(col("c_ij") >= minSupport)
    pairs
      .join(broadcast(itemCounts.select(col("it").as("i"), col("c").as("c_i"))), "i")
      .join(broadcast(itemCounts.select(col("it").as("j"), col("c").as("c_j"))), "j")
      .withColumn("cos2_bp", expr("c_ij * c_ij * 10000 div (c_i * c_j)"))
      .select("i", "j", "c_i", "c_j", "c_ij", "cos2_bp")
  }

  /** Frequent 3-itemsets by A-Priori candidate pruning (Agrawal &
    * Srikant 1994): L1 = items with support ≥ minSupport; baskets
    * restrict to L1; L2 = within-basket pairs with support ≥
    * minSupport; candidate triples come from the classic
    * F₂ ⋈ F₂ prefix join — (a,b) and (a,c) with b < c, kept only when
    * (b,c) is itself frequent (every subset of a frequent set is
    * frequent — the pruning that makes the lattice walk tractable);
    * then ONE exact counting pass over the restricted baskets.
    *
    * Scale shape: the anti-monotone pruning is the whole story — the
    * candidate table is bounded by frequent-pair structure, never
    * |items|³, and the counting join fans out per candidate only into
    * the users that contain its first item. All equi-joins on item/user
    * keys; the degree cap bounds per-user pair enumeration exactly as
    * in [[itemSimilarity]].
    *
    * The effective threshold is max(minSupport, ⌊baskets ·
    * relPerMille/1000⌋) — RELATIVE support is the standard formulation
    * (a fixed absolute count stops pruning as data grows: at 10× the
    * baskets every random pair clears it and the lattice walk
    * degenerates toward |items|³). The basket count rides a broadcast
    * 1-row aggregate so both engines compute the identical threshold.
    *
    * Out: (a, b, c, c_abc), a < b < c, support ≥ threshold.
    */
  def frequentTriples(
      interactions: DataFrame, userCol: String, itemCol: String,
      minSupport: Long = 3L, maxItemsPerUser: Int = 64,
      relPerMille: Long = 0L
  ): DataFrame = {
    val ui = interactions.select(col(userCol).as("u"), col(itemCol).as("it"))
      .distinct()
    val eligible = ui.groupBy("u").agg(count(lit(1)).as("_deg"))
      .filter(col("_deg") <= maxItemsPerUser)
      .select("u")
    val basket0 = graft.util.AutoUnpersist.persistScoped(
      ui.join(eligible, "u"))
    val thr = broadcast(basket0.agg(countDistinct("u").as("_nb"))
      .select(greatest(lit(minSupport),
        expr(s"_nb * $relPerMille div 1000")).as("_thr")))
    val l1 = basket0.groupBy("it").agg(count(lit(1)).as("c"))
      .crossJoin(thr)
      .filter(col("c") >= col("_thr"))
      .select("it")
    val kept = graft.util.AutoUnpersist.persistScoped(
      basket0.join(broadcast(l1), "it"))
    val l2 = graft.util.AutoUnpersist.persistScoped(
      kept.select(col("u"), col("it").as("i"))
        .join(kept.select(col("u"), col("it").as("j")), "u")
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("c_ij"))
        .crossJoin(thr)
        .filter(col("c_ij") >= col("_thr"))
        .select("i", "j"))
    val cand = l2.select(col("i").as("a"), col("j").as("b"))
      .join(l2.select(col("i").as("a"), col("j").as("c")), "a")
      .filter(col("b") < col("c"))
      .join(l2.select(col("i").as("b"), col("j").as("c")), Seq("b", "c"))
      .select("a", "b", "c")
    cand
      .join(kept.select(col("it").as("a"), col("u")), "a")
      .join(kept.select(col("it").as("b"), col("u")), Seq("b", "u"))
      .join(kept.select(col("it").as("c"), col("u")), Seq("c", "u"))
      .groupBy("a", "b", "c").agg(count(lit(1)).as("c_abc"))
      .crossJoin(thr)
      .filter(col("c_abc") >= col("_thr"))
      .select("a", "b", "c", "c_abc")
  }
}
