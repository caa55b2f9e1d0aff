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
}
