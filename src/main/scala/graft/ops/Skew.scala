package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew tooling for hot-key joins and aggregations. AQE's skew
  * handling covers sort-merge joins at runtime; these are for the cases
  * planners can't fix — e.g. one key holding 10% of a 100 TB fact table,
  * or partial-aggregate trees that still funnel one key to one reducer.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side scatters each key across
    * `salt` sub-keys; the small side replicates each row `salt` times.
    * Hot keys then occupy `salt` reducers instead of one. Semantics are
    * identical to `big.join(small, key)` for inner joins.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // deterministic scatter: spread by row identity, not rand(), so runs
    // are reproducible
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)))
    val smallSalted = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    bigSalted.join(smallSalted, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate per
    * (key, salt) first, then merge per key. `partials` maps column names
    * to mergeable partial aggregates (sum/count/min/max style).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    df.withColumn("_salt",
        pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"), sum("_n").as("n_rows"))
  }
}
