package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt-test / Deequ-style audit a
  * warehouse load runs before publishing: key uniqueness, referential
  * integrity, null discipline, range and accepted-value rules. Each
  * check is one aggregation over one table (map-side combinable; the
  * orphan check is one left join against the parent's distinct keys,
  * broadcastable when the parent is a dimension) returning the uniform
  * row (check, n_checked, n_violations, pass) — so a full audit is a
  * UNION of independent single-pass checks, each prunable to the
  * columns it reads, and the report is checks-sized however large the
  * tables are.
  */
object DataQuality {

  private def report(name: String, checked: Column, viol: Column)(
      df: DataFrame): DataFrame =
    df.agg(checked.as("n_checked"), viol.as("n_violations"))
      .select(lit(name).as("check_name"), col("n_checked"),
        col("n_violations"),
        (col("n_violations") === 0L).as("pass"))

  /** Duplicate-key volume: rows beyond the first per key value. */
  def unique(df: DataFrame, keyCol: String, name: String): DataFrame =
    report(name, count(lit(1)),
      count(col(keyCol)) - countDistinct(col(keyCol)))(df)

  /** Foreign-key orphans: child rows whose non-null `fkCol` has no
    * match in the parent's `pkCol` (null FKs are not orphans).
    */
  def orphans(
      child: DataFrame, fkCol: String, parent: DataFrame, pkCol: String,
      name: String
  ): DataFrame = {
    val p = parent.select(col(pkCol).as("_pk")).distinct()
    report(name, count(lit(1)),
      sum(when(col(fkCol).isNotNull && col("_pk").isNull, 1L)
        .otherwise(0L)))(
      child.select(col(fkCol)).join(p, col(fkCol) === col("_pk"), "left"))
  }

  /** Non-null values outside [lo, hi]. */
  def inRange(
      df: DataFrame, c: String, lo: Column, hi: Column, name: String
  ): DataFrame =
    report(name, count(lit(1)),
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)))(df)

  /** Non-null values outside the accepted set. */
  def accepted(
      df: DataFrame, c: String, values: Seq[String], name: String
  ): DataFrame =
    report(name, count(lit(1)),
      sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L)
        .otherwise(0L)))(df)

  /** Null discipline. */
  def notNull(df: DataFrame, c: String, name: String): DataFrame =
    report(name, count(lit(1)),
      sum(when(col(c).isNull, 1L).otherwise(0L)))(df)
}
