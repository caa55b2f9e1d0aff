package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy audits for data release — the checks a corpus/telemetry
  * export runs AFTER PII scrubbing (`TextClean`), which removes
  * direct identifiers but not linkage risk: quasi-identifier (QI)
  * combinations that map to few subjects re-identify them by join with
  * any outside dataset (Sweeney's k-anonymity; Machanavajjhala's
  * l-diversity for the sensitive-attribute variant).
  *
  * Scale shape: one groupBy on the QI columns with map-side partials;
  * `count_distinct` over subjects/sensitive values is the only
  * expensive aggregate and Spark plans it as the standard two-phase
  * partial-distinct expand. Output is QI-domain-sized (the product of
  * generalized attribute cardinalities — small by construction: a QI
  * scheme with corpus-sized output is already failing the audit).
  * No joins, no windows; corpus growth only widens the first pass.
  */
object Privacy {

  /** Per distinct QI combination: row volume, distinct subjects,
    * distinct sensitive values, and the verdicts — `at_risk` when fewer
    * than `k` subjects share the combination (k-anonymity), `low_div`
    * when fewer than `l` sensitive values do (l-diversity: a uniform
    * sensitive value leaks it even when k holds).
    */
  def kAnonymity(
      df: DataFrame, qiCols: Seq[String], subjectCol: String,
      sensitiveCol: String, k: Int = 5, l: Int = 2
  ): DataFrame = {
    require(qiCols.nonEmpty && k >= 2 && l >= 1)
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(subjectCol)).as("n_subjects"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("at_risk", col("n_subjects") < k)
      .withColumn("low_div", col("n_sensitive") < l)
  }
}
