package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Implemented as the union+window composition rather than a range join:
  * tag both sides, union, sort within key by (time, side-tag), and carry
  * the last right-side row forward with `last(ignoreNulls)`. One shuffle
  * on the key (the same partitioning both inputs would need anyway), no
  * range-condition join explosion, and the carried state is one row per
  * key stream — the standard scalable formulation.
  *
  * Right rows at exactly the same timestamp match (<= semantics, like SQL
  * ASOF JOIN); the oracle checks against DuckDB's native ASOF JOIN — an
  * independent implementation of the same semantics.
  */
object AsOf {

  /** For each left row, attach the most recent right row (by `timeCol`,
    * <=) with the same `keyCol`, as a struct column `asof` (null when no
    * prior right row exists).
    */
  def join(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String
  ): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == timeCol)
    val payloadType = StructType(
      right.schema.fields.filterNot(f => f.name == keyCol || f.name == timeCol))
    val leftCols = left.columns

    val lSide = left
      .withColumn("_side", lit(1))
      .withColumn("_rstruct", lit(null).cast(payloadType))
    val rSide = right
      .select(
        leftCols.map { c =>
          if (c == keyCol || c == timeCol) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)
        } :+ lit(0).as("_side") :+
          struct(rightPayload.map(col): _*).cast(payloadType).as("_rstruct"): _*)

    // right rows (side 0) sort before left rows (side 1) at equal time →
    // an exactly-simultaneous right row is visible to the left row (<=)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.select((leftCols.map(col) :+ col("_side") :+ col("_rstruct")): _*)
      .unionByName(rSide)
      .withColumn("asof", last(col("_rstruct"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rstruct")
  }
}
