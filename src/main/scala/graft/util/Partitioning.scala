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
}
