package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis._

// temporary probe — deleted before commit
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.util.Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("ref_toks", slice(col("toks"), 1, 40))
      .withColumn("cand_toks",
        transform(sequence(lit(1), least(size(col("toks")), lit(36))),
          i => when(pmod(i, lit(9)) === 0, lit("the"))
            .otherwise(element_at(col("toks"), i))))
      .select(col("doc_id"), col("cand_toks"), col("ref_toks"))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"PROBE $tag ${(System.nanoTime - t0) / 1e9}%.2f n=$n")
    }
    time("materialize-pairs")(docs.count())
    val p2 = docs.localCheckpoint(true)
    time("gram-cand-only") {
      val toks = p2.select(col("doc_id").as("_id"), col("cand_toks").as("_ct"))
      (1 to 4).map { n =>
        toks.select(col("_id"), lit(n).as("_n"),
          explode(when(size(col("_ct")) >= n,
            transform(sequence(lit(1), size(col("_ct")) - (n - 1)),
              i => array_join(slice(col("_ct"), i, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))).as("_g"))
      }.reduce(_ unionAll _).groupBy("_id", "_n", "_g")
        .agg(count(lit(1))).count()
    }
    val toks1 = p2.select(col("doc_id").as("_id"), col("cand_toks").as("_ct"))
      .localCheckpoint(true)
    time("gram-slice-4orders") {
      (1 to 4).map { n =>
        toks1.select(col("_id"), lit(n).as("_n"),
          explode(when(size(col("_ct")) >= n,
            transform(sequence(lit(1), size(col("_ct")) - (n - 1)),
              i => array_join(slice(col("_ct"), i, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))).as("_g"))
      }.reduce(_ unionAll _).groupBy("_id", "_n", "_g")
        .agg(count(lit(1))).count()
    }
    time("gram-concat-4orders") {
      (1 to 4).map { n =>
        toks1.select(col("_id"), lit(n).as("_n"),
          explode(when(size(col("_ct")) >= n,
            transform(sequence(lit(1), size(col("_ct")) - (n - 1)),
              i => concat_ws(" ",
                (0 until n).map(o => element_at(col("_ct"), i + o)): _*)))
            .otherwise(array().cast("array<string>"))).as("_g"))
      }.reduce(_ unionAll _).groupBy("_id", "_n", "_g")
        .agg(count(lit(1))).count()
    }
    time("gram-order1-only") {
      toks1.select(col("_id"), explode(col("_ct")).as("_g"))
        .groupBy("_id", "_g").agg(count(lit(1))).count()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    time("noop-full-1")(noop(graft.ops.TextAnalysis.bleu(docs, "doc_id")))
    time("noop-full-2")(noop(graft.ops.TextAnalysis.bleu(docs, "doc_id")))
    val st = graft.ops.TextAnalysis.bleu(docs, "doc_id")
    time("noop-full-3")(noop(st))
    time("noop-no-logged")(noop(graft.ops.TextAnalysis.bleu(docs, "doc_id").drop("bleu_log2_fp")))
  }
}
