package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SessionizeSpec extends AnyFunSuite with SparkTestBase {

  private val GapUs = 1800L * 1000000L // 30 minutes

  test("batch sessionization matches the lag()-window formulation row for row") {
    val events = graft.util.Tables.events(spark, sf())
    // reference formulation: session id = running count of gap-breaks
    val byUser = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val expected = events
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ns").isNull ||
          col("ts_ns") - col("prev_ns") > 1800L * 1000000000L, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(
        expr("min(ts_ns) DIV 1000").as("session_start_us"),
        expr("max(ts_ns) DIV 1000").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = Sessionize.batchSessions(events, GapUs)
      .collect()
      .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events))
      .toSet
    assert(got.nonEmpty)
    assert(got == expected,
      s"missing ${expected -- got} / extra ${got -- expected}")
  }

  test("streaming: open session flushes on event-time timeout at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = Sessionize.sessionSummaries(
      input.toDF().toDF("user_id", "ts", "value")
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), col("ts"), col("value"))
        .as[Sessionize.Event],
      GapUs, trailing = false)
    val query = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // two quick events for user 1 = one session; nothing emitted yet
      input.addData((1L, t("2024-01-01 10:00:00"), 1.0),
        (1L, t("2024-01-01 10:05:00"), 2.0))
      query.processAllAvailable()
      assert(spark.table("sess_out").count() == 0)
      // an event far past the gap advances the watermark beyond
      // (10:05 + 30 min) -> user 1's open session must flush; the new
      // event opens user 2's session, which stays open
      input.addData((2L, t("2024-01-01 12:00:00"), 5.0))
      query.processAllAvailable()
      // watermark advances at the END of the batch; one more batch lets
      // the timeout fire
      input.addData((2L, t("2024-01-01 12:01:00"), 1.0))
      query.processAllAvailable()
      val rows = spark.table("sess_out")
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
      assert(rows.toSeq == Seq((1L, 2L, 3.0)),
        s"got ${rows.toSeq}")
    } finally query.stop()
  }
}
