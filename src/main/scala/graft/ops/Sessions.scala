package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over an event stream — the classic gap-based window
  * analytic (and the batch twin of Structured Streaming's session
  * windows): a new session opens where the gap to the previous event of
  * the same user exceeds `gapUs`.
  *
  * Scale shape: everything is per-user — one hash shuffle on user_id,
  * then lag / running-sum windows INSIDE each partition's groups (no
  * global window, no single-task stage; the same partitioning serves
  * both window passes and the final aggregate, so Catalyst plans one
  * Exchange). Timestamps compare at exact microsecond precision
  * (unix_micros here, epoch_us in the DuckDB oracle — integer math, so
  * the session layout carries a full hash oracle); ordering ties break
  * on event_id, making session assignment deterministic. */
object Sessions {

  def sessionize(events: DataFrame, gapUs: Long = 30L * 60 * 1000000):
      DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    events
      .select(col("user_id"), col("event_id"),
        // the events table stores TIMESTAMP_NTZ; the session TZ is UTC,
        // so the cast reads the naive value as UTC — the same instant
        // DuckDB's epoch_us(ts) computes
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .withColumn("prev", lag(col("tsu"), 1).over(byUser))
      .withColumn("newsess",
        when(col("prev").isNull || col("tsu") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("newsess")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tsu")).as("start_us"),
        max(col("tsu")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
