package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Layout, Stats}

/** Round-5 closing additions: CUBE grouping sets, Z-order layout, and
  * the HLL++ error-band contract. Every expectation is hand-computed —
  * the bit spreads on paper, the cube lattice cell by cell — the same
  * integer math the DuckDB oracles re-derive at scale. */
class StatsLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Morton bit spread / z-value ----

  test("spreadBits16: hand-computed spreads (bit i -> bit 2i)") {
    val out = Seq(0L, 1L, 3L, 5L, 33L, 0xFFFFL).toDF("v")
      .select(Layout.spreadBits16(col("v")).as("s"))
      .as[Long].collect().toSeq
    // 0 -> 0; 1 -> 1; 0b11 -> 0b101 = 5; 0b101 -> 0b10001 = 17;
    // 0b100001 -> 0b10000000001 = 1025; 16 ones -> 0x55555555
    assert(out == Seq(0L, 1L, 5L, 17L, 1025L, 0x55555555L))
  }

  test("zValue: x on even bits, y on odd bits") {
    val out = Seq((3L, 1L), (0L, 3L), (1023L, 0L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // (3,1): 0101 | 0010 = 7; (0,3): spread(3)<<1 = 1010 = 10;
    // (1023,0): spread(0x3FF) = 0b01010101010101010101 = 349525
    assert(out == Seq(7L, 10L, 349525L))
  }

  // ---- Z-order layout ----

  test("zOrderLayout: 64x64 grid packs into exactly 4 buckets of 1024, " +
       "every bucket a tight 32x32 rectangle") {
    val rows = for { u <- 0 until 64; h <- 0 until 64 }
      yield (u.toLong, h.toLong)
    val events = rows.toDF("user_id", "h")
      .withColumn("ts", timestamp_seconds(col("h") * 3600L))
    val out = Layout.zOrderLayout(events)
      .orderBy("file_bucket")
      .select("file_bucket", "n_rows", "x_min", "x_max", "y_min",
        "y_max", "x_span", "y_span")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // top 5 bits of each 10-bit dim -> 32-wide blocks; 64 values = 2
    // blocks per dim -> 2x2 = 4 buckets x 1024 rows, spans exactly 31.
    // Bucket ids: z >> 10 of (xblock, yblock) = zValue(xb5, yb5) over
    // the top bits -> (0,0)=0, (1,0)=1, (0,1)=2, (1,1)=3.
    assert(out == Seq(
      (0L, 1024L, 0L, 31L, 0L, 31L, 31L, 31L),
      (1L, 1024L, 32L, 63L, 0L, 31L, 31L, 31L),
      (2L, 1024L, 0L, 31L, 32L, 63L, 31L, 31L),
      (3L, 1024L, 32L, 63L, 32L, 63L, 31L, 31L)))
  }

  test("zOrderLayout: single row at the origin lands in bucket 0") {
    val events = Seq((0L, 0L)).toDF("user_id", "h")
      .withColumn("ts", timestamp_seconds(col("h")))
    val out = Layout.zOrderLayout(events)
      .select("file_bucket", "n_rows").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L)))
  }

  // ---- CUBE ----

  test("cubeDocStats: full 2^2 lattice, hand-computed cells") {
    val docs = Seq(
      (1L, "en", "web", 10L),
      (2L, "en", "book", 20L),
      (3L, "fr", "web", 30L)
    ).toDF("doc_id", "lang", "source", "n_chars")
    val out = Stats.cubeDocStats(docs)
      .orderBy("gid", "lang", "source")
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, "en", "book", 1L, 20L, 20L),
      (0L, "en", "web", 1L, 10L, 10L),
      (0L, "fr", "web", 1L, 30L, 30L),
      (1L, "en", "ALL", 2L, 30L, 20L),
      (1L, "fr", "ALL", 1L, 30L, 30L),
      (2L, "ALL", "book", 1L, 20L, 20L),
      (2L, "ALL", "web", 2L, 40L, 30L),
      (3L, "ALL", "ALL", 3L, 60L, 30L)))
  }

  test("cubeDocStats plan: one Expand, no more than one data exchange") {
    val docs = Seq((1L, "en", "web", 10L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val plan = Stats.cubeDocStats(docs).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"cube must plan Expand:\n$plan")
  }

  // ---- sketch contract ----

  test("sketchDistinctAudit: exact counts, in-band flag on small groups") {
    val events = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 1L), ("b", 1L)
    ).toDF("event_type", "user_id")
    val out = Stats.sketchDistinctAudit(events)
      .orderBy("event_type")
      .as[(String, Long, Long)].collect().toSeq
    // sparse-mode HLL++ is exact at these cardinalities -> flag 1
    assert(out == Seq(("a", 3L, 1L), ("b", 1L, 1L)))
  }

  test("sketchDistinctAudit: 5000 distinct keys stay inside the 10% band") {
    val events = spark.range(5000L)
      .select(lit("t").as("event_type"), col("id").as("user_id"))
    val out = Stats.sketchDistinctAudit(events)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("t", 5000L, 1L)))
  }
}
