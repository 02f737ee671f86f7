package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at 100-TB scale.
  *
  * Z-ORDER CLUSTERING — the OPTIMIZE ZORDER analog of the table-format
  * world: interleave the bits of two bucketed dimensions into one
  * Morton code so that sorting/bucketing by the single z-value keeps
  * BOTH dimensions locally tight, letting min/max file statistics prune
  * scans on either predicate. Everything here is pure integer
  * expression math (shift / and / or — whole-stage-codegen built-ins,
  * no UDF, no shuffle for the assignment itself), so the full layout
  * carries an exact DuckDB hash oracle: the same magic-number bit
  * spreads re-derived with `<<`/`&`/`|` on BIGINT.
  *
  * Scale shape: z-value and file-bucket assignment are per-row
  * projections (zero exchanges — at cluster scale this runs inside the
  * write path's existing partitioning); the demo aggregate that proves
  * the pruning property (per-bucket min/max of each dimension) is one
  * partial-aggregated hash shuffle on the bucket id. By construction a
  * bucket formed from the top `2*prefixBits` z-bits spans at most
  * `2^(dimBits - prefixBits)` distinct values in EACH dimension — the
  * per-bucket spans in the output are the file-skipping bound a
  * format's column stats would expose.
  */
object Layout {

  /** Spread the low 16 bits of `v` so bit i lands at bit 2i (the
    * standard mask-ladder Morton spread; exact in Long arithmetic). */
  def spreadBits16(v: Column): Column = {
    val s1 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two dim values already reduced to `dimBits` bits
    * each: x on even bit positions, y on odd. */
  def zValue(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Z-order layout of the events table over (user bucket, hour
    * bucket) — the realistic pruning pair: point/range predicates on
    * user AND on event time both benefit from one clustering.
    *
    * Dimensions: xb = pmod(user_id, 2^dimBits); yb = hour index of the
    * event timestamp mod 2^dimBits (tsu integer microseconds, UTC —
    * the same epoch_us integer DuckDB computes). File bucket = top
    * 2*prefixBits bits of the z-value → 2^(2*prefixBits) buckets, each
    * covering a 2^(dimBits-prefixBits)-wide rectangle in BOTH dims.
    *
    * Output (one row per bucket): n_rows, min/max of each dim, and the
    * spans — the oracle re-derives every integer, and a spec asserts
    * the rectangle bound span <= 2^(dimBits-prefixBits) - 1. */
  def zOrderLayout(events: DataFrame, dimBits: Int = 10,
                   prefixBits: Int = 5): DataFrame = {
    require(dimBits > 0 && dimBits <= 16, "dimBits must be in 1..16")
    require(prefixBits > 0 && prefixBits <= dimBits,
      "prefixBits must be in 1..dimBits")
    val dimMod = 1L << dimBits
    val shift = 2 * (dimBits - prefixBits)
    val zed = events
      .select(
        pmod(col("user_id"), lit(dimMod)).as("xb"),
        // exact integer floor-division (SQL `div`), the same semantics
        // as DuckDB's `//` on BIGINT — no double rounding anywhere
        pmod(expr("unix_micros(cast(ts as timestamp)) div 3600000000"),
          lit(dimMod)).as("yb"))
      .withColumn("z", zValue(col("xb"), col("yb")))
      .withColumn("file_bucket", shiftright(col("z"), shift))
    zed.groupBy(col("file_bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("xb")).as("x_min"), max(col("xb")).as("x_max"),
        min(col("yb")).as("y_min"), max(col("yb")).as("y_max"))
      .withColumn("x_span", col("x_max") - col("x_min"))
      .withColumn("y_span", col("y_max") - col("y_min"))
  }
}
