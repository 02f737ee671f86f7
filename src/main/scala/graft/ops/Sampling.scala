package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: membership is a
  * pure arithmetic function of the row key (affine hash mod a prime), so
  * the sample is identical under any partitioning, any cluster size, and
  * any execution order — the property `RAND()`-based sampling lacks — and
  * resampling with the same salt is stable across runs (incremental
  * pipelines re-derive the same subset). Pure Catalyst arithmetic: no
  * shuffle, no UDF, survives whole-stage codegen, and pushes down to the
  * scan as a filter.
  *
  * The hash is deliberately oracle-expressible (exact 64-bit arithmetic,
  * no overflow for keys < 2^31 given the 2654435761 multiplier), so the
  * driver's DuckDB gate verifies sampling decisions value-for-value.
  */
object Sampling {

  private val Mult = 2654435761L // Knuth's 2^32 golden-ratio multiplier
  private val Prime = 1000003L

  /** Uniform hash of the key into [0, 1000) (permille bucket). */
  def permilleBucket(key: Column, salt: Long = 0L): Column =
    pmod(pmod(key * lit(Mult) + lit(salt), lit(Prime)), lit(1000L))

  /** Keep rows whose key hashes into the first `permille` buckets —
    * a deterministic `permille`/1000 sample. */
  def hashSample(df: DataFrame, keyCol: String, permille: Int,
      salt: Long = 0L): DataFrame =
    df.filter(permilleBucket(col(keyCol), salt) < permille)

  /** Stratified deterministic sample: per-stratum permille rates (data
    * mixing — e.g. keep 10% of English, 50% of everything else). Strata
    * absent from the map use `defaultPermille`. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      permilleByStratum: Map[String, Int], defaultPermille: Int,
      salt: Long = 0L): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) =>
        when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(permilleBucket(col(keyCol), salt) < rate)
  }
}
