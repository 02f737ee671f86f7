package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table commit: the cluster mechanism for SHUFFLE-FREE repeated
  * equi-joins and aggregations on a stable key.
  *
  * At 100 TB a fact table (the triple store, lineitem-shaped logs) is
  * written ONCE bucketed+sorted by its join key — that write pays the only
  * shuffle. Every subsequent join between tables bucketed on the same key
  * with compatible bucket counts, and every groupBy on (a superset of) the
  * key, reads the on-disk hash partitioning instead of exchanging: the
  * scan IS the shuffle, amortized across all downstream queries. This is
  * the warehouse-backed analog of the Store's stage commit (the engine's
  * checkpointed parquet snapshots) — same immutability contract, plus a
  * partitioning the planner can PROVE and reuse.
  *
  * Exchange-freedom is pinned at plan level in BucketedSpec;
  * q52_bucketed_join value-checks the full write→join→agg path against a
  * plain DuckDB join.
  */
object Bucketed {

  /** Commit `df` as a parquet table bucketed and sorted by `key`.
    *
    * The input is repartitioned to the bucket hash FIRST
    * (`repartition(buckets, key)` uses the same murmur3 HashPartitioning
    * as the bucketed-table layout): without it every input task writes
    * one file per bucket it happens to hold — task-count × bucket-count
    * small files per commit, paid again at every bucketed scan (guide
    * §6). With it each task holds exactly one bucket → `buckets` files.
    * The shuffle this costs is the standard price of write clustering
    * (the Iceberg `write.distribution-mode=hash` tradeoff); table
    * CONTENT is unchanged. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
}
