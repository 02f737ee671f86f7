package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.corpus.Synth
import graft.kg.{Pipeline, Triples}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full KG pipeline over the deterministic synthetic source-file corpus,
    * triples counted by predicate. */
  def entry(spark: SparkSession): DataFrame = {
    val (nFiles, spf) = Synth.sizeForSfDir("/root/testdata/sf0.001")
    val files = Synth.corpus(spark, nFiles, spf)
    Triples.fromFiles(spark, files)
      .groupBy(col("pred")).agg(count(lit(1)).as("n"))
      .orderBy(col("pred"))
  }

  private def corpusFor(spark: SparkSession, dir: String) = {
    val (nFiles, spf) = Synth.sizeForSfDir(dir)
    Synth.corpus(spark, nFiles, spf)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- KG pipeline (not SQL-expressible; rows-only checks; golden
    //      P/R coverage lives in the ScalaTest suite) ----
    "kg_triples_by_pred" -> ((s, dir) =>
      Triples.fromFiles(s, corpusFor(s, dir))
        .groupBy(col("pred")).agg(count(lit(1)).as("n")).orderBy("pred")),
    "kg_events_by_type" -> ((s, dir) => {
      val ann = Pipeline.annotate(s, corpusFor(s, dir))
      ann.events.groupBy(col("eventType")).agg(count(lit(1)).as("n"))
        .orderBy("eventType")
    }),
    "kg_relations_by_label" -> ((s, dir) => {
      val ann = Pipeline.annotate(s, corpusFor(s, dir))
      ann.relations.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .orderBy("label")
    }),

    // ---- relational operators with DuckDB oracles ----
    "q1_agg" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity"))).cast("long").as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
        |  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sum_price_cents,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
