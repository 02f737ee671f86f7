package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-6 plan capture: writes `.explain("formatted")` for the named
  * queries to plans/r06/<query>_<suffix>.txt at the bench scale factor.
  * Usage: runMain graft.PlanDumpR06 <suffix> [query ...] (default: the
  * round-6 optimization-target list). */
object PlanDumpR06 {
  val DefaultTargets: Seq[String] = Seq(
    "kg_snapshot_delta", "kg_temporal_closure", "kg_pagerank",
    "kg_labelprop", "kg_triangles", "kg_kcore", "kg_edge_jaccard",
    "kg_truss", "kg_degree_dist", "kg_from_annotations", "kg_triples_by_pred",
    "q13_ngram_jaccard", "q32_dedup_clusters", "q11_minhash_neardups",
    "q74_prefix_jaccard", "q54_incremental_neardup", "q47_timeline_fit",
    "q26_embed_neardup_lsh", "q41_align_inject", "q52_bucketed_join")

  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultTargets
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        "/tmp/graft_warehouse/" + java.util.UUID.randomUUID().toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = Paths.get("plans/r06")
    Files.createDirectories(outDir)
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
        println(s"WROTE $n")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"FAILED $n: $e") }
    }
    spark.stop()
  }
}
