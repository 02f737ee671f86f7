package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.corpus.Synth
import graft.kg.Triples

/** Two-parallelism scaling evidence for the north rule: the SAME KG job on
  * the SAME deterministic input at local[N] and local[4N] (the sandbox
  * proxy for N vs 4N executors, per the driver instruction), reporting
  * throughput at both and efficiency = thr(4N) / (4 × thr(N)). Appends the
  * measured table to BENCH/BASELINE.md.
  *
  * Usage: runMain graft.Scaling [nFiles] [sentsPerFile] [nLow]
  */
object Scaling {

  case class Run(cores: Int, sec: Double, triples: Long, sentences: Long) {
    def triplesPerSec: Double = triples / sec
    def sentencesPerSec: Double = sentences / sec
  }

  def runOnce(cores: Int, nFiles: Long, spf: Int): Run = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val files = Synth.corpus(spark, nFiles, spf)
      // warm-up: JIT + codegen caches, tiny slice (excluded from timing)
      Triples.fromFiles(spark, Synth.corpus(spark, 8, 2)).count()
      val nSentences = nFiles * spf
      val t0 = System.nanoTime()
      val nTriples = Triples.fromFiles(spark, files).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Run(cores, sec, nTriples, nSentences)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.lift(0).map(_.toLong).getOrElse(6000L)
    val spf = args.lift(1).map(_.toInt).getOrElse(8)
    val nLow = args.lift(2).map(_.toInt).getOrElse(8)
    val low = runOnce(nLow, nFiles, spf)
    val high = runOnce(nLow * 4, nFiles, spf)
    val eff = high.triplesPerSec / (4.0 * low.triplesPerSec)
    val json =
      s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio","low_cores":${low.cores},"high_cores":${high.cores},"low_sec":${low.sec},"high_sec":${high.sec},"triples":${low.triples},"low_triples_per_sec":${low.triplesPerSec},"high_triples_per_sec":${high.triplesPerSec},"n_files":$nFiles,"sents_per_file":$spf}"""
    println(json)
    val md =
      s"""
         |## Measured scaling (graft.Scaling, ${java.time.LocalDate.now()})
         |
         |Same job (KG pipeline → triple count), same deterministic input
         |($nFiles files × $spf sentences, ${low.triples} triples), one JVM per run:
         |
         || cores | wall (s) | triples/sec | sentences/sec |
         ||---|---|---|---|
         || local[${low.cores}] | ${f"${low.sec}%.1f"} | ${f"${low.triplesPerSec}%.0f"} | ${f"${low.sentencesPerSec}%.0f"} |
         || local[${high.cores}] | ${f"${high.sec}%.1f"} | ${f"${high.triplesPerSec}%.0f"} | ${f"${high.sentencesPerSec}%.0f"} |
         |
         |**Scaling efficiency (N→4N) = ${f"$eff%.3f"}** (target ≥ 0.8; perfect = 1.0).
         |""".stripMargin
    val out = Paths.get("BENCH")
    Files.createDirectories(out)
    val f = out.resolve("BASELINE.md")
    val existing = if (Files.exists(f)) Files.readString(f) else
      "# BENCH/BASELINE.md — measured engine numbers\n"
    Files.writeString(f, existing + md)
  }
}
