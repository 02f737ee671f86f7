package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CosineSimilarity, RollingFingerprint}

/** The SQL function surface: GraftExtensions (the
  * `spark.sql.extensions` path a cluster user configures) and
  * GraftFunctions.register (the existing-session path), both resolving
  * the NATIVE Expressions — SQL results must be bit-identical to the
  * Column API. */
class ExtensionsSpec extends AnyFunSuite {

  private val sentence = "The Quick  Brown fox\tjumps over the lazy dog"

  test("spark.sql.extensions config registers the functions in a fresh session") {
    val base = TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s2 ne base, "getOrCreate must build a NEW session for extensions to apply")
      val fp = s2.sql(
        s"SELECT rolling_fingerprint('$sentence', 32) AS fp").head.getLong(0)
      assert(fp == RollingFingerprint.fingerprint(sentence, 32))
      // default window == RollingFingerprint.DefaultWindow
      val fpDefault = s2.sql(
        s"SELECT rolling_fingerprint('$sentence') AS fp").head.getLong(0)
      assert(fpDefault == fp)
      val cos = s2.sql(
        """SELECT cosine_similarity(cast(array(1.0, 2.0, 3.0) as array<float>),
          |                         cast(array(3.0, 2.0, 1.0) as array<float>)) AS c
          |""".stripMargin).head.getDouble(0)
      assert(math.abs(cos - 10.0 / 14.0) < 1e-12)

      // injected optimizer rule: lower/trim under the fingerprint are
      // elided (the internal normalization subsumes them) — plan-level
      // AND value-level check. range()-backed so ConvertToLocalRelation
      // can't fold the projection away before we can inspect it.
      s2.range(3)
        .selectExpr("id", "concat('  MiXeD Case\\ttext ', id, 'x  ') AS text")
        .createOrReplaceTempView("ext_norm")
      val wrapped = s2.sql(
        "SELECT id, rolling_fingerprint(lower(trim(text)), 32) AS fp FROM ext_norm")
      val opt = wrapped.queryExecution.optimizedPlan.toString
      assert(opt.contains("rolling_fingerprint"), s"projection folded away:\n$opt")
      assert(!opt.contains("lower("), s"lower not elided:\n$opt")
      assert(!opt.contains("trim("), s"trim not elided:\n$opt")
      val plain = s2.sql(
        "SELECT id, rolling_fingerprint(text, 32) AS fp FROM ext_norm")
      assert(wrapped.orderBy("id").collect().toSeq ==
        plain.orderBy("id").collect().toSeq)
      // a trim with an explicit trim-char set is NOT elided
      val kept = s2.sql(
        "SELECT rolling_fingerprint(trim('x' FROM text), 32) AS fp FROM ext_norm")
        .queryExecution.optimizedPlan.toString
      assert(kept.contains("trim("), s"explicit-char trim must survive:\n$kept")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("register() on an existing session; SQL == Column API over a frame") {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    import s.implicits._
    val docs = Seq((0L, sentence), (1L, ""), (2L, "short"),
      (3L, sentence + " with a tail appended beyond the window"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = s.sql(
      "SELECT doc_id, rolling_fingerprint(text, 32) AS fp FROM ext_docs ORDER BY doc_id")
      .collect().toSeq
    val viaCol = graft.ops.TextAnalysis.withFingerprint(docs)
      .select($"doc_id", $"fingerprint".as("fp")).orderBy("doc_id")
      .collect().toSeq
    assert(viaSql == viaCol)

    val vecs = Seq((0L, Array(1f, 0f, 2f), Array(2f, 1f, 0f)),
      (1L, Array(0.5f, -1f, 3f), Array(0.5f, -1f, 3f)))
      .toDF("id", "a", "b")
    vecs.createOrReplaceTempView("ext_vecs")
    val sqlCos = s.sql("SELECT cosine_similarity(a, b) AS c FROM ext_vecs ORDER BY id")
      .collect().map(_.getDouble(0)).toSeq
    val colCos = vecs.orderBy("id")
      .select(CosineSimilarity.cosine_similarity($"a", $"b")).collect()
      .map(_.getDouble(0)).toSeq
    assert(sqlCos == colCos)
    assert(math.abs(sqlCos(1) - 1.0) < 1e-15)
  }

  test("bad arity / non-literal window fail analysis loudly") {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    intercept[Exception] {
      s.sql("SELECT cosine_similarity(cast(array(1.0) as array<float>))").collect()
    }
    intercept[Exception] {
      s.sql("SELECT rolling_fingerprint('x', 'not-an-int-literal')").collect()
    }
  }
}
