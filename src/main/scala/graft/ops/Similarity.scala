package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k, expressed entirely in Catalyst
  * higher-order functions (`zip_with` for the dot product, `aggregate` for
  * the norms) — whole-stage-codegen'd, no UDF, so the scan+score is one
  * fused stage; the only shuffle is the top-k (a TakeOrderedAndProject,
  * not a full sort).
  *
  * Scale path: LSH-bucketed ANN — offline signature = sign bits of
  * `nPlanes` seeded random hyperplanes; a query probes its own bucket plus
  * all buckets at Hamming distance 1 (multi-probe), then brute-forces only
  * inside the probed buckets. Bucket assignment is one narrow map; the
  * probe is a semi-join on bucket id. At 10^12 rows the probed fraction is
  * 2^-nPlanes × (nPlanes+1), independent of corpus size.
  */
object Similarity {

  /** Cosine similarity between an embedding column and a literal query
    * vector, as a pure Catalyst expression tree. */
  def cosineToQuery(vec: Column, query: Seq[Float]): Column = {
    // accumulate in double (float*float would lose precision vs any
    // double-based oracle)
    val q = typedlit(query.map(_.toDouble))
    val dot = aggregate(zip_with(vec, q, (a, b) => a.cast("double") * b),
      lit(0.0d), (acc, x) => acc + x)
    val nv = sqrt(aggregate(transform(vec, a => a.cast("double") * a),
      lit(0.0d), (acc, x) => acc + x))
    val nq = math.sqrt(query.map(x => x.toDouble * x).sum)
    dot / (nv * lit(nq))
  }

  /** Brute-force top-k by cosine to a query vector. */
  def bruteForceTopK(embeddings: DataFrame, query: Seq[Float], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(idCol), cosineToQuery(col(vecCol), query).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 4).as("cos"))

  // ---- LSH-bucketed ANN ----

  /** Deterministic pseudo-random hyperplanes (seeded, dimension `dim`). */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat))
  }

  /** Sign-bit bucket id for each embedding row (narrow map, no shuffle). */
  def withBucket(embeddings: DataFrame, planes: Array[Array[Float]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(planes)
    embeddings.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val ps = bc.value
        it.map { case (id, v) =>
          (id, bucketOf(v.toArray, ps))
        }
      }.toDF(idCol, "bucket")
  }

  def bucketOf(v: Array[Float], planes: Array[Array[Float]]): Int = {
    var b = 0
    var i = 0
    while (i < planes.length) {
      var dot = 0.0
      val p = planes(i)
      var j = 0
      val n = math.min(p.length, v.length)
      while (j < n) { dot += p(j) * v(j); j += 1 }
      if (dot >= 0) b |= (1 << i)
      i += 1
    }
    b
  }

  /** ANN top-k: probe the query's bucket and all Hamming-1 neighbors, then
    * exact cosine inside the probed set. */
  def annTopK(embeddings: DataFrame, query: Seq[Float], k: Int,
      nPlanes: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dim = query.length
    val planes = hyperplanes(dim, nPlanes)
    val qb = bucketOf(query.toArray, planes)
    val probes = qb +: (0 until nPlanes).map(i => qb ^ (1 << i))
    val buckets = withBucket(embeddings, planes, idCol, vecCol)
    val probed = embeddings.join(
      buckets.filter(col("bucket").isin(probes: _*)).select(idCol), Seq(idCol),
      "left_semi")
    bruteForceTopK(probed, query, k, idCol, vecCol)
  }

  /** Embedding-cosine near-duplicate pairs (the 5th dedup strategy):
    * bucket by LSH signature, pair within bucket, verify cosine ≥
    * threshold. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
      nPlanes: Int = 6, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    val dim = embeddings.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(dim, nPlanes)
    val withB = embeddings.join(withBucket(embeddings, planes, idCol, vecCol),
      Seq(idCol))
    val l = withB.select(col("bucket"), col(idCol).as("a"), col(vecCol).as("va"))
    val r = withB.select(col("bucket"), col(idCol).as("b"), col(vecCol).as("vb"))
    val dot = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    def norm(c: Column) = sqrt(aggregate(transform(c, x => x * x),
      lit(0.0d), (acc, x) => acc + x))
    l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cos", dot / (norm(col("va")) * norm(col("vb"))))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 4).as("cos"))
      .distinct()
  }
}
