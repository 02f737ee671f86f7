package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-salted equi-join (north rule: "skew salting on hot
  * triggers").
  *
  * When the build side is small, `broadcast()` defuses skew outright (the
  * engine's default for canonical-form and block→canonical maps). This
  * utility covers the remaining case: BOTH sides too large to broadcast
  * and the probe side skewed on a few hot keys. The skewed side gets a
  * random-but-deterministic salt in [0, S); the other side is replicated
  * S× with every salt; the join key becomes (key, salt), spreading each
  * hot key over S reducers.
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles most of
  * this at runtime; the explicit form exists for engines/configs where AQE
  * is off and as the documented, testable technique.
  */
object SkewJoin {

  /** Inner equi-join of `skewed` and `other` on `key`, salted S ways.
    * Deterministic: the salt is a hash of the skewed row's salt-source
    * columns, not a random number. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int, saltSource: Seq[String]): DataFrame = {
    val saltCol = pmod(hash(saltSource.map(col): _*), lit(salts))
    val left = skewed.withColumn("__salt", saltCol)
    val right = other.withColumn("__salt",
      explode(typedlit(Seq.range(0, salts))))
    left.join(right, Seq(key, "__salt")).drop("__salt")
  }
}
