package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the large (skewed) side gets a
  * deterministic salt derived from its other columns, the small side
  * is replicated across all `salts` partitions, and the join key
  * becomes (key, salt) — a hot key's rows spread over `salts` reducers
  * instead of one. Result-identical to the plain join.
  *
  * Use when AQE's runtime skew splitting isn't available (e.g. the
  * skewed side feeds a non-shuffle operator) or the skew is known
  * up front. `salts` ~ 2-4x the executor count caps the hot key's
  * largest partition at |hot| / salts rows.
  */
object SkewJoin {
  def saltedJoin(skewed: DataFrame, small: DataFrame,
      skewedKey: String, smallKey: String,
      salts: Int = 32, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // deterministic salt: hash of the whole row spreads a hot key's
    // rows uniformly without an RNG (reproducible plans)
    val salted = skewed.withColumn("__g_salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts)).cast("int"))
    val replicated = small.withColumn("__g_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
        salted(skewedKey) === replicated(smallKey) &&
          salted("__g_salt") === replicated("__g_salt"), joinType)
      .drop(salted("__g_salt")).drop(replicated("__g_salt"))
  }
}
