package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * At 100 TB a handful of hot keys (the bot user, the empty string, the
  * boilerplate document) can put most of a shuffle into one reducer. AQE
  * skew-join splitting handles moderate skew at runtime; salting is the
  * explicit, planner-independent fix for the pathological case: the big
  * side spreads each key's rows across `salt` sub-keys, the small side
  * replicates `salt`× so every sub-key still finds its match, and the
  * join runs on (key, salt) — one hot key now lands on `salt` reducers.
  *
  * Result is IDENTICAL to the plain equi-join (inner and left_outer):
  * each big-side row matches exactly the same small-side rows as before
  * (its one salt replica). Cost: small side shuffles `salt`× its size —
  * only worth it when the small side is genuinely small and skew is
  * genuinely pathological.
  *
  * The salt is deterministic (hash of the big-side row's key and all
  * columns, mod `salt`), so results and partition placement are
  * reproducible run-to-run — no `rand()`.
  */
object SkewJoin {

  def salted(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // right/full would duplicate unmatched small-side rows per replica
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salted join supports inner/left joins, got $joinType")
    val l = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salt)).cast("int"))
    val r = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, l(bigKey) === r(smallKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }
}
