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
  * Salt assignment: `monotonically_increasing_id() % salt` — round-robin
  * within each scan partition. The RESULT is provably independent of
  * which salt a row gets (every salt value finds the same small-side
  * match), so output determinism is unconditional; only physical row
  * placement varies with scan split order. This beats hashing row
  * content on both axes the round-4 review flagged: no column is read
  * for the salt (column pruning reaches the scan), and fully identical
  * duplicate rows of a hot key — the canonical pathological case — still
  * spread across all `salt` reducers instead of re-colliding.
  */
object SkewJoin {

  /** Round-robin salt in [0, salt): reads no data columns, spreads even
    * bit-identical duplicate rows. Exposed for tests.
    */
  private[graft] def saltCol(salt: Int) =
    pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int")

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
    val l = big.withColumn("__salt", saltCol(salt))
    val r = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, l(bigKey) === r(smallKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }
}
