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
  * Salt assignment MUST be a pure function of row content: Spark
  * recomputes lost partitions on task/stage retry, and any
  * order-dependent salt (`rand()`, `monotonically_increasing_id()`,
  * partition-local counters) can reassign rows across already-fetched
  * reducer partitions mid-job — silently losing or duplicating join
  * rows exactly when a big cluster hits its first fetch failure. So the
  * salt is `xxhash64(key, saltOn...) mod salt`: deterministic under any
  * recomputation. `saltOn` names the row-identity columns that
  * disambiguate rows of one key — defaults to ALL big-side columns
  * (always correct), but naming a small stable subset (e.g. the columns
  * the query projects anyway) keeps column pruning at the scan. Known
  * limit, by construction: rows that are bit-identical across key AND
  * every saltOn column hash to the same sub-key and still co-locate —
  * content-deterministic salting cannot spread true duplicates.
  */
object SkewJoin {

  /** The salt: pure content hash of (key, identity columns) mod `salt`.
    * Exposed for tests — the retry-safety property IS this expression's
    * content-determinism, and must be asserted against the production
    * definition, not a test-local copy.
    */
  private[graft] def saltExpr(bigKey: String, idCols: Seq[String], salt: Int) =
    pmod(xxhash64((bigKey +: idCols).distinct.map(col): _*), lit(salt)).cast("int")

  def salted(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salt: Int,
      joinType: String = "inner",
      saltOn: Seq[String] = Nil): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // right/full would duplicate unmatched small-side rows per replica
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salted join supports inner/left joins, got $joinType")
    val idCols = if (saltOn.nonEmpty) saltOn else big.columns.toSeq
    require(idCols.forall(big.columns.contains), s"saltOn columns not in big side: $saltOn")
    val l = big.withColumn("__salt", saltExpr(bigKey, idCols, salt))
    val r = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, l(bigKey) === r(smallKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }
}
