package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared exact-verify stage of the near-dup joins ([[MinHash]] and
  * [[JaccardJoin]]): attach both docs' true shingle sets to each
  * candidate pair by equi-join, count the overlap with the native
  * bounded kernel, keep pairs with integer-exact Jaccard >= num/den.
  *
  * The overlap count is [[graft.functions.BoundedIntersectSize]]: exact
  * for every pair that reaches the threshold (those are the reported
  * rows), early-exit below it for pairs that provably cannot — the
  * common case on a verify stage, where most candidates fail.
  */
private[graft] object PairVerify {

  /** `cands`: (id_a, id_b). `sets`: (__id, __sh) — one row per doc,
    * __sh the distinct shingle array. Output: (id_a, id_b, inter_size,
    * union_size) for pairs with inter*den >= union*num.
    */
  def exact(cands: DataFrame, sets: DataFrame, num: Int, den: Int): DataFrame =
    cands
      .join(sets.select(col("__id").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.HashExprs.boundedIntersectSize(col("sh_a"), col("sh_b"), num, den)
          .as("inter_size"),
        (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("__szsum"))
      .select(col("id_a"), col("id_b"), col("inter_size"),
        (col("__szsum") - col("inter_size")).as("union_size"))
      .where(col("inter_size") * den >= col("union_size") * num)
}
