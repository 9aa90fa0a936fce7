package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{MinHash, PairVerify}

/** The accepted-first cross-batch dedup stage shared by
  * [[StreamingDedup]] and [[CurationGate]]: band the batch index against
  * the stored accepted index (map-only explodes of signatures — no
  * re-shingling of history), one bucket equi-join for candidates, exact
  * Jaccard verify on candidates only. One definition so the two ingest
  * gates cannot silently diverge on the dedup protocol.
  */
private[streaming] object DedupStage {

  /** Ids (as `__id`) of batch docs that near-dup ANY accepted doc.
    * `batchIdx`/`accepted` are [[MinHash.corpusIndex]]-shaped frames
    * (__id, __sh, __sig). localCheckpointed: each batch's drop set is
    * consumed by several downstream joins and must compute once.
    */
  def dupOfAccepted(
      batchIdx: DataFrame,
      accepted: DataFrame,
      b: Int,
      r: Int,
      num: Int,
      den: Int): DataFrame = {
    val bb = MinHash.bands(batchIdx.select(col("__id"), col("__sig")), "__sig", b, r)
      .select(col("__id"), col("band"), col("bucket"))
    val ab = MinHash.bands(accepted.select(col("__id"), col("__sig")), "__sig", b, r)
      .select(col("__id"), col("band"), col("bucket"))
    val crossCands = bb.select(col("__id").as("id_a"), col("band"), col("bucket"))
      .join(ab.select(col("__id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select(col("id_a"), col("id_b")).distinct()
    val sets = batchIdx.select(col("__id"), col("__sh"))
      .unionByName(accepted.select(col("__id"), col("__sh")))
    PairVerify.exact(crossCands, sets, num, den)
      .select(col("id_a").as("__id")).distinct()
      .localCheckpoint(true)
  }
}
