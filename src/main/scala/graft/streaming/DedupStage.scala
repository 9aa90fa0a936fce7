package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MinHash, PairVerify}

/** The accepted-first cross-batch dedup stage shared by
  * [[StreamingDedup]] and [[CurationGate]]: band the batch index against
  * the stored accepted BAND index, one bucket equi-join for candidates,
  * exact Jaccard verify on candidates only. One definition so the two
  * ingest gates cannot silently diverge on the dedup protocol.
  *
  * THE BAND INDEX (round-11, the CurationGate history term): the
  * accepted corpus's (band, bucket) rows are PRECOMPUTED at accept time
  * and stored as their own [[BatchIndex]] tree at `<indexPath>/__bands`
  * (invisible to the signature tree's `batch=`/`run=` listing),
  * partitioned by `__bp = pmod(bucket, 64)`. The per-batch probe then
  *  - reads stored band rows instead of re-hashing every stored
  *    signature each batch (the term BENCH_scale measured growing with
  *    history: banding is an explode of k-wide signature arrays over
  *    the FULL accepted corpus, every micro-batch), and
  *  - prunes the stored scan to the bucket partitions the batch
  *    actually touches (collected driver-side — bounded by 64, never
  *    row data), the same PartitionFilters device as
  *    [[StreamingIvf]]'s centroid prune: a small batch reads a
  *    fraction of the band index instead of all of it.
  * Band values are a deterministic function of the signature (same b,
  * r), so verdicts are bit-identical to banding in-line.
  */
private[graft] object DedupStage {

  /** Partition count of the stored band index — the prune granularity.
    * Bounded so the driver-side touched-partition collect is trivially
    * small; 64 × target-file-size also keeps each batch's band write
    * from fragmenting.
    */
  val BucketPartitions = 64

  /** The band tree of a signature index tree. The `__` prefix keeps it
    * invisible to directory listings of the signature tree (markers and
    * state subtrees share the convention).
    */
  def bandsPath(indexPath: String): String = s"$indexPath/__bands"

  /** Precomputed band rows of a [[MinHash.corpusIndex]]-shaped frame:
    * (__id, band, bucket, __bp).
    */
  def bandRows(idx: DataFrame, b: Int, r: Int): DataFrame =
    MinHash.bands(idx.select(col("__id"), col("__sig")), "__sig", b, r)
      .select(col("__id"), col("band"), col("bucket"),
        pmod(col("bucket"), lit(BucketPartitions.toLong)).as("__bp"))

  /** Write one batch's accepted band rows (banding the just-written
    * batch directory — batch-sized, retry-idempotent like the signature
    * write it mirrors) and purge dead incarnations of the band tree.
    * `template` supplies the read schema: a zero-survivor batch writes
    * a data-less signature dir, which would kill schema inference.
    */
  def commitBands(spark: SparkSession, indexPath: String, batchId: Long,
      b: Int, r: Int, template: DataFrame): Unit = {
    bandRows(spark.read.schema(template.schema).parquet(s"$indexPath/batch=$batchId"), b, r)
      .write.mode("overwrite").partitionBy("__bp")
      .parquet(s"${bandsPath(indexPath)}/batch=$batchId")
    BatchIndex.purgeBeyond(spark, bandsPath(indexPath), batchId)
  }

  /** The stored band index as of `beforeBatch` — the probe side of
    * [[dupOfAccepted]]. Guards against a signature tree that has state
    * while the band tree has none (a tree seeded before the band index
    * existed): silent empty-bands would skip history dedup entirely.
    */
  def readBands(spark: SparkSession, indexPath: String, template: DataFrame,
      beforeBatch: Long): DataFrame = {
    def hasState(p: String): Boolean =
      BatchIndex.foldBound(spark, p).nonEmpty ||
        BatchIndex.batchDirIds(spark, p).exists(_ < beforeBatch)
    require(!hasState(indexPath) || hasState(bandsPath(indexPath)),
      s"signature index at $indexPath has state but its band tree is empty — " +
        "seeded without bands? (StreamingDedup.seedIndex writes both)")
    BatchIndex.read(spark, bandsPath(indexPath), template, beforeBatch)
  }

  /** Ids (as `__id`) of batch docs that near-dup ANY accepted doc.
    * `batchIdx` is a [[MinHash.corpusIndex]]-shaped frame (__id, __sh,
    * __sig); `acceptedBands` the stored band index ((__id, band, bucket,
    * __bp) — [[readBands]]); `acceptedSets` the stored signature index —
    * only its (__id, __sh) columns are read (column-pruned scan), and
    * only for ids that survived banding. localCheckpointed: each batch's
    * drop set is consumed by several downstream joins and must compute
    * once.
    */
  def dupOfAccepted(
      batchIdx: DataFrame,
      acceptedBands: DataFrame,
      acceptedSets: DataFrame,
      b: Int,
      r: Int,
      num: Int,
      den: Int): DataFrame = {
    // batch bands: batch-sized, consumed twice (touched-partition
    // collect + the candidate join) — compute once
    val bb = bandRows(batchIdx, b, r)
      .select(col("__id"), col("band"), col("bucket"), col("__bp"))
      .localCheckpoint(true)
    // partitions the batch touches: ≤ BucketPartitions values via the
    // driver — prunes the stored band scan at PartitionFilters level
    val touched = bb.select(col("__bp")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val ab = acceptedBands.where(col("__bp").isin(touched: _*))
    val crossCands = bb.select(col("__id").as("id_a"), col("band"), col("bucket"))
      .join(ab.select(col("__id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select(col("id_a"), col("id_b")).distinct()
    val sets = batchIdx.select(col("__id"), col("__sh"))
      .unionByName(acceptedSets.select(col("__id"), col("__sh")))
    PairVerify.exact(crossCands, sets, num, den)
      .select(col("id_a").as("__id")).distinct()
      .localCheckpoint(true)
  }
}
