package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.VecExprs
import graft.operators.Ivf

/** Incremental SEMANTIC dedup of an EMBEDDING stream — SemDeDup's
  * cluster-then-compare recipe ([[graft.operators.SemDedup]], Abbas et
  * al. 2023, arXiv:2303.09540) as an ingest gate — the embeddings row
  * of the streaming-gate matrix: text has
  * [[StreamingDedup]]/[[CurationGate]] (MinHash banding), media has
  * [[StreamingPhashDedup]] (pHash banding), exact substring spans have
  * [[StreamingSpanDedup]] (anchor-gram coverage), and embeddings have
  * this (coarse-cell cosine).
  *
  * Policy — greedy ONLINE semantic dedup, mirroring [[StreamingDedup]]
  * clause for clause:
  *  1. accepted-first — a batch vector with cosine ≥ `threshold` to any
  *     ACCEPTED vector in its coarse cell drops;
  *  2. lowest-id-within-batch — among new same-cell near-dups of each
  *     other, the higher id of every ≥-threshold pair drops (exactly
  *     [[graft.operators.SemDedup.dedupCorpus]]'s keep-lowest-id rule);
  *  3. un-assignable vectors (zero norm — cosine undefined) can never be
  *     semantic dups and pass through accepted-but-not-indexed, the
  *     analogue of StreamingDedup's too-short-to-shingle rule.
  * Dedup scope is the vector's own coarse cell — SemDeDup's deliberate
  * contract (cross-cluster near-dups survive by design), which also
  * makes the accepted-side scan an EXACT partition prune, not a recall
  * approximation. The online-vs-one-shot divergence is the same
  * documented one as StreamingDedup's: a dropped vector is never a
  * witness, so the online gate keeps strictly more data; re-running
  * [[graft.operators.SemDedup.dedupCorpus]] over the accepted corpus
  * converges the two.
  *
  * STATE IS A [[StreamingIvf]] TREE — that is the point: survivors are
  * committed through [[StreamingIvf.commitBatch]] into the same
  * static-quantizer, centroid-partitioned, commit-marked layout, so the
  * accepted corpus doubles as a live ANN index. [[StreamingIvf.topK]],
  * [[StreamingIvf.committedIndex]]/[[StreamingIvf.committedEnc]],
  * [[StreamingIvf.seedIndex]], [[StreamingIvf.compact]] and
  * [[StreamingIvf.rebuild]] all work on it unchanged (a rebuild changes
  * cell boundaries and therefore FUTURE dedup scope — the same
  * new-generation semantics as a quantizer re-train for queries). Call
  * [[StreamingIvf.staticCentroids]] (and optionally
  * [[StreamingIvf.staticPq]]) before the first batch.
  *
  * 100 TB shape: per batch the work is one broadcast of the k-row
  * centroid table + map-side argmax (the [[Ivf.assign]] plan), ONE
  * partition-pruned scan of the accepted index restricted to the ≤ k
  * cells the batch touches (collected driver-side — bounded by k, never
  * row data), one cell-keyed equi-join scoring batch×accepted candidates
  * (AQE splits a hot cell), and a batch²-within-cell self-join. History
  * is never re-assigned and never re-scanned outside touched cells.
  * Honest cost disclosure: the scoring join's candidate volume is
  * Σ_cell |batch_cell| · |accepted_cell| — SemDeDup's cluster-scoped
  * shape, which grows with cell OCCUPANCY (unlike [[StreamingIvf]]'s
  * history-free ingest). BENCH_scale's `semgate_ingest` cell measures
  * it; the corpus-scale mitigation is a finer quantizer (k ~ √n) via
  * [[StreamingIvf.rebuild]], triggered by the q165 balance audit.
  */
object StreamingSemDedup {

  /** Run the incremental semantic dedup; `onSurvivors` receives each
    * batch's ACCEPTED original rows (full input schema) plus the
    * batchId. `compactEvery` wires [[StreamingIvf.compact]]'s tiered
    * policy in-band, exactly as [[StreamingIvf.run]] does.
    * `maintainEvery` wires [[StreamingIvf.maintain]]'s automated
    * health → rebuild loop in-band (same contract as
    * [[StreamingIvf.run]]'s) — THE remediation for this gate's
    * Σ_cell occupancy scoring term: a triggered rebuild re-trains the
    * quantizer at k ~ √n, so per-cell occupancy (and with it the
    * batch×accepted candidate volume) returns to ~√n instead of
    * compounding monotonically over a long ingest. NOTE a rebuild
    * changes cell boundaries and therefore FUTURE dedup scope — the
    * same documented semantics as any quantizer re-train on this tree.
    */
  def run(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      threshold: Double,
      compactEvery: Option[Int] = None,
      maintainEvery: Option[Int] = None)(
      onSurvivors: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(threshold > -1.0 && threshold <= 1.0,
      s"threshold must be a cosine in (-1, 1], got $threshold")
    vecs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      StreamingIvf.preFenceCheck(spark, path, batchId)
      val root = StreamingIvf.genRoot(spark, path)
      val cents = spark.read.parquet(s"$root/centroids")
      val v = batch.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      // (neighbor_id, centroid_id, __cv, __n) — zero-norm rows are
      // dropped by the assign (rule 3: they pass through un-indexed)
      val assigned = Ivf.assign(batch, idCol, vecCol, cents)
        .join(v, Seq("neighbor_id"))
        .withColumn("__n", sqrt(VecExprs.dot(col("__cv"), col("__cv"))))
        .localCheckpoint(true)

      // cells this batch touches: ≤ k values via the driver — prunes the
      // accepted-index scan at PartitionFilters level (the DedupStage
      // touched-partition device, here exact by the SemDeDup contract)
      val touched = assigned.select(col("centroid_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
      // accepted rows in touched cells as of this batch (beforeBatch
      // excludes a retry's own half-written directory; the read is
      // column-pruned to ids + vectors — stored PQ codes stay unread).
      // On a BUCKETED generation (a maintained tree — the __cp layout)
      // the partition prune is the touched cells' __cp buckets and the
      // centroid In-filter drops to row-group stats under it.
      val buckets = StreamingIvf.cpBucketsOf(spark, root)
      val template = buckets.fold(
          assigned.select(col("neighbor_id"), col("centroid_id"), col("__cv")))(p =>
          assigned.select(col("neighbor_id"), col("centroid_id"), col("__cv"))
            .withColumn("__cp", pmod(col("centroid_id"), lit(p.toLong))))
      val scan = BatchIndex.read(spark, s"$root/assign", template,
        beforeBatch = batchId)
      val pruned = buckets.fold(scan) { p =>
        val cps = touched.map(StreamingIvf.bucketOf(_, p).toLong).distinct
        scan.where(col("__cp").isin(cps: _*))
      }
      val accepted = pruned
        .where(col("centroid_id").isin(touched: _*))
        .select(col("neighbor_id").as("__idb"), col("centroid_id"),
          col("__cv").as("__vb"))
        .withColumn("__nb", sqrt(VecExprs.dot(col("__vb"), col("__vb"))))

      // 1. accepted-first: any batch vector with a ≥-threshold accepted
      // witness in its cell drops (drop set computed once)
      val dupOfAccepted = assigned
        .select(col("neighbor_id").as("__ida"), col("centroid_id"),
          col("__cv").as("__va"), col("__n").as("__na"))
        .join(accepted, Seq("centroid_id"))
        .where(VecExprs.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))
          >= threshold)
        .select(col("__ida").as("neighbor_id")).distinct()
        .localCheckpoint(true)
      val fresh = assigned.join(dupOfAccepted, Seq("neighbor_id"), "left_anti")

      // 2. within-batch, within-cell: the higher id of every
      // ≥-threshold pair drops (SemDedup.dedupCorpus's exact policy)
      val fa = fresh.select(col("neighbor_id").as("__ida"), col("centroid_id"),
        col("__cv").as("__va"), col("__n").as("__na"))
      val fb = fresh.select(col("neighbor_id").as("__idb"), col("centroid_id"),
        col("__cv").as("__vb"), col("__n").as("__nb"))
      val innerDrop = fa.join(fb, Seq("centroid_id"))
        .where(col("__ida") < col("__idb") &&
          VecExprs.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))
            >= threshold)
        .select(col("__idb").as("neighbor_id")).distinct()
        .localCheckpoint(true)

      // 3. commit survivors into the StreamingIvf tree (books-aware
      // write + marker + post-commit fence recheck + purge — the shared
      // contract), then emit the surviving ORIGINAL rows: anti-join, so
      // un-assignable zero-norm rows pass through like StreamingDedup's
      // short docs
      val survivors = fresh.join(innerDrop, Seq("neighbor_id"), "left_anti")
        .select(col("neighbor_id"), col("centroid_id"), col("__cv"))
        .localCheckpoint(true)
      StreamingIvf.commitBatch(spark, path, root, cents, survivors,
        survivors.count(), batchId)
      compactEvery.filter(_ > 0).foreach { every =>
        if ((batchId + 1) % every == 0)
          StreamingIvf.compact(spark, path, tiered = true)
      }
      maintainEvery.filter(_ > 0).foreach { every =>
        if ((batchId + 1) % every == 0)
          StreamingIvf.inBandMaintain(spark, path, batchId)
      }
      val dropIds = dupOfAccepted.unionByName(innerDrop)
        .select(col("neighbor_id").as(idCol))
      onSurvivors(batch.join(dropIds, Seq(idCol), "left_anti"), batchId)
    }
  }
}
