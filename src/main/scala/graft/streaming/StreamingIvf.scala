package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Ivf

/** Incremental ANN index maintenance — the embedding analogue of
  * [[StreamingDedup]]: a stream of (id, vector) rows is continuously
  * assigned to a FIXED coarse quantizer and appended to a per-batch,
  * centroid-partitioned parquet index. Queries run against the
  * accumulated index at any time with partition-pruned candidate
  * fetches; the corpus is never re-scanned and vectors are never
  * re-assigned.
  *
  * The quantizer is trained ONCE on a bootstrap slice
  * ([[staticCentroids]]) and never moves — the same static-model
  * contract as [[CurationGate.staticLm]] (CCNet's reference-model
  * shape): per-batch assignments are bit-identical to what a one-shot
  * build over the union would assign, so the streamed index equals the
  * batch index row-for-row (pinned in StreamingSpec). Production
  * re-trains the quantizer out-of-band and rebuilds; an in-band drifting
  * quantizer would silently split one semantic region across lists.
  *
  * State layout is the [[BatchIndex]] contract: one directory per
  * micro-batch (`<path>/assign/batch=<id>`, overwrite → retry-
  * idempotent, restart resumes with zero recovery logic, dead
  * incarnations purged), and WITHIN each batch directory the rows are
  * partitioned by `centroid_id` — so a query's candidate fetch is a
  * partition-pruned scan of ~nprobe/k of every batch directory, the
  * same pruning [[Ivf.topKFromIndex]] gets on the one-shot layout.
  *
  * 100 TB shape: per batch the work is one broadcast of the k-row
  * centroid table and a map-side argmax per vector (the [[Ivf.assign]]
  * plan — the n×k scored stream never shuffles); the index write is the
  * batch's own rows only. Queries cost nprobe/k of the INDEX (8-byte
  * ids + vectors), never the raw corpus.
  */
object StreamingIvf {

  /** Rebuild-in-progress fence at `<path>/_REBUILD`: [[rebuild]] creates
    * it first and removes it after the generation switch; [[run]]'s
    * foreachBatch throws while it exists (fail the batch loudly — the
    * checkpoint retries it into the new generation — rather than
    * silently writing into a generation the rebuild deletes).
    */
  val RebuildMarker = "_REBUILD"

  // ------------------------------------------------------- generations
  // The quantizer is static per GENERATION: [[rebuild]] re-trains it on
  // the accumulated corpus and rebuilds the whole index under
  // `<path>/gen=<g>/...`, then atomically switches readers and ingest
  // to it by creating the marker file `<path>/_GEN=<g>` (a marker
  // CREATE is atomic where a pointer-file rewrite is not; the current
  // generation is the max marked g). The bootstrap generation lives at
  // `<path>` itself (no marker) — pre-rebuild trees keep working
  // unchanged.

  private def genRoot(spark: SparkSession, path: String): String =
    currentGen(spark, path).fold(path)(g => s"$path/gen=$g")

  private def currentGen(spark: SparkSession, path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("_GEN=") => n.stripPrefix("_GEN=").toLong }
      .sorted.lastOption
  }

  /** Train the coarse quantizer on a bootstrap slice and MATERIALIZE it
    * under `<path>/centroids` — the fixed model every batch assigns
    * against and every query ranks against (until a [[rebuild]]
    * supersedes it with a new generation). Call once, before the first
    * ingest — never after a rebuild (it would write into the superseded
    * bootstrap generation).
    */
  def staticCentroids(
      bootstrap: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      stride: Int = 16,
      refine: Int = 1,
      maxK: Int = 64): Unit =
    Ivf.centroids(bootstrap, idCol, vecCol, stride, refine, maxK)
      .write.mode("overwrite").parquet(s"$path/centroids")

  /** Re-train the coarse quantizer on the ACCUMULATED corpus and rebuild
    * the index as a new generation — the out-of-band remediation for a
    * drifted/imbalanced quantizer (the pathology q165's balance audit
    * detects: a bootstrap trained before a hot cluster arrived leaves
    * one list owning half the corpus, wasting every probe budget).
    * In-band drifting is still never done: WITHIN a generation the
    * quantizer stays fixed, so per-batch assignments remain
    * bit-identical to a one-shot build over that generation's corpus.
    *
    * Steps: read every committed vector from the current generation,
    * train fresh centroids on them ([[Ivf.centroids]] — deterministic
    * stride seeding + fixed-point Lloyd, so the result equals what a
    * one-shot build over the same corpus would train), write the new
    * generation's centroids + fully re-assigned index (as one
    * consolidated `compacted=<maxBatch>` dir — a rebuild IS a
    * compaction), commit-mark it, then atomically switch via the
    * `_GEN=<g>` marker and delete the superseded generation's state.
    *
    * MUST run with ingest STOPPED (it folds the newest batch too; a
    * concurrent ingest would write into the superseded generation and
    * be deleted). A restart afterwards resumes into the new generation:
    * the checkpoint's next batch id is `maxBatch`+1 (> the rebuilt
    * compacted bound), and a retry of `maxBatch` writes rows the
    * compacted dir already covers — readers exclude it, and its content
    * matches by determinism. In-flight QUERIES racing the switch can
    * see the old generation being deleted — the same disclosed window
    * as a concurrent retry; `ignoreMissingFiles` on the scan tolerates
    * it.
    *
    * Returns the new generation id.
    */
  def rebuild(
      spark: SparkSession,
      path: String,
      stride: Int = 16,
      refine: Int = 1,
      maxK: Int = 64): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ingest fence: [[run]]'s foreachBatch refuses to commit while this
    // marker exists, so a concurrent ingest FAILS LOUDLY (and its
    // checkpoint retries into the new generation after the switch)
    // instead of silently writing into a generation this rebuild is
    // about to delete. A rebuild retry tolerates a stale marker (its
    // own crash left it); the marker clears on the generation switch.
    val lock = new org.apache.hadoop.fs.Path(s"$path/$RebuildMarker")
    fs.create(lock, true).close()
    val oldRoot = genRoot(spark, path)
    val (runDirs, batchDirs) = committedView(spark, s"$oldRoot/assign")
    require(runDirs.nonEmpty || batchDirs.nonEmpty,
      s"no committed index state under $oldRoot/assign — nothing to rebuild from")
    val corpus = {
      val parts =
        runDirs.map(d => spark.read.parquet(d)) ++
        (if (batchDirs.nonEmpty)
          Seq(spark.read.option("basePath", s"$oldRoot/assign")
            .parquet(batchDirs: _*).drop("batch"))
         else Nil)
      parts.reduce(_ unionByName _).select(col("neighbor_id"), col("__cv"))
    }
    // the new generation's bound derives from COMMITTED state only
    // (ADVICE r10): an uncommitted trailing batch dir (stream died
    // mid-write) must stay ABOVE the rebuilt compacted bound, so its
    // checkpoint retry re-lands visibly in the new generation instead
    // of being stamped as covered and silently lost
    val maxBatch = (BatchIndex.foldBound(spark, s"$oldRoot/assign").toSeq ++
      batchDirs.map(d => d.substring(d.lastIndexOf("batch=") + 6).toLong)).max
    val g = currentGen(spark, path).getOrElse(0L) + 1
    val newRoot = s"$path/gen=$g"
    val cents = Ivf.centroids(corpus, "neighbor_id", "__cv", stride, refine, maxK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      cents.write.mode("overwrite").parquet(s"$newRoot/centroids")
      Ivf.assign(corpus, "neighbor_id", "__cv", cents)
        .join(corpus, Seq("neighbor_id"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$newRoot/assign/compacted=$maxBatch")
      BatchIndex.touchCommit(spark, s"$newRoot/assign/compacted=$maxBatch")
    } finally { cents.unpersist(); () }
    // the atomic switch: marker creation makes generation g current
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_GEN=$g"), true).close()
    fs.delete(lock, false)
    // superseded generation's state (bootstrap layout lives at the tree
    // root; later generations under their own gen dir)
    if (oldRoot == path) {
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/centroids"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/assign"), true)
    } else fs.delete(new org.apache.hadoop.fs.Path(oldRoot), true)
    g
  }

  /** Ingest: per micro-batch, assign each vector to its nearest static
    * centroid map-side and commit (neighbor_id, centroid_id, __cv) under
    * `<path>/assign/batch=<id>`, centroid-partitioned. `onIndexed`
    * receives (rowsIndexed, batchId) after each commit.
    */
  /** `compactEvery = Some(n)`: auto-compact after every n-th committed
    * batch (the default fold bound — the just-committed batch stays
    * live), so a long-running ingest never accumulates more than ~n
    * batch directories. Out-of-band [[compact]] stays available for
    * operator-driven runs.
    */
  def run(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      compactEvery: Option[Int] = None)(onIndexed: (Long, Long) => Unit): DataStreamWriter[Row] = {
    vecs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      // the [[rebuild]] fence: refuse to write while a rebuild owns the
      // tree — this batch would land in the generation the rebuild is
      // about to delete and be silently lost. Failing the batch keeps
      // it in the checkpoint; the retry (after the switch) re-lands it
      // in the new generation.
      val lockPath = new org.apache.hadoop.fs.Path(s"$path/$RebuildMarker")
      if (lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(lockPath))
        throw new IllegalStateException(
          s"StreamingIvf rebuild in progress at $path ($RebuildMarker present) — " +
            s"batch $batchId refused; it will retry after the generation switch")
      // resolved per batch: a [[rebuild]] between runs (stream stopped,
      // checkpoint kept) switches ingest to the new generation too
      val root = genRoot(spark, path)
      val cents = spark.read.parquet(s"$root/centroids")
      val v = batch.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      // materialize + count BEFORE deciding to write: an EMPTY batch
      // (no input rows, or all rows zero-norm-dropped by the assign)
      // must not commit a data-less partitioned directory — partitionBy
      // writes no partition subdirs for zero rows, and a marked dir
      // with no parquet files kills schema inference for every
      // subsequent [[topK]]
      val assigned = Ivf.assign(batch, idCol, vecCol, cents)
        .join(v, Seq("neighbor_id"))
        .localCheckpoint(true)
      val n = assigned.count()
      val dir = s"$root/assign/batch=$batchId"
      if (n > 0) {
        assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(dir)
        // commit marker AFTER the write completes: [[topK]] reads only
        // marked directories, so a query racing a half-written batch (a
        // parquet overwrite is not atomic) never sees uncommitted rows.
        // A retry overwrites the dir and re-creates the marker — the
        // brief marker-less window only hides the batch, never corrupts.
        BatchIndex.touchCommit(spark, dir)
      } else {
        // a same-id directory can still exist (a dead incarnation whose
        // batch N was non-empty): an overwrite would have replaced it —
        // the empty-skip must delete it for the same phantom-row reason
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      BatchIndex.purgeBeyond(spark, s"$root/assign", batchId)
      compactEvery.filter(_ > 0).foreach { every =>
        // tiered: the in-band policy — bounded write amplification over
        // a long ingest (a full fold here would rewrite the ENTIRE
        // accumulated corpus every `every` batches)
        if ((batchId + 1) % every == 0) compact(spark, path, tiered = true)
      }
      onIndexed(n, batchId)
    }
  }

  /** Bootstrap the index with an EXISTING corpus's assignment (the
    * one-shot [[Ivf.writeIndex]]-style rows a production stream takes
    * over from): `assigned` must carry (neighbor_id, centroid_id,
    * __cv) under the CURRENT generation's quantizer. Written as a
    * consolidated generation below every future batch id
    * (`compacted=-1`), so ingest batch 0 appends beside it and queries
    * see the union — the [[StreamingDedup.seedIndex]] device.
    */
  def seedIndex(assigned: DataFrame, path: String): Unit = {
    val spark = assigned.sparkSession
    val dir = s"${genRoot(spark, path)}/assign/compacted=-1"
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(dir)
    BatchIndex.touchCommit(spark, dir)
  }

  /** Fold committed historical batch directories into one consolidated
    * `compacted=<upTo>` generation (partitioned by `centroid_id`, so a
    * query's PartitionFilters prune is identical before and after) —
    * the [[BatchIndex.compact]] contract applied to the assign tree.
    * By default the newest committed batch dir stays live (the
    * foreachBatch-retry guard); pass `upTo = Some(maxId)` when the
    * stream is stopped with its final batch committed to the
    * checkpoint. Safe to run beside live ingest: ingest only appends
    * NEW batch dirs, and readers see either the old generation + old
    * batch dirs or the new generation — never both (marker protocol).
    */
  def compact(spark: SparkSession, path: String, upTo: Option[Long] = None,
      tiered: Boolean = false): Option[Long] =
    BatchIndex.compact(spark, s"${genRoot(spark, path)}/assign",
      partitionCols = Seq("centroid_id"), committedOnly = true, upTo = upTo,
      tiered = tiered)

  /** Committed view of the assign tree: every active consolidated run
    * and every committed batch dir newer than the fold bound — both as
    * directory paths.
    */
  private def committedView(
      spark: SparkSession, assignPath: String): (Seq[String], Seq[String]) = {
    val runs = BatchIndex.activeRuns(spark, assignPath)
    val bound = runs.map(_.hi).maxOption
    val dirs = BatchIndex.batchDirIds(spark, assignPath)
      .filter(id => bound.forall(id > _))
      .map(id => s"$assignPath/batch=$id")
      .filter(d => BatchIndex.isCommitted(spark, d))
    (runs.map(_.dir), dirs)
  }

  /** Approximate top-k against the accumulated streamed index — the
    * [[Ivf.topKFromIndex]] query over every committed batch directory.
    * Output schema matches [[Ivf.topK]]: (probe_id, neighbor_id,
    * cosine, rank).
    *
    * Concurrency windows (both disclosed, neither corrupts a result
    * that completes): the committed-dir list is taken eagerly but the
    * scan executes lazily, so (a) a CONCURRENT INGEST RETRY overwriting
    * a listed directory between listing and execution can read a
    * half-rewritten dir — a retry rewrites identical rows (the static
    * quantizer makes assignment deterministic), so a completed read is
    * correct, but a file observed mid-delete would abort the scan
    * without `ignoreMissingFiles` (set below); (b) a reset-checkpoint
    * restart can leave a dead incarnation's committed dirs visible
    * until the next commit purges them — same window every
    * [[BatchIndex]] consumer has.
    */
  def topK(
      spark: SparkSession,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val root = genRoot(spark, path)
    val cents = spark.read.parquet(s"$root/centroids")
    // only COMMITTED state (markers written after each parquet
    // completes): a query issued while the ingest stream — or a
    // concurrent [[compact]] — is live never reads a half-written
    // directory. Dead-incarnation dirs (a reset checkpoint restarting
    // at batch 0) are purged by the next commit; between reset and
    // first commit a query can still see the old incarnation's
    // committed rows — the same window every BatchIndex consumer has,
    // disclosed here rather than hidden.
    Ivf.topKPruned(probes, idCol, vecCol, cents, k, nprobe)(
      committedIndex(spark, path))
  }

  /** The committed index of the current generation as one frame —
    * (neighbor_id, centroid_id, __cv) across every active consolidated
    * run plus every committed batch directory: the raw-fetch side for
    * [[graft.operators.Pq.searchRerank]] (the streamed twin of
    * [[Ivf.writeIndex]]'s assign tree) and the scan [[topK]] prunes.
    *
    * basePath keeps `batch` and `centroid_id` as discovered partition
    * columns over the explicit committed-dir list, so a centroid
    * equality/In filter prunes at PartitionFilters level across every
    * committed batch directory AND the consolidated runs (themselves
    * centroid-partitioned). ignoreMissingFiles covers the concurrency
    * window disclosed on [[topK]]: a listed file deleted by a
    * concurrent retry/purge before execution is skipped instead of
    * failing the scan. Compaction cleanup is DEFERRED one round
    * ([[BatchIndex.compact]]'s grace period), so a scan racing a
    * compaction still finds every directory it listed — the
    * missing-file tolerance is for retry overwrites, not a license for
    * cleanup to pull files out from under a running query.
    */
  def committedIndex(spark: SparkSession, path: String): DataFrame = {
    val root = genRoot(spark, path)
    val (runDirs, dirs) = committedView(spark, s"$root/assign")
    require(runDirs.nonEmpty || dirs.nonEmpty,
      s"no committed index state under $root/assign")
    val parts =
      runDirs.map(d => spark.read
        .option("ignoreMissingFiles", "true").parquet(d)) ++
      (if (dirs.nonEmpty)
        Seq(spark.read.option("basePath", s"$root/assign")
          .option("ignoreMissingFiles", "true")
          .parquet(dirs: _*).drop("batch"))
       else Nil)
    parts.reduce(_ unionByName _)
  }
}
