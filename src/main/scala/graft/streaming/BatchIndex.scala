package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Idempotent per-micro-batch index layout shared by the incremental
  * ingest gates ([[StreamingDedup]] for text, [[StreamingPhashDedup]]
  * for media, [[CurationGate]] for the full waterfall, [[StreamingIvf]]
  * for embeddings): the accepted-corpus state lives as one directory per
  * micro-batch (`<root>/batch=<id>`, written with overwrite), so
  *  - a foreachBatch RETRY rewrites its own directory instead of
  *    double-appending (at-least-once safe),
  *  - a restart resumes against the full accepted corpus with zero
  *    recovery logic (the directory tree IS the state),
  *  - directories from a dead incarnation (ids beyond the current
  *    batch after a checkpoint reset) are purged on write so the tree
  *    never carries phantom accepted rows.
  *
  * COMPACTION (the streaming small-files fix): a long-running ingest
  * accumulates one directory per micro-batch forever, and a reader's
  * file-listing + parquet-footer cost grows with batch count even
  * though the data doesn't. [[compact]] folds historical batch
  * directories into ONE consolidated `<root>/compacted=<upTo>`
  * generation — readers then open the single consolidated directory
  * plus only the batch directories newer than it. The contract:
  *  - the consolidated directory carries the SAME commit-marker
  *    protocol as [[StreamingIvf]]'s batch dirs (marker written after
  *    the parquet completes), so a reader never sees a half-written
  *    generation: an unmarked `compacted=` dir is invisible and readers
  *    fall back to the batch directories it would have replaced;
  *  - compaction is retry-idempotent the same way batches are — a
  *    crashed compaction either left no marker (its output is invisible,
  *    re-run overwrites) or marked its output but died before cleanup
  *    (readers already ignore the superseded dirs; the next compaction
  *    deletes them);
  *  - LIVE INGEST IS UNTOUCHED: by default the newest batch directory
  *    is never folded, because it is the only directory an at-least-once
  *    foreachBatch retry can rewrite — folding it would let a retrying
  *    batch see its own rows as "accepted" (self-dedup drops the whole
  *    batch). Pass `upTo = Some(maxId)` only when the stream is stopped
  *    AND its final batch is known committed to the CHECKPOINT.
  */
private[streaming] object BatchIndex {

  val CommitMarker = "_GRAFT_COMMIT"

  def touchCommit(spark: SparkSession, dir: String): Unit = {
    val p = new Path(s"$dir/$CommitMarker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }

  def isCommitted(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(s"$dir/$CommitMarker")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def childIds(spark: SparkSession, indexPath: String, prefix: String): Seq[Long] = {
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) => n.stripPrefix(prefix).toLong }
  }

  def batchDirIds(spark: SparkSession, indexPath: String): Seq[Long] =
    childIds(spark, indexPath, "batch=")

  /** The highest MARKED consolidated generation, if any — the one
    * readers use. Unmarked `compacted=` dirs (a compaction that died
    * mid-write) are invisible by the marker contract.
    */
  def currentCompacted(spark: SparkSession, indexPath: String): Option[Long] =
    childIds(spark, indexPath, "compacted=")
      .filter(u => isCommitted(spark, s"$indexPath/compacted=$u"))
      .sorted.lastOption

  /** Dead-incarnation purge: a reused indexPath with a reset checkpoint
    * restarts batchIds at 0 — directories beyond the current batch are
    * a previous run's corpse and would surface as phantom accepted rows.
    * A consolidated generation STRICTLY beyond the current batch is the
    * same corpse one level up (it folds batches the new incarnation has
    * not produced); `compacted=<u>` with u <= batchId stays — it is the
    * valid folded history the incarnation resumes against.
    */
  def purgeBeyond(spark: SparkSession, indexPath: String, batchId: Long): Unit = {
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    batchDirIds(spark, indexPath).filter(_ > batchId)
      .foreach(id => fs.delete(new Path(s"$indexPath/batch=$id"), true))
    childIds(spark, indexPath, "compacted=").filter(_ > batchId)
      .foreach(u => fs.delete(new Path(s"$indexPath/compacted=$u"), true))
  }

  /** The accepted-corpus index: the consolidated generation (if one is
    * marked) plus every batch directory NEWER than it with id <
    * `beforeBatch` (a retry of batch N must not dedup against its own
    * half-written output). Empty frame of `template`'s schema when
    * nothing exists yet.
    */
  def read(
      spark: SparkSession,
      indexPath: String,
      template: DataFrame,
      beforeBatch: Long): DataFrame = {
    val cur = currentCompacted(spark, indexPath)
    val dirs = batchDirIds(spark, indexPath)
      .filter(id => id < beforeBatch && cur.forall(id > _))
      .map(id => s"$indexPath/batch=$id")
    val parts =
      cur.map(u => spark.read.schema(template.schema)
        .parquet(s"$indexPath/compacted=$u")).toSeq ++
      (if (dirs.nonEmpty)
        Seq(spark.read.schema(template.schema).parquet(dirs: _*)) else Nil)
    if (parts.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), template.schema)
    else parts.reduce(_ unionByName _)
  }

  /** Fold historical batch directories (and the previous consolidated
    * generation) into `<root>/compacted=<newUpTo>`, commit-mark it,
    * then delete the superseded directories. See the class doc for the
    * crash/retry contract.
    *
    *  - `partitionCols`: partition layout of the consolidated write
    *    (e.g. `centroid_id` for [[StreamingIvf]]'s assign tree, so a
    *    query's PartitionFilters prune survives compaction);
    *  - `committedOnly`: fold only commit-marked batch dirs (layouts
    *    whose batches carry markers — [[StreamingIvf]]); marker-less
    *    layouts ([[StreamingDedup]]/[[CurationGate]], single-writer
    *    trees read only inside their own foreachBatch) fold every dir;
    *  - `schema`: explicit read schema — REQUIRED for unpartitioned
    *    layouts whose batch dirs can be legitimately empty (a batch
    *    with zero survivors writes a data-less dir, which would kill
    *    schema inference);
    *  - `upTo`: inclusive fold bound. Default folds everything except
    *    the NEWEST batch dir (the live-retry guard above);
    *  - `targetBytes`: output file sizing — the generation is written
    *    as ceil(foldedBytes / targetBytes) tasks (q145's bin-packing
    *    arithmetic applied to the consolidated write), so a compaction
    *    of ten thousand tiny batch files lands as a handful of
    *    target-sized ones instead of reproducing the fragmentation one
    *    level up.
    *
    * Returns the active consolidated generation id after the call (the
    * previous one if there was nothing new to fold).
    */
  def compact(
      spark: SparkSession,
      indexPath: String,
      partitionCols: Seq[String] = Nil,
      committedOnly: Boolean = false,
      schema: Option[StructType] = None,
      upTo: Option[Long] = None,
      targetBytes: Long = 128L << 20): Option[Long] = {
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = currentCompacted(spark, indexPath)

    def cleanup(keep: Long): Unit = {
      // superseded state: batch dirs the generation absorbed (or that a
      // prior crashed cleanup left behind) + older/unmarked generations
      batchDirIds(spark, indexPath).filter(_ <= keep)
        .foreach(id => fs.delete(new Path(s"$indexPath/batch=$id"), true))
      childIds(spark, indexPath, "compacted=").filter(_ < keep)
        .foreach(u => fs.delete(new Path(s"$indexPath/compacted=$u"), true))
    }

    val eligible = batchDirIds(spark, indexPath).sorted
      .filter(id => !committedOnly || isCommitted(spark, s"$indexPath/batch=$id"))
    val limit = upTo.getOrElse(eligible.lastOption.getOrElse(Long.MinValue) - 1)
    val fold = eligible.filter(id => cur.forall(id > _) && id <= limit)
    if (fold.isEmpty) { cur.foreach(cleanup); return cur }

    val newU = fold.max
    // a batch with zero survivors writes a data-less directory; without
    // an explicit schema such a dir breaks per-dir inference, so it is
    // skipped on read (it contributes no rows) while its id still
    // advances the generation bound (readers exclude it either way)
    def hasDataFiles(dir: String): Boolean = {
      val it = fs.listFiles(new Path(dir), true)
      var found = false
      while (!found && it.hasNext) {
        val n = it.next().getPath.getName
        found = !n.startsWith("_") && !n.startsWith(".")
      }
      found
    }
    def readDir(dir: String): Option[DataFrame] = schema match {
      case Some(s) => Some(spark.read.schema(s).parquet(dir))
      case None => if (hasDataFiles(dir)) Some(spark.read.parquet(dir)) else None
    }
    val parts = cur.flatMap(u => readDir(s"$indexPath/compacted=$u")).toSeq ++
      fold.flatMap(id => readDir(s"$indexPath/batch=$id"))
    if (parts.isEmpty) {
      // every eligible dir is data-less and no schema was given: there
      // is nothing to write a generation FROM — leave the (empty) dirs
      // in place rather than guess a schema
      cur.foreach(cleanup); return cur
    }
    // ceil(foldedBytes / targetBytes) output tasks: the whole point of
    // compaction is fewer, target-sized files
    val foldedBytes = (cur.map(u => s"$indexPath/compacted=$u").toSeq ++
      fold.map(id => s"$indexPath/batch=$id")).map { dir =>
      val it = fs.listFiles(new Path(dir), true)
      var b = 0L
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) b += f.getLen
      }
      b
    }.sum
    val outTasks = math.max(1L, (foldedBytes + targetBytes - 1) / targetBytes).toInt
    val df = parts.reduce(_ unionByName _).coalesce(outTasks)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$indexPath/compacted=$newU")
    touchCommit(spark, s"$indexPath/compacted=$newU")
    cleanup(newU)
    Some(newU)
  }
}
