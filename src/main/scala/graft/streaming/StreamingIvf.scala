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

  /** Train the coarse quantizer on a bootstrap slice and MATERIALIZE it
    * under `<path>/centroids` — the fixed model every batch assigns
    * against and every query ranks against.
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

  /** Ingest: per micro-batch, assign each vector to its nearest static
    * centroid map-side and commit (neighbor_id, centroid_id, __cv) under
    * `<path>/assign/batch=<id>`, centroid-partitioned. `onIndexed`
    * receives (rowsIndexed, batchId) after each commit.
    */
  def run(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      path: String)(onIndexed: (Long, Long) => Unit): DataStreamWriter[Row] = {
    vecs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val cents = spark.read.parquet(s"$path/centroids")
      val v = batch.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      val assigned = Ivf.assign(batch, idCol, vecCol, cents)
        .join(v, Seq("neighbor_id"))
      assigned.write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$path/assign/batch=$batchId")
      // commit marker AFTER the write completes: [[topK]] reads only
      // marked directories, so a query racing a half-written batch (a
      // parquet overwrite is not atomic) never sees uncommitted rows.
      // A retry overwrites the dir and re-creates the marker — the
      // brief marker-less window only hides the batch, never corrupts.
      touchCommit(spark, s"$path/assign/batch=$batchId")
      BatchIndex.purgeBeyond(spark, s"$path/assign", batchId)
      onIndexed(spark.read.parquet(s"$path/assign/batch=$batchId").count(), batchId)
    }
  }

  private val CommitMarker = "_GRAFT_COMMIT"

  private def touchCommit(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$CommitMarker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }

  private def committedDirs(spark: SparkSession, assignPath: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(assignPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    BatchIndex.batchDirIds(spark, assignPath)
      .map(id => s"$assignPath/batch=$id")
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(s"$d/$CommitMarker")))
  }

  /** Approximate top-k against the accumulated streamed index — the
    * [[Ivf.topKFromIndex]] query over every committed batch directory.
    * Output schema matches [[Ivf.topK]]: (probe_id, neighbor_id,
    * cosine, rank).
    */
  def topK(
      spark: SparkSession,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    // only COMMITTED batch directories (marker written after the batch's
    // parquet completes): a query issued while the ingest stream is live
    // never reads a half-written directory. Dead-incarnation dirs (a
    // reset checkpoint restarting at batch 0) are purged by the next
    // commit; between reset and first commit a query can still see the
    // old incarnation's committed rows — the same window every
    // BatchIndex consumer has, disclosed here rather than hidden.
    val dirs = committedDirs(spark, s"$path/assign")
    require(dirs.nonEmpty, s"no committed batch directories under $path/assign")
    Ivf.topKPruned(probes, idCol, vecCol, cents, k, nprobe)(
      // basePath keeps `batch` and `centroid_id` as discovered partition
      // columns over the explicit committed-dir list; the centroid
      // filter (applied inside topKPruned) prunes at PartitionFilters
      // level across every committed batch directory
      spark.read.option("basePath", s"$path/assign").parquet(dirs: _*).drop("batch"))
  }
}
