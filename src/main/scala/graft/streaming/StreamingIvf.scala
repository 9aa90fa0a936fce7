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
      BatchIndex.purgeBeyond(spark, s"$path/assign", batchId)
      onIndexed(spark.read.parquet(s"$path/assign/batch=$batchId").count(), batchId)
    }
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
    require(BatchIndex.batchDirIds(spark, s"$path/assign").nonEmpty,
      s"no committed batch directories under $path/assign")
    Ivf.topKPruned(probes, idCol, vecCol, cents, k, nprobe) { probed =>
      // read the tree ROOT: `batch` and `centroid_id` both become
      // discovered partition columns (per-dir reads would conflict on
      // the mixed directory structure), and the centroid filter still
      // prunes at PartitionFilters level across every batch directory
      val idxRaw = spark.read.parquet(s"$path/assign")
      val typed: Seq[Any] = idxRaw.schema("centroid_id").dataType match {
        case org.apache.spark.sql.types.IntegerType => probed.map(_.toInt)
        case _ => probed
      }
      idxRaw.where(col("centroid_id").isin(typed: _*)).drop("batch")
    }
  }
}
