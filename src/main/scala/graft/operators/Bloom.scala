package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashExprs, HashRuntime}

/** Distributed bloom-filter build + probe, for semi/anti-join
  * pre-filtering when the build side is too large to broadcast-join on
  * its raw keys but its BITMAP still fits in a task binary.
  *
  * Why this exists at 100 TB: a semi-join of a huge exploded fact side
  * (e.g. every n-gram of every corpus doc) against a banlist shuffles the
  * WHOLE fact side when the banlist exceeds the broadcast threshold. A
  * bloom filter of the banlist is 2 bytes/key at fpp≈1e-3 — 100–1000×
  * smaller than the keys — so the probe runs scan-side and only true
  * hits plus the fpp share of the fact side ever reach the shuffle. No
  * false negatives means the downstream EXACT join sees every true
  * match; false positives only add candidates, which the exact join
  * discards — the composed result is identical to the plain join.
  * (Spark's AQE injects the same shape for selective equi-joins as
  * "runtime row-level filtering"; this operator makes it explicit,
  * composable with explode/distinct stages AQE can't see through.)
  *
  * Build: one `treeAggregate` OR-fold of per-partition bitmaps — no row
  * collect; the driver receives only the final bit array (same contract
  * as `DataFrameStatFunctions.bloomFilter`). Probe: a native codegen'd
  * expression ([[graft.functions.BloomMightContain]]) over `xxhash64`
  * of the key, so the hot path stays inside WholeStageCodegen.
  *
  * Sizing: `sizeFor` rounds `expectedKeys * bitsPerKey` bits up to a
  * power of two; k = round(ln2 · bitsPerKey) probes (the optimum for
  * that load factor). The bit array is plan-embedded and broadcast once
  * per stage with the task binary: at the default 16 bits/key a 10M-key
  * banlist costs 20 MB — fine; past ~10^8 keys prefer partitioned
  * semi-join on key hashes instead (the array itself caps at 2^31 bits).
  */
object Bloom {

  /** An immutable built filter: probe columns with [[mightContain]].
    * `keyHash` must be the same hash the builder used — both sides of
    * that contract live in this object (xxhash64, seed 42 = Spark's
    * default), so callers never see the raw hash.
    */
  final case class Filter(bits: Array[Long], k: Int) {
    /** True for every key that was inserted; false positives at the
      * configured rate, never false negatives. Null keys probe as null
      * (filtered out by `where`, matching join semantics on null keys) —
      * guarded explicitly here, because `xxhash64` itself maps null to
      * the seed constant, which would otherwise let a null probe "match"
      * a build side that contained nulls.
      */
    def mightContain(key: Column): Column =
      when(key.isNull, lit(null).cast("boolean"))
        .otherwise(HashExprs.bloomMightContain(xxhash64(key), bits, k))

    def sizeBytes: Long = bits.length.toLong * 8
  }

  /** Bit-array word count (power of two) for `expectedKeys` at
    * `bitsPerKey`. Caps at 2^25 words = 2^31 bits = 256 MB — beyond
    * that a bloom stops being the right tool (see class doc).
    */
  def sizeFor(expectedKeys: Long, bitsPerKey: Int): Int = {
    require(expectedKeys >= 0, s"expectedKeys must be >= 0, got $expectedKeys")
    require(bitsPerKey >= 1 && bitsPerKey <= 64, s"bitsPerKey must be in [1,64], got $bitsPerKey")
    val bitsWanted = math.max(64L, expectedKeys * bitsPerKey)
    var words = 1
    while (words.toLong * 64 < bitsWanted && words < (1 << 25)) words <<= 1
    words
  }

  /** Number of probe hashes for a load of `bitsPerKey`: ln2 · b, the
    * classic optimum, clamped to [1, 32].
    */
  def probesFor(bitsPerKey: Int): Int =
    math.max(1, math.min(32, math.round(0.6931472 * bitsPerKey).toInt))

  /** Build a filter over `key` of `df`. Runs two actions on `df` (a
    * count for sizing unless `expectedKeys` is given, then the
    * bitmap fold); callers looping over the same build side should
    * persist it first.
    */
  def build(
      df: DataFrame,
      key: Column,
      bitsPerKey: Int = 16,
      expectedKeys: Option[Long] = None): Filter = {
    // null keys never enter the bitmap (join semantics: NULL matches
    // nothing) — without the filter, xxhash64's null-to-seed-constant
    // mapping would insert a phantom key every null probe then "finds"
    val keyed = df.select(key.as("__k")).where(col("__k").isNotNull)
      .select(xxhash64(col("__k")).as("__h"))
    val n = expectedKeys.getOrElse(keyed.count())
    val words = sizeFor(n, bitsPerKey)
    val k = probesFor(bitsPerKey)
    import df.sparkSession.implicits._
    // treeAggregate: per-partition bitmaps OR-fold up a tree — the
    // driver materializes one Array[Long], never the keys
    val bits = keyed.as[Long].rdd.treeAggregate(new Array[Long](words))(
      seqOp = (acc, h) => { HashRuntime.bloomInsert(h, acc, k); acc },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      })
    Filter(bits, k)
  }

  /** Persist a built filter as a one-row parquet table (little-endian
    * bitmap bytes + probe count) — the build-once/query-many shape the
    * persisted minhash/IVF indexes already follow: build the banlist
    * bitmap in the ingest pipeline, probe it from every downstream job
    * without re-scanning the banlist.
    */
  def write(spark: org.apache.spark.sql.SparkSession, path: String, filter: Filter): Unit = {
    import spark.implicits._
    Seq((HashRuntime.bloomBytesFromWords(filter.bits), filter.k))
      .toDF("bits", "k")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a filter written by [[write]]. The driver reads ONE bounded
    * row (the bitmap — same size it held at build time), never keys.
    */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): Filter = {
    val row = spark.read.parquet(path).select("bits", "k").head()
    val bytes = row.getAs[Array[Byte]](0)
    require(bytes.length % 8 == 0 && java.lang.Long.bitCount(bytes.length / 8L) == 1,
      s"corrupt bloom table at $path: ${bytes.length} bytes is not a power-of-two word count")
    val k = row.getInt(1)
    // k <= 0 would make every probe vacuously true (the probe loop never
    // runs) — a corrupt table must fail loudly, not pass the whole corpus
    require(k >= 1 && k <= 64,
      s"corrupt bloom table at $path: probe count k=$k outside [1, 64] (probesFor caps at 32)")
    Filter(HashRuntime.bloomWordsFromBytes(bytes), k)
  }
}
