package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting.
  *
  * A document's simhash is a 64-bit fingerprint where bit j is set iff
  * the majority of its tokens hash to 1 in slot j; near-duplicate docs
  * have fingerprints at small Hamming distance.
  *
  * 100 TB design: fingerprints are computed map-side (one 64-bit long per
  * doc). Candidate generation uses the pigeonhole principle: split the 64
  * bits into (maxHamming+1) chunks — two fingerprints within maxHamming
  * bits of each other must agree exactly on at least one chunk, so a
  * per-chunk equality join finds all candidates with (maxHamming+1)
  * shuffled rows per doc, never all-pairs. Final filter is the exact
  * bit_count(a^b) <= maxHamming test on candidates only.
  */
object SimHash {

  /** 64-bit simhash of an array of token hashes. Slot bit for token h and
    * slot j: parity of ((a_j*h + b_j) mod p). Deterministic via the same
    * LCG coefficient stream as [[MinHash.coefficients]]. Native
    * expression — the 64×|tokens| vote loop is per-row hot
    * (see [[graft.functions.SimHash64]]).
    */
  def simhash(tokenHashes: Column, seed: Long = 42L): Column =
    graft.functions.HashExprs.simHash64(tokenHashes, seed)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("int")

  private def requireRadius(maxHamming: Int): Unit =
    // chunks = maxHamming+1 must leave chunks of >= 4 bits: at width < 4
    // bucket keys carry so little signal that the pigeonhole join
    // degenerates toward all-pairs (and width 0 would mask every chunk to
    // 0 — ONE quadratic bucket). 64/16 = 4 bits is the floor.
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15] (chunk width 64/(maxHamming+1) >= 4 bits), got $maxHamming")

  /** (id, fp) -> one row per pigeonhole chunk: (__id, __fp, chunk,
    * bits). Fingerprint 0 (no signal — empty token stream / degenerate
    * payload) is dropped BEFORE banding: a corpus with many trivial
    * inputs would put them ALL in one quadratic bucket on every chunk
    * (MinHash's empty-shingle guard, same reasoning); a genuine input
    * collides with fp 0 with probability 2^-64.
    */
  private def chunkKeys(df: DataFrame, idCol: String, fpCol: String, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    df.select(col(idCol).as("__id"), col(fpCol).as("__fp"))
      .where(col("__fp") =!= 0L)
      .select(
        col("__id"), col("__fp"),
        explode(transform(sequence(lit(0), lit(chunks - 1)),
          c => struct(c.as("chunk"),
            // chunk c = bits [c*width, (c+1)*width) (last chunk keeps the remainder)
            when(c === chunks - 1, call_function("shiftrightunsigned", col("__fp"), c * width))
              .otherwise(call_function("shiftrightunsigned", col("__fp"), c * width)
                .bitwiseAND(lit((1L << width) - 1))).as("bits")))).as("__c"))
      .select(col("__id"), col("__fp"), col("__c.chunk").as("chunk"), col("__c.bits").as("bits"))
  }

  /** Pairs (idA < idB) with hamming(simhash) <= maxHamming, found via
    * pigeonhole chunk join (no all-pairs).
    * Input df must have `id` (orderable) and `fp` (long) columns.
    */
  def nearPairs(df: DataFrame, idCol: String, fpCol: String, maxHamming: Int): DataFrame = {
    requireRadius(maxHamming)
    val keyed = chunkKeys(df, idCol, fpCol, maxHamming)
    val l = keyed.select(col("__id").as("id_a"), col("__fp").as("fp_a"), col("chunk"), col("bits"))
    val r = keyed.select(col("__id").as("id_b"), col("__fp").as("fp_b"), col("chunk"), col("bits"))
    l.join(r, Seq("chunk", "bits"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Incremental-ingest drop set over fingerprints — the
    * [[MinHash.dedupIncrement]] policy on Hamming distance: a `batch`
    * id drops iff it is within `maxHamming` of any `history` row (any
    * id; history is immutable and never dropped) or of a LOWER-id row
    * of the same batch. Returns the dropped batch ids (one `id` column).
    *
    * Probe asymmetry is the scale point: only batch chunk rows drive
    * the candidate join — history×history candidates are never
    * generated, so per-ingest cost is O(|batch| · chunks) probe rows
    * against the history chunk index. Hamming verify is computed
    * INLINE from the two fingerprints riding the candidate row — no
    * second verify join (unlike shingle-set verification, the
    * fingerprint IS the full evidence). Fingerprint-0 rows are excluded
    * on both sides (degenerate inputs never pair — callers accept them
    * without indexing). PRECONDITION: history and batch id spaces are
    * disjoint (an id in both would self-pair; fresh monotone ingest ids
    * satisfy this trivially).
    */
  def incrementalDrops(
      history: DataFrame, batch: DataFrame,
      idCol: String, fpCol: String, maxHamming: Int): DataFrame = {
    requireRadius(maxHamming)
    val combined = chunkKeys(history, idCol, fpCol, maxHamming).withColumn("__new", lit(false))
      .unionByName(chunkKeys(batch, idCol, fpCol, maxHamming).withColumn("__new", lit(true)))
    combined.where(col("__new"))
      .select(col("__id").as("id_a"), col("__fp").as("fp_a"), col("chunk"), col("bits"))
      .join(combined.select(col("__id").as("id_b"), col("__fp").as("fp_b"),
        col("__new").as("__bn"), col("chunk"), col("bits")), Seq("chunk", "bits"))
      .where(col("id_b") =!= col("id_a") && (!col("__bn") || col("id_b") < col("id_a")))
      .where(hamming(col("fp_a"), col("fp_b")) <= maxHamming)
      .select(col("id_a").as(idCol)).distinct()
  }

  /** Corpus-level simhash dedup: drop every doc that is the higher id of
    * a [[nearPairs]] pair (greedy keep-lowest-id — the same policy as
    * [[MinHash.dedupCorpus]] and [[graft.operators.Similarity.dedupCorpus]],
    * over Hamming distance instead of Jaccard/cosine). Survivors =
    * docs ANTI JOIN distinct id_b: one ids-only shuffle; fingerprints
    * never ride the candidate join. Docs with fp == 0 (empty token
    * stream) never pair, so they always survive.
    */
  def dedupCorpus(df: DataFrame, idCol: String, fpCol: String, maxHamming: Int): DataFrame = {
    val drop = nearPairs(df, idCol, fpCol, maxHamming)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }
}
