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

  /** Pairs (idA < idB) with hamming(simhash) <= maxHamming, found via
    * pigeonhole chunk join (no all-pairs).
    * Input df must have `id` (orderable) and `fp` (long) columns.
    */
  def nearPairs(df: DataFrame, idCol: String, fpCol: String, maxHamming: Int): DataFrame = {
    // chunks = maxHamming+1 must leave chunks of >= 4 bits: at width < 4
    // bucket keys carry so little signal that the pigeonhole join
    // degenerates toward all-pairs (and width 0 would mask every chunk to
    // 0 — ONE quadratic bucket). 64/16 = 4 bits is the floor.
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15] (chunk width 64/(maxHamming+1) >= 4 bits), got $maxHamming")
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val keyed = df.select(col(idCol).as("__id"), col(fpCol).as("__fp"))
      // Empty-token docs all fingerprint to exactly 0 (no votes -> no
      // bits), so a corpus with many trivial docs would put them ALL in
      // one quadratic bucket on every chunk; drop them before banding
      // (MinHash's empty-shingle guard, same reasoning). A genuine doc
      // collides with fp 0 with probability 2^-64.
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
    val l = keyed.select(col("__id").as("id_a"), col("__fp").as("fp_a"), col("chunk"), col("bits"))
    val r = keyed.select(col("__id").as("id_b"), col("__fp").as("fp_b"), col("chunk"), col("bits"))
    l.join(r, Seq("chunk", "bits"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("fp_a"), col("fp_b")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
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
