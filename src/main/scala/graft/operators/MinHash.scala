package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** MinHash + banded-LSH near-duplicate detection over text documents.
  *
  * Pipeline (the standard web-scale dedup shape — shingle, minhash,
  * band, bucket-join, verify):
  *
  *   1. shingle: distinct word n-grams per doc (map-only, scan-side);
  *   2. minhash: k permutation-min signatures over shingle hashes
  *      (map-only — one `transform` over a literal coefficient array);
  *   3. band: split the signature into b bands of r rows, one bucket key
  *      per band (map-only explode, b rows per doc);
  *   4. bucket-join: self-join on (band, bucket) — the ONLY shuffle, and
  *      it shuffles b small rows per doc, never all-pairs;
  *   5. verify: exact Jaccard on the candidate pairs only.
  *
  * 100 TB design: all-pairs comparison is O(n²) and impossible; this is
  * O(n·b) shuffle + O(candidates) verify. Candidates per bucket are
  * bounded because a bucket key has r×64 bits of hash; pathological
  * buckets (boilerplate docs) are the classic skew case — AQE skew-join
  * splitting handles the join, and a `max bucket size` guard can drop
  * degenerate buckets (not needed at test scale).
  *
  * Probability a true pair at Jaccard J reaches verify:
  * 1-(1-J^r)^b; defaults r=4, b=32 give >0.999998 at J=0.8.
  *
  * Determinism: the permutation coefficients derive from `seed` via a
  * fixed LCG, so results are reproducible run-to-run and cluster-to-
  * cluster (required by the correctness gate; also what you want in a
  * production dedup job).
  */
object MinHash {

  val Prime: Long = graft.functions.HashCoeffs.Prime

  /** Deterministic (a, b) coefficient pairs for k permutations (fixed
    * MMIX LCG, fully specified in [[graft.functions.HashCoeffs]]).
    */
  def coefficients(k: Int, seed: Long): (Seq[Long], Seq[Long]) = {
    val (as, bs) = graft.functions.HashCoeffs.coefficients(k, seed)
    (as.toSeq, bs.toSeq)
  }

  /** k-element minhash signature column over an array of shingle hashes.
    * sig[j] = min over shingles h of (a_j*h + b_j) mod Prime.
    * Empty shingle sets get Prime (= "infinity") in every slot — they
    * never collide with a non-empty doc, but DO collide with each other,
    * so callers must drop empty-shingle docs before banding (as
    * [[nearDupPairs]] does). Native expression — the k×|shingles| inner
    * loop is the pipeline's hot spot (see HashExprs).
    */
  def signature(shingleHashes: Column, k: Int, seed: Long): Column =
    graft.functions.HashExprs.minHashSignature(shingleHashes, k, seed)

  /** Explode a signature into (band, bucket) keys: b bands of r rows.
    * Bucket key is Spark's 64-bit xxhash of the band slice — engine-
    * private is fine here because buckets never leave Spark (the final
    * answer is exact-verified).
    */
  def bands(df: DataFrame, sigCol: String, b: Int, r: Int): DataFrame =
    df.select(
        col("*"),
        explode(transform(sequence(lit(0), lit(b - 1)),
          j => struct(j.as("band"), xxhash64(j, slice(col(sigCol), j * r + 1, lit(r))).as("bucket"))))
          .as("__band"))
      .select(col("*"), col("__band.band").as("band"), col("__band.bucket").as("bucket"))
      .drop("__band")

  /** Candidate pairs (idA < idB) sharing at least one LSH bucket.
    * Input: df with `id` and `sig` columns. Output: (id_a, id_b).
    *
    * `maxBucketSize` is the degenerate-bucket guard for web-scale
    * corpora: a bucket holding B docs contributes B² candidate rows, and
    * boilerplate (empty pages, license headers) routinely puts millions
    * of near-identical docs in one bucket — one such bucket IS an
    * all-pairs join. Buckets above the cap are dropped wholesale
    * (one count agg over the band rows, then a semi-join). Opt-in and
    * recall-trading by design: docs whose EVERY shared bucket is
    * degenerate lose their pairs — the standard web-dedup accept
    * (boilerplate clusters are handled by exact dedup upstream, q22's
    * hash-groupBy, where they cost O(B) not O(B²)).
    */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      sigCol: String,
      b: Int,
      r: Int,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val banded = bands(df.select(col(idCol).as("__id"), col(sigCol).as("__sig")), "__sig", b, r)
      .select(col("__id"), col("band"), col("bucket"))
    val kept = maxBucketSize.fold(banded) { cap =>
      require(cap >= 2, s"maxBucketSize must be >= 2, got $cap")
      val ok = banded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("__bn"))
        .where(col("__bn") <= cap)
        .select(col("band"), col("bucket"))
      banded.join(ok, Seq("band", "bucket"), "left_semi")
    }
    val l = kept.select(col("__id").as("id_a"), col("band"), col("bucket"))
    val rt = kept.select(col("__id").as("id_b"), col("band"), col("bucket"))
    l.join(rt, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Full near-dup pipeline over (id, text): returns exact-verified pairs
    * with integer intersection/union sizes of their n-gram shingle sets,
    * filtered to Jaccard >= num/den (integer-exact threshold compare:
    * inter*den >= num*union).
    */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int = 3,
      k: Int = 128,
      b: Int = 32,
      r: Int = 4,
      seed: Long = 42L,
      num: Int = 8,
      den: Int = 10): DataFrame = {
    // b*r beyond k would slice past the signature: the overrun bands
    // hash an EMPTY slice identically for every doc — each one a
    // whole-corpus bucket, degrading the join toward all-pairs
    require(b * r <= k, s"b*r must not exceed k: $b*$r > $k")
    // one definition of the scan+shingle+signature stage (corpusIndex —
    // also what the persisted-index and streaming paths consume, so the
    // semantics can't desynchronize), persisted once for its three
    // consumers: the banding branch and both verify sides. Cache lives
    // until clearCache()/session end — see JaccardJoin; for repeated
    // querying use [[writeCorpusIndex]] + [[nearDupPairsFromIndex]]
    val idx = corpusIndex(docs, idCol, textCol, ngram, k, seed)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cands = candidatePairs(idx.select(col("__id"), col("__sig")), "__id", "__sig", b, r)
    PairVerify.exact(cands, idx.select(col("__id"), col("__sh")), num, den)
  }

  /** Persist the dedup index: one row per doc with its shingle set AND
    * minhash signature, so repeated dedup runs (the build-once/query-many
    * shape — nightly dedup over a growing corpus, threshold sweeps) skip
    * the scan+shingle+signature stage entirely. At 100 TB this table is
    * the expensive artifact; candidate generation and verify against it
    * are cheap by comparison.
    */
  /** The (\_\_id, \_\_sh, \_\_sig) index rows of a document table — THE
    * single definition of the scan+shingle+signature stage, consumed by
    * [[nearDupPairs]], [[writeCorpusIndex]] and the streaming dedup.
    *
    * Docs with fewer than `ngram` tokens are dropped: their shingle sets
    * are empty, they can never be near-dups, and their all-"infinity"
    * signatures would collide into one bucket. (Callers that must KEEP
    * such docs — e.g. dedup output — anti-join drops against the
    * original table instead of semi-joining survivors.)
    */
  def corpusIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int = 3,
      k: Int = 128,
      seed: Long = 42L): DataFrame = {
    // spread: a single-file doc scan arrives as one split; the shingle +
    // k-hash signature stage is per-row expensive, so hash-repartition
    // the raw docs first (deterministic, one tiny shuffle of raw rows).
    // Filter on the raw token count (shingles empty ⟺ tokens < ngram):
    // filtering on size(__sh) would collapse into the projection and
    // re-run the shingle expression twice per row
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs
      .repartition(par, col(idCol))
      .where(size(TextOps.tokens(col(textCol))) >= ngram)
      .select(
        col(idCol).as("__id"),
        TextOps.shingles(TextOps.tokens(col(textCol)), ngram).as("__sh"))
      .withColumn("__sig", signature(TextOps.polyHashAll(col("__sh")), k, seed))
  }

  def writeCorpusIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      ngram: Int = 3,
      k: Int = 128,
      seed: Long = 42L): Unit =
    corpusIndex(docs, idCol, textCol, ngram, k, seed).write.mode("overwrite").parquet(path)

  /** Near-dup pairs from a [[writeCorpusIndex]] table: banding + verify
    * only — no re-shingling, no re-hashing. Same output and semantics as
    * [[nearDupPairs]] with the matching (ngram, k, seed); b*r must not
    * exceed the indexed k.
    */
  def nearDupPairsFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      b: Int = 32,
      r: Int = 4,
      num: Int = 8,
      den: Int = 10): DataFrame = {
    val idx = spark.read.parquet(path)
    require(Seq("__id", "__sh", "__sig").forall(idx.columns.contains),
      s"not a writeCorpusIndex table: ${idx.columns.mkString(",")}")
    // enforce b*r <= indexed k: overrun bands would slice empty and put
    // the whole corpus in one bucket per band (see nearDupPairs)
    idx.select(size(col("__sig"))).take(1).foreach { r0 =>
      val sigLen = r0.getInt(0)
      require(b * r <= sigLen, s"b*r exceeds the indexed signature length: $b*$r > $sigLen")
    }
    val cands = candidatePairs(idx.select(col("__id"), col("__sig")), "__id", "__sig", b, r)
    PairVerify.exact(cands, idx.select(col("__id"), col("__sh")), num, den)
  }

  /** Corpus-level near-dup removal: drop every document that is the
    * HIGHER id of a verified near-dup pair (greedy keep-lowest-id
    * survivor — the standard web-dedup policy; in a chain a<b<c the
    * minimum survives, the rest each appear as an id_b and drop).
    *
    * Scale: survivors = docs ANTI JOIN (distinct id_b) — one shuffle of
    * ids, no doc payload moves through the pair pipeline.
    */
  def dedupCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int = 3,
      k: Int = 128,
      b: Int = 32,
      r: Int = 4,
      seed: Long = 42L,
      num: Int = 8,
      den: Int = 10): DataFrame = {
    val drop = nearDupPairs(docs, idCol, textCol, ngram, k, b, r, seed, num, den)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Incremental ingest dedup — the DAILY-BATCH shape: drop each new doc
    * that near-dups the EXISTING corpus (history is immutable, never
    * dropped) or a LOWER-id doc of the same batch (within-batch
    * keep-lowest, [[dedupCorpus]]'s policy). The batch analogue of
    * [[graft.streaming.StreamingDedup]], oracle-checkable.
    *
    * Probe asymmetry is the scale point: only NEW docs' band rows drive
    * the candidate join, so history×history candidates are never
    * generated — per-ingest cost is O(|batch| · b) probe rows against
    * the corpus band index, not O(|corpus|²). (A service reuses the
    * banded index via [[writeCorpusIndex]]; this self-contained form
    * recomputes it from `corpus` for the gate.)
    *
    * PRECONDITION: an id appearing in BOTH corpus and batch must denote
    * the SAME text. The combined frame keys shingle sets by id, so a
    * batch doc reusing a history id with DIFFERENT text attaches both
    * variants' shingle sets in the verify join — intersection/union
    * counts become a mix of the two and the drop decision is undefined.
    * (Identical text is fine and well-defined: the same-id twin is
    * excluded from candidates by the `id_b =!= id_a` guard and the
    * duplicated verify rows collapse in the final `distinct()` — the
    * PropertySpec self-dedup law exercises exactly this.) A service
    * ingesting with a fresh monotone id space satisfies this trivially.
    */
  def dedupIncrement(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int = 3,
      k: Int = 128,
      b: Int = 32,
      r: Int = 4,
      seed: Long = 42L,
      num: Int = 8,
      den: Int = 10,
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(b * r <= k, s"b*r must not exceed k: $b*$r > $k")
    // one combined (id, shingles, signature, isNew) frame, persisted: it
    // feeds the band explode (referenced twice by the probe self-join)
    // and the verify stage's shingle sets
    val combined = corpusIndex(corpus, idCol, textCol, ngram, k, seed)
      .withColumn("__new", lit(false))
      .unionByName(corpusIndex(batch, idCol, textCol, ngram, k, seed)
        .withColumn("__new", lit(true)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandedAll = bands(combined.select(col("__id"), col("__sig"), col("__new")), "__sig", b, r)
      .select(col("__id"), col("__new"), col("band"), col("bucket"))
    // same degenerate-bucket guard as [[candidatePairs]]: a boilerplate
    // bucket with B history docs fans every probing batch doc out B ways
    val banded = maxBucketSize.fold(bandedAll) { cap =>
      require(cap >= 2, s"maxBucketSize must be >= 2, got $cap")
      val ok = bandedAll.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("__bn"))
        .where(col("__bn") <= cap)
        .select(col("band"), col("bucket"))
      bandedAll.join(ok, Seq("band", "bucket"), "left_semi")
    }
    // candidates: (new doc, other) sharing a bucket — other is history
    // (any id) or an earlier same-batch doc; each unordered pair
    // surfaces exactly once (only the droppable side probes)
    val cands = banded.where(col("__new"))
      .select(col("__id").as("id_a"), col("band"), col("bucket"))
      .join(banded.select(col("__id").as("id_b"), col("__new").as("__bn"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .where(col("id_b") =!= col("id_a") && (!col("__bn") || col("id_b") < col("id_a")))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val drop = PairVerify.exact(cands, combined.select(col("__id"), col("__sh")), num, den)
      .select(col("id_a").as(idCol)).distinct()
    // combined stays lazily cached for the run (the JaccardJoin shingle
    // convention: CacheManager dedupes re-executions; callers looping
    // over different corpora clear the cache between runs)
    batch.join(drop, Seq(idCol), "left_anti")
  }

  /** Cluster-canonical variant of [[dedupCorpus]]: connected components
    * over the verified pair graph, keep exactly ONE (min-id) doc per
    * near-dup cluster — the transitive policy of
    * [[JaccardJoin.dedupCorpusClustered]] on the probabilistic (LSH)
    * candidate path. Same probabilistic caveat as [[nearDupPairs]]: an
    * LSH-missed pair can split a cluster in two (each half still dedups
    * internally).
    */
  def dedupCorpusClustered(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int = 3,
      k: Int = 128,
      b: Int = 32,
      r: Int = 4,
      seed: Long = 42L,
      num: Int = 8,
      den: Int = 10): DataFrame =
    Components.keepMinPerCluster(docs, idCol,
      nearDupPairs(docs, idCol, textCol, ngram, k, b, r, seed, num, den))
}
