package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins (point-in-interval, interval-overlap) as bucketed
  * equi-joins.
  *
  * Spark plans a bare non-equi predicate (`p BETWEEN s AND e`) as a
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) compares, and a
  * hard failure once the interval side outgrows the broadcast limit. At
  * 100 TB (events vs. incident windows, reads vs. genomic intervals,
  * clicks vs. campaign flights) neither side broadcasts, and a
  * nested-loop join is the cluster's whole night.
  *
  * The fix is the classic bucket decomposition: quantize the range
  * dimension into fixed-width buckets, explode each interval to every
  * bucket it touches, tag each point with its single bucket, and
  * equi-join on the bucket id with the exact range predicate kept as
  * the join's residual filter. The join becomes a shuffle/broadcast
  * HASH join on `__bkt` — partitionable, AQE-skew-splittable, no
  * nested loop — and the residual discards the same-bucket non-matches.
  *
  * Exactness (proved by PropertySpec laws against the brute-force
  * join):
  *  - a point p with s <= p <= e satisfies bucket(s) <= bucket(p) <=
  *    bucket(e), so the matching bucket row exists: no false negatives;
  *  - each point carries exactly ONE bucket and `sequence` lists each
  *    covered bucket ONCE, so a (point, interval) pair joins at most
  *    once: no duplicate-pair dedup pass is needed;
  *  - for interval-overlap, a pair shares every bucket both intervals
  *    touch; keeping only the FIRST shared bucket
  *    (`greatest(bucket(sL), bucket(sR))`) restores exactly-once.
  *
  * Bucket width tunes replication vs. residual selectivity: intervals
  * explode to `span/width + 1` rows, points in a bucket compare against
  * every interval touching it. Rule of thumb: width ≈ the typical
  * interval span (each interval lands in 1–2 buckets and the residual
  * stays selective). `maxBucketsPerInterval` (assert, not silent
  * truncation) catches the degenerate call — one huge interval exploded
  * a million ways — loudly at run time.
  *
  * Bucket ids use true floor division (`(x - pmod(x, w)) / w` with the
  * divide in DECIMAL), exact on LONG and correct for negative
  * coordinates — `floor(x / w)`, or even the exact-multiple divide done
  * with `Column./` (double division in Spark!), would round through a
  * double and lose exactness above 2^53 (epoch-micros scale is 1.7e15,
  * only ~5x below that cliff; one misassigned bucket is a silently lost
  * match).
  */
object RangeJoin {

  /** True floor division of a long column — exact, negative-safe. The
    * numerator is an exact multiple of `w` (pmod is non-negative), so
    * SQL `div` (IntegralDivide: truncating LONG division, plain codegen
    * arithmetic — no Decimal allocation, safe in a join residual
    * evaluated per candidate) returns the exact floor quotient;
    * `Column./` would be IEEE-double division and corrupt bucket ids
    * past 2^53.
    */
  private[graft] def fdiv(x: Column, w: Long): Column =
    call_function("div", x - pmod(x, lit(w)), lit(w))

  private def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"range join requires disjoint column names; shared: ${shared.mkString(", ")}")
  }

  /** Join `points` to every interval (inclusive bounds) containing
    * `pointCol`: s <= p <= e. Point/bound columns must be LONG (callers
    * convert timestamps via `unix_micros` — exact, tz-free).
    *
    * `joinType`: "inner" or "left_outer" (points keep their single
    * bucket row, so an unmatched point survives exactly once).
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      joinType: String = "inner",
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(joinType == "inner" || joinType == "left_outer",
      s"pointInInterval supports inner/left_outer, got $joinType")
    requireDisjoint(points, intervals)

    val p = points.withColumn("__bkt", fdiv(col(pointCol), bucketWidth))
    val lo = fdiv(col(startCol), bucketWidth)
    val hi = fdiv(col(endCol), bucketWidth)
    val iv = intervals
      // assert_true returns NULL on success: the where keeps the check
      // in the plan without filtering anything
      .where(assert_true(
        col(startCol) <= col(endCol) &&
          hi - lo < lit(maxBucketsPerInterval.toLong),
        lit(s"interval invalid or wider than $maxBucketsPerInterval buckets " +
          s"of $bucketWidth — raise bucketWidth or maxBucketsPerInterval")).isNull)
      .withColumn("__bkt", explode(sequence(lo, hi)))

    p.join(iv,
        p("__bkt") === iv("__bkt") &&
          col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol),
        joinType)
      .select((points.columns ++ intervals.columns).map(col).toSeq: _*)
  }

  /** Join two interval sets on overlap: sL <= eR AND sR <= eL
    * (inclusive bounds, LONG columns). Inner join only — an overlap
    * pair exists in every shared bucket, and the first-shared-bucket
    * filter that restores exactly-once has no row to keep for an
    * unmatched left interval.
    *
    * `slices` parallelizes the quadratic part. The bucket join has one
    * key per time bucket — a month of day-wide buckets is 30 join keys,
    * so on a 32-core (or 1000-executor) shuffle most tasks sit idle
    * while the dense center buckets do n² residual compares. With
    * slices = S, each RIGHT row is assigned one of S hash slices
    * (content-deterministic, so retries are stable) and each LEFT row
    * is replicated to all S; the join key becomes (bucket, slice) —
    * S× the keys, each task 1/S of a bucket's compares, identical total
    * compare count and identical output (a pair still meets exactly
    * once: one first-shared bucket × one right slice). Replication
    * cost is S× the LEFT side's exploded bucket rows — intervals are
    * (start, end, ids), so this is megabytes when the pair output is
    * the real cost. Size S so buckets·S comfortably exceeds the
    * cluster's cores; 1 (default) skips the machinery entirely.
    */
  def intervalOverlap(
      left: DataFrame,
      leftStart: String,
      leftEnd: String,
      right: DataFrame,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096,
      slices: Int = 1): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(slices >= 1, s"slices must be >= 1, got $slices")
    requireDisjoint(left, right)

    def exploded(df: DataFrame, s: String, e: String): DataFrame = {
      val lo = fdiv(col(s), bucketWidth)
      val hi = fdiv(col(e), bucketWidth)
      df.where(assert_true(
          col(s) <= col(e) && hi - lo < lit(maxBucketsPerInterval.toLong),
          lit(s"interval invalid or wider than $maxBucketsPerInterval buckets " +
            s"of $bucketWidth — raise bucketWidth or maxBucketsPerInterval")).isNull)
        // carry the start bucket: the exactly-once residual below needs
        // it PER CANDIDATE, and a column read is free where re-deriving
        // it (division per probe) would dominate the quadratic join
        .withColumn("__lo", lo)
        .withColumn("__bkt", explode(sequence(lo, hi)))
    }

    val l0 = exploded(left, leftStart, leftEnd)
    val r0 = exploded(right, rightStart, rightEnd)
    val (l, r) =
      if (slices == 1) (l0, r0)
      else {
        val ls = l0.withColumn("__sl", explode(sequence(lit(0), lit(slices - 1))))
        // slice from the right ROW's content (not the bucket), computed
        // once per interval: deterministic under retries, and identical
        // duplicate rows sharing a slice only affects balance, not
        // correctness
        val rs = r0.withColumn("__sl",
          pmod(xxhash64(struct(right.columns.map(col).toSeq: _*)), lit(slices.toLong))
            .cast("int"))
        // the EXPLICIT partition count is the point, not the shuffle:
        // interval rows are tiny, so AQE's size-based coalescing (or a
        // broadcast join streaming a 1-partition cached frame) would run
        // the whole n² residual on ONE task — AQE can only see bytes,
        // and the cost here is compute per (bucket, slice) cell. A
        // user-specified numPartitions is exempt from AQE coalescing,
        // so each core gets its share of cells regardless of input size
        val parts = left.sparkSession.sessionState.conf.numShufflePartitions
        (ls.repartition(parts, ls("__bkt"), ls("__sl")),
          rs.repartition(parts, rs("__bkt"), rs("__sl")))
      }
    val sliceEq = if (slices == 1) lit(true) else l("__sl") === r("__sl")
    l.join(r,
        l("__bkt") === r("__bkt") && sliceEq &&
          col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd) &&
          // exactly-once: keep the pair only in the first bucket both touch
          l("__bkt") === greatest(l("__lo"), r("__lo")),
        "inner")
      .select((left.columns ++ right.columns).map(col).toSeq: _*)
  }
}
