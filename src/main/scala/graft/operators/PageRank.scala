package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank over an ids-only weighted edge list — the
  * authority-ranking stage of web-crawl curation (domain/page ranking for
  * crawl-frontier prioritization and source-quality weighting, the signal
  * CommonCrawl-scale pipelines mix into per-source sampling decisions).
  *
  * Iteration model (the standard power-iteration form, fixed round count
  * like [[Components.connectedComponents]]):
  *
  *   pr[0](v)   = S                                    (scale constant)
  *   pr[i+1](v) = S·(100-d)/100
  *              + d/100 · Σ_{(u,v,w)∈E} (pr[i](u)·w) div outw(u)
  *
  * with d the damping percentage and outw(u) = Σ w over u's out-edges.
  * Dangling nodes (no out-edges) absorb rank without redistributing it —
  * the "pruned" PageRank variant; total mass is not conserved, relative
  * ordering is what downstream sampling consumes. Documented, not hidden.
  *
  * Cross-engine determinism: ALL arithmetic is BIGINT — ranks are scaled
  * integers, per-edge contributions use integer division, and integer
  * sums are order-independent (double sums are not). An oracle engine
  * replaying the same recurrence matches bit-for-bit at any parallelism.
  *
  * Scale design: the edge list carries (src, dst, w, outw) longs only —
  * never payloads. Each iteration is one hash join on src (the edge side
  * is pre-partitioned by src ONCE and reused, so only the small rank
  * frame shuffles per round) plus one aggregation by dst. State per
  * round is O(|V|) rank rows; candidate volume is O(|E|) exactly, no
  * explosion. Fixed iteration count keeps the lineage bounded (5 rounds
  * ≈ the practical convergence horizon for ranking use at damping 0.85).
  */
object PageRank {

  /** Conf key: edge-row count at or below which the power iteration runs
    * on the DRIVER over the collected ids-only edge list instead of the
    * distributed per-round join+agg loop. Default 1000000 edge rows
    * (~24 MB of (src, dst, w) longs) — the q89 transition graph at sf0.1
    * is 309k edges, and at that size the loop's fixed cost (5 rounds of
    * join/agg/truncate jobs, ~4.7 s measured) dwarfs the ~1.5M integer
    * operations the recurrence actually needs. Same size-keyed guard
    * device as [[Components.LocalEdgeMaxKey]]: the count is measured
    * anyway (loop parallelism sizing), corpus-scale graphs take the
    * distributed loop unchanged, and all arithmetic is the identical
    * BIGINT recurrence — bit-identical by the LlmOpsSpec law. Set 0 to
    * force the loop.
    */
  val LocalEdgeMaxKey = "spark.graft.pagerank.localEdgeMax"

  /** Driver evaluation of the exact BIGINT recurrence — the local fast
    * path of [[ranks]]. Same math, same integer-division order:
    * pr[0](v) = scale; per round S(v) = Σ (pr(u)·w) div outw(u) over
    * in-edges, pr[i+1](v) = teleport + (dampingPct·S(v)) div 100 for
    * EVERY node (a source-only node receives nothing and lands exactly
    * on `teleport`, reproducing the loop's folded constant frames).
    * Integer sums commute, so iteration order is irrelevant.
    * Package-visible for the equality law in LlmOpsSpec.
    */
  private[graft] def localRanks(
      edges: Array[(Long, Long, Long)],
      iterations: Int,
      dampingPct: Int,
      scale: Long): Array[(Long, Long)] = {
    val teleport = scale * (100L - dampingPct) / 100L
    val outw = new scala.collection.mutable.LongMap[Long](edges.length)
    edges.foreach { case (s, _, w) => outw(s) = outw.getOrElse(s, 0L) + w }
    val nodes = {
      val set = new java.util.TreeSet[java.lang.Long]()
      edges.foreach { case (s, d, _) => set.add(s); set.add(d) }
      set.toArray(new Array[java.lang.Long](0)).map(_.longValue)
    }
    var pr = new scala.collection.mutable.LongMap[Long](nodes.length)
    nodes.foreach(v => pr(v) = scale)
    for (_ <- 1 to iterations) {
      val s = new scala.collection.mutable.LongMap[Long](nodes.length)
      edges.foreach { case (u, v, w) =>
        s(v) = s.getOrElse(v, 0L) + (pr(u) * w) / outw(u)
      }
      val next = new scala.collection.mutable.LongMap[Long](nodes.length)
      nodes.foreach(v => next(v) = teleport + (dampingPct * s.getOrElse(v, 0L)) / 100L)
      pr = next
    }
    nodes.map(v => (v, pr(v)))
  }

  /** Rank every node of the directed weighted graph `edges`.
    *
    * @param edges      (srcCol, dstCol, wCol) rows; parallel edges should
    *                   be pre-aggregated (duplicate (src,dst) rows act as
    *                   independent edges, which is also well-defined)
    * @param iterations fixed power-iteration rounds (>= 1)
    * @param dampingPct damping factor as an integer percentage (85 = 0.85)
    * @param scale      fixed-point scale of the rank values (1e6 → rank
    *                   1.0 is 1000000)
    * @return (node LONG, pr LONG) — pr is the scaled rank after the last
    *         round
    */
  def ranks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      iterations: Int = 5,
      dampingPct: Int = 85,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct must be in [0,100], got $dampingPct")
    val spark = edges.sparkSession

    // The caller's edge frame can be arbitrarily expensive (q89 builds it
    // with a window over the fact table) and it fans out FOUR ways below
    // (out-weight agg, ew join left side, both node projections) — cache
    // the ids-only projection first so the upstream computes exactly once.
    val e = edges.select(
        col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"),
        col(wCol).cast("long").as("__w"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Size the LOOP's parallelism to the graph, not the corpus (the
    // Components rule): the edge list is ids-only and usually orders of
    // magnitude smaller than whatever produced it, and every round would
    // otherwise pay a full corpus-sized task wave. ~2M edge rows
    // (~50 MB) per partition; grows back to cluster parallelism on real
    // graphs. Floor at min(8, cores): a 1-partition loop serializes the
    // per-round join/agg even when cores are idle (measured ~1s over 5
    // rounds at sf0.1) — small-but-multi beats single. e is persisted
    // above, so this count doubles as the eager cache fill.
    val nE = e.count()
    // Local fast path (round-13 optimization; see LocalEdgeMaxKey): the
    // recurrence over a driver-sized edge list is pure integer
    // arithmetic — collect the ids-only projection, evaluate, return a
    // LocalRelation. Guarded by the MEASURED edge count (computed anyway
    // for loop sizing); larger graphs run the distributed loop below.
    val localMax = spark.conf.get(LocalEdgeMaxKey, "1000000").toLong
    if (nE <= localMax) {
      val rows = e.collect()
      // a null endpoint/weight has engine-specific join/agg semantics in
      // the loop — leave that (never-seen) shape to the loop unchanged
      val clean = !rows.exists(r => r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))
      if (clean) {
        val arr = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // a source whose TOTAL out-weight is 0 (all-zero or cancelling
        // weights) would divide by zero in localRanks, where the loop's
        // `div` yields null and silently drops the contribution — leave
        // that pathological shape to the loop unchanged (ADVICE r13)
        val outw = new scala.collection.mutable.LongMap[Long](arr.length)
        arr.foreach { case (s, _, w) => outw(s) = outw.getOrElse(s, 0L) + w }
        if (!outw.values.exists(_ == 0L)) {
          e.unpersist()
          val ranked = localRanks(arr, iterations, dampingPct, scale)
          // explicit Row + schema (no implicit-encoder reflection): a
          // plain LocalRelation, broadcastable by downstream joins
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("pr",
              org.apache.spark.sql.types.LongType, nullable = false)))
          return spark.createDataFrame(
            java.util.Arrays.asList(ranked.map(p =>
              org.apache.spark.sql.Row(p._1, p._2)): _*), schema)
        }
      }
    }
    val dp = spark.sparkContext.defaultParallelism.toLong
    val parallelism = math.max(math.min(8L, dp),
      math.min(dp, nE / 2000000L)).toInt

    // Out-weight attaches to the edge list ONCE; the per-iteration join
    // then needs only (rank ⋈ edges).
    val ew = e
      .join(e.groupBy(col("__src")).agg(sum(col("__w")).as("__outw")), "__src")

    // Nodes with at least one IN-edge are the only ones whose rank ever
    // changes: a source-only node's rank is `scale` before round 1 and
    // exactly `teleport` after every round (it receives nothing). So the
    // loop maintains ranks for in-edge nodes ONLY, and contributions from
    // source-only nodes — constant per round — are FOLDED into two
    // precomputed per-dst frames (round-1 uses pr=scale, later rounds
    // pr=teleport). This removes the per-round `nodes LEFT JOIN contribs`
    // stage entirely: every in-edge node is a __dst of some edge whose
    // source is either in the rank frame or in the folded constant, so
    // the contribution agg already covers all of them (round-6 change;
    // the old form paid an extra O(|V|) join stage per round).
    val inNodes = e.select(col("__dst").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE flagged edge frame instead of separate semi/anti splits (each
    // was its own join + shuffle + persist): the flag marks whether the
    // SOURCE has in-edges, the loop filters in place from the shared
    // cache. Persist + pre-partition by the join key so every round
    // reuses the same shuffle-free edge side.
    val ewFlag = ew
      .join(inNodes.select(col("node").as("__src"), lit(true).as("__dyn")),
        Seq("__src"), "left")
      .na.fill(false, Seq("__dyn"))
      .repartition(parallelism, col("__src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ewDyn = ewFlag.where(col("__dyn")).drop("__dyn")
    val teleport = scale * (100L - dampingPct) / 100L
    // Constant contributions (sources with no in-edges hold rank `scale`
    // before round 1 and exactly `teleport` after): folded per dst, with
    // the integer per-edge div BEFORE the sum — bit-identical to
    // evaluating them inside the loop. Round-1's frame is used once (no
    // persist); the steady frame feeds rounds 2..n.
    def constContrib(prVal: Long): DataFrame = ewFlag
      .where(!col("__dyn"))
      .select(col("__dst"), expr(s"(${prVal}L * __w) div __outw").as("__c"))
      .groupBy(col("__dst")).agg(sum(col("__c")).as("__c"))
    val constR1 = constContrib(scale)
    val constSteady = constContrib(teleport).persist(StorageLevel.MEMORY_AND_DISK)

    var pr = inNodes.select(col("node"), lit(scale).as("pr"))
    var checkpointed = 0
    // Loop confs: AQE off (per-stage re-planning latency, nothing to
    // improve on pre-partitioned rounds); shuffle partitions sized to
    // the graph; broadcast OFF — the cached loop frames have small
    // stats, so the planner would broadcast one side of EVERY round's
    // joins, paying a driver collect + broadcast build per round
    // (measured 2-4x per-round cost) to replace a join that is already
    // co-partitioned and shuffle-free.
    val out = graft.Engine.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> parallelism.toString,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      for (i <- 1 to iterations) {
        val const = if (i == 1) constR1 else constSteady
        val contribs = pr.join(ewDyn, col("node") === col("__src"))
          .select(col("__dst"), expr("(pr * __w) div __outw").as("__c"))
          .union(const)
          .groupBy(col("__dst")).agg(sum(col("__c")).as("__s"))
        pr = contribs.select(col("__dst").as("node"),
          expr(s"${teleport}L + (${dampingPct}L * __s) div 100L").as("pr"))
        // Truncate lineage every other round (the Components rule: an
        // untruncated iterative tree grows per round and Catalyst's
        // analysis/codegen walks go super-linear). Measured at sf0.1:
        // fusing all 5 rounds into one job costs ~7.0s, checkpointing
        // every 1-2 rounds ~5.4s — the optimizer/codegen cost of the
        // deep fused plan dominates the extra eager jobs. Values are
        // integers — materialization cannot perturb them.
        checkpointed += 1
        if (checkpointed % 2 == 0) pr = graft.Engine.truncate(pr)
      }
      // Source-only nodes re-enter the result at their constant
      // post-round rank (exactly `teleport` after >= 1 round); read from
      // the cached flag frame, not a fresh anti-join against e.
      val srcOnly = ewFlag.where(!col("__dyn"))
        .select(col("__src").as("node")).distinct()
        .select(col("node"), lit(teleport).as("pr"))
      // materialize the result (AQE off: every join side above is
      // pre-partitioned, so runtime re-planning only adds per-stage
      // driver latency) so the operator's working caches do not outlive
      // the call; checkpoint blocks are ContextCleaner-collected
      graft.Engine.truncate(pr.union(srcOnly))
    }
    e.unpersist()
    inNodes.unpersist()
    ewFlag.unpersist()
    constSteady.unpersist()
    out
  }
}
