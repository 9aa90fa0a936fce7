package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf"[,"errors"]}.
  *
  * Methodology:
  *  - Each query is fully materialized via a noop-format write (count()
  *    can let Catalyst prune work; noop forces every row through the
  *    whole plan).
  *  - One FULL unmeasured pass over the registry first, so codegen/JIT/
  *    classloading cost is not attributed to whichever queries happen to
  *    run first (round-1 lesson: ~70% of the reported total was
  *    cold-start noise on the first few queries).
  *  - Two measured passes, min per query: shuffle-file/page-cache/GC
  *    noise measured up to 3x run-to-run on join-heavy queries; min-of-2
  *    reports the repeatable cost. BOTH raw passes are also emitted
  *    (`queries_pass1`/`queries_pass2`) so a one-off outlier (GC pause,
  *    page-cache miss) is self-diagnosing in the artifact instead of
  *    looking like a plan regression (round-4 lesson: q01's 2.26s).
  *  - A failed query is reported in "errors" and exits non-zero; it is
  *    NEVER silently dropped from the total (a broken query must not make
  *    the bench look faster).
  *  - Caches are cleared between queries (round-5 change): before, a
  *    query's internal `persist` survived into the next pass, so
  *    persist-using queries were measured AGAINST THEIR OWN WARM CACHE
  *    and under-reported (q41: 2.0s cached vs 4.4s true; q89: 3.6s vs
  *    ~6s), while the leaked frames built eviction pressure that bled
  *    into later queries. Totals from round 5 on are therefore honest
  *    per-query costs and NOT comparable to rounds <= 4 (which read
  *    ~30% lower for the same code).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.configure(
        SparkSession.builder().master(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // queries that persist a shared intermediate (the q55 rule) leave
      // it cached after the write completes; over 3 registry passes ~50
      // leaked frames build eviction pressure that bleeds into LATER
      // queries' times (round-5 lesson: pass-2 creep on q81+). Scope each
      // query's caches to its own measurement.
      spark.catalog.clearCache()
      // clearCache() only drops Dataset caches. localCheckpoint blocks
      // (Components/PageRank/Bpe/Ivf/HeavyHitters iteration cuts) are
      // freed only when the ContextCleaner GCs the driver-side RDD refs —
      // across 3 registry passes the orphaned blocks build storage
      // eviction pressure until a GC storm (round-7 driver run: pass-2
      // q99-q107 at 2.7-6.6x pass-1, q102 23.3s vs 3.5s). Unpersist them
      // eagerly; blocking so the release lands before the next
      // measurement starts.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    // Optional subset filter for local iteration: SPARK_GRAFT_ONLY is a
    // comma-separated list of query names (or prefixes). The driver never
    // sets it, so official artifacts always cover the full registry; a
    // subset run's total is NOT comparable to a full run's.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).filter(_.nonEmpty))
    val registry = only match {
      case Some(names) => SparkEntry.registry.filter(q => names.exists(q.name.startsWith))
      case None => SparkEntry.registry
    }

    // Unmeasured warm-up: full pass over the registry (ignore failures
    // here; they surface in the measured pass).
    registry.foreach { q =>
      try materialize(q.run) catch { case _: Throwable => () }
    }

    var errors = List.empty[String]
    // ---- instrumentation for pass-to-pass outliers (round-12 judge
    // item 4: q167 read 120s in the driver's pass 2 vs a 1.7s min with
    // the inflation concentrated on the vector/eigen family). Each
    // query's measurement also records its JVM GC time and post-query
    // heap/storage state, emitted as gc_ms_pass{i}/heap_mb_pass{i} maps
    // in the artifact — so an inflated cell is attributable (GC storm vs
    // storage leak vs ambient) from the artifact alone.
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    def heapUsedMb(): Long = {
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) >> 20
    }
    // (seconds, succeeded, gcMsDelta, heapMbAfter) per query per pass:
    // min is taken only over SUCCESSFUL passes — a query that fails fast
    // in one pass must not report its time-to-failure as the cost (that
    // would make a broken query look faster). A query with no successful
    // pass reports the MAX time-to-failure (and the run exits non-zero
    // either way).
    def measuredPass(): Seq[(String, (Double, Boolean, Long, Long))] = registry.map { q =>
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      try {
        materialize(q.run)
        q.name -> ((System.nanoTime() - t0) / 1e9, true, gcMillis() - g0, heapUsedMb())
      } catch {
        case e: Throwable =>
          if (!errors.contains(q.name)) errors ::= q.name
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          q.name -> ((System.nanoTime() - t0) / 1e9, false, gcMillis() - g0, heapUsedMb())
      }
    }
    // SPARK_GRAFT_PASSES: measured-pass count (min per query over the
    // successful passes). The driver's per-round artifact keeps the
    // default 2 (cross-round comparability); local BENCH_local artifacts
    // run 3 (round-11 judge item 8 — the scale cells' min-of-3 noise
    // discipline applied to the registry bench, so per-query cross-round
    // comparisons stop needing a variance disclaimer). The pass count is
    // recorded in the artifact either way.
    val nPasses = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt)
    val passes = (1 to nPasses).map(_ => measuredPass())
    val byName = passes.map(_.toMap)
    val results = passes.head.map { case (k, _) =>
      val samples = byName.map(_(k))
      val ok = samples.collect { case (t, true, _, _) => t }
      k -> (if (ok.nonEmpty) ok.min else samples.map(_._1).max)
    }
    def qJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def lJson(rs: Seq[(String, Long)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = qJson(results)
    val rawJson = passes.zipWithIndex.map { case (p, i) =>
      s""""queries_pass${i + 1}":${qJson(p.map { case (k, (t, _, _, _)) => k -> t })},""" +
        s""""gc_ms_pass${i + 1}":${lJson(p.map { case (k, (_, _, g, _)) => k -> g })},""" +
        s""""heap_mb_pass${i + 1}":${lJson(p.map { case (k, (_, _, _, h)) => k -> h })}"""
    }.mkString(",")
    val total = results.map(_._2).sum
    val errJson =
      if (errors.isEmpty) ""
      else errors.reverse.map("\"" + _ + "\"").mkString(",\"errors\":[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s"""$rawJson,"passes":$nPasses,"sf":"$sfDir"$errJson}"""
    println(json)
    // Also write the artifact to a file directly: stdout scraping truncates
    // long lines (round-5 lesson: BENCH_r05's per-query map was cut at 2000
    // chars, making the round's evidence unauditable). The file is complete
    // even when rc!=0.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    // LAST stdout line: a tiny summary that survives any stdout-tail
    // truncation (round-6 lesson: the full line above exceeds a 2000-char
    // tail, so a scraper that only keeps the tail parsed nothing). Carries
    // the driver-contract keys; the per-query detail lives in the full
    // line and the file artifact.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
      s""""n":${results.size},"errors":${errors.size}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
