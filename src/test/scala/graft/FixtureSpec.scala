package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._
import graft.sources.Sources

/** Per-operator tests on the reference's exact fixture data (FIXTURES.md:
  * people/countries/items), covering SURVEY §2 batch semantics.
  */
class FixtureSpec extends SparkSpec {
  import testImplicits._

  // F1: people (ISO variant) — two probe rows share key ES; CA/IT unmatched
  // (reference DataStreamJob.java:63-73)
  def people = Seq(
    ("Alice", 12, "ES"), ("Bob", 5, "ES"), ("Peter", 13, "CA"), ("Paul", 13, "IT"))
    .toDF("name", "age", "country")

  // F2: countries_updates — versioned dimension with duplicate keys;
  // latest capital per iso must win (WithStateTtlJob.java:62-71 pattern:
  // 4 rows, duplicated keys)
  def countriesUpdates = Seq(
    ("ES", "Sevilla", ts(1)), ("ES", "Madrid", ts(3)),
    ("FR", "Paris", ts(2)), ("ES", "Barcelona", ts(2)))
    .toDF("iso", "capital", "ts")

  def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  // ------------------------------------------------------------- S1
  test("S1 fromRows builds a typed bounded table from literal rows") {
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("age", IntegerType),
      StructField("country", StringType)))
    val df = Sources.fromRows(spark, schema,
      Seq(Row("Alice", 12, "ES"), Row("Bob", 5, "ES"), Row("Peter", 13, "CA"), Row("Paul", 13, "IT")))
    assert(df.count() === 4)
    assert(df.schema === schema)
  }

  // ------------------------------------------------------------- S2
  test("S2 bounded datagen: n rows, length-bounded key fields collide") {
    val df = Sources.dataGenBounded(spark, 64,
      Seq("iso" -> (id => Sources.strField(id, 1)), "n" -> (id => Sources.intField(id, 10))))
    assert(df.count() === 64)
    // length-1 hex alphabet = at most 16 distinct keys => guaranteed collisions
    val distinct = df.select("iso").distinct().count()
    assert(distinct <= 16 && distinct > 1)
    // deterministic: same seed column -> same values
    assert(df.collect().toSeq === Sources.dataGenBounded(spark, 64,
      Seq("iso" -> (id => Sources.strField(id, 1)), "n" -> (id => Sources.intField(id, 10)))).collect().toSeq)
  }

  // ----------------------------------------------------------- §2.8
  test("PROCTIME ingest column is a non-null timestamp") {
    val df = Sources.withProcTime(people)
    assert(df.schema("proctime").dataType === TimestampType)
    assert(df.where(col("proctime").isNull).count() === 0)
  }

  // ---------------------------------------------------------- W1/W2/T4
  test("W2/T4 keep-latest dedup: latest capital per iso wins") {
    val latest = Dedup.keepLatest(countriesUpdates, Seq("iso"), Seq(col("ts")))
      .select("iso", "capital").as[(String, String)].collect().toMap
    assert(latest === Map("ES" -> "Madrid", "FR" -> "Paris"))
  }

  test("W2 keep-first dedup keeps earliest") {
    val first = Dedup.keepFirst(countriesUpdates, Seq("iso"), Seq(col("ts")))
      .select("iso", "capital").as[(String, String)].collect().toMap
    assert(first === Map("ES" -> "Sevilla", "FR" -> "Paris"))
  }

  // ------------------------------------------------------------- J-D/J1
  test("J-D dedup-then-join enriches with latest version; unmatched keys null-pad") {
    val out = EnrichJoin.enrichLatest(people, countriesUpdates, "country", "iso", Seq(col("ts")))
      .select("name", "country", "capital")
      .as[(String, String, String)].collect().toSet
    assert(out === Set(
      ("Alice", "ES", "Madrid"), ("Bob", "ES", "Madrid"),
      ("Peter", "CA", null), ("Paul", "IT", null)))
  }

  // ------------------------------------------------------------- J3/J4
  test("J3/J4 left outer join preserves unmatched probe rows (fluent form)") {
    val countries = Seq(("ES", "Madrid"), ("FR", "Paris")).toDF("iso", "capital")
    val out = people.join(countries, col("country") === col("iso"), "left_outer")
      .select("name", "capital").as[(String, String)].collect().toSet
    assert(out === Set(("Alice", "Madrid"), ("Bob", "Madrid"), ("Peter", null), ("Paul", null)))
  }

  // ------------------------------------------------------------- J2/J5
  test("J2 LEFT JOIN LATERAL ... ON TRUE (SQL) — outer correlated expansion") {
    people.createOrReplaceTempView("people_fx")
    countriesUpdates.createOrReplaceTempView("countries_fx")
    val out = spark.sql("""
      SELECT p.name, t.latest_capital
      FROM people_fx p LEFT JOIN LATERAL (
        SELECT max_by(capital, ts) AS latest_capital
        FROM countries_fx WHERE iso = p.country) t ON TRUE
      ORDER BY p.name""").as[(String, String)].collect().toSet
    assert(out === Set(
      ("Alice", "Madrid"), ("Bob", "Madrid"), ("Peter", null), ("Paul", null)))
  }

  // ------------------------------------------------------------- J5
  test("J5 fluent lateral join: correlated filter + TVF explode forms") {
    val p = people.as("p")
    val cu = countriesUpdates.as("cu")
    val latest = cu
      .where(col("cu.iso") === col("p.country").outer())
      .orderBy(col("cu.ts").desc).limit(1).select(col("capital"))
    val out = Lateral.leftOuter(p, latest)
      .select("name", "capital").as[(String, String)].collect().toSet
    assert(out === Set(
      ("Alice", "Madrid"), ("Bob", "Madrid"), ("Peter", null), ("Paul", null)))

    // TVF form: lateral explode_outer ≡ the J6 fixture semantics
    val input = Seq(("a", Seq("b")), ("b", Seq.empty[String])).toDF("id", "items").as("t")
    val exploded = Lateral.leftOuter(input.toDF(),
        spark.tvf.explode_outer(col("t.items").outer()))
      .select(col("id"), col("col")).as[(String, String)].collect().toSet
    assert(exploded === Set(("a", "b"), ("b", null)))
  }

  // ------------------------------------------------------------- J6
  test("J6 outer UNNEST keeps the empty-array parent (CrossJoinJob fixture)") {
    // F3: ("a", [{item_id:"b"}]), ("b", []) — expected ("a","b"), ("b",NULL)
    val input = Seq(("a", Seq("b")), ("b", Seq.empty[String])).toDF("id", "items")
    val out = Unnest.outer(input, col("items"), "item_id")
      .select("id", "item_id").as[(String, String)].collect().toSet
    assert(out === Set(("a", "b"), ("b", null)))
  }

  test("J6 inner unnest drops the empty-array parent") {
    val input = Seq(("a", Seq("b")), ("b", Seq.empty[String])).toDF("id", "items")
    val out = Unnest.inner(input, col("items"), "item_id")
      .select("id", "item_id").as[(String, String)].collect().toSet
    assert(out === Set(("a", "b")))
  }

  // ------------------------------------------------------------- W3/A1
  test("W3/A1 tumbling window agg: counts per key per window + window_time") {
    val rows = Seq(
      ("a", ts(0)), ("a", ts(0)), ("b", ts(0)), ("a", ts(2)))
      .toDF("iso", "ts")
    val out = WindowAgg.tumble(rows, "ts", "1 minute", Seq("iso"), Seq(count(lit(1)).as("n")))
    val got = out.select("iso", "window_start", "window_time", "n")
      .as[(String, Timestamp, Timestamp, Long)].collect().toSet
    assert(got === Set(
      ("a", ts(0), Timestamp.valueOf("2024-01-01 00:00:59.999"), 2L),
      ("b", ts(0), Timestamp.valueOf("2024-01-01 00:00:59.999"), 1L),
      ("a", ts(2), Timestamp.valueOf("2024-01-01 00:02:59.999"), 1L)))
  }

  // ------------------------------------------------------------- J1 as-of
  test("J1 as-of join attaches latest build row at-or-before probe ts") {
    val probe = Seq((1L, "ES", ts(2)), (2L, "ES", ts(4)), (3L, "FR", ts(1))).toDF("id", "key", "pts")
    val build = Seq(("ES", ts(1), "v1"), ("ES", ts(3), "v2"), ("FR", ts(2), "x1")).toDF("key", "bts", "v")
    val out = EnrichJoin.asOfJoin(probe, build, "key", "pts", "bts", Seq("v"))
      .select("id", "v").as[(Long, String)].collect().toSet
    // id=1: latest ES at <= 00:02 is v1; id=2: v2; id=3: FR at <= 00:01 — none
    assert(out === Set((1L, "v1"), (2L, "v2"), (3L, null)))
  }

  // ------------------------------------------------------------- P3/P4
  test("P3/P4 filter on window result and fluent predicate") {
    val ranked = countriesUpdates.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("iso")).orderBy(col("ts").desc)))
    assert(ranked.where(col("rn") === 1).count() === 2)
    assert(people.where(col("age") === 13).count() === 2)
  }

  // ------------------------------------------------------- SnapshotDiff
  test("SnapshotDiff classifies added/removed/changed/same with null-safe compare") {
    import testImplicits._
    val oldV = Seq[(Long, Option[String])](
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("gone")), (5L, None))
      .toDF("id", "txt")
    val newV = Seq[(Long, Option[String])](
      (1L, Some("a")),      // same
      (2L, Some("B")),      // changed
      (3L, None),           // same — NULL <=> NULL must not read as changed
      (5L, Some("now")),    // changed — NULL -> value
      (6L, Some("new")))    // added; 4 removed
      .toDF("id", "txt")
    val got = SnapshotDiff.diff(oldV, newV, "id", Seq("txt"))
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "same", 2L -> "changed", 3L -> "same",
      4L -> "removed", 5L -> "changed", 6L -> "added"))
  }

  // --------------------------------------------------------- RangeJoin
  test("RangeJoin rejects invalid and over-wide intervals loudly (no silent truncation)") {
    import testImplicits._
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    // s > e: must fail the run, not return an empty/partial result
    val inverted = Seq((1L, 10L, 2L)).toDF("iid", "s", "e")
    val e1 = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "p", inverted, "s", "e", 10L).collect()
    }
    assert(stackMessages(e1).contains("interval invalid or wider"), stackMessages(e1))
    // wider than maxBucketsPerInterval buckets: explode would balloon —
    // fail loudly instead of quietly producing a huge plan
    val wide = Seq((1L, 0L, 100000L)).toDF("iid", "s", "e")
    val e2 = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "p", wide, "s", "e", 1L,
        maxBucketsPerInterval = 16).collect()
    }
    assert(stackMessages(e2).contains("interval invalid or wider"), stackMessages(e2))
  }

  private def stackMessages(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { sb.append(cur.getMessage).append(" | "); cur = cur.getCause }
    sb.toString
  }

  test("Profile.summarize: null-aware counts, exact distincts, one row per column") {
    import testImplicits._
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")),
      (None, Some("b")), (None, None)).toDF("x", "y")
    val got = Profile.summarize(df, Seq("x", "y"))
      .as[(String, Long, Long)].collect().toSeq
    // count() and count(DISTINCT) both skip NULLs — the SQL contract the
    // q75 oracle relies on
    assert(got === Seq(("x", 3L, 2L), ("y", 3L, 2L)))
    intercept[IllegalArgumentException] {
      Profile.summarize(df, Seq("x", "nope"))
    }
  }

  // ------------------------------------------------------------- K1/K4
  test("K1 named sink table + INSERT INTO (batch)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    graft.sinks.Sinks.createSinkTable(spark, "graft_out_fx", dir,
      "name STRING, country STRING, capital STRING")
    val enriched = EnrichJoin.enrichLatest(people, countriesUpdates, "country", "iso", Seq(col("ts")))
      .select("name", "country", "capital")
    graft.sinks.Sinks.insertInto(enriched, "graft_out_fx")
    assert(spark.table("graft_out_fx").count() === 4)
    spark.sql("DROP TABLE graft_out_fx")
  }

  test("batchFile: csv + json round-trip with explicit schema (no inference pass)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val rows = Seq((1L, "alpha", 0.5), (2L, "beta", -1.25), (3L, null: String, 2.0))
    val df = rows.toDF("id", "name", "score")

    val csvDir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    df.write.mode("overwrite").option("header", "true").csv(csvDir)
    val backCsv = graft.sources.Sources.batchFile(spark, "csv", csvDir,
        Some(schema), Map("header" -> "true"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(backCsv === rows.map { case (i, n, s) => (i, Option(n), s) }.toSet)
    // schema is the DECLARED one, not an inferred guess
    assert(graft.sources.Sources.batchFile(spark, "csv", csvDir,
      Some(schema), Map("header" -> "true")).schema === schema)

    val jsonDir = java.nio.file.Files.createTempDirectory("graft_json").toString
    df.write.mode("overwrite").json(jsonDir)
    val backJson = graft.sources.Sources.batchFile(spark, "json", jsonDir, Some(schema))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(backJson === rows.map { case (i, n, s) => (i, Option(n), s) }.toSet)
  }

  test("Tables.events: robust to both testdata timestamp encodings (nanos-long and native ntz)") {
    // Round-5 regression guard: the testdata generator switched the events
    // `ts` column from TIMESTAMP(NANOS) (read as a raw long under
    // nanosAsLong) to TIMESTAMP(MICROS, NTZ) between rounds, silently
    // breaking every events consumer. The loader must yield the SAME
    // micros values and the SAME TimestampType schema under either.
    import org.apache.spark.sql.types._
    val microsVals = Seq(1700000000000001L, 1700000000123456L, 1699999999999999L)

    // encoding A: raw long of NANOS since epoch (the old nanosAsLong read)
    val dirA = java.nio.file.Files.createTempDirectory("graft_ev_nanos").toString
    microsVals.map(us => (1L, us * 1000L, "click")).toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")

    // encoding B: native timestamp_ntz of MICROS (the current generator)
    val dirB = java.nio.file.Files.createTempDirectory("graft_ev_ntz").toString
    microsVals.map(us => (1L, us, "click")).toDF("event_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)).drop("us")
      .select($"event_id", $"ts", $"event_type")
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")

    val a = Tables.events(spark, dirA)
    val b = Tables.events(spark, dirB)
    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)
    val usOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(unix_micros($"ts")).collect().map(_.getLong(0)).sorted.toSeq
    assert(usOf(a) === microsVals.sorted)
    assert(usOf(b) === microsVals.sorted)
  }

  test("q169 dataset build: the written artifact matches the returned manifest — counts, shards, curriculum order") {
    // the write-side contract the registry's audit frame describes:
    // run the flagship once, then verify the PHYSICAL artifact —
    //  (a) row count of the written dataset == the TOTAL n_sampled row,
    //  (b) every out_shard dir holds exactly the docs whose Knuth hash
    //      maps there,
    //  (c) rows within each written file are in curriculum-position
    //      order (the property the sortWithinPartitions lead column
    //      exists for),
    //  (d) the manifest parquet on disk IS the returned frame.
    val audit = SparkEntry.registry.find(_.name == "q169_dataset_build").get
      .run(spark, "/root/testdata/sf0.001")
    val rows = audit.collect()
    val total = rows.find(_.getString(0) == "TOTAL").get
    val outPath = new java.io.File("target/q169_dataset").getAbsolutePath
    val data = spark.read.parquet(s"$outPath/data")
    // (a) count
    assert(data.count() === total.getAs[Long]("n_sampled"))
    assert(total.getAs[Long]("n_sampled") > 0)
    // (b) shard assignment honored by the layout
    val misplaced = data.where(
      pmod(pmod(col("doc_id") * lit(2654435761L), lit(1000000007L)), lit(16L))
        =!= col("out_shard")).count()
    assert(misplaced === 0L)
    // (c) per-file curriculum order: positions non-decreasing in file order
    import org.apache.spark.sql.expressions.Window
    val byFile = data
      .select(col("position"),
        org.apache.spark.sql.functions.input_file_name().as("f"),
        org.apache.spark.sql.functions.monotonically_increasing_id().as("ord"))
    val disorder = byFile
      .withColumn("prev", lag(col("position"), 1).over(
        Window.partitionBy(col("f")).orderBy(col("ord"))))
      .where(col("prev").isNotNull && col("prev") > col("position"))
      .count()
    assert(disorder === 0L, "written files are not in curriculum order")
    // (d) written manifest == returned frame
    val manifest = spark.read.parquet(s"$outPath/manifest")
    assert(manifest.collect().map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("AtomicDataset commit contract: torn builds are refused, completed builds read back (q169's write path)") {
    // the crash-window twin of StreamingSpec's unmarked-husk pins, on
    // the one-shot artifact: a build that died between begin() and
    // commit() must be detectable — read() refuses it loudly instead of
    // serving a half-overwritten tree
    import graft.sinks.AtomicDataset
    val root = java.nio.file.Files.createTempDirectory("graft_atomic").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

    // crash window 1: died mid-build (data written, manifest + marker
    // missing) — refused
    AtomicDataset.begin(spark, root)
    df.write.mode("overwrite").parquet(s"$root/data")
    intercept[IllegalStateException] { AtomicDataset.read(spark, root, "data") }

    // completed build reads back
    df.groupBy(col("v")).count().write.mode("overwrite").parquet(s"$root/manifest")
    AtomicDataset.commit(spark, root)
    assert(AtomicDataset.read(spark, root, "data").count() === 2L)
    assert(AtomicDataset.read(spark, root, "manifest").count() === 2L)

    // crash window 2: a REBUILD died after begin() (previous files
    // intact on disk, but the overwrite may have started anywhere) —
    // the previous marker is gone, so the stale-looking tree is refused
    // too; only a completed retry is served again
    AtomicDataset.begin(spark, root)
    intercept[IllegalStateException] { AtomicDataset.read(spark, root, "manifest") }
    df.write.mode("overwrite").parquet(s"$root/data")
    df.groupBy(col("v")).count().write.mode("overwrite").parquet(s"$root/manifest")
    AtomicDataset.commit(spark, root)
    assert(AtomicDataset.read(spark, root, "manifest").count() === 2L)
  }
}
