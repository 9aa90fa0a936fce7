package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Sources: in-memory fixtures, datagen (bounded + rate-throttled), and
  * the PROCTIME ingest column.
  *
  * Reference capabilities:
  *  - S1 in-memory collection source: `Types.ROW_NAMED` literal rows
  *    (flink playground `DataStreamJob.java:63-73` and five siblings);
  *  - S2 bounded datagen: `'connector'='datagen','number-of-rows'='4'`
  *    (`DataStreamJob.java:75-86`);
  *  - S3 unbounded throttled datagen with length-bounded fields:
  *    `'rows-per-second'='4', 'fields.iso.length'='1'`
  *    (`WithDeduplicateJoinJob.java:56-68`) — length-1 hex fields give a
  *    16-symbol alphabet, guaranteeing join/group key collisions;
  *  - §2.8 PROCTIME(): computed ingest-time column
  *    (`DataStreamJob.java:95`).
  */
object Sources {

  /** S1: bounded table from literal rows with an explicit schema. */
  def fromRows(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size min 4)), schema)

  /** S1 (tuple convenience): bounded table from products via Encoders. */
  def fromSeq[T <: Product: org.apache.spark.sql.Encoder](spark: SparkSession, data: Seq[T], names: String*): DataFrame = {
    val df = spark.createDataset(data).toDF()
    if (names.nonEmpty) df.toDF(names: _*) else df
  }

  /** Deterministic pseudo-random string field of `len` hex chars derived
    * from a long column — datagen's `fields.<f>.length` semantics
    * (len=1 ⇒ 16-symbol alphabet ⇒ guaranteed collisions).
    */
  def strField(seedCol: Column, len: Int): Column =
    substring(md5(seedCol.cast("string")), 1, len)

  /** Deterministic pseudo-random int field in [0, bound). */
  def intField(seedCol: Column, bound: Int, salt: Int = 0): Column =
    pmod(xxhash64(seedCol, lit(salt)), lit(bound)).cast("int")

  /** S2: bounded datagen — `n` rows, fields derived per `fields`
    * (name -> expression over the `id` column). Batch: spark.range keeps
    * everything map-side and splittable (`numPartitions` tasks).
    * `fields` is a Seq, NOT a Map (review r13 pass 6): a Map parameter
    * silently switched to HashMap iteration order past 4 entries, so
    * the output COLUMN ORDER stopped matching declaration order —
    * breaking positional consumers (tuple decoding, position-sensitive
    * sinks). Duplicate field names are rejected.
    */
  def dataGenBounded(
      spark: SparkSession,
      n: Long,
      fields: Seq[(String, Column => Column)],
      numPartitions: Int = 4): DataFrame = {
    require(fields.map(_._1).distinct.size == fields.size,
      s"duplicate field names: ${fields.map(_._1).mkString(",")}")
    val base = spark.range(0, n, 1, numPartitions)
    base.select(fields.map { case (name, f) => f(col("id")).as(name) }: _*)
  }

  /** S3: unbounded throttled datagen — `rowsPerSecond` via the rate
    * source; fields derived from the monotonically increasing `value`.
    * Emits the rate source's `timestamp` as `ts` plus the derived fields.
    */
  def dataGenRate(
      spark: SparkSession,
      rowsPerSecond: Int,
      fields: Seq[(String, Column => Column)]): DataFrame = {
    // Seq for declaration-order columns (see dataGenBounded); "ts" is
    // emitted by the source itself, so a derived field may not reuse it
    require(fields.map(_._1).distinct.size == fields.size && !fields.exists(_._1 == "ts"),
      s"duplicate or reserved ('ts') field names: ${fields.map(_._1).mkString(",")}")
    val base = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load() // schema: timestamp TIMESTAMP, value LONG
    base.select(col("timestamp").as("ts") +: fields.map { case (name, f) => f(col("value")).as(name) }: _*)
  }

  /** S5: programmatic source descriptor — build a streaming source from
    * (format, schema, options) fluently, the Spark twin of the
    * reference's `TableDescriptor.forConnector(...)`
    * (`TableAPIJob.java:73-82`).
    */
  def descriptor(
      spark: SparkSession,
      format: String,
      options: Map[String, String],
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.readStream.format(format).options(options)
    schema.fold(r)(r.schema).load()
  }

  /** Streaming file-directory source: `readStream` tailing a directory
    * of parquet/csv/json files — the actual shape of a 100 TB ingest
    * (files land continuously; the query discovers and processes them in
    * micro-batches, exactly-once via the checkpoint's file log).
    * `maxFilesPerTrigger` bounds per-batch work so one trigger never
    * swallows a day's backlog; schema is explicit (streaming scans must
    * not infer — a schema drift should fail loudly, not silently widen).
    */
  def fileStream(
      spark: SparkSession,
      format: String,
      dir: String,
      schema: StructType,
      maxFilesPerTrigger: Option[Int] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.readStream.format(format).schema(schema).options(options)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n.toString)).load(dir)
  }

  /** Batch file source with EXPLICIT schema — csv/json/parquet/orc/text.
    * At corpus scale schema inference is an extra full pass over the data
    * (and a silent-drift hazard: a malformed shard widens a column for
    * everyone), so production reads pin the schema and let mismatches
    * fail loudly; `options` passes format specifics through (header,
    * delimiter, compression, multiLine, ...).
    */
  def batchFile(
      spark: SparkSession,
      format: String,
      path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(options)
    schema.fold(r)(r.schema).load(path)
  }

  /** Kafka source options for [[descriptor]] — the standard option set
    * of Spark's kafka connector, assembled in one place so callers can't
    * typo the magic keys. Exposed separately from [[kafka]] so the
    * plumbing is testable without a broker or the connector jar.
    */
  def kafkaOptions(
      bootstrapServers: String,
      topics: String,
      startingOffsets: String = "earliest",
      extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics,
      "startingOffsets" -> startingOffsets) ++ extra

  /** Kafka streaming source via [[descriptor]]. Requires the
    * spark-sql-kafka connector on the classpath and a reachable broker;
    * this sandbox has neither, so the test gates on the connector being
    * resolvable and the wiring stays compiled.
    */
  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      topics: String,
      startingOffsets: String = "earliest",
      extra: Map[String, String] = Map.empty): DataFrame =
    descriptor(spark, "kafka", kafkaOptions(bootstrapServers, topics, startingOffsets, extra))

  /** The kafka connector's FIXED output schema (Spark pins it; every
    * consumer transform starts from these seven columns). Exposed so a
    * broker-less test can stand in a MemoryStream with exactly this
    * shape and exercise the consumer-side plumbing end-to-end — the
    * schema contract is what the sandbox cannot otherwise reach.
    */
  val KafkaWireSchema: StructType = StructType(Seq(
    StructField("key", org.apache.spark.sql.types.BinaryType),
    StructField("value", org.apache.spark.sql.types.BinaryType),
    StructField("topic", org.apache.spark.sql.types.StringType),
    StructField("partition", org.apache.spark.sql.types.IntegerType),
    StructField("offset", org.apache.spark.sql.types.LongType),
    StructField("timestamp", org.apache.spark.sql.types.TimestampType),
    StructField("timestampType", org.apache.spark.sql.types.IntegerType)))

  /** The first transform every kafka consumer applies: decode the wire
    * frame's binary key/value to strings beside the record coordinates.
    * Validates the input against [[KafkaWireSchema]]'s columns, so a
    * drifted stand-in (or a connector upgrade changing the contract)
    * fails loudly here instead of downstream. Works identically over
    * the real connector's output and a MemoryStream stand-in.
    */
  def kafkaDecode(df: DataFrame): DataFrame = {
    val missing = KafkaWireSchema.fieldNames.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"not a kafka wire frame — missing columns: ${missing.mkString(", ")}")
    df.select(col("topic"), col("partition"), col("offset"), col("timestamp"),
      col("key").cast("string").as("key_str"),
      col("value").cast("string").as("value_str"))
  }

  /** §2.8: PROCTIME() ingest column — micro-batch processing time.
    * `current_timestamp()` is evaluated per batch (constant-folded at
    * batch planning), matching Flink's proctime-at-ingest semantics at
    * micro-batch granularity.
    */
  def withProcTime(df: DataFrame, name: String = "proctime"): DataFrame =
    df.withColumn(name, current_timestamp())
}
