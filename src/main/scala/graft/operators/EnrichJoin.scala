package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Enrichment joins: latest-version ("temporal") and as-of.
  *
  * Reference capabilities: the processing-time temporal join
  * (flink playground `DataStreamJob.java:88-104` — "enrich a stream with a
  * dimension table (last/current value)") and the dedup-then-join pattern
  * (`WithDeduplicateJoinJob.java:89-104`).
  *
  * Scale notes:
  *  - `enrichLatest` dedups the dimension first (top-1-per-key, map-side
  *    group-limited), then joins. The deduped dimension is one row per
  *    key — its size grows with key cardinality, so a forced broadcast is
  *    an executor OOM at high-cardinality scale. Default: let AQE decide
  *    the join strategy from the *runtime* size of the deduped side (it
  *    switches to broadcast when the side is genuinely small). Pass
  *    `broadcastDim = true` only when the key domain is known-bounded
  *    (e.g. an ISO-country dimension like the reference's).
  *  - `asOfJoin` uses the union-and-carry-forward formulation: one shuffle
  *    of (probe ∪ build) by key, one in-partition sort, zero row
  *    amplification — versus a naive `probe JOIN build ON ts <= pts`
  *    which is quadratic per key.
  */
object EnrichJoin {

  /** Left-join `probe` against the latest version (by `dimOrder` desc) of
    * each `dimKey` in `dim`. Join strategy is AQE-decided by default;
    * `broadcastDim = true` forces a broadcast and is only safe when the
    * dimension's key cardinality is known-bounded.
    */
  def enrichLatest(
      probe: DataFrame,
      dim: DataFrame,
      probeKey: String,
      dimKey: String,
      dimOrder: Seq[Column],
      broadcastDim: Boolean = false): DataFrame = {
    val latest = Dedup.keepLatest(dim, Seq(dimKey), dimOrder)
    val build = if (broadcastDim) broadcast(latest) else latest
    probe.join(build, probe(probeKey) === build(dimKey), "left_outer")
  }

  /** As-of join: for each probe row, attach the columns of the build row
    * with the greatest `buildTs <= probeTs` for the same key.
    *
    * `carry` names the build columns to attach (they must exist in `build`
    * and not clash with probe columns). Build rows must be unique per
    * (key, buildTs) — pre-dedup otherwise (ties would be nondeterministic).
    *
    * Implementation: tag both sides, union, window-sort by (ts, side) per
    * key, carry the last build row's attributes forward AS ONE STRUCT
    * (a single `last(ignoreNulls)` — per-column lasts could mix
    * attributes of different build rows when a nearer row has NULL in
    * one carry column), keep probe rows. Build rows at ts == probeTs
    * are visible (side 0 sorts first).
    */
  def asOfJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeTs: String,
      buildTs: String,
      carry: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val carryStruct = struct(carry.map(col): _*)
    val nullCarry = lit(null).cast(
      org.apache.spark.sql.types.StructType(carry.map(c => build.schema(c))))
    val p = probe
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(probeTs))
      .select((probeCols.map(col) ++ Seq(nullCarry.as("__cs"), col("__side"), col("__ts"))): _*)
    val b = build
      .withColumn("__side", lit(0))
      .withColumn("__ts", col(buildTs))
      .withColumn(key, col(key)) // key must exist on both
      .select((probeCols.map(c => if (c == key) col(c) else lit(null).cast(probe.schema(c).dataType).as(c)) ++
        Seq(carryStruct.as("__cs"), col("__side"), col("__ts"))): _*)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = p.unionByName(b)
      .withColumn("__last", last(col("__cs"), ignoreNulls = true).over(w))
      .select(
        (probeCols.map(col) ++
          carry.map(c => col(s"__last.$c").as(c)) ++
          Seq(col("__side"))): _*)
    carried.where(col("__side") === 1).drop("__side")
  }

  /** FORWARD as-of join with tolerance — the attribution shape: for each
    * probe row, attach the build row with the SMALLEST
    * `buildTs >= probeTs` for the same key, provided
    * `buildTs - probeTs <= toleranceUs`; otherwise the carried columns
    * (and `asof_delay`) are null. Both ts columns must be exact integer
    * epoch micros (LONG) — tolerance arithmetic stays integer-exact.
    *
    * Ties (two build rows at the same ts) resolve to the smallest
    * `buildTie` value, making the result deterministic without a
    * uniqueness precondition (unlike [[asOfJoin]]'s pre-dedup contract).
    *
    * Same scale shape as [[asOfJoin]]: tag, union, ONE per-key window
    * (descending scan carrying the nearest later build row backward),
    * no join at all — at 100 TB this is one shuffle on the key versus a
    * range join's bucket explosion.
    */
  def asOfJoinForward(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeTs: String,
      buildTs: String,
      carry: Seq[String],
      toleranceUs: Long,
      buildTie: String): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    require(!carry.contains("__bts"), "carry column name __bts is reserved")
    val probeCols = probe.columns.toSeq
    // ONE struct per build row — carry columns AND the build ts travel
    // together through a single last(ignoreNulls), so every output row's
    // attributes (and its asof_delay) come from the SAME build row. The
    // per-column formulation could stitch a nearer row's asof_delay to a
    // farther row's attribute when the nearer row had a NULL carry cell.
    val nullCarry = lit(null).cast(org.apache.spark.sql.types.StructType(
      carry.map(c => build.schema(c)) :+
        org.apache.spark.sql.types.StructField("__bts", build.schema(buildTs).dataType)))
    val p = probe
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(probeTs))
      .select((probeCols.map(col) ++
        Seq(nullCarry.as("__cs"),
          col("__side"), col("__ts"), lit(null).cast("long").as("__tie"))): _*)
    val b = build
      .withColumn("__side", lit(0))
      .withColumn("__ts", col(buildTs))
      .select((probeCols.map(c =>
          if (c == key) col(c) else lit(null).cast(probe.schema(c).dataType).as(c)) ++
        Seq(struct((carry.map(col) :+ col(buildTs).as("__bts")): _*).as("__cs"),
          col("__side"), col("__ts"), col(buildTie).cast("long").as("__tie"))): _*)
    // descending time scan: at equal ts the build row sorts first
    // (inclusive >=), and among equal-ts builds the LAST seen — i.e.
    // the carried one — is the smallest tiebreak (desc order)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__side").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = p.unionByName(b)
      .withColumn("__last", last(col("__cs"), ignoreNulls = true).over(w))
      .select(
        (probeCols.map(col) ++
          carry.map(c => col(s"__last.$c").as(c)) ++
          Seq((col("__last.__bts") - col("__ts")).as("asof_delay"), col("__side"))): _*)
    val within = col("asof_delay").isNotNull && col("asof_delay") <= toleranceUs
    carried.where(col("__side") === 1).select(
      (probeCols.map(col) ++
        carry.map(c => when(within, col(c)).otherwise(lit(null)).as(c)) :+
        when(within, col("asof_delay")).otherwise(lit(null)).as("asof_delay")): _*)
  }
}
