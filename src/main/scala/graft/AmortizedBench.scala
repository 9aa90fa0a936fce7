package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.{Components, JaccardJoin, MinHash}

/** Build-once/query-many demonstration for the shared near-dup pair
  * graph (not a registry query — registry queries stay independent for
  * the oracle, so q51/q102/q106/q107 each re-derive their pair graph;
  * this main measures what a PIPELINE deployment does instead). Since
  * round 8 the composed shape ALSO lives under the oracle as
  * q136_dedup_report (index build once -> pairs -> components ->
  * histogram + survivors + lang mix in one plan, PlanSpec-pinned); this
  * main remains the per-stage cost breakdown:
  *
  *   1. persist the corpus index ONCE ([[MinHash.writeCorpusIndex]] —
  *      the expensive scan+shingle+signature artifact at 100 TB);
  *   2. run ONE exact PPJoin pair pass from it at the LOOSEST threshold
  *      (5/10) via [[JaccardJoin.pairsFromIndex]];
  *   3. derive all four downstream products from that single pair
  *      frame: tighter-threshold subsets are conditional FILTERS on the
  *      exact inter/union columns (exact-complete at 5/10 implies
  *      exact-complete at every tighter threshold — the q107 law,
  *      PropertySpec), components/min-survivor (q51), best-of-cluster
  *      (q102), soft weights (q106), threshold sweep (q107).
  *
  * Prints one JSON line with per-stage seconds; compare against the
  * same four queries' standalone times in the bench artifact (each of
  * which pays its own shingle+pair cost). SURVEY.md records the ratio.
  */
object AmortizedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
        SparkSession.builder().master(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_amortized").toString + "/idx"

    val (_, tIndex) = timed { MinHash.writeCorpusIndex(docs, "doc_id", "text", dir) }
    val (pairs, tPairs) = timed {
      val p = JaccardJoin.pairsFromIndex(spark, dir, num = 5, den = 10)
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }
    // q51's/q102's/q106's threshold (6/10) as a filter, not a re-join
    val p6 = pairs.where(col("inter_size") * 10 >= col("union_size") * 6)

    val (_, tQ51) = timed {
      mat(Components.keepMinPerCluster(docs, "doc_id", p6).select("doc_id"))
    }
    val (_, tQ102) = timed {
      mat(Components.keepBestPerCluster(docs, "doc_id", p6,
        better = Seq(col("n_chars").desc, col("doc_id").asc)).select("doc_id"))
    }
    val (_, tQ106) = timed {
      val comp = Components.connectedComponents(p6, "id_a", "id_b")
      val w = comp
        .join(comp.groupBy(col("comp")).agg(count(lit(1)).as("__cs")), Seq("comp"))
        .select(col("id").as("doc_id"), expr("1000000L div __cs").as("weight_ppm"))
      mat(docs.select(col("doc_id")).join(w, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("weight_ppm"), lit(1000000L)).as("weight_ppm")))
    }
    val (_, tQ107) = timed {
      mat(pairs.select(explode(expr(
          "filter(transform(sequence(5, 9), t -> " +
            "IF(inter_size * 10 >= t * union_size, t, -1)), t -> t >= 0)"))
          .as("threshold_pct10"))
        .groupBy(col("threshold_pct10"))
        .agg(count(lit(1)).as("n_pairs")))
    }
    val total = tIndex + tPairs + tQ51 + tQ102 + tQ106 + tQ107
    println(f"""{"metric":"amortized_total","value":$total%.3f,"unit":"sec","sf":"$sfDir",""" +
      f""""index":$tIndex%.3f,"pairs":$tPairs%.3f,"q51":$tQ51%.3f,"q102":$tQ102%.3f,""" +
      f""""q106":$tQ106%.3f,"q107":$tQ107%.3f}""")
    spark.stop()
  }
}
