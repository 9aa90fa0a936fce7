package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round instrumentation: dump `.explain("formatted")` for the
  * named registry queries to `<outDir>/<name>.txt` — the plan evidence the
  * round's OPTIMIZATION_r*.md claims are checked against.
  *
  * Usage: runMain graft.PlanDump <outDir> <q1,q2,...>
  *
  * Caveat (documented in the dumped header): queries that run EAGER stages
  * during construction (localCheckpoint'd codebooks, index writes, the q169
  * dataset write) only expose the plan of the RETURNED frame; the eager
  * stages' plans are not reachable from it. The dump still shows the final
  * join/agg shape, exchange count and scan pushdown of the tail.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(
        SparkSession.builder().master(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.registry.filter(q => names.contains(q.name)).foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${q.name}.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $outDir/${q.name}.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] ${q.name} FAILED: ${e.getMessage}")
      } finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
    }
    spark.stop()
  }
}
