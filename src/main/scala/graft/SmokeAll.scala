package graft

import org.apache.spark.sql.SparkSession

/** Executes EVERY registry query end-to-end (noop write) at a given sf
  * dir and reports failures — the runtime-smoke complement of Verify
  * (which checks values at sf0.01) and PlanSpec's global guard (which
  * only builds plans). Usage: runMain graft.SmokeAll [sfDir]
  */
object SmokeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Engine.configure(
        SparkSession.builder().master(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = List.empty[String]
    SparkEntry.registry.foreach { q =>
      try {
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
      } catch {
        case e: Throwable =>
          bad ::= q.name
          System.err.println(s"[smoke] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    println(s"SMOKE ${SparkEntry.registry.size - bad.size}/${SparkEntry.registry.size} ok" +
      (if (bad.nonEmpty) s"; FAILED: ${bad.reverse.mkString(", ")}" else ""))
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
