package graft

import org.apache.spark.sql.SparkSession

/** Pin-run helper for literal oracles: prints a registry query's rows as
  * `PIN|v1,v2,...` lines at a given master (e.g. local[5] / local[16]),
  * so a deterministic query's output can be captured at two parallelism
  * levels, diffed, and inlined as a pinned VALUES oracle (the q164/q166
  * device). Usage: runMain graft.PinQuery <query> <sfDir> <master>
  */
object PinQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, master) = args.take(3)
    val spark = Engine.configure(
      SparkSession.builder().master(master), shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).collect()
      .foreach(r => println("PIN|" + r.mkString(",")))
    spark.stop()
  }
}
