package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-facing registration of the native expressions via
  * SparkSessionExtensions (own session — extensions bind at build time).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_* SQL functions resolve and match the Scala API") {
    // getOrCreate would return an already-active session (built WITHOUT
    // the extension) when another suite ran first — clear the active/
    // default handles so the builder constructs a fresh session (it
    // still reuses the JVM's SparkContext) and restore them after
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = Engine.configure(
        SparkSession.builder().master("local[2]")
          .config("spark.sql.extensions", "graft.functions.GraftExtensions"),
        shufflePartitions = 2)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      Seq(("hello world")).toDF("text").createOrReplaceTempView("ext_docs")
      val row = spark.sql("""
        SELECT graft_poly_hash_array(split(text, ' ')) AS h,
               graft_minhash(graft_poly_hash_array(split(text, ' ')), 4, 42) AS mh,
               graft_simhash(graft_poly_hash_array(split(text, ' ')), 42) AS sh
        FROM ext_docs""").head()
      def wh(w: String) = w.foldLeft(7L)((a, c) => (a * 31 + c) % 1000000007L)
      assert(row.getSeq[Long](0) === Seq(wh("hello"), wh("world")))
      assert(row.getSeq[Long](1).length === 4)
      // simhash of the same tokens via the Scala API must be identical
      val viaApi = Seq("hello world").toDF("text")
        .select(graft.operators.SimHash.simhash(
          graft.operators.TextOps.polyHashAll(
            graft.operators.TextOps.tokens(org.apache.spark.sql.functions.col("text")))))
        .head().getLong(0)
      assert(row.getLong(2) === viaApi)
    } finally {
      // leave the shared context running for other suites; just drop the
      // view and restore the prior session handles
      spark.catalog.dropTempView("ext_docs")
      prior.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }
}
