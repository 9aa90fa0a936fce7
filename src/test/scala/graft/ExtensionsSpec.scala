package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** SQL-facing registration of the native expressions via
  * SparkSessionExtensions (own session — extensions bind at build time).
  */
class ExtensionsSpec extends AnyFunSuite {

  /** Run `body` with a fresh extension-enabled session, then restore the
    * JVM's prior active/default session handles. When no session existed
    * before, CLEAR the handles instead of leaving the extension session
    * as the JVM default — otherwise every later suite's getOrCreate
    * would silently reuse this local[2]/shufflePartitions=2 session
    * (order-dependent cross-suite coupling).
    */
  private def withExtensionSession[A](body: SparkSession => A): A = {
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // .config("spark.sql.extensions", ...) is a STATIC conf: when another
    // suite already created the SparkContext, the builder silently drops
    // it and no functions register (order-dependent failure). The
    // programmatic .withExtensions hook binds at SESSION build and works
    // on a reused context — so the suite passes in any order. Production
    // spark-submit users set the conf (fresh context); embedded users on
    // a shared context must use withExtensions, as documented on
    // GraftExtensions. (Engine.configure injects the extensions a third
    // time — the point here is that EACH path works; registration is
    // idempotent-by-replacement and RangeJoinRewrite is a fixed point,
    // so the overlap is harmless.)
    val spark = Engine.configure(
        SparkSession.builder().master("local[2]")
          .withExtensions(new graft.functions.GraftExtensions().apply(_))
          .config("spark.sql.extensions", "graft.functions.GraftExtensions"),
        shufflePartitions = 2)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      body(spark)
    } finally {
      // leave the shared SparkContext running for other suites
      prior match {
        case Some(p) =>
          SparkSession.setActiveSession(p)
          SparkSession.setDefaultSession(p)
        case None =>
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
      }
    }
  }

  test("graft_* SQL functions resolve and match the Scala API") {
    withExtensionSession { spark =>
      import spark.implicits._
      Seq(("hello world")).toDF("text").createOrReplaceTempView("ext_docs")
      try {
        val row = spark.sql("""
          SELECT graft_poly_hash_array(split(text, ' ')) AS h,
                 graft_minhash(graft_poly_hash_array(split(text, ' ')), 4, 42) AS mh,
                 graft_simhash(graft_poly_hash_array(split(text, ' ')), 42) AS sh,
                 graft_shingles(split(text, ' '), 2) AS sg,
                 graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
                 graft_word_count(split(text, ' '), array('hello', 'x')) AS wc,
                 graft_winnow(array(5L, 3L, 9L, 3L, 7L, 1L), 3) AS wn,
                 graft_intersect_size(array('a', 'b', 'c'), array('b', 'c', 'd'), 1, 2) AS isz,
                 graft_levenshtein(text, 'hallo world', 3) AS lv,
                 graft_levenshtein(text, 'completely different', 3) AS lv_over,
                 graft_gram_hashes(split(text, ' '), 2) AS gh,
                 graft_classifier_score(split(text, ' '), 64, 3, 7, 2) AS cs
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
        assert(row.getSeq[String](3) === Seq("hello world"))
        assert(row.getDouble(4) === 11.0)
        assert(row.getLong(5) === 1L)
        // windows of [5,3,9,3,7,1] w=3: mins 3,3,3,1 -> distinct [3,1]
        assert(row.getSeq[Long](6) === Seq(3L, 1L))
        // {a,b,c} ∩ {b,c,d} = 2, and J = 2/4 reaches 1/2 — exact count
        assert(row.getLong(7) === 2L)
        // one substitution within threshold; -1 above it
        assert(row.getInt(8) === 1)
        assert(row.getInt(9) === -1)
        // positional 2-gram hash == polyhash of the joined gram string
        assert(row.getSeq[Long](10) === Seq(wh("hello world")))
        // classifier score: sum over tokens of ((h % 64) * 3 % 7 - 2)
        val want = Seq("hello", "world").map(w => (wh(w) % 64) * 3 % 7 - 2).sum
        assert(row.getLong(11) === want)
      } finally spark.catalog.dropTempView("ext_docs")
    }
  }

  test("graft_* SQL functions reject bad arity, non-literal config args, and wrong types") {
    withExtensionSession { spark =>
      import spark.implicits._
      Seq((Seq(1L, 2L), 4)).toDF("hs", "k").createOrReplaceTempView("ext_args")
      try {
        // wrong arity
        val e1 = intercept[AnalysisException](spark.sql("SELECT graft_minhash(hs) FROM ext_args").collect())
        assert(e1.getMessage.contains("expects 3 arguments"), e1.getMessage)
        // non-literal k: coefficient tables are baked in at plan time
        val e2 = intercept[AnalysisException](
          spark.sql("SELECT graft_minhash(hs, k, 42) FROM ext_args").collect())
        assert(e2.getMessage.contains("must be a literal"), e2.getMessage)
        // wrong element type: array<int> hashes would read garbage via
        // ArrayData.getLong on unsafe rows — must fail analysis instead
        val e3 = intercept[AnalysisException](
          spark.sql("SELECT graft_minhash(array(1, 2), 4, 42)").collect())
        assert(e3.getMessage.toLowerCase.contains("array<bigint>")
          || e3.getMessage.contains("DATATYPE_MISMATCH"), e3.getMessage)
        val e4 = intercept[AnalysisException](
          spark.sql("SELECT graft_simhash(array('a'), 42)").collect())
        assert(e4.getMessage.toLowerCase.contains("array<bigint>")
          || e4.getMessage.contains("DATATYPE_MISMATCH"), e4.getMessage)
        // non-literal / wrong-typed word set
        val e5 = intercept[AnalysisException](
          spark.sql("SELECT graft_word_count(array('a'), array(1, 2))").collect())
        assert(e5.getMessage.contains("array<string>"), e5.getMessage)
        val e6 = intercept[AnalysisException](
          spark.sql("SELECT graft_word_count(array('a'), array(cast(k AS string))) FROM ext_args").collect())
        assert(e6.getMessage.contains("literal"), e6.getMessage)
        // intersect_size: threshold must be a valid literal fraction
        val e7 = intercept[AnalysisException](
          spark.sql("SELECT graft_intersect_size(array('a'), array('a'), 3, 2)").collect())
        assert(e7.getMessage.contains("(0, 1]"), e7.getMessage)
        val e8 = intercept[AnalysisException](
          spark.sql("SELECT graft_intersect_size(array('a'), array(1), 1, 2)").collect())
        assert(e8.getMessage.toLowerCase.contains("array<string>")
          || e8.getMessage.contains("DATATYPE_MISMATCH"), e8.getMessage)
        val e9 = intercept[AnalysisException](
          spark.sql("SELECT graft_intersect_size(array('a'), array('a'), k, 2) FROM ext_args").collect())
        assert(e9.getMessage.contains("must be a literal"), e9.getMessage)
        // levenshtein: negative threshold, non-literal threshold, wrong type
        val e10 = intercept[AnalysisException](
          spark.sql("SELECT graft_levenshtein('a', 'b', -1)").collect())
        assert(e10.getMessage.contains("non-negative"), e10.getMessage)
        val e11 = intercept[AnalysisException](
          spark.sql("SELECT graft_levenshtein('a', 'b', k) FROM ext_args").collect())
        assert(e11.getMessage.contains("must be a literal"), e11.getMessage)
        val e12 = intercept[AnalysisException](
          spark.sql("SELECT graft_levenshtein(array('a'), 'b', 1)").collect())
        assert(e12.getMessage.contains("two strings")
          || e12.getMessage.contains("DATATYPE_MISMATCH"), e12.getMessage)
      } finally spark.catalog.dropTempView("ext_args")
    }
  }

  test("graft_bloom_agg + graft_bloom_contains: plan-side decontamination == exact semi-join") {
    withExtensionSession { spark =>
      import spark.implicits._
      // small corpus/banlist with overlap: grams g0..g99 in the corpus,
      // banlist bans every 7th — the bloom flow must flag EXACTLY those
      (0 until 100).map(i => (i.toLong, s"g$i")).toDF("id", "g")
        .createOrReplaceTempView("ext_corpus")
      (0 until 100 by 7).map(i => s"g$i").toDF("gram")
        .createOrReplaceTempView("ext_ban")
      try {
        val flagged = spark.sql("""
          SELECT id FROM ext_corpus
          WHERE graft_bloom_contains(xxhash64(g),
                  (SELECT graft_bloom_agg(xxhash64(gram), 4096, 11) FROM ext_ban), 11)
            AND g IN (SELECT gram FROM ext_ban)
          ORDER BY id""").as[Long].collect().toSeq
        assert(flagged === (0L until 100L by 7), "bloom+verify flow lost or invented a match")
        // the bloom alone has NO false negatives: every banned gram passes
        val pre = spark.sql("""
          SELECT id FROM ext_corpus
          WHERE graft_bloom_contains(xxhash64(g),
                  (SELECT graft_bloom_agg(xxhash64(gram), 4096, 11) FROM ext_ban), 11)""")
          .as[Long].collect().toSet
        assert((0L until 100L by 7).forall(pre), "bloom false negative")
        // the aggregate is mergeable: a 16-partition build == 1-partition
        val b16 = spark.sql(
          "SELECT graft_bloom_agg(xxhash64(gram), 4096, 11) FROM (SELECT /*+ REPARTITION(16) */ gram FROM ext_ban)")
          .head().getAs[Array[Byte]](0)
        val b1 = spark.sql(
          "SELECT graft_bloom_agg(xxhash64(gram), 4096, 11) FROM (SELECT /*+ REPARTITION(1) */ gram FROM ext_ban)")
          .head().getAs[Array[Byte]](0)
        assert(java.util.Arrays.equals(b16, b1), "bitmap depends on partitioning")
        // and it agrees with the Scala-side treeAggregate build
        // (expectedKeys=256 @ 16 bits/key sizes to the same 4096 bits;
        // probesFor(16) = 11 = the SQL k)
        val scalaSide = graft.operators.Bloom.build(
          spark.table("ext_ban"), org.apache.spark.sql.functions.col("gram"),
          bitsPerKey = 16, expectedKeys = Some(256L))
        assert(java.util.Arrays.equals(
          graft.functions.HashRuntime.bloomBytesFromWords(scalaSide.bits), b1),
          "SQL aggregate and Bloom.build disagree on the same keys")
        // rejections: non-power-of-two size, non-literal size, bad k, bad types
        val e1 = intercept[AnalysisException](
          spark.sql("SELECT graft_bloom_agg(xxhash64(gram), 1000, 11) FROM ext_ban").collect())
        assert(e1.getMessage.contains("power of two"), e1.getMessage)
        val e2 = intercept[AnalysisException](
          spark.sql("SELECT graft_bloom_agg(xxhash64(gram), length(gram), 11) FROM ext_ban").collect())
        assert(e2.getMessage.contains("must be a literal"), e2.getMessage)
        val e3 = intercept[AnalysisException](
          spark.sql("SELECT graft_bloom_contains(xxhash64(g), g, 11) FROM ext_corpus").collect())
        assert(e3.getMessage.contains("binary") || e3.getMessage.contains("DATATYPE_MISMATCH"),
          e3.getMessage)
        val e4 = intercept[AnalysisException](
          spark.sql("SELECT graft_bloom_agg(gram, 4096, 11) FROM ext_ban").collect())
        assert(e4.getMessage.contains("bigint") || e4.getMessage.contains("DATATYPE_MISMATCH"),
          e4.getMessage)
      } finally {
        spark.catalog.dropTempView("ext_corpus")
        spark.catalog.dropTempView("ext_ban")
      }
    }
  }

  test("RangeJoinRewrite: pure range join plans as hash join, equals nested loop exactly") {
    withExtensionSession { spark =>
      import spark.implicits._
      val rnd = new scala.util.Random(11)
      val pts = (1 to 400).map(i => (i.toLong, rnd.nextLong(2000) - 1000)).toDF("pid", "p")
      val ivs = (1 to 80).map { i =>
        val s = rnd.nextLong(2000) - 1000
        (i.toLong, s, s + rnd.nextLong(300))
      }.toDF("iid", "s", "e")
      pts.createOrReplaceTempView("rjr_pts")
      ivs.createOrReplaceTempView("rjr_ivs")
      try {
        spark.conf.set(graft.plans.RangeJoinRewrite.WidthKey, "128")
        val sql = "SELECT pid, iid FROM rjr_pts JOIN rjr_ivs ON p >= s AND p <= e"

        spark.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
        val bnl = spark.sql(sql)
        assert(bnl.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
          "baseline should be the nested loop the rule exists to kill")
        val want = bnl.as[(Long, Long)].collect().toSet

        spark.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "true")
        val rewritten = spark.sql(sql)
        val physical = rewritten.queryExecution.executedPlan.toString
        assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
        assert(physical.contains("Generate explode"), physical)
        val got = rewritten.as[(Long, Long)].collect()
        assert(got.length === got.toSet.size, "duplicate pairs from bucket explode")
        assert(got.toSet === want)

        // strict bounds rewrite too, and stay exact
        val strict = "SELECT pid, iid FROM rjr_pts JOIN rjr_ivs ON p > s AND p < e"
        spark.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
        val wantStrict = spark.sql(strict).as[(Long, Long)].collect().toSet
        spark.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "true")
        val gotStrict = spark.sql(strict)
        assert(!gotStrict.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
        assert(gotStrict.as[(Long, Long)].collect().toSet === wantStrict)

        // an equi key makes the join ineligible: Spark's own hash join
        // already handles it, and no explode should appear
        val equi = spark.sql(
          "SELECT pid, iid FROM rjr_pts JOIN rjr_ivs ON pid = iid AND p >= s AND p <= e")
        val equiPlan = equi.queryExecution.executedPlan.toString
        assert(!equiPlan.contains("Generate explode"), equiPlan)

        // interval-overlap joins rewrite too: both sides explode,
        // first-shared-bucket keeps each pair exactly once
        val rnd2 = new scala.util.Random(13)
        val ivs2 = (1 to 90).map { i =>
          val s = rnd2.nextLong(2000) - 1000
          (i + 1000L, s, s + rnd2.nextLong(250))
        }.toDF("jid", "s2", "e2")
        ivs2.createOrReplaceTempView("rjr_ivs2")
        val over = "SELECT iid, jid FROM rjr_ivs JOIN rjr_ivs2 ON s <= e2 AND s2 <= e"
        spark.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
        val wantOver = spark.sql(over).as[(Long, Long)].collect().toSet
        spark.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "true")
        val gotOverDf = spark.sql(over)
        val overPlan = gotOverDf.queryExecution.executedPlan.toString
        assert(!overPlan.contains("BroadcastNestedLoopJoin"), overPlan)
        assert(overPlan.contains("Generate explode"), overPlan)
        val gotOver = gotOverDf.as[(Long, Long)].collect()
        assert(gotOver.length === gotOver.toSet.size,
          "duplicate overlap pairs from double explode")
        assert(gotOver.toSet === wantOver)
      } finally {
        spark.conf.unset(graft.plans.RangeJoinRewrite.EnabledKey)
        spark.conf.unset(graft.plans.RangeJoinRewrite.WidthKey)
        spark.catalog.dropTempView("rjr_pts")
        spark.catalog.dropTempView("rjr_ivs")
        spark.catalog.dropTempView("rjr_ivs2")
      }
    }
  }
}
