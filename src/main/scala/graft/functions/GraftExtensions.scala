package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration for graft's native expressions,
  * making them callable from SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_poly_hash_array(split(text, ' ')) FROM docs")
  * }}}
  *
  * The Scala API ([[HashExprs]], [[VecExprs]]) does not require the
  * extension — it builds the expressions directly — so
  * `SparkEntry.queries` work under any session; the extension is for
  * SQL-first users.
  *
  * `spark.sql.extensions` is a STATIC conf: it only takes effect when the
  * builder creates the SparkContext. Embedding into a JVM whose context
  * already exists (notebooks, test harnesses) silently skips it — use the
  * programmatic form there:
  * `builder.withExtensions(new GraftExtensions().apply(_))`.
  *
  * Scalar config args (k, seed, n) must be literals: they are baked into
  * the expression at plan time (coefficient/hyperplane tables derive from
  * them), so a non-foldable arg is rejected at analysis with a clear
  * error instead of failing obscurely in `eval()` at builder time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> msg))

  private def checkArity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.size != n) fail(s"$fn expects $n arguments, got ${args.size}")

  private def literalArg(fn: String, args: Seq[Expression], i: Int, what: String): Long = {
    val e = args(i)
    if (!e.foldable) fail(s"$fn: $what (argument ${i + 1}) must be a literal, got ${e.sql}")
    e.eval() match {
      case n: Number => n.longValue()
      case other => fail(s"$fn: $what (argument ${i + 1}) must be an integer literal, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: pure range joins (no equi keys) auto-rewritten to
    // the bucketed hash-join decomposition — see RangeJoinRewrite's doc
    // for eligibility, configs, and the exactness argument
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash_array"),
      info("graft_poly_hash_array",
        "graft_poly_hash_array(arr) - polynomial mod-1e9+7 hash of each string in arr"),
      (args: Seq[Expression]) => {
        checkArity("graft_poly_hash_array", args, 1)
        PolyHashArray(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(hashes, k, seed) - k-slot minhash signature of a long array"),
      (args: Seq[Expression]) => {
        checkArity("graft_minhash", args, 3)
        val k = literalArg("graft_minhash", args, 1, "k")
        if (k < 1 || k > 4096) fail(s"graft_minhash: k must be in [1, 4096], got $k")
        MinHashSignature(args.head, k.toInt, literalArg("graft_minhash", args, 2, "seed"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(hashes, seed) - 64-bit simhash of a long array"),
      (args: Seq[Expression]) => {
        checkArity("graft_simhash", args, 2)
        SimHash64(args.head, literalArg("graft_simhash", args, 1, "seed"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles",
        "graft_shingles(tokens, n) - distinct word n-gram shingles of a string array"),
      (args: Seq[Expression]) => {
        checkArity("graft_shingles", args, 2)
        val n = literalArg("graft_shingles", args, 1, "n")
        if (n < 1 || n > 64) fail(s"graft_shingles: n must be in [1, 64], got $n")
        ShingleArray(args.head, n.toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      info("graft_winnow",
        "graft_winnow(hashes, w) - distinct w-window minima of a long array (MOSS winnowing)"),
      (args: Seq[Expression]) => {
        checkArity("graft_winnow", args, 2)
        val w = literalArg("graft_winnow", args, 1, "w")
        if (w < 1 || w > 4096) fail(s"graft_winnow: w must be in [1, 4096], got $w")
        WinnowMins(args.head, w.toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_hashes"),
      info("graft_gram_hashes",
        "graft_gram_hashes(tokens, k) - positional k-gram polyhashes of a string array " +
          "(space-joined grams, no intermediate strings)"),
      (args: Seq[Expression]) => {
        checkArity("graft_gram_hashes", args, 2)
        val k = literalArg("graft_gram_hashes", args, 1, "k")
        if (k < 1 || k > 64) fail(s"graft_gram_hashes: k must be in [1, 64], got $k")
        PositionalGramHashes(args.head, k.toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_classifier_score"),
      info("graft_classifier_score",
        "graft_classifier_score(tokens, buckets, mul, mod, shift) - hashing-trick linear " +
          "classifier score: sum over tokens of ((polyhash(tok) % buckets) * mul % mod - shift)"),
      (args: Seq[Expression]) => {
        checkArity("graft_classifier_score", args, 5)
        val buckets = literalArg("graft_classifier_score", args, 1, "buckets")
        if (buckets < 1) fail(s"graft_classifier_score: buckets must be >= 1, got $buckets")
        val wmod = literalArg("graft_classifier_score", args, 3, "mod")
        if (wmod < 1) fail(s"graft_classifier_score: mod must be >= 1, got $wmod")
        val mul = literalArg("graft_classifier_score", args, 2, "mul")
        // the kernel's invariant is "non-negative before the shift, Java %
        // == mathematical mod": a negative mul breaks it, and a huge mul
        // overflows (hash % buckets) * mul before the % mod
        if (mul < 0) fail(s"graft_classifier_score: mul must be >= 0, got $mul")
        if (buckets - 1 > Long.MaxValue / math.max(mul, 1L)) {
          fail(s"graft_classifier_score: (buckets - 1) * mul overflows Long " +
            s"(buckets=$buckets, mul=$mul)")
        }
        ClassifierScore(args.head, buckets,
          mul, wmod,
          literalArg("graft_classifier_score", args, 4, "shift"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_count"),
      info("graft_word_count",
        "graft_word_count(tokens, words) - count of tokens present in the literal word array"),
      (args: Seq[Expression]) => {
        checkArity("graft_word_count", args, 2)
        val wordsExpr = args(1)
        if (!wordsExpr.foldable) {
          fail(s"graft_word_count: words (argument 2) must be a literal array, got ${wordsExpr.sql}")
        }
        wordsExpr.dataType match {
          case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _) => ()
          case t => fail(s"graft_word_count: words must be array<string>, got $t")
        }
        val words = wordsExpr.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            (0 until a.numElements()).map { i =>
              if (a.isNullAt(i)) fail("graft_word_count: words must not contain null")
              a.getUTF8String(i).toString
            }
          case other => fail(s"graft_word_count: words must be an array<string> literal, got $other")
        }
        if (words.isEmpty) fail("graft_word_count: words must not be empty")
        WordSetCount(args.head, words)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_intersect_size"),
      info("graft_intersect_size",
        "graft_intersect_size(a, b, num, den) - DISTINCT-set intersection size of two string " +
          "arrays; exact for pairs reaching Jaccard num/den, early-exit (partial count) below " +
          "it. Pass distinct arrays: the num/den bound treats array lengths as set sizes"),
      (args: Seq[Expression]) => {
        checkArity("graft_intersect_size", args, 4)
        val num = literalArg("graft_intersect_size", args, 2, "num")
        val den = literalArg("graft_intersect_size", args, 3, "den")
        if (num < 1 || den < 1 || num > den) {
          fail(s"graft_intersect_size: threshold num/den must be in (0, 1], got $num/$den")
        }
        BoundedIntersectSize(args.head, args(1), num.toInt, den.toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_levenshtein"),
      info("graft_levenshtein",
        "graft_levenshtein(a, b, maxDist) - Levenshtein distance over code points if " +
          "<= maxDist else -1 (banded native kernel; maxDist a non-negative int literal)"),
      (args: Seq[Expression]) => {
        checkArity("graft_levenshtein", args, 3)
        val maxDist = literalArg("graft_levenshtein", args, 2, "maxDist")
        if (maxDist < 0 || maxDist > Int.MaxValue) {
          fail(s"graft_levenshtein: maxDist must be a non-negative int, got $maxDist")
        }
        BoundedLevenshtein(args.head, args(1), maxDist.toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot",
        "graft_dot(a, b) - in-order dot product of two double arrays"),
      (args: Seq[Expression]) => {
        checkArity("graft_dot", args, 2)
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(hash, numBits, k) - mergeable bloom-bitmap aggregate over bigint " +
          "keys; numBits a power-of-two literal, k probes. Returns BINARY (little-endian)"),
      (args: Seq[Expression]) => {
        checkArity("graft_bloom_agg", args, 3)
        val numBits = literalArg("graft_bloom_agg", args, 1, "numBits")
        val k = literalArg("graft_bloom_agg", args, 2, "k")
        if (numBits < 64 || numBits > (1L << 31) || (numBits & (numBits - 1)) != 0) {
          fail(s"graft_bloom_agg: numBits must be a power of two in [64, 2^31], got $numBits")
        }
        if (k < 1 || k > 32) fail(s"graft_bloom_agg: k must be in [1, 32], got $k")
        BloomAggregate(args.head, numBits, k.toInt).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains",
        "graft_bloom_contains(hash, bitmap, k) - probe a graft_bloom_agg bitmap; k must " +
          "match the build's"),
      (args: Seq[Expression]) => {
        checkArity("graft_bloom_contains", args, 3)
        val k = literalArg("graft_bloom_contains", args, 2, "k")
        if (k < 1 || k > 32) fail(s"graft_bloom_contains: k must be in [1, 32], got $k")
        BloomContainsBytes(args.head, args(1), k.toInt)
      }))
  }
}
