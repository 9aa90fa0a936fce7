package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
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
  * The Scala API ([[HashExprs]]) does not require the extension — it
  * builds the expressions directly — so `SparkEntry.queries` work under
  * any session; the extension is for SQL-first users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash_array"),
      info("graft_poly_hash_array",
        "graft_poly_hash_array(arr) - polynomial mod-1e9+7 hash of each string in arr"),
      (args: Seq[Expression]) => PolyHashArray(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(hashes, k, seed) - k-slot minhash signature of a long array"),
      (args: Seq[Expression]) =>
        MinHashSignature(args.head,
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].longValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(hashes, seed) - 64-bit simhash of a long array"),
      (args: Seq[Expression]) =>
        SimHash64(args.head, args(1).eval().asInstanceOf[Number].longValue())))
  }
}
