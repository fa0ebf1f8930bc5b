package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{MinHashSig, ShingleHashes, TokenStats, TopGramFrac}

/** SparkSessionExtensions hook (SURVEY §7 custom-work tier c): registers
  * graft's native expressions as SQL functions, so `spark.sql` users get
  * them without touching the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * spark.sql("SELECT minhash_sig(shingle_hashes(text, 3), 16) FROM docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => ShingleHashes(text, 3)
        case Seq(text, k) => ShingleHashes(text, intArg(k, "shingle_hashes k"))
        case _ => throw new IllegalArgumentException(
          "shingle_hashes(text[, k]) takes 1 or 2 arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(hashes) => MinHashSig(hashes, 16)
        case Seq(hashes, n) => MinHashSig(hashes, intArg(n, "minhash_sig n"))
        case _ => throw new IllegalArgumentException(
          "minhash_sig(hashes[, n]) takes 1 or 2 arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => TokenStats(text, Nil)
        case _ => throw new IllegalArgumentException(
          "token_stats(text) takes 1 argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_gram_frac"),
      new ExpressionInfo(classOf[TopGramFrac].getName, "top_gram_frac"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => TopGramFrac(text, 2)
        case Seq(text, n) => TopGramFrac(text, intArg(n, "top_gram_frac n"))
        case _ => throw new IllegalArgumentException(
          "top_gram_frac(text[, n]) takes 1 or 2 arguments")
      }))
  }
}
