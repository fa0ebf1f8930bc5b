package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{DotLong, LshBucket, MinHashSig, NfcNormalize,
  QuantizeInt8Q, ShingleHashes, SimHash, TokenStats, TopGramFrac}

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
    ext.injectFunction((
      new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => SimHash(text, 64)
        case Seq(text, bits) => SimHash(text, intArg(bits, "simhash bits"))
        case _ => throw new IllegalArgumentException(
          "simhash(text[, bits]) takes 1 or 2 arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => NfcNormalize(s)
        case _ => throw new IllegalArgumentException(
          "nfc_normalize(text) takes 1 argument")
      }))
    // vector args arrive as whatever array type the SQL literal or
    // column carries; cast to the expressions' declared element types
    // exactly as the Scala Column helpers do
    ext.injectFunction((
      new FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotLong(a, b)
        case _ => throw new IllegalArgumentException(
          "dot_long(a, b) takes 2 arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("quantize_int8q"),
      new ExpressionInfo(classOf[QuantizeInt8Q].getName, "quantize_int8q"),
      (args: Seq[Expression]) => args match {
        case Seq(v) =>
          QuantizeInt8Q(Cast(v, ArrayType(DoubleType)))
        case _ => throw new IllegalArgumentException(
          "quantize_int8q(vec) takes 1 argument")
      }))
    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      (args: Seq[Expression]) => args match {
        case Seq(v, dim, planes) =>
          LshBucket(Cast(v, ArrayType(DoubleType)),
            intArg(dim, "lsh_bucket dim"), intArg(planes, "lsh_bucket planes"))
        case _ => throw new IllegalArgumentException(
          "lsh_bucket(vec, dim, planes) takes 3 arguments")
      }))
  }
}
