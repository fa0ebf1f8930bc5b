package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The STAMPED text-normalizer stage of the tokenizer families — the
  * step every published subword pipeline runs before pre-tokenization
  * (HF calls it the `normalizer`; BERT's `do_lower_case` is the
  * canonical instance). The mode is chosen at train/import time, rides
  * the model stamp next to `wordPattern`/`byteLevel`, and every
  * stamp-reading path (indexed encodes, windows landings, SFT
  * assembly, fertility/OOV observables, streaming serves, drift-fired
  * retrains) applies it automatically — so a BERT-uncased vocab.txt
  * imported with `normalize = "lowercase_strip_accents"` reproduces
  * the published ids on mixed-case text without the caller
  * remembering anything.
  *
  * Modes: `none` (default — pre-r16 stamps read back as it), `nfc`,
  * `nfkc`, `lowercase`, `lowercase_strip_accents` (the BERT-uncased
  * pair: lowercase, then NFD-decompose and drop Mn marks). All
  * non-`none` modes run the native [[graft.functions.TextNormalize]]
  * codegen expression — blockwise, no UDF, fuses into the scan.
  *
  * Detokenization is normalization-lossy by construction (an uncased
  * model cannot restore case) — stated, not hidden. */
object Normalize {

  /** Every valid mode, `none` first. */
  val Modes: Seq[String] =
    "none" +: graft.functions.TextNormalize.Modes

  /** Loud validation at the train/import front door — a typo'd mode
    * must refuse before it rides a stamp. */
  def validate(mode: String, who: String): Unit =
    require(Modes.contains(mode),
      s"$who: unknown normalize mode '$mode' — one of " +
        Modes.mkString(", "))

  /** The mode applied to one column; `none` passes through (no extra
    * projection in the unnormalized path). */
  def colOf(c: Column, mode: String): Column =
    if (mode == "none") c
    else graft.functions.TextHashExprs.textNormalize(c, mode)

  /** The mode applied to a frame's text column in place — the wrap
    * every stamp-reading serve runs before handing `docs` to the
    * un-stamped encode machinery. */
  def frame(df: DataFrame, textCol: String, mode: String): DataFrame =
    if (mode == "none") df
    else df.withColumn(textCol, colOf(col(textCol), mode))
}
