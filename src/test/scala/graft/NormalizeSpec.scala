package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.Normalize

/** The stamped tokenizer text-normalizer stage: mode semantics of the
  * native TextNormalize expression (NFC/NFKC composition, locale-pinned
  * lowercase, the BERT-uncased lowercase+strip-accents pair), null
  * passthrough, `none` identity, and the loud unknown-mode refusal. */
class NormalizeSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def run(mode: String, s: String): String =
    df(schema, Row(1L, s))
      .select(Normalize.colOf(col("text"), mode).as("t"))
      .head().getString(0)

  test("mode semantics: nfc composes, nfkc folds compatibility forms, lowercase is locale-pinned, strip drops Mn marks") {
    // NFC: e + COMBINING ACUTE (U+0301) composes to é
    assert(run("nfc", "Café") === "Café")
    // NFKC: ﬁ-ligature (U+FB01) folds to "fi"; ① (U+2460) folds to "1"
    assert(run("nfkc", "ﬁle ①") === "file 1")
    // lowercase: plain fold, accents KEPT
    assert(run("lowercase", "Café RÉSUMÉ") === "café résumé")
    // the BERT-uncased pair: lowercase THEN NFD-strip Mn marks —
    // composed AND decomposed inputs land on the same bytes
    assert(run("lowercase_strip_accents", "Café RÉSUMÉ Über naïve") ===
      "cafe resume uber naive")
    assert(run("lowercase_strip_accents", "Café") === "cafe")
    // none: identity (no projection inserted at all)
    val c = col("text")
    assert(Normalize.colOf(c, "none") eq c)
  }

  test("null passthrough, frame wrap, and unknown-mode refusal") {
    val d = df(schema, Row(1L, null), Row(2L, "AbC"))
    val out = Normalize.frame(d, "text", "lowercase")
      .orderBy("id").collect().map(r =>
        if (r.isNullAt(1)) null else r.getString(1))
    assert(out.toSeq === Seq(null, "abc"))
    val e = intercept[IllegalArgumentException] {
      Normalize.validate("lower", "test")
    }
    assert(e.getMessage.contains("unknown normalize mode"))
    // a typo'd mode refuses at every train/import front door
    assert(intercept[IllegalArgumentException] {
      graft.llm.Bpe.writeBpeModel(d, "text", "nzb", "/tmp/never", 1,
        normalize = "upper")
    }.getMessage.contains("unknown normalize mode"))
  }

  test("DuckDB-parity shape: engine lowercase_strip_accents equals lower(strip_accents(x)) on Latin fixtures") {
    // the oracle replays the mode as lower(strip_accents(x)); the two
    // orders agree unless lowering invents marks — pin the fixture
    // alphabet the oracles use (Latin letters + common accents)
    val fixtures = Seq("Café", "RÉSUMÉ", "Über", "naïve", "COÛT",
      "El Niño", "Zürich", "François", "plain ascii TEXT")
    fixtures.foreach { s =>
      val engine = run("lowercase_strip_accents", s)
      // reference: strip first, then lower (the DuckDB-side order)
      val stripped = java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFD)
        .filter(ch => Character.getType(ch) != Character.NON_SPACING_MARK)
        .toLowerCase(java.util.Locale.ROOT)
      assert(engine === stripped, s"order-sensitivity on '$s'")
    }
  }
}
