package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-agnostic deterministic text hashing.
  *
  * Every hash here is pure integer arithmetic over character codes, so the
  * DuckDB oracle can recompute signatures bit-for-bit in SQL — the
  * correctness gate then verifies the whole minhash/LSH pipeline, not just
  * row counts. (Spark's `hash()` is Murmur3 with Spark-specific seeds and
  * DuckDB's `hash()` is different again — neither is cross-checkable.)
  *
  * All expressions are codegen'd Column arithmetic — no UDFs — so
  * signature computation is blockwise (zero shuffles) and fuses into the
  * scan stage, the shape that survives 100 TB of documents.
  */
object TextHash {
  /** Large Mersenne prime 2^31-1: modulus for all signature arithmetic;
    * keeps every intermediate < 2^63. */
  val P = 2147483647L

  /** Token id: first 4 chars (padded) as base-128 digits + length mix.
    * Collisions are fine (it is a hash); determinism and
    * SQL-expressibility are the point. */
  def tokId(w: Column): Column = {
    val p = rpad(w, 4, "_")
    (ascii(substring(p, 1, 1)) * lit(2097152L)) +
      (ascii(substring(p, 2, 1)) * lit(16384L)) +
      (ascii(substring(p, 3, 1)) * lit(128L)) +
      ascii(substring(p, 4, 1)) +
      length(w) * lit(7919L)
  }
  /** Same hash as DuckDB SQL, for oracle statements. The BIGINT cast on
    * the first digit matters: DuckDB multiplies INT32 ascii codes in
    * INT32, which overflows at supplementary code points (≥ 2^16) ×
    * 2097152 — Spark's Column arithmetic is already 64-bit via lit(L). */
  def tokIdSql(w: String): String =
    s"(CAST(ascii(substr(rpad($w, 4, '_'), 1, 1)) AS BIGINT) * 2097152 + " +
      s"CAST(ascii(substr(rpad($w, 4, '_'), 2, 1)) AS BIGINT) * 16384 + " +
      s"CAST(ascii(substr(rpad($w, 4, '_'), 3, 1)) AS BIGINT) * 128 + " +
      s"ascii(substr(rpad($w, 4, '_'), 4, 1)) + length($w) * 7919)"

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-token id array — hash each token ONCE; shingle hashes combine
    * these numerically (a string-concat shingle hash costs ~20 string ops
    * per shingle inside interpreted higher-order functions — measured 30x
    * slower at sf0.1). */
  def tokenIds(text: Column): Column = transform(tokens(text), w => tokId(w))

  /** Distinct word k-shingle hashes: polynomial combine of the k token
    * ids mod P, built from k shifted slices zip_with'd together.
    *
    * Shape matters: an `element_at(tid, i+d)` inside a transform lambda
    * re-evaluates the whole token-id array PER ELEMENT under interpreted
    * higher-order evaluation — O(tokens^2) per row (measured: minutes at
    * sf0.1). Slices evaluate their child once per row, so this form is
    * O(tokens·k). Guarded for docs shorter than k tokens. */
  def shingleHashArray(text: Column, k: Int = 3): Column = {
    val tid = tokenIds(text)
    val n = size(tid)
    val win = n - lit(k - 1)
    val first = slice(tid, lit(1), win)
    val combined = (1 until k).foldLeft(first) { (acc, d) =>
      zip_with(acc, slice(tid, lit(d + 1), win), (a, t) => a * lit(31L) + t)
    }
    when(n >= k,
      array_distinct(transform(combined, h => pmod(h, lit(P)))))
      .otherwise(array().cast("array<bigint>"))
  }
  /** MinHash signature (k independent permutation hashes) over a
    * pre-hashed shingle array. sig[i] = min over shingles of
    * (a_i*h + b_i) mod P, a_i = 2000006*i + 1012345, b_i = 999983*i
    * + 423307. */
  def minhashSignature(shingleHashes: Column, numHashes: Int = 16): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(shingleHashes, h =>
        pmod(h * (i * lit(2000006L) + lit(1012345L)) + i * lit(999983L) + lit(423307L), lit(P)))))

  /** The (a, b) multipliers of simhash bit `j` — the same public
    * affine family as [[minhashSignature]], so each signature position
    * is an INDEPENDENT well-mixed hash of the token. This matters for
    * wide signatures: the raw tokId carries only ~28 bits of entropy on
    * ASCII text, so a signature that read raw tokId bits (the pre-r12
    * form) would have every position past ~28 constantly 0 — and any
    * band covering those positions would put the WHOLE corpus in one
    * bucket (a quadratic self-join). Mixed per-position bits keep all
    * 64 positions uniform, which is what makes the
    * Manku/Jain/Sarma 64-bit banding geometry selective. */
  private def simhashAB(j: Int): (Long, Long) =
    (2000006L * j + 1012345L, 999983L * j + 423307L)

  /** SimHash over token hashes: signature bit j is set iff more
    * distinct tokens have bit_j = 1 than not, where bit_j(h) =
    * ((h mod P) · a_j + b_j) mod P, taken mod 2 ([[simhashAB]]). The
    * tokId is reduced mod P before the multiply so the product stays
    * < 2^62 at any code point (the [[fingerprint]] overflow posture).
    * `bits` ≤ 64; position 63 contributes Long.MinValue as a pure bit
    * term (the sum of distinct bit terms is a bitwise OR — no
    * arithmetic overflow is possible). */
  def simhash(text: Column, bits: Int = 64): Column = {
    require(bits >= 1 && bits <= 64, s"simhash bits must be in [1, 64], got $bits")
    val hs = transform(array_distinct(tokens(text)),
      w => pmod(tokId(w), lit(P)))
    val terms = (0 until bits).map { j =>
      val (a, b) = simhashAB(j)
      val withBit = size(filter(hs, h =>
        pmod(pmod(h * lit(a) + lit(b), lit(P)), lit(2L)) === 1))
      when(withBit * 2 > size(hs), lit(1L << j)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** DuckDB SQL mirror of [[simhash]]'s bit-term sum over a list
    * variable holding the mod-P distinct token hashes — kept next to
    * the Scala definition so the two derivations can never drift. The
    * j = 63 term is spelled `(-9223372036854775807 - 1)`: the bare
    * literal −2^63 does not parse as a BIGINT in SQL (the positive half
    * overflows before negation). */
  def simhashTermsSql(hsVar: String, bits: Int): String = {
    require(bits >= 1 && bits <= 64)
    (0 until bits).map { j =>
      val (a, b) = simhashAB(j)
      val v = if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString
      s"(CASE WHEN 2*len(list_filter($hsVar, h -> ((h * $a + $b) % 2147483647) % 2 = 1)) " +
        s"> len($hsVar) THEN $v ELSE 0 END)"
    }.mkString(" + ")
  }

  /** Order-sensitive document fingerprint: positionally-weighted rolling
    * hash mod P (near-identical reorderings get different fingerprints,
    * unlike set-based minhash).
    *
    * The tokId is reduced mod P BEFORE the weight multiply: a raw tokId
    * reaches ~2^41 at supplementary code points, and ×1742810335 (the
    * largest weight) overflows Int64 — ANSI Spark raises, DuckDB raises,
    * and a wrapping implementation silently diverges. (tokId % P) ×
    * weight stays < 2^62. ASCII tokIds are already < P, so the reduction
    * changes nothing for them. */
  def fingerprint(text: Column): Column = {
    val t = tokens(text)
    val weights = Seq(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 1742810335L)
    val weightArr = typedLit(weights)
    pmod(
      aggregate(
        zip_with(t, sequence(lit(0), size(t) - 1), (w, i) =>
          pmod(pmod(tokId(w), lit(P)) * element_at(weightArr, pmod(i, lit(8)).cast("int") + 1), lit(P))),
        lit(0L), (acc, x) => pmod(acc + x, lit(P))),
      lit(P))
  }
}
