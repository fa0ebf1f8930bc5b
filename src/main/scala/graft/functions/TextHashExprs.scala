package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash hot path.
  *
  * The declarative forms (llm/TextHash.scala) run as interpreted
  * higher-order functions — fine for oracle documentation, but each row
  * pays hundreds of boxed lambda evaluations. These expressions compute
  * the SAME integer arithmetic (bit-for-bit, so the DuckDB oracle still
  * matches — WindowLlmSpec asserts equality against the declarative
  * form) in one imperative pass per row.
  *
  * SURVEY §7 custom-work tier (b): a scalar Expression where composing
  * built-ins can't reach the needed efficiency.
  */

/** Shared token-id hash for the native text expressions.
  *
  * The declarative specification (TextHash.tokId: `ascii(substring(
  * rpad(tok,4,'_'), d, 1))` + `length(tok) * 7919`) and its DuckDB
  * mirror both operate on CODE POINTS — Spark's substring/length and
  * DuckDB's substr/length count code points, and ascii() yields the
  * code point of the (possibly supplementary) first character. The
  * native form must therefore walk code points too: a UTF-16
  * `charAt`/`length` walk diverges on any non-BMP character (𝄞, emoji —
  * ubiquitous in web corpora) by splitting it into two surrogate units. */
private[functions] object TokHash {
  /** tokId = cp1*128^3 + cp2*128^2 + cp3*128 + cp4 over the first four
    * code points ('_'-padded) + codePointCount * 7919. */
  def tokId(tok: String): Long = {
    var id = 0L
    var mult = 2097152L // 128^3, then /128 per digit
    var ci = 0
    var d = 0
    while (d < 4) {
      val cp =
        if (ci < tok.length) {
          val c = tok.codePointAt(ci); ci += Character.charCount(c); c
        } else '_'.toInt
      id += cp.toLong * mult
      mult /= 128L
      d += 1
    }
    id + tok.codePointCount(0, tok.length).toLong * 7919L
  }
}

/** Distinct k-shingle hashes of a whitespace-tokenized text; semantics
  * identical to TextHash.shingleHashArray (split(' ', -1) tokenization,
  * tokId = cp1*128^3+cp2*128^2+cp3*128+cp4 over rpad(tok,4,'_') +
  * code-point-len*7919, shingle = polynomial-31 combine mod 2^31-1,
  * distinct). */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  // Real codegen via the reference-call pattern: the generated code
  // invokes this expression's own nullSafeEval with the CHILD VALUE (not
  // the input row), so the operator stays inside WholeStageCodegen — a
  // CodegenFallback would force the surrounding span to materialize the
  // full input row per call. One virtual call per row remains; the loop
  // itself is already an imperative single pass.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs STRING, got ${child.dataType}")

  private val P = 2147483647L

  private def tokId(tok: String): Long = TokHash.tokId(tok)

  override def nullSafeEval(input: Any): Any = {
    // split(" ", -1): exactly Spark's split(text, ' ') semantics
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val m = toks.length
    if (m < k) return new GenericArrayData(Array.empty[Long])
    val tids = new Array[Long](m)
    var i = 0
    while (i < m) { tids(i) = tokId(toks(i)); i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j + k <= m) {
      var h = tids(j)
      var d = 1
      while (d < k) { h = h * 31L + tids(j + d); d += 1 }
      seen.add(java.lang.Long.valueOf(((h % P) + P) % P))
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** MinHash signature over a long-array of element hashes; identical math
  * to TextHash.minhashSignature. Empty input → empty signature (callers
  * filter empty shingle sets first, as the declarative path does). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs ARRAY<BIGINT>, got $other")
  }

  private val P = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    if (arr.isEmpty) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = i.toLong * 2000006L + 1012345L
      val b = i.toLong * 999983L + 423307L
      var mn = Long.MaxValue
      var j = 0
      while (j < arr.length) {
        val h = (arr(j) * a + b) % P
        val hp = if (h < 0) h + P else h
        if (hp < mn) mn = hp
        j += 1
      }
      out(i) = mn
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** Exact-decimal dot product of two double arrays — the native form of
  * Similarity.dotExact. Per-element semantics replicate the declarative
  * path bit-for-bit: IEEE double product, then the same
  * toString-shortest-representation rounding Spark's double→decimal cast
  * applies (java BigDecimal.valueOf + HALF_UP setScale), accumulated
  * exactly. One virtual call per row instead of per-element lambda
  * dispatch. */
case class DotDecimal(left: Expression, right: Expression, scale: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotDecimal", this)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.types.Decimal) $ref.nullSafeEval($a, $b);")
  }
  import org.apache.spark.sql.types._

  override def dataType: DataType = DecimalType(30, scale)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_decimal needs two ARRAY<DOUBLE>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toDoubleArray()
    val b = r.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(a.length, b.length)
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      acc = acc.add(java.math.BigDecimal.valueOf(a(i) * b(i))
        .setScale(scale, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    Decimal(acc, 30, scale)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDecimal =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_decimal"
}

/** L2-UNIT form of a float/double array in ONE imperative pass — the
  * SemDeDup assignment's hot path. Bit-identical to the declarative
  * chain `transform(v.cast(array<double>), x => x / normExact(v, 12))`
  * (spec-asserted): the norm is the square root of the per-element
  * (x·x as double) products accumulated as scale-12 HALF_UP decimals —
  * exactly [[DotDecimal]]'s arithmetic — cast to double, then one
  * correctly-rounded division per element. The declarative form's norm
  * sub-expression sits inside a lambda where CollapseProject inlining
  * re-evaluates the decimal fold PER ELEMENT (measured 6× on the
  * SemDeDup assignment even with the norm pre-projected); this
  * computes it once. Zero-norm vectors have no direction → null, and so
  * is a vector with a NULL ELEMENT (its norm is undefined — the typed
  * outcome, not a runtime cast crash; callers treating null-element
  * vectors as data should fill them upstream). */
case class UnitVector(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unit_vector needs ARRAY<DOUBLE> or ARRAY<FLOAT>, got $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unitVector", this)
    val r = ctx.freshName("unitVecRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = $ref.nullSafeEval($c);
      if ($r == null) { ${ev.isNull} = true; } else {
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r;
      }""")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // a null element makes the norm undefined: return null (typed),
    // never let toFloatArray/toDoubleArray throw on the hole
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    val xs =
      if (isFloat) arr.toFloatArray().map(_.toDouble)
      else arr.toDoubleArray()
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < xs.length) {
      acc = acc.add(java.math.BigDecimal.valueOf(xs(i) * xs(i))
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    val norm = math.sqrt(Decimal(acc, 30, 12).toDouble)
    if (norm == 0.0) return null
    val out = new Array[Any](xs.length)
    i = 0
    while (i < xs.length) { out(i) = xs(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): UnitVector =
    copy(child = newChild)
  override def prettyName: String = "unit_vector"
}

/** Plain double dot product — the cheap PREFILTER companion to
  * DotDecimal: one sequential IEEE loop per row (deterministic for a
  * fixed array order, ~50× cheaper than per-term BigDecimal). Used to
  * discard candidate pairs far below a similarity threshold so the
  * exact-decimal dot runs only on survivors; callers must keep a
  * conservative margin (double vs decimal dot differ by ≲1e-12 at unit
  * scale, margins are set at 1e-6). */
case class DotDouble(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_double needs two ARRAY<DOUBLE>, got $other")
    }

  // null ELEMENTS contribute 0 in BOTH evaluation paths (interpreted
  // toDoubleArray would NPE on a null slot while unsafe codegen would
  // silently read 0.0 — the explicit isNullAt check makes the two paths
  // bit-identical for every legal input)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  // real codegen (not CodegenFallback): this runs per candidate pair in
  // the dedup prefilter — a fallback here would split the filter's
  // WholeStageCodegen span and pay a virtual call per row
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_double"
}

/** Integer dot product of two ARRAY<BYTE> (int8-quantized vectors) —
  * the hot inner loop of the quantized rankers
  * (Similarity.annTopKQuantized / annTopKQuantizedBatch): it runs per
  * candidate pair, and the declarative `aggregate(zip_with(...))` form
  * it replaces is interpretation-fallback (HOFs don't codegen) —
  * measured 5× slower than the exact decimal path it was meant to
  * beat. Exact by construction: |acc| ≤ 127² · dim fits a long for any
  * real dim. Null elements contribute 0 in both paths (the DotDouble
  * discipline). Norms are DotLong(a, a).
  *
  * NaN robustness (deliberate divergence from the declarative form,
  * which only shows on corrupt data): QuantizeInt8Q detects ANY NaN
  * element and quantizes the whole vector to zeros, so the rankers'
  * `na > 0` guard EXCLUDES every NaN-bearing vector — where the
  * declarative floor-cast chain would throw under ANSI and fail the
  * whole job for one corrupt row. (Without the explicit check, a
  * vector with SOME NaN elements would take its scale from the finite
  * elements, map only the NaN dims to 0, and be silently ranked —
  * the r10-advice failure mode.) */
case class DotLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_long needs two ARRAY<TINYINT>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_long"
}

/** INT8 quantization of a vector — the `q` field of the declarative
  * Similarity.quantizeInt8, bit-identical on clean data (parity spec):
  * per element floor(x / (max|x| / 127) + 0.5) as a byte, zero vector
  * → all zeros, null elements preserved as null (the declarative
  * when/floor propagates them). A vector with ANY NaN element
  * quantizes to ALL zeros (corrupt data carries no rankable
  * direction), so the rankers' `na > 0` guard excludes it — the
  * declarative form instead throws under ANSI there, which is why
  * NaN rows sit outside the parity contract. Native because the
  * quantized rankers run it per ROW over the whole corpus and the
  * declarative transform-with-when is interpretation-fallback —
  * profiled as the dominant cost of q_ann_quantized after DotLong
  * went native. */
case class QuantizeInt8Q(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(ByteType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize_int8_q needs ARRAY<DOUBLE>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var mx = 0.0
    var nan = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = a.getDouble(i)
        if (x != x) nan = true
        val v = math.abs(x)
        if (v > mx) mx = v
      }
      i += 1
    }
    val scale = if (nan) 0.0 else mx / 127.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (a.isNullAt(i)) out(i) = null
      else if (scale == 0.0) out(i) = 0.toByte
      else out(i) = math.floor(a.getDouble(i) / scale + 0.5).toInt.toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val sc = ctx.freshName("sc")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      val nan = ctx.freshName("nan")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |boolean $nan = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = $a.getDouble($i);
         |    if (Double.isNaN($v)) $nan = true;
         |    $v = java.lang.Math.abs($v);
         |    if ($v > $mx) $mx = $v;
         |  }
         |}
         |double $sc = $nan ? 0.0 : $mx / 127.0;
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    $out[$i] = null;
         |  } else if ($sc == 0.0) {
         |    $out[$i] = (byte) 0;
         |  } else {
         |    $out[$i] = (byte)(int) java.lang.Math.floor($a.getDouble($i) / $sc + 0.5);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeInt8Q = copy(child = newChild)
  override def prettyName: String = "quantize_int8_q"
}

/** Random-hyperplane LSH bucket id — native form of the declarative
  * Similarity.lshBucketDeclarative, bit-identical (WindowLlmSpec asserts
  * it): per plane j and element i the weight is the exact integer
  * floorMod((j*dim+i) * 2654435761, 2^32) - 2^31 as a double, the
  * product is an IEEE double, and accumulation replicates Spark's
  * double→DECIMAL(25,12) cast (BigDecimal.valueOf shortest-repr +
  * HALF_UP) summed exactly. The declarative HOF form re-evaluated the
  * 8×64 weight array through interpreted lambdas PER ROW — this computes
  * the weights once per executor and runs one imperative pass. */
case class LshBucket(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBucket", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }
  import org.apache.spark.sql.types._

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket needs ARRAY<DOUBLE>, got $other")
  }

  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](planes * dim)
    var f = 0
    while (f < w.length) {
      w(f) = (java.lang.Math.floorMod(f.toLong * 2654435761L, 4294967296L)
        - 2147483648L).toDouble
      f += 1
    }
    w
  }

  override def nullSafeEval(input: Any): Any = {
    // ONE bulk copy per row with null slots zeroed: null elements must
    // contribute 0 without NPE (toDoubleArray throws on null slots), but
    // per-element isNullAt/getDouble inside the planes×dim loop costs
    // planes×dim virtual calls per row on this interpreted-eval
    // expression (measured 5x on q_ann_buckets). A zero slot is
    // bit-identical to skipping the term: BigDecimal.valueOf(±0.0)
    // .setScale(12) is exactly zero, and adding zero is exact.
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) v(i) = arr.getDouble(i)
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var acc = java.math.BigDecimal.ZERO
      val off = j * dim
      var k = 0
      while (k < n) {
        acc = acc.add(java.math.BigDecimal.valueOf(v(k) * weights(off + k))
          .setScale(12, java.math.RoundingMode.HALF_UP))
        k += 1
      }
      if (acc.signum() > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
  override def prettyName: String = "lsh_bucket"
}

/** One-pass token statistics: (n_tokens, sum_token_len, n_distinct,
  * n_stopwords, fingerprint) — the counters TextStats.qualityFrame
  * needs, computed in a single tokenization pass instead of five
  * interpreted higher-order scans. Same split(' ', -1) tokenization and
  * fingerprint arithmetic as the declarative forms.
  *
  * Also carries the char-class counters (n_chars, n_alpha, n_digit,
  * n_symbol, n_punct) the BPE-ish token estimate and punct ratio need:
  * the declarative forms pay one regexp_replace PER CLASS, each
  * allocating a rewritten copy of the document — this counts all five in
  * the same pass, by code point (regex and Spark's length() both count
  * code points, so a supplementary char is one symbol, not two). */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStats", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }
  import org.apache.spark.sql.types._

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("fingerprint", LongType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_symbol", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_stats needs STRING, got ${child.dataType}")

  private val P = 2147483647L
  private val weights = Array(1L, 31L, 961L, 29791L, 923521L, 28629151L,
    887503681L, 1742810335L)
  @transient private lazy val stopSet = stopwords.toSet

  private def tokId(tok: String): Long = TokHash.tokId(tok)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // char-class pass, by code point (same counting as '[A-Za-z]'-style
    // regex classes and Spark's length())
    var nChars = 0; var nAlpha = 0; var nDigit = 0; var nSym = 0; var nPunct = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      nChars += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) nAlpha += 1
      else if (cp >= '0' && cp <= '9') nDigit += 1
      else if (cp != ' ') nSym += 1
      if (cp == '.' || cp == ',' || cp == '!' || cp == '?' ||
          cp == ';' || cp == ':') nPunct += 1
      ci += Character.charCount(cp)
    }
    val toks = s.split(" ", -1)
    var sumLen = 0L
    var stops = 0
    var fp = 0L
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      // code points, not UTF-16 units: feeds avg_token_len, which the
      // declarative/oracle forms compute from length() (code points)
      sumLen += t.codePointCount(0, t.length)
      if (stopSet.contains(t)) stops += 1
      seen.add(t)
      // tokId mod P BEFORE the weight multiply — raw supplementary-char
      // tokIds (~2^41) × the largest weight overflow Int64 (see
      // TextHash.fingerprint, the declarative spec)
      fp = (fp + ((tokId(t) % P) * weights(i % 8)) % P) % P
      i += 1
    }
    InternalRow(toks.length, sumLen, seen.size, stops, fp,
      nChars, nAlpha, nDigit, nSym, nPunct)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
  override def prettyName: String = "token_stats"
}

/** Per-row n-gram concentration — (top_count, total_count) over adjacent
  * n-grams of the space-split tokens: the Gopher-style repetition signal
  * (reference quality-heuristics family) WITHOUT a (doc, gram) shuffle.
  * The declarative form explodes every gram instance across the cluster
  * and aggregates twice; this computes the same two integers in one
  * imperative pass per row, memory bounded by the document's own
  * distinct-gram count — the same per-doc bound the shuffle had, minus
  * the network. Counts are keyed on the gram STRING (no hashing), so
  * results are exactly the grouped counts the oracle computes. */
case class TopGramFrac(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "top_gram_frac needs n >= 1")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topGramFrac", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("top_count", IntegerType, nullable = false),
    StructField("total_count", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_gram_frac needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val total = toks.length - n + 1
    if (total <= 0) return InternalRow(0, 0)
    val counts = new java.util.HashMap[String, Int]()
    var top = 0
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    InternalRow(top, total)
  }

  override protected def withNewChildInternal(newChild: Expression): TopGramFrac =
    copy(child = newChild)
  override def prettyName: String = "top_gram_frac"
}

/** Unicode NFC normalization as a native expression — the last hot-path
  * text transform that was a Scala UDF (a UDF call costs the
  * serialization fence and blocks nulls-aware codegen; this inlines a
  * single static JDK call inside WholeStageCodegen). Semantics are
  * exactly `java.text.Normalizer.normalize(s, NFC)` — the same call the
  * UDF made, so results are bit-for-bit identical. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  // straight-line codegen: no reference object — the normalizer is a
  // static JDK method, so the generated code calls it directly
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

/** The stamped tokenizer text normalizer — the stage every published
  * subword pipeline runs BEFORE pre-tokenization (a BERT-uncased
  * vocab.txt mis-tokenizes mixed-case text unless the same lowercase +
  * strip-accents ran at serve time). Modes:
  *
  *  - `nfc` / `nfkc`: Unicode canonical / compatibility composition
  *    (JDK normalizer — the ICU-free subset both engines agree on);
  *  - `lowercase`: `String.toLowerCase(Locale.ROOT)` (locale-pinned:
  *    a Turkish default locale must not change token ids);
  *  - `lowercase_strip_accents`: lowercase, then NFD-decompose and
  *    drop NON_SPACING_MARK (Mn) code points — the published BERT
  *    `do_lower_case` semantics (lowercase FIRST, then strip), which
  *    DuckDB replays as `lower(strip_accents(x))` on text where the
  *    two orders agree (they do unless lowering invents marks).
  *
  * Codegen-friendly (reference-object call, no UDF); `none` never
  * reaches this expression — the dispatcher passes the column through. */
case class TextNormalize(child: Expression, mode: String)
    extends UnaryExpression {
  require(TextNormalize.Modes.contains(mode),
    s"text_normalize: unknown mode '$mode' — one of " +
      TextNormalize.Modes.mkString(", "))

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_normalize needs STRING, got ${child.dataType}")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textNormalize", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = mode match {
      case "nfc" =>
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      case "nfkc" =>
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
      case "lowercase" => s.toLowerCase(java.util.Locale.ROOT)
      case "lowercase_strip_accents" =>
        val low = java.text.Normalizer.normalize(
          s.toLowerCase(java.util.Locale.ROOT),
          java.text.Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(low.length)
        var i = 0
        while (i < low.length) {
          val cp = low.codePointAt(i)
          if (Character.getType(cp) != Character.NON_SPACING_MARK)
            sb.appendCodePoint(cp)
          i += Character.charCount(cp)
        }
        sb.toString
    }
    UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TextNormalize =
    copy(child = newChild)
  override def prettyName: String = "text_normalize"
}

object TextNormalize {
  /** The non-`none` modes this expression serves. */
  val Modes: Seq[String] =
    Seq("nfc", "nfkc", "lowercase", "lowercase_strip_accents")
}

/** SimHash signature over a text's DISTINCT whitespace tokens —
  * identical math to TextHash.simhash (r12 geometry): per distinct
  * token, hp = tokId mod P; signature bit j is set iff more tokens have
  * ((hp·a_j + b_j) mod P) odd than even, with (a_j, b_j) the minhash
  * affine family (a = 2000006j + 1012345, b = 999983j + 423307). The
  * declarative form evaluates `bits` interpreted higher-order filter
  * passes per row — measured ~15× slower at sf0.1 — and, worse, gets
  * recomputed per join branch when AQE broadcasts a side of the band
  * self-join; this is one imperative pass per row inside
  * WholeStageCodegen (the ShingleHashes reference-call pattern).
  * Bit-parity with the declarative form is spec-asserted. */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"simhash bits must be in [1, 64], got $bits")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((Long) $ref.nullSafeEval($c)).longValue();")
  }

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash needs STRING, got ${child.dataType}")

  private val P = 2147483647L

  override def nullSafeEval(input: Any): Any = {
    // array_distinct(split(text, ' ')) semantics: distinct TOKENS (not
    // distinct hashes — colliding tokens count twice, as declaratively)
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    val n = seen.size
    val hp = new Array[Long](n)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      val h = TokHash.tokId(it.next()) % P
      hp(o) = if (h < 0) h + P else h
      o += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      val a = j.toLong * 2000006L + 1012345L
      val b = j.toLong * 999983L + 423307L
      var cnt = 0
      var t = 0
      while (t < n) {
        if ((hp(t) * a + b) % P % 2L == 1L) cnt += 1
        t += 1
      }
      if (2 * cnt > n) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
  override def prettyName: String = "simhash"
}

/** Byte-pair-encoding segmentation of ONE word under a learned merge
  * table (Sennrich et al. 2016 `apply_bpe` semantics): start from the
  * word's code points, apply each merge IN RANK ORDER, each application
  * replacing adjacent (left, right) symbol pairs greedily left-to-right
  * (non-overlapping). Returns the final symbol array — lossless by
  * construction (concatenating the tokens reproduces the word; symbols
  * the merges never touch pass through, so out-of-vocabulary characters
  * degrade to singletons rather than erroring).
  *
  * Deterministic and engine-reproducible: pure code-point string
  * operations — the DuckDB oracle replays the same merges with greedy
  * `replace` over a symbol form with each symbol wrapped in its own
  * spaces (see [[BpeEncode.mergePair]]'s note) and must match exactly.
  * Per-expression memo cache (words are Zipfian: a few thousand types
  * cover most of a corpus) — concurrent because one expression instance
  * can be shared across executor task threads; capped so an adversarial
  * all-unique corpus cannot grow it unboundedly. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     byteLevel: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs STRING, got ${child.dataType}")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ArrayData]()
  private val CacheCap = 65536

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val hit = cache.get(word)
    if (hit != null) return hit
    val toks = BpeEncode.encodeWord(word, merges, byteLevel)
    val out: ArrayData = new GenericArrayData(
      toks.map(t => UTF8String.fromString(t): AnyRef))
    if (cache.size < CacheCap) cache.put(word, out)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
}

/** [[BpeEncode]] fused with the VOCAB LOOKUP: one word → its BPE
  * token IDS (`array<long>`), out-of-vocab tokens degrading to -1 (the
  * [[graft.llm.Bpe.encodeIds]] convention — OOV mass stays countable
  * instead of vanishing). This is the hot path of token-ID window
  * assembly: the per-word hash-map lookup replaces the exploded
  * vocab JOIN (and its regroup shuffle) the row-wise form needs, so a
  * document's full id sequence materializes INSIDE the scan — zero
  * extra exchanges at any corpus size. The vocab rides the expression
  * as an immutable map: it is MODEL-sized (|alphabet| + numMerges —
  * the same bounded object [[graft.llm.Bpe.encodeIds]] broadcasts),
  * never corpus-sized. Same memo cache as [[BpeEncode]]. */
case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)],
                        vocab: Map[String, Long],
                        byteLevel: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids needs STRING, got ${child.dataType}")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeIds", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ArrayData]()
  private val CacheCap = 65536

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val hit = cache.get(word)
    if (hit != null) return hit
    val toks = BpeEncode.encodeWord(word, merges, byteLevel)
    val ids = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      ids(i) = vocab.getOrElse(toks(i), -1L)
      i += 1
    }
    val out: ArrayData = new GenericArrayData(ids)
    if (cache.size < CacheCap) cache.put(word, out)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode_ids"
}

/** Inverse of [[BpeEncodeIds]]: an `array<long>` of token ids back to
  * the SURFACE STRING — vocab tokens concatenate (at byte level the
  * hex stream is un-hexed back to UTF-8 first); a -1 (OOV) id renders
  * as the replacement character U+FFFD, the standard lossy-decode
  * marker. With a GPT-2-pretokenized model the result IS the original
  * text (leading spaces ride in the tokens); with whitespace-split
  * models word boundaries are gone by construction — the caller knows
  * which contract their model stamped. The reverse map is model-sized
  * (the vocab object, inverted once per expression instance). */
case class BpeDecodeIds(child: Expression, vocab: Map[String, Long],
                        byteLevel: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode_ids needs ARRAY<BIGINT>, got $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecodeIds", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  @transient private lazy val inverse: Map[Long, String] =
    vocab.map(_.swap)

  override def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[ArrayData].toLongArray()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < ids.length) {
      sb.append(inverse.getOrElse(ids(i), "\ufffd"))
      i += 1
    }
    val cat = sb.toString
    val out =
      if (!byteLevel) cat
      else {
        // hex pairs -> bytes -> UTF-8 (ids not in the vocab already
        // rendered as U+FFFD above; its own bytes pass through)
        val bytes = new java.io.ByteArrayOutputStream()
        var j = 0
        while (j < cat.length) {
          val c = cat.charAt(j)
          if (c == '\ufffd') { bytes.write(0xEF); bytes.write(0xBF); bytes.write(0xBD); j += 1 }
          else { bytes.write(Integer.parseInt(cat.substring(j, j + 2), 16)); j += 2 }
        }
        new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
      }
    UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeIds =
    copy(child = newChild)
  override def prettyName: String = "bpe_decode_ids"
}

/** NEXT-FIT sequence packing over an ordered list of piece lengths —
  * the kernel of the doc-aware training-window packers (the "fewer
  * truncations" layout, Ding et al. 2024; the packed-batch idea of
  * Krell et al. 2021): pieces are placed in the GIVEN order into
  * windows of `capacity` tokens, a new window opening exactly when the
  * current one cannot hold the next piece. Input is the per-piece
  * length array of ONE bounded permutation segment (the caller caps
  * segment size — this row is segment-sized, never corpus-sized);
  * output is the aligned array<struct<win:int, off:bigint>>: the
  * window index within the segment and the token offset at which the
  * piece lands. One imperative O(|segment|) pass per row — the
  * recurrence (each placement depends on the running fill) is exactly
  * what a declarative prefix sum cannot express, which is why
  * concat-and-chop (assembleWindows) splits documents and this layout
  * doesn't. Every length must be in (0, capacity] — callers pre-split
  * oversized docs into capacity-sized pieces, so token conservation is
  * exact; a violating length throws rather than silently truncating. */
case class PackNextFit(child: Expression, capacity: Long)
    extends UnaryExpression {
  require(capacity > 0, s"pack_next_fit needs capacity > 0, got $capacity")

  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("win", IntegerType, nullable = false),
    StructField("off", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_next_fit needs ARRAY<BIGINT>, got $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("packNextFit", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val lens = input.asInstanceOf[ArrayData].toLongArray()
    val out = new Array[Any](lens.length)
    var win = 0
    var fill = 0L
    var i = 0
    while (i < lens.length) {
      val l = lens(i)
      if (l <= 0L || l > capacity) throw new IllegalArgumentException(
        s"pack_next_fit: piece length $l outside (0, $capacity] at " +
          s"position $i — pre-split oversized docs before packing")
      if (fill + l > capacity) { win += 1; fill = 0L }
      out(i) = InternalRow(win, fill)
      fill += l
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PackNextFit =
    copy(child = newChild)
  override def prettyName: String = "pack_next_fit"
}

/** Shared lattice machinery for the UNIGRAM-LM tokenizer family
  * (Kudo 2018, the SentencePiece unigram algorithm — public). A model
  * is a bounded piece table; a word's segmentations form a lattice
  * over its code-point positions with edges = vocabulary pieces (plus
  * a single-code-point OOV fallback for SERVING — training corpora
  * cover their own alphabet by construction, so the EM lattice is
  * vocabulary-only).
  *
  * DETERMINISM CONTRACT (the reason this engine's unigram models carry
  * `logp_micro: long`): Viterbi runs on FIXED-POINT micro-nat
  * log-probs (round(logp·1e6) as a BIGINT), so the best-path score is
  * an exact integer sum — the argmax segmentation is bit-reproducible
  * on any engine and any summation order, and the DuckDB oracle can
  * replay it by exact path enumeration with zero float tolerance.
  * Float Viterbi would make near-tie segmentations engine-dependent
  * (libm exp/log differ by ulps), which silently changes landed
  * training ids. Tie-break among equal-score paths: fewer pieces,
  * then the piece-LENGTH sequence lexicographically LARGEST (longer
  * pieces earlier) — realized by a right-to-left DP that prefers the
  * longest extension, and replayed in SQL as `ORDER BY score DESC,
  * n_pieces ASC, lens DESC`. */
object UnigramKernel {
  /** Micro-nat score charged per OOV code point at serving time.
    * Every model logp_micro must exceed this (enforced by the
    * expressions) so an in-vocab piece always beats the fallback on a
    * pure tie — OOV is reachable only where the vocabulary has no
    * cover. -100 nats ≈ prob 3.7e-44: no real vocab entry is rarer. */
  val OovMicro: Long = -100000000L

  /** Code-point boundary offsets of a word: offs(i) = char index of
    * the i-th code point, offs(n) = length (surrogate-pair safe). */
  def cpOffsets(w: String): Array[Int] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < w.length) { buf += i; i += Character.charCount(w.codePointAt(i)) }
    buf += w.length
    buf.toArray
  }

  /** Viterbi best segmentation of `word` under (piece → (id, micro)):
    * (ids, score_micro, n_pieces). OOV code points emit id -1 at
    * OovMicro each — or, when `byteIds` is provided (the published
    * SentencePiece `byte_fallback` convention: 256 reserved byte
    * pieces), the UTF-8 BYTE ids of the uncovered code point, making
    * the id stream lossless on any script. The lattice itself is
    * unchanged (one OovMicro edge per uncovered code point; the
    * expansion happens at emission), so covered text segments
    * bit-identically with or without the fallback. Empty word →
    * (empty, 0, 0); n_pieces counts EMITTED ids. */
  def segment(word: String, lookup: java.util.HashMap[String, (Long, Long)],
              maxPieceLen: Int,
              byteIds: Array[Long] = null): (Array[Long], Long, Int) = {
    val offs = cpOffsets(word)
    val n = offs.length - 1
    if (n == 0) return (Array.emptyLongArray, 0L, 0)
    val score = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val choiceLen = new Array[Int](n + 1)
    val choiceId = new Array[Long](n + 1)
    var i = n - 1
    while (i >= 0) {
      // seed with the OOV fallback, then let any vocab edge beat it
      // (strict improvement on (score, np); iterate L descending so
      // the longest piece wins pure ties)
      var bScore = OovMicro + score(i + 1)
      var bNp = 1 + np(i + 1)
      var bLen = 1
      var bId = -1L
      var L = math.min(maxPieceLen, n - i)
      while (L >= 1) {
        val hit = lookup.get(word.substring(offs(i), offs(i + L)))
        if (hit != null) {
          val s = hit._2 + score(i + L)
          val k = 1 + np(i + L)
          if (s > bScore || (s == bScore && k < bNp)) {
            bScore = s; bNp = k; bLen = L; bId = hit._1
          }
        }
        L -= 1
      }
      score(i) = bScore; np(i) = bNp; choiceLen(i) = bLen; choiceId(i) = bId
      i -= 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](np(0))
    var p = 0
    while (p < n) {
      if (choiceId(p) == -1L && byteIds != null) {
        val bs = word.substring(offs(p), offs(p + 1)).getBytes(
          java.nio.charset.StandardCharsets.UTF_8)
        var b = 0
        while (b < bs.length) { out += byteIds(bs(b) & 0xFF); b += 1 }
      } else out += choiceId(p)
      p += choiceLen(p)
    }
    (out.toArray, score(0), out.length)
  }

  /** E-step lattice sums of `word` under (piece → (id, prob)), in
    * PROBABILITY space (prob = exp(logp); products, not log-sums —
    * on a dyadic-prob fixture every intermediate is exact, which is
    * what makes the EM oracle engine-exact). Forward f(i) = total
    * weight of segmentations of the prefix, backward b(i) of the
    * suffix; per-piece numerator = Σ over occurrences (j, j+L) of
    * f(j)·p·b(j+L). Returns (z = f(n), per-piece (id, numer)); z == 0
    * means the vocabulary cannot cover the word (no OOV edges in the
    * EM lattice) and the word contributes nothing. Underflow note:
    * serving-scale words are bounded (pre-tokenized runs), so products
    * of ≥1e-9 probs over ≤~50 pieces stay in double range; training
    * corpora with pathological 1000-char "words" should raise
    * minWordCount or pre-normalize. */
  def expected(word: String, lookup: java.util.HashMap[String, (Long, Double)],
               maxPieceLen: Int): (Double, Array[(Long, Double)]) = {
    val offs = cpOffsets(word)
    val n = offs.length - 1
    if (n == 0) return (0.0, Array.empty)
    val f = new Array[Double](n + 1)
    val b = new Array[Double](n + 1)
    f(0) = 1.0; b(n) = 1.0
    var i = 1
    while (i <= n) {
      var s = 0.0
      var L = 1
      val maxL = math.min(maxPieceLen, i)
      while (L <= maxL) {
        val hit = lookup.get(word.substring(offs(i - L), offs(i)))
        if (hit != null) s += f(i - L) * hit._2
        L += 1
      }
      f(i) = s; i += 1
    }
    i = n - 1
    while (i >= 0) {
      var s = 0.0
      var L = 1
      val maxL = math.min(maxPieceLen, n - i)
      while (L <= maxL) {
        val hit = lookup.get(word.substring(offs(i), offs(i + L)))
        if (hit != null) s += hit._2 * b(i + L)
        L += 1
      }
      b(i) = s; i -= 1
    }
    val z = f(n)
    if (z == 0.0) return (0.0, Array.empty)
    val acc = new java.util.LinkedHashMap[java.lang.Long, java.lang.Double]()
    var j = 0
    while (j < n) {
      var L = 1
      val maxL = math.min(maxPieceLen, n - j)
      while (L <= maxL) {
        val hit = lookup.get(word.substring(offs(j), offs(j + L)))
        if (hit != null) {
          val w = f(j) * hit._2 * b(j + L)
          val prev = acc.get(hit._1)
          acc.put(hit._1, if (prev == null) w else prev.doubleValue() + w)
        }
        L += 1
      }
      j += 1
    }
    val out = new Array[(Long, Double)](acc.size)
    val it = acc.entrySet().iterator()
    var k = 0
    while (it.hasNext) { val e = it.next(); out(k) = (e.getKey, e.getValue); k += 1 }
    (z, out)
  }

  private[functions] def cpCount(s: String): Int = s.codePointCount(0, s.length)
}

/** Viterbi segmentation of one word under a unigram-LM piece table:
  * struct<ids: array<bigint>, score_micro: bigint, n_pieces: int>.
  * The piece table rides the expression as a bounded model object
  * (|vocab| entries — the [[BpeEncodeIds]] posture: no vocab join, no
  * regroup shuffle; a document's id stream materializes inside the
  * scan). Integer micro-nat scores make the argmax engine-exact — see
  * [[UnigramKernel]]. */
case class UnigramSegment(child: Expression,
                          pieces: Seq[(String, Long, Long)],
                          byteFallback: Option[IndexedSeq[Long]] = None)
    extends UnaryExpression {
  require(pieces.forall(_._3 > UnigramKernel.OovMicro),
    "unigram_segment: every piece logp_micro must exceed the OOV floor " +
      s"${UnigramKernel.OovMicro} — an in-vocab piece may never lose to the fallback")
  byteFallback.foreach { b =>
    require(b.length == 256,
      s"unigram_segment: byteFallback needs exactly 256 byte ids, got ${b.length}")
    require(!b.exists(id => id == -1L || pieces.exists(_._2 == id)),
      "unigram_segment: a byte-fallback id collides with a piece id or -1")
  }

  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("score_micro", LongType, nullable = false),
    StructField("n_pieces", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_segment needs STRING, got ${child.dataType}")

  @transient private lazy val lookup = {
    val m = new java.util.HashMap[String, (Long, Long)](pieces.size * 2)
    pieces.foreach { case (p, id, micro) => m.put(p, (id, micro)) }
    m
  }
  @transient private lazy val maxPieceLen =
    if (pieces.isEmpty) 1 else pieces.iterator.map(p => UnigramKernel.cpCount(p._1)).max
  @transient private lazy val byteArr: Array[Long] =
    byteFallback.map(_.toArray).orNull

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegment", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, InternalRow]()
  private val CacheCap = 65536

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val hit = cache.get(word)
    if (hit != null) return hit
    val (ids, score, n) = UnigramKernel.segment(word, lookup, maxPieceLen,
      byteArr)
    val out = InternalRow(new GenericArrayData(ids), score, n)
    if (cache.size < CacheCap) cache.put(word, out)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
  override def prettyName: String = "unigram_segment"
}

/** [[UnigramSegment]] restricted to the ids — the hot path of unigram
  * token-ID window assembly (same contract as [[BpeEncodeIds]]: OOV
  * code points degrade to -1, the id stream materializes inside the
  * scan with zero extra exchanges). */
case class UnigramEncodeIds(child: Expression,
                            pieces: Seq[(String, Long, Long)],
                            byteFallback: Option[IndexedSeq[Long]] = None)
    extends UnaryExpression {
  require(pieces.forall(_._3 > UnigramKernel.OovMicro),
    "unigram_encode_ids: every piece logp_micro must exceed the OOV floor " +
      s"${UnigramKernel.OovMicro} — an in-vocab piece may never lose to the fallback")
  byteFallback.foreach { b =>
    require(b.length == 256,
      s"unigram_encode_ids: byteFallback needs exactly 256 byte ids, got ${b.length}")
    require(!b.exists(id => id == -1L || pieces.exists(_._2 == id)),
      "unigram_encode_ids: a byte-fallback id collides with a piece id or -1")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_encode_ids needs STRING, got ${child.dataType}")

  @transient private lazy val lookup = {
    val m = new java.util.HashMap[String, (Long, Long)](pieces.size * 2)
    pieces.foreach { case (p, id, micro) => m.put(p, (id, micro)) }
    m
  }
  @transient private lazy val maxPieceLen =
    if (pieces.isEmpty) 1 else pieces.iterator.map(p => UnigramKernel.cpCount(p._1)).max
  @transient private lazy val byteArr: Array[Long] =
    byteFallback.map(_.toArray).orNull

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEncodeIds", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ArrayData]()
  private val CacheCap = 65536

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val hit = cache.get(word)
    if (hit != null) return hit
    val (ids, _, _) = UnigramKernel.segment(word, lookup, maxPieceLen,
      byteArr)
    val out: ArrayData = new GenericArrayData(ids)
    if (cache.size < CacheCap) cache.put(word, out)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeIds =
    copy(child = newChild)
  override def prettyName: String = "unigram_encode_ids"
}

object WordPieceKernel {
  /** Greedy longest-match-first segmentation of one word — the
    * published WordPiece serving algorithm (Devlin et al. 2019 BERT;
    * the `WordpieceTokenizer` of the public BERT release): from the
    * current cursor take the LONGEST vocabulary piece matching
    * (continuation pieces carry the `##`-style prefix when the cursor
    * is not at the word start); if no piece matches at any cursor, or
    * the word exceeds `maxInputChars` code points, the WHOLE word
    * emits the single unknown id. Unlike the BPE/unigram families
    * there is no partial OOV — UNK is all-or-nothing per word, by the
    * published contract. Surrogate-safe: cursor and bounds count code
    * points. */
  def encode(word: String,
             init: java.util.HashMap[String, java.lang.Long],
             cont: java.util.HashMap[String, java.lang.Long],
             unkId: Long, maxInputChars: Int,
             maxInit: Int, maxCont: Int): Array[Long] = {
    val offs = UnigramKernel.cpOffsets(word)
    val n = offs.length - 1
    if (n == 0) return Array.emptyLongArray
    if (n > maxInputChars) return Array(unkId)
    val out = new scala.collection.mutable.ArrayBuffer[Long](4)
    var start = 0
    while (start < n) {
      val lookup = if (start == 0) init else cont
      var l = math.min(if (start == 0) maxInit else maxCont, n - start)
      var hit: java.lang.Long = null
      while (l >= 1 && hit == null) {
        hit = lookup.get(word.substring(offs(start), offs(start + l)))
        if (hit == null) l -= 1
      }
      if (hit == null) return Array(unkId)
      out += hit.longValue()
      start += l
    }
    out.toArray
  }
}

/** WordPiece greedy encode of one word to token ids: array<bigint>
  * (never null elements — OOV is the whole-word unknown id, the
  * published all-or-nothing contract). The vocabulary rides the
  * expression as a bounded model object (the [[BpeEncodeIds]] /
  * [[UnigramEncodeIds]] posture: no vocab join, no regroup shuffle —
  * a document's id stream materializes inside the scan). Matching is
  * exact-string and greedy, so the result is engine-exact and the
  * oracle replays it in SQL as a precomputed longest-match table plus
  * a deterministic recursive walk. */
case class WordPieceEncodeIds(child: Expression,
                              vocab: Seq[(String, Long)],
                              unkId: Long, contPrefix: String,
                              maxInputChars: Int)
    extends UnaryExpression {
  require(vocab.nonEmpty, "wordpiece_encode_ids: empty vocabulary")
  require(contPrefix.nonEmpty,
    "wordpiece_encode_ids: empty continuation prefix")
  require(maxInputChars >= 1,
    s"wordpiece_encode_ids: maxInputChars must be >= 1, got $maxInputChars")
  require(vocab.exists(_._2 == unkId),
    s"wordpiece_encode_ids: unkId $unkId is not a vocabulary id — the " +
      "unknown token must be IN the vocabulary (the published contract)")
  require(!vocab.exists(_._1 == contPrefix),
    s"wordpiece_encode_ids: a piece equal to the continuation prefix " +
      s"'$contPrefix' would match the empty string — malformed vocabulary")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode_ids needs STRING, got ${child.dataType}")

  // split the vocabulary once: pieces carrying the prefix match only
  // at non-initial cursors (keyed by their RAW surface), the rest only
  // at the word start
  @transient private lazy val (initLk, contLk, maxInit, maxCont) = {
    val ini = new java.util.HashMap[String, java.lang.Long]()
    val con = new java.util.HashMap[String, java.lang.Long]()
    var mi = 1; var mc = 1
    vocab.foreach { case (p, id) =>
      if (p.startsWith(contPrefix)) {
        val raw = p.substring(contPrefix.length)
        con.put(raw, id)
        mc = math.max(mc, UnigramKernel.cpCount(raw))
      } else {
        ini.put(p, id)
        mi = math.max(mi, UnigramKernel.cpCount(p))
      }
    }
    (ini, con, mi, mc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceEncodeIds", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ArrayData]()
  private val CacheCap = 65536

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val hit = cache.get(word)
    if (hit != null) return hit
    val ids = WordPieceKernel.encode(word, initLk, contLk, unkId,
      maxInputChars, maxInit, maxCont)
    val out: ArrayData = new GenericArrayData(ids)
    if (cache.size < CacheCap) cache.put(word, out)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeIds =
    copy(child = newChild)
  override def prettyName: String = "wordpiece_encode_ids"
}

/** Token ids back to surface text for a model that mixes TEXT pieces
  * with BYTE pieces (the SentencePiece `byte_fallback` shape): text
  * piece ids append their surface's UTF-8 bytes, byte ids append their
  * single raw byte, and the whole buffer decodes as UTF-8 at the end —
  * so a multi-byte character split across consecutive byte pieces
  * reassembles exactly. Unknown ids (and byte runs that do not form
  * valid UTF-8) render U+FFFD, the [[BpeDecodeIds]] convention. */
case class SubwordDecodeIds(child: Expression,
                            surfaces: Map[Long, String],
                            byteOf: Map[Long, Int])
    extends UnaryExpression {
  require(byteOf.valuesIterator.forall(b => b >= 0 && b <= 255),
    "subword_decode_ids: byte values must be 0..255")
  require(byteOf.keysIterator.forall(id => !surfaces.contains(id)),
    "subword_decode_ids: an id maps to both a surface and a byte")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_decode_ids needs ARRAY<BIGINT>, got $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordDecodeIds", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[ArrayData].toLongArray()
    val buf = new java.io.ByteArrayOutputStream(ids.length * 2)
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      byteOf.get(id) match {
        case Some(b) => buf.write(b)
        case None => buf.write(surfaces.getOrElse(id, "�")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      i += 1
    }
    // String's UTF-8 decoder substitutes U+FFFD for malformed runs —
    // the documented lossy rendering for ids that never came from a
    // real encode
    UTF8String.fromString(new String(buf.toByteArray,
      java.nio.charset.StandardCharsets.UTF_8))
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordDecodeIds =
    copy(child = newChild)
  override def prettyName: String = "subword_decode_ids"
}

/** EM E-step lattice sums of one word under a unigram-LM model in
  * PROBABILITY space: struct<z: double, parts: array<struct<pid:
  * bigint, numer: double>>> — z the word's total segmentation weight,
  * numer the per-piece occupancy numerator (posterior = numer / z;
  * the division is the caller's, kept out of the kernel so the oracle
  * can compare exact dyadic numerators). The model rides the
  * expression bounded; one O(len · maxPieceLen) pass per distinct
  * word (memoized). Training is the only caller — the EM lattice has
  * no OOV edges ([[UnigramKernel.expected]]). */
case class UnigramExpected(child: Expression,
                           pieces: Seq[(String, Long, Double)])
    extends UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("z", DoubleType, nullable = false),
    StructField("parts", ArrayType(StructType(Seq(
      StructField("pid", LongType, nullable = false),
      StructField("numer", DoubleType, nullable = false))),
      containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_expected needs STRING, got ${child.dataType}")

  @transient private lazy val lookup = {
    val m = new java.util.HashMap[String, (Long, Double)](pieces.size * 2)
    pieces.foreach { case (p, id, prob) => m.put(p, (id, prob)) }
    m
  }
  @transient private lazy val maxPieceLen =
    if (pieces.isEmpty) 1 else pieces.iterator.map(p => UnigramKernel.cpCount(p._1)).max

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramExpected", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, InternalRow]()
  private val CacheCap = 65536

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val hit = cache.get(word)
    if (hit != null) return hit
    val (z, parts) = UnigramKernel.expected(word, lookup, maxPieceLen)
    val rows = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) { rows(i) = InternalRow(parts(i)._1, parts(i)._2); i += 1 }
    val out = InternalRow(z, new GenericArrayData(rows))
    if (cache.size < CacheCap) cache.put(word, out)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramExpected =
    copy(child = newChild)
  override def prettyName: String = "unigram_expected"
}

object BpeEncode {
  /** Code-point symbols of a word (surrogate-pair safe). */
  def codePointSymbols(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** One merge applied greedily left-to-right (non-overlapping).
    * NOTE: this is NOT a string `replace` over a single-space-joined
    * symbol form — adjacent occurrences share the separator there, so
    * `replace` skips every second site ([a,a,a,a] must merge to
    * [aa,aa], not [aa,a,a]). The oracle replays it as a replace over a
    * form with each symbol wrapped in its OWN spaces (double-space
    * separators), which makes occurrences disjoint and IS equivalent. */
  def mergePair(syms: Array[String], left: String, right: String): Array[String] =
    mergePairInto(syms, left, right, left + right)

  /** [[mergePair]] with an EXPLICIT merged surface — the WordPiece
    * trainer's form, where merging strips the right symbol's
    * continuation prefix (merged != left + right). One greedy
    * left-to-right pass; both trainers share this single body so the
    * replacement semantics the SQL oracles replay can never diverge. */
  def mergePairInto(syms: Array[String], left: String, right: String,
                    merged: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += merged; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** UTF-8 byte symbols of a word as UPPERCASE two-hex-char strings —
    * the BYTE-LEVEL symbolization (the GPT-2 foundation: every word is
    * coverable by a 256-entry base alphabet, no code point is ever
    * OOV). Hex pairs rather than raw bytes so the symbols stay plain
    * strings the merge machinery — and the DuckDB oracle, via
    * hex(encode(w)) — operates on unchanged. */
  def byteSymbolsHex(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = f"${bytes(i) & 0xff}%02X"
      i += 1
    }
    out
  }

  /** Initial symbolization: code points, or UTF-8 hex-pair bytes. */
  def symbols(word: String, byteLevel: Boolean): Array[String] =
    if (byteLevel) byteSymbolsHex(word) else codePointSymbols(word)

  /** Full encode: initial symbols, then every merge in rank order. */
  def encodeWord(word: String, merges: Seq[(String, String)],
                 byteLevel: Boolean = false): Array[String] = {
    var syms = symbols(word, byteLevel)
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) syms = mergePair(syms, l, r)
    }
    syms
  }
}

object TextHashExprs {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def bpeEncode(word: Column, merges: Seq[(String, String)],
                byteLevel: Boolean = false): Column =
    column(BpeEncode(expression(word), merges, byteLevel))
  def bpeEncodeIds(word: Column, merges: Seq[(String, String)],
                   vocab: Map[String, Long],
                   byteLevel: Boolean = false): Column =
    column(BpeEncodeIds(expression(word), merges, vocab, byteLevel))
  def bpeDecodeIds(ids: Column, vocab: Map[String, Long],
                   byteLevel: Boolean = false): Column =
    column(BpeDecodeIds(expression(ids), vocab, byteLevel))


  def shingleHashes(text: Column, k: Int = 3): Column =
    column(ShingleHashes(expression(text), k))
  def simhash(text: Column, bits: Int = 64): Column =
    column(SimHash(expression(text), bits))
  def minhashSig(hashes: Column, numHashes: Int = 16): Column =
    column(MinHashSig(expression(hashes), numHashes))
  def tokenStats(text: Column, stopwords: Seq[String]): Column =
    column(TokenStats(expression(text), stopwords))
  def dotDecimal(a: Column, b: Column, scale: Int): Column =
    column(DotDecimal(expression(a.cast("array<double>")),
      expression(b.cast("array<double>")), scale))
  def dotDouble(a: Column, b: Column): Column =
    column(DotDouble(expression(a.cast("array<double>")),
      expression(b.cast("array<double>"))))
  def dotLong(a: Column, b: Column): Column =
    column(DotLong(expression(a), expression(b)))
  def quantizeInt8Q(vec: Column): Column =
    column(QuantizeInt8Q(expression(vec.cast("array<double>"))))
  def lshBucket(vec: Column, dim: Int, planes: Int): Column =
    column(LshBucket(expression(vec.cast("array<double>")), dim, planes))
  def nfcNormalize(s: Column): Column =
    column(NfcNormalize(expression(s)))
  def textNormalize(s: Column, mode: String): Column =
    column(TextNormalize(expression(s), mode))
  def topGramFrac(text: Column, n: Int): Column =
    column(TopGramFrac(expression(text), n))
  def packNextFit(lengths: Column, capacity: Long): Column =
    column(PackNextFit(expression(lengths), capacity))
  def unitVector(vec: Column): Column =
    column(UnitVector(expression(vec)))

  def unigramSegment(word: Column, pieces: Seq[(String, Long, Long)],
                     byteFallback: Option[IndexedSeq[Long]] = None): Column =
    column(UnigramSegment(expression(word), pieces, byteFallback))
  def unigramEncodeIds(word: Column, pieces: Seq[(String, Long, Long)],
                       byteFallback: Option[IndexedSeq[Long]] = None): Column =
    column(UnigramEncodeIds(expression(word), pieces, byteFallback))
  def subwordDecodeIds(ids: Column, surfaces: Map[Long, String],
                       byteOf: Map[Long, Int]): Column =
    column(SubwordDecodeIds(expression(ids), surfaces, byteOf))
  def unigramExpected(word: Column, pieces: Seq[(String, Long, Double)]): Column =
    column(UnigramExpected(expression(word), pieces))
  def wordPieceEncodeIds(word: Column, vocab: Seq[(String, Long)],
                         unkId: Long, contPrefix: String = "##",
                         maxInputChars: Int = 200): Column =
    column(WordPieceEncodeIds(expression(word), vocab, unkId, contPrefix,
      maxInputChars))
}
