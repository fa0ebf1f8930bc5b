package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.api.GraftFrame

/** Algebraic-identity property tests (SURVEY §5): the laws Catalyst's
  * rewrites must preserve, checked over generated frames. ScalaCheck
  * generators driven with fixed seeds (scalatestplus bridge isn't in
  * the offline dependency set). */
class PropertySpec extends SparkTestBase {

  private def forAll[T](gen: Gen[T], cases: Int = 10)(body: T => Unit): Unit =
    (1 to cases).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], cases: Int = 10)(
      body: (A, B) => Unit): Unit =
    (1 to cases).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default, Seed(42L + i)),
        gb.pureApply(Gen.Parameters.default, Seed(1042L + i)))
    }

  private val rowsGen: Gen[List[(Long, String, Double)]] = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 1000L)
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(-100, 100).map(_.toDouble / 4.0)
    } yield (id, k, v))
  } yield rows

  private def sortedRows(f: GraftFrame): Seq[Row] =
    f.df.orderBy("id", "k", "v").collect().toSeq

  /** Short docs over a 6-word vocabulary: cross-doc 2-gram collisions are
    * likely, so both decontamination outcomes occur across cases. */
  private val docsGenSmall: Gen[List[String]] = for {
    n <- Gen.choose(2, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 8)
      ws <- Gen.listOfN(len, Gen.oneOf("red", "blue", "fox", "jumps", "runs", "far"))
    } yield ws.mkString(" "))
  } yield docs

  test("filter/select commute") {
    forAll(rowsGen) { rows =>
      val f = GraftFrame(kv(rows: _*))
      val a = f.filter(col("v") > 0).select("id", "k", "v")
      val b = f.select("id", "k", "v").filter(col("v") > 0)
      assert(sortedRows(a) == sortedRows(b))
    }
  }

  test("projection is idempotent") {
    forAll(rowsGen) { rows =>
      val f = GraftFrame(kv(rows: _*))
      assert(sortedRows(f.select("id", "v").select("id", "v")) ==
        sortedRows(f.select("id", "v")))
    }
  }

  test("concat counts add; filter distributes over concat") {
    forAll2(rowsGen, rowsGen) { (r1, r2) =>
      val a = GraftFrame(kv(r1: _*))
      val b = GraftFrame(kv(r2: _*))
      assert(a.concat(b).df.count() == r1.length + r2.length)
      val p = col("v") >= 0
      assert(sortedRows(a.concat(b).filter(p)) ==
        sortedRows(a.filter(p).concat(b.filter(p))))
    }
  }

  test("dropDuplicates is idempotent and keeps min order key") {
    forAll(rowsGen) { rows =>
      val f = GraftFrame(kv(rows: _*))
      val once = f.dropDuplicates(Seq("k"), col("id"))
      val twice = once.dropDuplicates(Seq("k"), col("id"))
      assert(sortedRows(once) == sortedRows(twice))
      // each kept row carries the smallest id of its key group
      val minIds = rows.groupBy(_._2).map { case (k, g) => k -> g.map(_._1).min }
      once.df.collect().foreach { r =>
        assert(r.getLong(0) == minIds(r.getString(1)))
      }
    }
  }

  test("groupby sum equals driver-side sum per key") {
    forAll(rowsGen) { rows =>
      val f = GraftFrame(kv(rows: _*))
      val got = f.groupby("k")
        .agg(sum(col("v").cast("decimal(18,6)")).as("s")).df
        .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
      val expect = rows.groupBy(_._2).map { case (k, g) =>
        k -> g.map(x => BigDecimal(x._3)).sum.toDouble }
      assert(got.keySet == expect.keySet)
      got.foreach { case (k, v) => assert(math.abs(v - expect(k)) < 1e-9) }
    }
  }

  test("repartition count never changes row multiset size") {
    forAll2(rowsGen, Gen.choose(1, 8)) { (rows, n) =>
      val f = GraftFrame(kv(rows: _*))
      assert(f.repartition(n).df.count() == rows.length)
      assert(f.repartitionByRange(n, "id").df.count() == rows.length)
    }
  }

  test("sortValues then head(n) == nsmallest(n)") {
    forAll2(rowsGen, Gen.choose(1, 5)) { (rows, n) =>
      val f = GraftFrame(kv(rows: _*)).select("id", "v")
      val a = f.sortValues(Seq("v" -> true, "id" -> true)).head(n).df.collect().toSeq
      val b = f.nsmallest(n, "v", "id").df.collect().toSeq
      assert(a == b)
    }
  }

  test("decontaminate partitions train: clean ∪ flagged = train, disjoint") {
    forAll(docsGenSmall) { docs =>
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val all = df(sch, docs.zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(i.toLong, t) }: _*)
      val train = all.filter(col("doc_id") % 2 === 0)
      val bench = all.filter(col("doc_id") % 2 =!= 0)
      val flagged = graft.llm.Dedup.contaminationReport(train, bench, "doc_id", "text", k = 2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val clean = graft.llm.Dedup.decontaminate(train, bench, "doc_id", "text", k = 2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
      assert((clean & flagged).isEmpty)
      assert((clean | flagged) == trainIds)
    }
  }

  test("strCenter matches CPython str.center for all small widths/lengths") {
    import graft.api.StrOps._
    // CPython: left = marg//2 + (marg & width & 1)
    def pyCenter(s: String, width: Int, fill: Char): String =
      if (s.length >= width) s
      else {
        val marg = width - s.length
        val left = marg / 2 + (marg & width & 1)
        fill.toString * left + s + fill.toString * (marg - left)
      }
    val strings = Seq("", "a", "ab", "abc", "abcd", "abcde")
    for (width <- 3 to 8) {
      val in = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(strings.map(Row(_))).asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("s",
            org.apache.spark.sql.types.StringType))))
      val got = in.select(col("s"), col("s").strCenter(width, "*").as("c"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      strings.foreach { s =>
        assert(got(s) == pyCenter(s, width, '*'),
          s"center('$s', $width): got '${got(s)}', py '${pyCenter(s, width, '*')}'")
      }
    }
  }

  test("native text hashes equal declarative forms on arbitrary unicode") {
    // Pin the code-point contract (r4: native tokId walked UTF-16 units
    // and diverged on every supplementary char): generated docs mix
    // ASCII, BMP accents/CJK, and SUPPLEMENTARY code points (𝄞, emoji).
    val cpGen: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(4)),
      Gen.oneOf("é", "ß", "中", "文", "π"),
      Gen.oneOf("𝄞", "🚀", "💩")) // 𝄞 🚀 💩
    val docGen: Gen[String] = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, for {
        parts <- Gen.listOfN(3, cpGen)
      } yield parts.mkString)
    } yield toks.mkString(" ")
    forAll(Gen.listOfN(25, docGen), cases = 4) { docs =>
      val in = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(docs.map(Row(_))).asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
      val stop = Seq("the", "é")
      val bad = in.select(
        graft.functions.TextHashExprs.shingleHashes(col("text")).as("sh_n"),
        graft.llm.TextHash.shingleHashArray(col("text")).as("sh_d"),
        graft.functions.TextHashExprs.tokenStats(col("text"), stop).as("ts"),
        graft.llm.TextHash.fingerprint(col("text")).as("fp_d"),
        length(col("text")).as("nc_d"))
        .filter(col("sh_n") =!= col("sh_d") ||
          col("ts.fingerprint") =!= col("fp_d") ||
          col("ts.n_chars") =!= col("nc_d"))
        .count()
      assert(bad == 0, s"$bad generated docs diverge native vs declarative")
    }
  }

  // ---- merge_asof vs a brute-force per-row reference ----
  // Small ts domain forces exact-ts collisions, duplicate right
  // timestamps, and empty-candidate rows across cases; nullable right
  // values exercise the matched-row NULL-carry discipline.

  private val asofGen: Gen[(List[(Long, String, Long)], List[(String, Long, Option[Double])])] =
    for {
      nl <- Gen.choose(1, 25)
      nr <- Gen.choose(0, 10)
      left <- Gen.listOfN(nl, for {
        g <- Gen.oneOf("g", "h")
        t <- Gen.choose(0L, 20L)
      } yield (g, t))
      right <- Gen.listOfN(nr, for {
        g <- Gen.oneOf("g", "h")
        t <- Gen.choose(0L, 20L)
        v <- Gen.option(Gen.choose(1, 9).map(_.toDouble))
      } yield (g, t, v))
    } yield (left.zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }, right)

  /** The pandas rule, spelled out row-at-a-time: candidates by direction
    * and exact-match flag, matched row = extreme (ts, value) tuple with
    * None-first value ordering (the asc_nulls_first tie-break), nearest
    * ties to backward, tolerance nulls a too-far match afterwards. */
  private def bruteAsof(lts: Long, rights: Seq[(Long, Option[Double])],
                        direction: String, allowExact: Boolean,
                        tol: Option[Long]): Option[(Long, Option[Double])] = {
    implicit val ord: Ordering[(Long, Option[Double])] =
      Ordering.Tuple2(Ordering.Long, Ordering.Option(Ordering.Double.TotalOrdering))
    val back = rights.filter(r => if (allowExact) r._1 <= lts else r._1 < lts)
      .sorted.lastOption
    val fwd = rights.filter(r => if (allowExact) r._1 >= lts else r._1 > lts)
      .sorted.headOption
    val m = direction match {
      case "backward" => back
      case "forward" => fwd
      case "nearest" => (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (lts - b._1 <= f._1 - lts) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }
    }
    m.filter(mm => tol.forall(t => math.abs(lts - mm._1) <= t))
  }

  test("asofJoin (all directions/flags) equals the brute-force reference") {
    import org.apache.spark.sql.types._
    val cases = for {
      direction <- Seq("backward", "forward", "nearest")
      allowExact <- Seq(true, false)
      tol <- Seq(None, Some(3L))
    } yield (direction, allowExact, tol)
    forAll(asofGen, cases = 6) { case (left, right) =>
      val lDf = df(StructType(Seq(StructField("id", LongType),
          StructField("g", StringType), StructField("t", LongType))),
        left.map { case (i, g, t) => Row(i, g, t) }: _*)
      val rDf = df(StructType(Seq(StructField("g", StringType),
          StructField("t", LongType), StructField("rv", DoubleType))),
        right.map { case (g, t, v) => Row(g, t, v.map(Double.box).orNull) }: _*)
      for ((direction, allowExact, tol) <- cases) {
        val out = graft.operators.Joins.asofJoin(lDf, rDf, "t", "t", Seq("g"),
          direction, tol, allowExact)
        val got = out.collect().map { r =>
          r.getLong(out.columns.indexOf("id")) ->
            (if (r.isNullAt(out.columns.indexOf("rv"))) None
             else Some(r.getDouble(out.columns.indexOf("rv"))))
        }.toMap
        assert(got.size == left.size, s"$direction/$allowExact/$tol lost rows")
        left.foreach { case (id, g, lts) =>
          val rights = right.filter(_._1 == g).map(r => (r._2, r._3))
          val expect = bruteAsof(lts, rights, direction, allowExact, tol)
            .flatMap(_._2)
          assert(got(id) == expect,
            s"id=$id g=$g t=$lts $direction exact=$allowExact tol=$tol: " +
              s"got ${got(id)}, brute $expect (rights=$rights)")
        }
      }
    }
  }

  /** (unique order key, nullable integer-valued double) rows — integer
    * values keep FP sums order-independent, so the brute single-pass
    * reference is bit-comparable to the distributed two-pass plans. */
  private val globalGen: Gen[List[(Long, Option[Double])]] = for {
    n <- Gen.choose(0, 40)
    ids <- Gen.listOfN(n, Gen.choose(0L, 10000L)).map(_.distinct)
    vs <- Gen.listOfN(ids.size,
      Gen.option(Gen.choose(-50, 50).map(_.toDouble)))
  } yield ids.zip(vs)

  test("global cumsum/ffill/rollingSum equal a single-pass reference under any partitioning") {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType)))
    forAll2(globalGen, Gen.choose(1, 7), cases = 8) { (rows, nPart) =>
      val base = df(sch, rows.map { case (i, v) =>
        Row(i, v.map(Double.box).orNull) }: _*).repartition(nPart)
      val sorted = rows.sortBy(_._1)

      val cum = graft.operators.WindowOps.globalCumSum(base, "id", "v", "c")
        .orderBy("id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      val expCum = sorted.scanLeft((0L, Option.empty[Double], Option.empty[Double])) {
        case ((_, acc, _), (id, v)) =>
          val s = (acc, v) match {
            case (None, None) => None
            case (a, b) => Some(a.getOrElse(0.0) + b.getOrElse(0.0))
          }
          (id, s, s)
      }.drop(1).map(t => t._1 -> t._2)
      assert(cum.toSeq == expCum.toSeq, s"cumsum diverged (nPart=$nPart)")

      val ff = graft.operators.WindowOps.globalFfill(base, "id", "v", "f")
        .orderBy("id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      val expFf = sorted.scanLeft((0L, Option.empty[Double])) {
        case ((_, carry), (id, v)) => (id, v.orElse(carry))
      }.drop(1)
      assert(ff.toSeq == expFf.toSeq, s"ffill diverged (nPart=$nPart)")

      // rollingSum needs non-null values (the imperative ring buffer and
      // SQL window agree on nulls only trivially) — fill with 0
      val filled = df(sch, rows.map { case (i, v) =>
        Row(i, Double.box(v.getOrElse(0.0))) }: _*).repartition(nPart)
      val rs = graft.operators.WindowOps
        .globalRollingSum(filled, "id", "v", 5, "r")
        .orderBy("id").collect().map(r => r.getLong(0) -> r.getDouble(2))
      val vals = sorted.map(_._2.getOrElse(0.0))
      val expRs = sorted.indices.map { i =>
        sorted(i)._1 -> vals.slice(math.max(0, i - 4), i + 1).sum
      }
      assert(rs.toSeq == expRs, s"rollingSum diverged (nPart=$nPart)")
    }
  }

  test("embedding near-dup: sound pairs, complete on exact dups, drop = min-label components") {
    import org.apache.spark.sql.types._
    // dim-8 vectors over a small non-zero grid: colinear and identical
    // pairs occur (identical → identical LSH bucket → candidate
    // GUARANTEED; colinear → same sign pattern → same bucket too), so
    // both the completeness and the component-resolution branches are
    // exercised; random grid pairs usually stay below the threshold.
    val grid = Seq(-1.0f, -0.5f, 0.5f, 1.0f, 2.0f)
    val caseGen: Gen[(List[List[Float]], List[Int])] = for {
      n <- Gen.choose(3, 14)
      vecs <- Gen.listOfN(n, Gen.listOfN(8, Gen.oneOf(grid)))
      nDup <- Gen.choose(1, 3)
      dupOf <- Gen.listOfN(nDup, Gen.choose(0, n - 1))
    } yield (vecs, dupOf)
    val sch = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def cosBrute(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    forAll(caseGen, cases = 8) { case (vecs, dupOf) =>
      val all: Seq[(Long, Seq[Float])] =
        vecs.zipWithIndex.map { case (v, i) => (i.toLong, v: Seq[Float]) } ++
          dupOf.zipWithIndex.map { case (src, j) =>
            (100L + j, vecs(src): Seq[Float]) }
      val d = df(sch, all.map { case (id, v) => Row(id, v) }: _*)
      val pairs = graft.llm.Dedup.embeddingNearDupPairs(d, "vec_id",
          "embedding", dim = 8, threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val byId = all.toMap
      // soundness: every emitted pair really is >= threshold (brute
      // double recompute; 1e-6 slack covers decimal-vs-double rounding)
      pairs.foreach { case (a, b, cos) =>
        val brute = cosBrute(byId(a), byId(b))
        assert(brute >= 0.9 - 1e-6, s"false positive ($a,$b): engine $cos brute $brute")
        assert(math.abs(brute - cos) < 1e-6, s"cos mismatch ($a,$b): $cos vs $brute")
      }
      // completeness on exact duplicates: identical vectors share every
      // hyperplane sign, so the pair can never be bucketed apart
      val ids = all.map(_._1)
      for (a <- ids; b <- ids if a < b && byId(a) == byId(b))
        assert(pairs.exists(p => p._1 == a && p._2 == b),
          s"exact duplicate pair ($a,$b) not emitted")
      // drop semantics: connected components over the ENGINE's own pair
      // graph, keep each component's minimum — recomputed imperatively
      val adj = pairs.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def component(start: Long): Set[Long] = {
        var seen = Set(start); var frontier = List(start)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
            .filterNot(seen)
          seen ++= next; frontier = next
        }
        seen
      }
      val expectedKept = ids.filter(id => component(id).min == id).sorted
      val kept = graft.llm.Dedup.dropEmbeddingNearDuplicates(
          d.select("vec_id"), "vec_id", d, "vec_id", "embedding", 8, 0.9)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == expectedKept,
        s"drop diverged: kept $kept expected $expectedKept (pairs ${pairs.toSeq})")
    }
  }

  // ---- r12 training-layout family: random configs vs Scala references ----

  test("chunkByTokens equals a reference chunker for random (n, maxTokens, overlap)") {
    import org.apache.spark.sql.types._
    val cfgGen = for {
      n <- Gen.choose(0, 120)
      maxT <- Gen.choose(1, 30)
      ov <- Gen.choose(0, maxT - 1)
    } yield (n, maxT, ov)
    forAll(cfgGen, cases = 25) { case (n, maxT, ov) =>
      val words = (1 to n).map(i => s"w$i")
      val text = words.mkString(" ")
      val docs = df(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))), Row(1L, text))
      val got = graft.llm.TextStats
        .chunkByTokens(docs, "doc_id", "text", maxT, ov)
        .orderBy("chunk_id").collect()
        .map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq
      // reference: stride windows until one reaches the end. The token
      // list mirrors split(" ", -1): an empty text is ONE empty token.
      val toks = text.split(" ", -1).toSeq
      val stride = maxT - ov
      val nChunks =
        if (toks.length <= maxT) 1
        else 1 + math.ceil((toks.length - maxT).toDouble / stride).toInt
      val expected = (0 until nChunks).map { c =>
        val slice = toks.slice(c * stride, c * stride + maxT)
        (c, slice.mkString(" "), slice.length)
      }
      assert(got == expected,
        s"n=$n maxT=$maxT ov=$ov: $got != $expected")
      // invariants: full coverage, last chunk reaches the end
      assert(got.map(_._3).sum == toks.length + ov * (nChunks - 1))
    }
  }

  test("tokenWindows equals a reference cumsum-chop for random weights") {
    import org.apache.spark.sql.types._
    val rowsGenW = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 100000L)
        w <- Gen.oneOf(Gen.const(0L), Gen.choose(1L, 400L))
      } yield (id, w))
    } yield rows.groupBy(_._1).map(_._2.head).toList // distinct keys
    forAll2(rowsGenW, Gen.choose(1L, 300L), cases = 20) { (rows, wsize) =>
      val docs = df(StructType(Seq(StructField("doc_id", LongType),
        StructField("tok", LongType))), rows.map(r => Row(r._1, r._2)): _*)
      val got = graft.llm.TextStats
        .tokenWindows(docs, "doc_id", "tok", wsize)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("token_start"),
          r.getAs[Long]("window_first"), r.getAs[Long]("window_last")))
        .sortBy(_._1).toSeq
      val hash = (id: Long) => (id % 2147483648L) * 2654435761L % 4294967296L
      val ordered = rows.sortBy(r => hash(r._1))
      var acc = 0L
      val expected = ordered.map { case (id, w) =>
        val start = acc; acc += w
        val first = start / wsize
        val last = if (w > 0) (start + w - 1) / wsize else first
        (id, start, first, last)
      }.sortBy(_._1)
      assert(got == expected, s"wsize=$wsize: $got != $expected")
    }
  }

  test("property: Checks.check verdicts equal a driver-side reference over generated frames") {
    import graft.operators.Checks
    import org.apache.spark.sql.types._
    val gen: Gen[List[(Option[Long], Option[String])]] = for {
      n <- Gen.choose(0, 25)
      rows <- Gen.listOfN(n, for {
        a <- Gen.option(Gen.choose(-50L, 50L))
        b <- Gen.option(Gen.oneOf("x", "y", "zz", "w3"))
      } yield (a, b))
    } yield rows
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    forAll(gen, cases = 15) { rows =>
      val d = df(schema, rows.map { case (a, b) =>
        Row(a.map(Long.box).orNull, b.orNull) }: _*)
      val cs = Seq(
        Checks.NotNull("a", 0.7), Checks.NotNull("b", 0.7),
        Checks.Unique(Seq("a"), 0.5),
        Checks.Bounds("a", -10, 30, 0.4),
        Checks.InSet("b", Seq("x", "y"), 0.4),
        Checks.Matches("b", "^[a-z]+$", 0.5),
        Checks.RowCountBetween(1L, 20L),
        Checks.MeanBetween("a", -5.0, 5.0))
      val got = Checks.check(d, cs).collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(5)))
      // driver-side reference: same semantics in plain Scala
      val as = rows.flatMap(_._1)
      val bs = rows.flatMap(_._2)
      val n = rows.size
      def vac(num: Long, den: Long) = if (den == 0) 1.0 else num.toDouble / den
      val expect = Seq(
        ("not_null", "a", vac(as.size, n) >= 0.7),
        ("not_null", "b", vac(bs.size, n) >= 0.7),
        ("unique", "a", vac(as.distinct.size, n) >= 0.5),
        ("bounds", "a",
          vac(as.count(v => v >= -10 && v <= 30), as.size) >= 0.4),
        ("in_set", "b", vac(bs.count(Set("x", "y")), bs.size) >= 0.4),
        ("matches", "b",
          vac(bs.count(_.matches("^[a-z]+$")), bs.size) >= 0.5),
        ("row_count", "*", n >= 1 && n <= 20),
        ("mean", "a",
          as.nonEmpty && {
            val m = as.sum.toDouble / as.size; m >= -5.0 && m <= 5.0 }))
      assert(got.map(g => (g._1, g._2)).toSeq == expect.map(e => (e._1, e._2)),
        "report order must be declaration order")
      got.zip(expect).foreach { case (g, e) =>
        assert(g._3 == e._3, s"${g._1}(${g._2}): engine ${g._3} != reference ${e._3} on $rows")
      }
    }
  }

  // generated corpora for the id-space window law: distinct ids, words
  // from a small vocab (merges apply), some empty docs, some docs with
  // characters the training corpus never saw (OOV -> -1)
  private val winDocsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 14)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      ws <- Gen.listOfN(len, Gen.oneOf("teeth", "tees", "street",
        "meet", "seat", "xyz?!", "a"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("id-space windows: flattened stream == concatenated per-doc encodes in permutation order; conservation; EOD invariants") {
    val trainDocs = df(
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))),
      Row(0L, "teeth tees street meet seat a teeth street"),
      Row(1L, "seat street tees teeth meet a a street"))
    val merges = graft.llm.Bpe.mergeList(
      graft.llm.Bpe.train(trainDocs, "text", 5))
    val vocab = graft.llm.Bpe.vocabMap(
      graft.llm.Bpe.vocabFrame(trainDocs, "text",
        graft.llm.Bpe.train(trainDocs, "text", 5)))
    val eod = vocab.values.max + 1L
    forAll2(winDocsGen, Gen.zip(Gen.choose(2L, 9L), Gen.choose(0L, 99L)),
      cases = 6) { case (docRows, (windowSize, seed)) =>
      val docs = df(
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))),
        docRows.map { case (i, t) => Row(i, t) }: _*)
      for (eodOpt <- Seq(None, Some(eod))) {
        val win = graft.llm.Bpe.assembleWindowsIds(docs, "doc_id",
            "text", windowSize, seed, merges, vocab, eodOpt,
            withDocSpans = true)
          .orderBy("window_id").collect()
        // the reference stream: per-doc id sequences (plus EOD) in the
        // SAME permutation the chop declares (QHelp.keyHash31 — the
        // oracle-pinned hash), concatenated on the driver
        def docIds(t: String): Seq[Long] =
          t.split(" ", -1).filter(_.nonEmpty).toSeq
            .flatMap(w => graft.functions.BpeEncode
              .encodeWord(w, merges).toSeq)
            .map(tok => vocab.getOrElse(tok, -1L)) ++ eodOpt.toSeq.map(_ => eod)
        def h(id: Long): Long = {
          val m = 2147483648L
          val c = ((id % m) + m) % m + seed % m
          ((c % m) * 2654435761L) % 4294967296L
        }
        val expected = docRows.sortBy { case (i, _) => (h(i), i) }
          .flatMap { case (_, t) => docIds(t) }
        val got = win.flatMap(_.getSeq[Long](1))
        assert(got.toSeq == expected,
          s"ws=$windowSize seed=$seed eod=$eodOpt: stream mismatch")
        // conservation + window sizing: every window except the global
        // tail holds exactly windowSize ids
        assert(win.map(_.getLong(2)).sum == expected.size.toLong)
        win.dropRight(1).foreach(r =>
          assert(r.getLong(2) == windowSize, "non-tail window size"))
        // spans tile each window exactly
        win.foreach { r =>
          val spans = r.getSeq[Row](3)
          assert(spans.map(_.getLong(2)).sum == r.getLong(2))
          var off = 0L
          spans.foreach { sp =>
            assert(sp.getLong(1) == off); off += sp.getLong(2)
          }
        }
      }
    }
  }

  test("strided id windows are exact stream slices; stride == size degenerates to the disjoint form") {
    val trainDocs = df(
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))),
      Row(0L, "teeth tees street meet seat a teeth street"),
      Row(1L, "seat street tees teeth meet a a street"))
    val merges = graft.llm.Bpe.mergeList(
      graft.llm.Bpe.train(trainDocs, "text", 5))
    val vocab = graft.llm.Bpe.vocabMap(
      graft.llm.Bpe.vocabFrame(trainDocs, "text",
        graft.llm.Bpe.train(trainDocs, "text", 5)))
    def docIds(t: String): Seq[Long] =
      t.split(" ", -1).filter(_.nonEmpty).toSeq
        .flatMap(w => graft.functions.BpeEncode.encodeWord(w, merges).toSeq)
        .map(tok => vocab.getOrElse(tok, -1L))
    def h(seed: Long)(id: Long): Long = {
      val m = 2147483648L
      val c = ((id % m) + m) % m + seed % m
      ((c % m) * 2654435761L) % 4294967296L
    }
    forAll2(winDocsGen,
      Gen.zip(Gen.choose(3L, 9L), Gen.choose(1L, 11L), Gen.choose(0L, 99L)),
      cases = 6) { case (docRows, (windowSize, stride, seed)) =>
      val docs = df(
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))),
        docRows.map { case (i, t) => Row(i, t) }: _*)
      val stream = docRows.sortBy { case (i, _) => (h(seed)(i), i) }
        .flatMap { case (_, t) => docIds(t) }
      val win = graft.llm.Bpe.assembleWindowsIdsStrided(docs, "doc_id",
          "text", windowSize, stride, seed, merges, vocab)
        .orderBy("window_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      // every produced window is EXACTLY the stream slice its id names
      win.foreach { case (w, ids, n) =>
        val want = stream.slice((w * stride).toInt,
          (w * stride + windowSize).toInt)
        assert(ids == want,
          s"ws=$windowSize stride=$stride seed=$seed w=$w: $ids != $want")
        assert(n == want.size.toLong)
      }
      // and the produced id set is every window whose span starts
      // before the stream ends (stride > size legitimately subsamples)
      val wantIds = (0L until
        (if (stream.isEmpty) 0L
         else (stream.size.toLong - 1) / stride + 1)).toSeq
      assert(win.map(_._1).toSeq == wantIds,
        s"ws=$windowSize stride=$stride: ${win.map(_._1).toSeq} != $wantIds")
      // stride == size is the disjoint training form, bit for bit
      val disjoint = graft.llm.Bpe.assembleWindowsIds(docs, "doc_id",
          "text", windowSize, seed, merges, vocab)
        .orderBy("window_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      val stridedSame = graft.llm.Bpe.assembleWindowsIdsStrided(docs,
          "doc_id", "text", windowSize, windowSize, seed, merges, vocab)
        .orderBy("window_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      assert(stridedSame.toSeq == disjoint.toSeq)
    }
  }
}
