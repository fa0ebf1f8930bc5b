package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the FAISS-IVFPQ-style compression tier
  * of the similarity family (brute-force → LSH → IVF → int8 → PQ): each
  * vector splits into `m` subvectors, each subvector is replaced by the
  * id of its nearest per-subspace centroid, and search scores corpus
  * rows through a per-query lookup table (asymmetric distance
  * computation) — never touching the original floats.
  *
  * Why this matters at 100 TB: a dim-64 float32 corpus is 256 B/vector;
  * the int8 tier cuts that 4×; PQ with m=8 one-byte codes cuts it 32×
  * (8 code bytes + an 8-byte norm), so a 10 B-vector corpus's serving
  * scan drops from 2.5 TB to ~160 GB — and the ADC score is `m` table
  * lookups instead of `dim` multiplies. The price is approximation
  * (quantization error), measured honestly by [[recallReport]], the
  * same harness as the LSH/IVF/int8 recall instruments.
  *
  * All math follows the repo's cross-engine determinism discipline:
  * code assignment is the same strict-improvement double argmin as
  * [[Ivf.assign]] (first strict improvement → lowest code on ties),
  * lookup tables are left-fold double dots, norms are exact scale-12
  * decimals — every step an oracle recomputes bit-for-bit.
  *
  * Reference framing: the reference exposes pluggable similarity
  * backends over columnar frames (`/root/reference` dask_expr
  * collection ops); PQ is built Spark-first as broadcast codebooks +
  * blockwise higher-order expressions — no shuffle of the corpus at
  * encode or search time. */
object Pq {

  private def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Train per-subspace codebooks: (sub, code, centroid) with
    * `codes` centroids per each of `m` subspaces of dim/m components.
    * Rides [[Ivf.train]] per subspace — deterministic hash-sampled
    * seeds, optional Lloyd refinement; `iters = 0` keeps the codebooks
    * fully SQL-reproducible (the seed-slice construction, as in
    * q_ivf_topk). Training cost: m passes over the hash sample. */
  def trainCodebooks(embeddings: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int = 8, codes: Int = 16,
                     iters: Int = 2,
                     trainFraction: Double = 0.05): DataFrame = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val subDim = dim / m
    val cb = (0 until m).map { j =>
      val sv = embeddings.select(col(idCol),
        slice(col(vecCol).cast("array<double>"), j * subDim + 1, subDim)
          .as("__sv__"))
      Ivf.train(sv, idCol, "__sv__", nCells = codes, iters = iters,
          trainFraction = trainFraction)
        .select(lit(j).as("sub"), col("cell").as("code"), col("centroid"))
    }.reduce(_.unionByName(_)).localCheckpoint(true)
    // Lloyd refinement DROPS a centroid whose cell lost every member —
    // a subspace with fewer than `codes` entries would silently skew the
    // flat (sub, code) → index layout every encode/search relies on.
    // Codebook-sized check; rerun with fewer codes (or iters=0) if hit.
    val bad = cb.groupBy("sub").count()
      .filter(col("count") =!= codes).collect()
    require(bad.isEmpty,
      s"subspaces ${bad.map(_.get(0)).mkString(",")} trained fewer than " +
        s"$codes codes (empty cells dropped during refinement) — lower " +
        "`codes` or use iters=0")
    cb
  }

  /** The broadcast flat codebook: element (j*codes + c + 1) is the
    * centroid of (sub=j, code=c) — array_sort on the (sub, code) struct
    * prefix gives the deterministic layout. */
  private def flatCodebook(codebooks: DataFrame) =
    broadcast(codebooks.agg(
      transform(
        array_sort(collect_list(struct(col("sub"), col("code"),
          col("centroid")))),
        s => s.getField("centroid")).as("__cb__")))

  private def codesPerSub(codebooks: DataFrame, m: Int): Int = {
    val n = codebooks.count() // codebook-sized: m*codes rows, bounded
    require(n % m == 0, s"codebook holds $n rows, not a multiple of m=$m")
    (n / m).toInt
  }

  /** Encode a corpus: (id, codes[m], norm) — one blockwise pass against
    * the broadcast codebooks, no shuffle. `norm` is the ORIGINAL
    * vector's exact scale-12 norm, kept so ADC cosine divides by the
    * true magnitude (reconstruction error stays in the numerator only).
    * Ties in the per-subspace argmin resolve to the lowest code
    * (strict-improvement fold — the [[Ivf.assign]] contract). */
  def encode(embeddings: DataFrame, idCol: String, vecCol: String,
             codebooks: DataFrame, dim: Int, m: Int = 8): DataFrame =
    encodeCols(embeddings, vecCol, codebooks, dim, m)
      .select(col(idCol), col("codes"), col("norm"))

  /** [[encode]] keeping the input's other columns (the IVF+PQ writer
    * needs `cell` to ride along). */
  private def encodeCols(embeddings: DataFrame, vecCol: String,
                         codebooks: DataFrame, dim: Int,
                         m: Int): DataFrame = {
    val subDim = dim / m
    val nCodes = codesPerSub(codebooks, m)
    embeddings.crossJoin(flatCodebook(codebooks))
      .withColumn("codes",
        transform(sequence(lit(0), lit(m - 1)), j => {
          val sv = slice(col(vecCol).cast("array<double>"),
            j * subDim + lit(1), lit(subDim))
          aggregate(sequence(lit(0), lit(nCodes - 1)),
            struct(lit(-1).cast("int").as("code"),
              lit(Double.MaxValue).as("d")),
            (best, c) => {
              val cent = element_at(col("__cb__"),
                (j * nCodes + c + 1).cast("int"))
              val d = sqDist(sv, cent)
              when(d < best.getField("d"),
                struct(c.cast("int").as("code"), d.as("d")))
                .otherwise(best)
            },
            best => best.getField("code"))
        }))
      .withColumn("norm",
        coalesce(Similarity.normExact(col(vecCol), 12), lit(0.0)))
      .drop("__cb__")
  }

  /** ADC top-k: score = Σ_j LUT[j][codes[j]] / (|q|·|x|) where
    * LUT[j][c] = dot(q_subvector_j, codebook[j][c]). The per-query work
    * is a codebook-sized LUT build (m·codes dots, broadcast); the
    * corpus-side work is m integer lookups + one divide per row over
    * the NARROW (id, codes, norm) frame — the original vectors are
    * never read. `query` is a 1-row frame with the vector under `qv`
    * (compose from any source — corpus row, external literal). Zero
    * norms rank as null and drop (the int8 ranker's contract). */
  def annTopKPq(encoded: DataFrame, idCol: String, codebooks: DataFrame,
                query: DataFrame, dim: Int, m: Int, k: Int): DataFrame = {
    val subDim = dim / m
    val nCodes = codesPerSub(codebooks, m)
    val lut = broadcast(
      codebooks.crossJoin(broadcast(query.select(
          col("qv").cast("array<double>").as("__qv__"),
          Similarity.dotExact(col("qv"), col("qv"), 12).cast("double")
            .as("__nq2__"))))
        .select(col("sub"), col("code"),
          aggregate(
            zip_with(col("centroid").cast("array<double>"),
              slice(col("__qv__"), col("sub") * subDim + lit(1),
                lit(subDim)),
              (x, y) => x * y),
            lit(0.0), (acc, v) => acc + v).as("lv"),
          col("__nq2__"))
        .agg(
          transform(
            array_sort(collect_list(struct(col("sub"), col("code"),
              col("lv")))),
            s => s.getField("lv")).as("__lut__"),
          first(col("__nq2__")).as("__nq2__")))
    encoded.crossJoin(lut)
      .withColumn("adc",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, j) => acc + element_at(col("__lut__"),
            (j * nCodes + element_at(col("codes"), (j + 1).cast("int"))
              + 1).cast("int"))))
      .filter(col("norm") > 0.0 && col("__nq2__") > 0.0)
      .withColumn("cos_adc",
        col("adc") / (sqrt(col("__nq2__")) * col("norm")))
      .select(col(idCol), col("cos_adc"))
      .orderBy(col("cos_adc").desc, col(idCol).asc)
      .limit(k)
  }

  /** Persist the PQ serving corpus: `codebooks/` + `encoded/` parquet
    * beside a `_PQ.json` geometry stamp (dim, m, codes) that
    * [[annTopKPqIndexed]] validates — mismatched geometry throws
    * instead of silently scoring garbage (the index-stamp discipline).
    * Rebuild wholesale; the encoded frame is corpus-sized but 32×
    * narrower than the floats. */
  def writePqCorpus(encoded: DataFrame, codebooks: DataFrame,
                    path: String, dim: Int, m: Int): Unit = {
    val spark = encoded.sparkSession
    val nCodes = codesPerSub(codebooks, m)
    codebooks.write.mode("overwrite").parquet(s"$path/codebooks")
    encoded.write.mode("overwrite").parquet(s"$path/encoded")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$path/_PQ.json")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(
      s"""{"dim": $dim, "m": $m, "codes": $nCodes}\n""".getBytes("UTF-8"))
    finally out.close()
  }

  private def readGeometry(spark: SparkSession,
                           path: String): (Int, Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_PQ.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no PQ geometry stamp at $p")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    def f(k: String) = s""""$k":\\s*(\\d+)""".r.findFirstMatchIn(txt)
      .getOrElse(sys.error(s"corrupt PQ stamp $p: missing $k")).group(1).toInt
    (f("dim"), f("m"), f("codes"))
  }

  /** [[annTopKPq]] over a persisted corpus ([[writePqCorpus]]): the scan
    * reads only (id, codes, norm) — geometry comes from the stamp, and
    * a caller-supplied expectation that disagrees with it throws. */
  def annTopKPqIndexed(spark: SparkSession, path: String, idCol: String,
                       query: DataFrame, k: Int,
                       expectDim: Option[Int] = None): DataFrame = {
    val (dim, m, _) = readGeometry(spark, path)
    expectDim.foreach(d => require(d == dim,
      s"PQ corpus at $path was built at dim=$dim, caller expects $d"))
    annTopKPq(spark.read.parquet(s"$path/encoded"), idCol,
      spark.read.parquet(s"$path/codebooks"), query, dim, m, k)
  }

  /** Persist the combined IVF+PQ index — the full FAISS-IVFPQ shape:
    * the encoded corpus lands cell-partitioned (coarse quantizer =
    * saved IVF centroids), so a search scans only the `nprobe` probe
    * cell DIRECTORIES and reads only (id, codes, norm) inside them —
    * partition pruning × 32× row compression multiply. Geometry (dim,
    * m, codes, nCells) stamps the root; [[annTopKIvfPq]] validates. */
  def writeIvfPqCorpus(embeddings: DataFrame, idCol: String,
                       vecCol: String, centroids: DataFrame,
                       codebooks: DataFrame, path: String, dim: Int,
                       m: Int): Unit = {
    val spark = embeddings.sparkSession
    val nCodes = codesPerSub(codebooks, m)
    val nCells = centroids.count()
    val assigned = Ivf.assign(embeddings, idCol, vecCol, centroids)
    encodeCols(assigned, vecCol, codebooks, dim, m)
      .select(col(idCol), col("codes"), col("norm"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/encoded")
    codebooks.write.mode("overwrite").parquet(s"$path/codebooks")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$path/_PQ.json")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(
      (s"""{"dim": $dim, "m": $m, "codes": $nCodes, """ +
       s""""nCells": $nCells}\n""").getBytes("UTF-8"))
    finally out.close()
  }

  /** Probe-cell ADC over a persisted [[writeIvfPqCorpus]] index: the
    * `nprobe` cells nearest the query resolve to LITERALS (the
    * [[Ivf.annTopKIndexed]] pattern), so the scan statically prunes to
    * nprobe cell directories — at a 10 B-vector corpus with 4096
    * cells and nprobe=8, the search reads ~0.2% of an already-32×-
    * compressed index. Scoring is the same ADC as [[annTopKPq]]. */
  def annTopKIvfPq(spark: SparkSession, path: String, idCol: String,
                   query: DataFrame, k: Int,
                   nprobe: Int = 2): DataFrame = {
    val (dim, m, _) = readGeometry(spark, path)
    val centroids = spark.read.parquet(s"$path/centroids")
    val codebooks = spark.read.parquet(s"$path/codebooks")
    val probeCells = centroids
      .crossJoin(broadcast(query.select(
        col("qv").cast("array<double>").as("__qv__"))))
      .withColumn("__d__", sqDist(col("centroid"), col("__qv__")))
      .orderBy(col("__d__").asc, col("cell").asc).limit(nprobe)
      .select("cell").collect().map(_.getInt(0)) // bounded: nprobe rows
    val enc = spark.read.parquet(s"$path/encoded")
      .filter(col("cell").isin(probeCells.toSeq: _*)) // partition-pruned
      .drop("cell")
    annTopKPq(enc, idCol, codebooks, query, dim, m, k)
  }

  /** Batched ADC: every query in ONE job — per-query LUTs broadcast
    * (Q·m·codes doubles, bounded by the sampled-queries contract), each
    * narrow corpus row scored against all Q tables, per-query top-k.
    * Deliberately Q×N (the scan-everything shape ADC exists to make
    * cheap — 8 lookups/row instead of 64 multiplies); candidates-first
    * variants belong to the LSH/IVF tiers. Self-matches are excluded. */
  def annTopKPqBatch(encoded: DataFrame, idCol: String,
                     codebooks: DataFrame, queries: DataFrame,
                     qIdCol: String, qVecCol: String,
                     dim: Int, m: Int, k: Int): DataFrame = {
    val subDim = dim / m
    val nCodes = codesPerSub(codebooks, m)
    val luts = broadcast(
      codebooks.crossJoin(broadcast(queries.select(
          col(qIdCol).as("query_id"),
          col(qVecCol).cast("array<double>").as("__qv__"),
          Similarity.dotExact(col(qVecCol), col(qVecCol), 12)
            .cast("double").as("__nq2__"))))
        .select(col("query_id"), col("sub"), col("code"),
          aggregate(
            zip_with(col("centroid").cast("array<double>"),
              slice(col("__qv__"), col("sub") * subDim + lit(1),
                lit(subDim)),
              (x, y) => x * y),
            lit(0.0), (acc, v) => acc + v).as("lv"),
          col("__nq2__"))
        .groupBy("query_id")
        .agg(
          transform(
            array_sort(collect_list(struct(col("sub"), col("code"),
              col("lv")))),
            s => s.getField("lv")).as("__lut__"),
          first(col("__nq2__")).as("__nq2__")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos_adc").desc, col(idCol).asc)
    encoded.crossJoin(luts)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("adc",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, j) => acc + element_at(col("__lut__"),
            (j * nCodes + element_at(col("codes"), (j + 1).cast("int"))
              + 1).cast("int"))))
      .filter(col("norm") > 0.0 && col("__nq2__") > 0.0)
      .withColumn("cos_adc",
        col("adc") / (sqrt(col("__nq2__")) * col("norm")))
      .withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= k)
      .select(col("query_id"), col(idCol), col("cos_adc"))
  }

  /** Recall@k of the PQ path vs exact brute force — the tuning
    * instrument completing the family ([[Similarity.recallReport]] for
    * LSH, [[Ivf.recallReport]] for IVF, quantizedRecallReport for
    * int8): what the 32× compression costs in rank quality. Same
    * sampled-queries contract and pooled Σhits/Σk mean. */
  def recallReport(embeddings: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, qIdCol: String,
                   qVecCol: String, codebooks: DataFrame, dim: Int,
                   m: Int, k: Int): DataFrame = {
    val encoded = encode(embeddings, idCol, vecCol, codebooks, dim, m)
    val ann = annTopKPqBatch(encoded, idCol, codebooks, queries,
        qIdCol, qVecCol, dim, m, k)
      .select(col("query_id"), col(idCol).as("cand_id"),
        lit(1L).as("__hit__"))
    Similarity.recallFromCandidates(embeddings, queries, idCol, vecCol,
      qIdCol, qVecCol, k, ann)
  }
}
