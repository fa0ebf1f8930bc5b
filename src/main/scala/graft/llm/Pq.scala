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

  /** Residual codebooks — the accuracy-correct FAISS-IVFPQ recipe:
    * train the per-subspace quantizers on x − centroid(cell(x))
    * instead of the raw vectors, so the codes spend their entire
    * budget on the WITHIN-cell structure the coarse quantizer cannot
    * express (scores then add the exact query·centroid term back at
    * search time). `iters = 0` keeps them SQL-reproducible like
    * [[trainCodebooks]]. */
  def trainResidualCodebooks(embeddings: DataFrame, idCol: String,
                             vecCol: String, centroids: DataFrame,
                             dim: Int, m: Int = 8, codes: Int = 16,
                             iters: Int = 2,
                             trainFraction: Double = 0.05): DataFrame = {
    // sample FIRST (the same hash filter + undersized fallback as
    // Ivf.train, so iters=0 seeds are unchanged), assign and form
    // residuals for the SAMPLE only, and pin them once — otherwise each
    // of the m per-subspace training passes would re-run a corpus-wide
    // assignment to train on 5% of it
    val sampled =
      if (trainFraction >= 1.0) embeddings
      else embeddings.filter(graft.QHelp.keyHash31(col(idCol)) <
        (trainFraction * 4294967296L).toLong)
    val base =
      if (trainFraction < 1.0 && sampled.limit(codes).count() < codes)
        embeddings
      else sampled
    val res = withResidual(Ivf.assign(base, idCol, vecCol, centroids),
        vecCol, centroids)
      .select(col(idCol), col("__res__")).localCheckpoint(true)
    trainCodebooks(res, idCol, "__res__", dim, m, codes, iters,
      trainFraction = 1.0)
  }

  /** x − centroid(cell(x)) for a frame already carrying `cell`. */
  private def withResidual(assigned: DataFrame, vecCol: String,
                           centroids: DataFrame): DataFrame =
    assigned.join(broadcast(centroids), Seq("cell"))
      .withColumn("__res__",
        zip_with(col(vecCol).cast("array<double>"),
          col("centroid").cast("array<double>"), (x, y) => x - y))
      .drop("centroid")

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
    // a null or wrong-dimension vector would fold to the -1 sentinel in
    // every subspace and CRASH every later ADC lookup (index 0 into the
    // LUT) — malformed rows are excluded here, the embedIndexRows
    // contract (they can never rank anyway: no meaningful codes exist)
    embeddings
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .crossJoin(flatCodebook(codebooks))
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

  /** The broadcast 1-row (LUT, |q|²) frame of a single query — shared
    * by the plain and residual scoring paths. */
  private def lutFrame(codebooks: DataFrame, query: DataFrame, dim: Int,
                       m: Int): DataFrame = {
    val subDim = dim / m
    broadcast(
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
  }

  /** The per-row ordered ADC fold: Σ_j LUT[j*nCodes + codes[j]]. */
  private def adcFold(m: Int, nCodes: Int): org.apache.spark.sql.Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc + element_at(col("__lut__"),
        (j * nCodes + element_at(col("codes"), (j + 1).cast("int"))
          + 1).cast("int")))

  /** ADC top-k: score = Σ_j LUT[j][codes[j]] / (|q|·|x|) where
    * LUT[j][c] = dot(q_subvector_j, codebook[j][c]). The per-query work
    * is a codebook-sized LUT build (m·codes dots, broadcast); the
    * corpus-side work is m integer lookups + one divide per row over
    * the NARROW (id, codes, norm) frame — the original vectors are
    * never read. `query` is a 1-row frame with the vector under `qv`
    * (compose from any source — corpus row, external literal). Zero
    * norms rank as null and drop (the int8 ranker's contract). */
  def annTopKPq(encoded: DataFrame, idCol: String, codebooks: DataFrame,
                query: DataFrame, dim: Int, m: Int, k: Int,
                nCodesKnown: Option[Int] = None,
                offsetCol: Option[String] = None): DataFrame = {
    // serving paths pass the stamped codes count through — recounting
    // the codebook would launch an extra job per query served
    val nCodes = nCodesKnown.getOrElse(codesPerSub(codebooks, m))
    val lut = lutFrame(codebooks, query, dim, m)
    // offsetCol: an additive per-row score term (the residual path's
    // query·centroid constant) — absent, the expression is exactly the
    // plain ADC (no `0.0 +`, which would flip -0.0 and break the
    // bit-level oracle)
    val score = offsetCol.fold(col("adc"))(o => col(o) + col("adc"))
    encoded.crossJoin(lut)
      .withColumn("adc", adcFold(m, nCodes))
      .filter(col("norm") > 0.0 && col("__nq2__") > 0.0)
      .withColumn("cos_adc",
        score / (sqrt(col("__nq2__")) * col("norm")))
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
    // a full rebuild resets the generation chain (r13 — latent gap: a
    // rebuild AFTER a retrainPqCorpus flip would otherwise write flat
    // files a stale gen-N manifest silently shadows) and re-populates
    // any id sidecar, whose stale-behind state would silently re-admit
    // present ids — the writeIvfPqCorpus discipline
    Generations.reset(spark, path, "MANIFEST")
    val idName = encoded.columns.head
    if (KeyBlooms.exists(spark, path, "idblooms"))
      KeyBlooms.rebuild(
        spark.read.parquet(s"$path/encoded").select(col(idName).as("key")),
        path, "idblooms")
  }

  private[llm] def readGeometry(spark: SparkSession,
                                path: String): Geom = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_PQ.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no PQ geometry stamp at $p")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    def f(k: String) = s""""$k":\\s*(\\d+)""".r.findFirstMatchIn(txt)
      .getOrElse(sys.error(s"corrupt PQ stamp $p: missing $k")).group(1).toInt
    // residual flag is optional (absent on pre-residual stamps → false);
    // ONE stamp read serves every entrypoint — no second open per query
    val residual = """"residual":\s*(\d+)""".r.findFirstMatchIn(txt)
      .exists(_.group(1).toInt == 1)
    Geom(f("dim"), f("m"), f("codes"), residual)
  }

  private[llm] case class Geom(dim: Int, m: Int, codes: Int,
                          residual: Boolean)

  /** [[annTopKPq]] over a persisted corpus ([[writePqCorpus]]): the scan
    * reads only (id, codes, norm) — geometry comes from the stamp, and
    * a caller-supplied expectation that disagrees with it throws. */
  def annTopKPqIndexed(spark: SparkSession, path: String, idCol: String,
                       query: DataFrame, k: Int,
                       expectDim: Option[Int] = None): DataFrame = {
    val g = readGeometry(spark, path)
    expectDim.foreach(d => require(d == g.dim,
      s"PQ corpus at $path was built at dim=${g.dim}, caller expects $d"))
    require(!g.residual,
      s"the corpus at $path holds RESIDUAL codes — serve it through " +
        "annTopKIvfPq (scores need the per-cell centroid term)")
    val root = resolveRoot(spark, path)
    annTopKPq(spark.read.parquet(s"$root/encoded"), idCol,
      spark.read.parquet(s"$root/codebooks"), query, g.dim, g.m, k,
      nCodesKnown = Some(g.codes))
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
                       m: Int, residual: Boolean = false): Unit = {
    val spark = embeddings.sparkSession
    val nCodes = codesPerSub(codebooks, m)
    val nCells = centroids.count()
    val assigned = Ivf.assign(embeddings, idCol, vecCol, centroids)
    encodeAssigned(assigned, idCol, vecCol, codebooks, centroids, dim,
        m, residual)
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
       s""""nCells": $nCells, "residual": ${if (residual) 1 else 0}}\n""")
        .getBytes("UTF-8"))
    finally out.close()
    // a full rebuild resets the generation chain (the flat layout IS
    // the live data again) — and must re-populate any id sidecar, whose
    // stale-behind state would otherwise silently re-admit present ids
    Generations.reset(spark, path, "MANIFEST")
    if (KeyBlooms.exists(spark, path, "idblooms"))
      KeyBlooms.rebuild(
        spark.read.parquet(s"$path/encoded").select(col(idCol).as("key")),
        path, "idblooms")
  }

  /** The LIVE generation root of a persisted PQ corpus — maintenance
    * rewrites install new generations behind an atomic manifest flip
    * (the [[Ivf.resolveRoot]] machinery), so probes planned pre-flip
    * finish on intact files. */
  def resolveRoot(spark: SparkSession, path: String): String =
    Generations.resolve(spark, path, "MANIFEST")

  /** Opt-in id-boundary Bloom sidecar for the PQ corpus (the
    * [[KeyBlooms]] family): [[appendToPqCorpus]] then skips its replay
    * guard's encoded id-column read entirely on a steady-state day.
    * Lives at the corpus ROOT — generation flips never touch it. */
  def buildIdBlooms(spark: SparkSession, path: String, idCol: String,
                    nBlooms: Int = 32, fpp: Double = 0.01): Unit = {
    val root = resolveRoot(spark, path)
    KeyBlooms.buildFrom(
      spark.read.parquet(s"$root/encoded").select(col(idCol).as("key")),
      path, "idblooms", nBlooms, fpp)
  }

  /** Daily growth of a persisted PQ corpus: assign against the SAVED
    * coarse quantizer, encode against the SAVED codebooks, append into
    * the matching cell partitions — only the shard is ever written.
    * REPLAY-SAFE like [[Ivf.appendToIndex]]: already-present ids drop
    * (with an id-Bloom sidecar the steady-state day never reads the
    * corpus id column; without one the guard column-prunes the encoded
    * table); the sidecar grows BEFORE the data commits (stale
    * positives, never a silent double-insert). */
  def appendToPqCorpus(newEmbeddings: DataFrame, idCol: String,
                       vecCol: String, path: String): Unit = {
    val spark = newEmbeddings.sparkSession
    val root = resolveRoot(spark, path)
    val g = readGeometry(spark, path)
    val centroids = spark.read.parquet(s"$root/centroids")
    val codebooks = spark.read.parquet(s"$root/codebooks")
    val hasBlooms = KeyBlooms.exists(spark, path, "idblooms")
    // the shared id-guard ([[KeyBlooms.presentIds]]): a steady-state
    // append never reads the encoded id column
    val present = KeyBlooms.presentIds(newEmbeddings.select(col(idCol)),
      idCol, spark.read.parquet(s"$root/encoded").select(col(idCol)),
      path)
    val fresh = newEmbeddings.join(present, Seq(idCol), "left_anti")
      .localCheckpoint(true) // one pinned evaluation across the sinks
    if (hasBlooms)
      KeyBlooms.append(fresh.select(col(idCol).as("key")), path,
        "idblooms")
    val assigned = Ivf.assign(fresh, idCol, vecCol, centroids)
    encodeAssigned(assigned, idCol, vecCol, codebooks, centroids, g.dim,
        g.m, g.residual)
      .write.mode("append").partitionBy("cell").parquet(s"$root/encoded")
  }

  /** Encode a cell-assigned frame to (id, codes, norm, cell) — plain
    * or residual codes; `norm` is ALWAYS the original vector's (the
    * ADC denominator needs |x| whichever space the codes live in). */
  private def encodeAssigned(assigned: DataFrame, idCol: String,
                             vecCol: String, codebooks: DataFrame,
                             centroids: DataFrame, dim: Int, m: Int,
                             residual: Boolean): DataFrame = {
    val base =
      if (!residual) encodeCols(assigned, vecCol, codebooks, dim, m)
      else encodeCols(withResidual(assigned, vecCol, centroids),
          "__res__", codebooks, dim, m)
        .withColumn("norm",
          coalesce(Similarity.normExact(col(vecCol), 12), lit(0.0)))
    base.select(col(idCol), col("codes"), col("norm"), col("cell"))
  }

  /** Rewrite each cell's accumulated append files into one file per
    * cell — same online generation-flip + writer-exclusive lock as
    * [[Ivf.compactIndex]]; geometry, row set and the probe-pruning
    * contract unchanged. */
  def compactPqCorpus(spark: SparkSession, path: String): Unit = {
    Generations.withCompactionLock(spark, s"$path/_COMPACTION_LOCK") {
      rewritePqLocked(spark, path, identity, "compactPqCorpus")
    }
    ()
  }

  /** RETRACT ids from the PQ corpus — a retraction IS a compaction with
    * an anti-join transform (the family-wide contract). A retracted id
    * stays Bloom-positive in any id sidecar — a stale positive the next
    * append verifies and re-admits, never a wrong answer. Returns
    * (rows before, rows after). */
  def retractFromPqCorpus(spark: SparkSession, path: String,
                          ids: DataFrame, idCol: String): (Long, Long) =
    Generations.withCompactionLock(spark, s"$path/_COMPACTION_LOCK") {
      val key = ids.select(col(idCol)).distinct()
      rewritePqLocked(spark, path,
        _.join(broadcast(key), Seq(idCol), "left_anti"),
        "retractFromPqCorpus")
    }

  /** RETRAIN the IVF+PQ geometry (coarse centroids AND per-subspace
    * codebooks) on the CURRENT source-of-truth embeddings and migrate
    * the serving corpus onto it in one online generation flip — the
    * [[Ivf.retrainIndex]] analog for the compressed tier, closing the
    * loop [[Ivf.cellDriftReport]] opens (r11 verdict #2).
    *
    * Unlike the IVF index, a PQ corpus stores only lossy codes, so
    * retraining REQUIRES the original float vectors: pass the corpus's
    * embeddings table (the vecs store the ingest pipeline maintains).
    * The stamped geometry (dim, m, codes, nCells, residual) is kept —
    * this migrates centroid/codebook VALUES onto the drifted
    * distribution, not the shape; residual corpora retrain residual
    * codebooks against the NEW coarse quantizer (the FAISS recipe).
    *
    * The new generation is re-encoded wholesale (assign + encode are
    * blockwise against broadcast geometry — the same cost as the
    * compaction rewrite it replaces, plus the bounded training
    * passes), verified, and installed behind the atomic manifest flip:
    * probes planned pre-flip finish intact. Any id-Bloom sidecar is
    * REBUILT from the new encoded ids in lockstep — the embeddings
    * frame is the new population and may differ from the old corpus,
    * and a sidecar behind the population is a silent re-admit.
    * Returns (rows in the old generation, rows in the new one). */
  def retrainIvfPqCorpus(embeddings: DataFrame, idCol: String,
                         vecCol: String, path: String, iters: Int = 2,
                         trainFraction: Double = 0.05): (Long, Long) = {
    val spark = embeddings.sparkSession
    Generations.withCompactionLock(spark, s"$path/_COMPACTION_LOCK") {
      val g = readGeometry(spark, path)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      val curGen = Generations.current(spark, path, "MANIFEST")
      val curRoot = if (curGen == 0) path else s"$path/gen-$curGen"
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$curRoot/centroids")),
        s"no centroids under $curRoot — retrainIvfPqCorpus migrates " +
          "writeIvfPqCorpus indexes; a flat writePqCorpus corpus " +
          "migrates with retrainPqCorpus (codebooks only, no coarse " +
          "quantizer)")
      val nCells = spark.read.parquet(s"$curRoot/centroids").count().toInt
      val newCents = Ivf.train(embeddings, idCol, vecCol, nCells,
        iters, trainFraction).localCheckpoint(true)
      val newCbs =
        (if (g.residual)
          trainResidualCodebooks(embeddings, idCol, vecCol, newCents,
            g.dim, g.m, g.codes, iters, trainFraction)
        else
          trainCodebooks(embeddings, idCol, vecCol, g.dim, g.m, g.codes,
            iters, trainFraction)).localCheckpoint(true)
      val nextGen = curGen + 1
      val nextRoot = s"$path/gen-$nextGen"
      fs.delete(new org.apache.hadoop.fs.Path(nextRoot), true)
      val assigned = Ivf.assign(embeddings, idCol, vecCol, newCents)
      val obs = new org.apache.spark.sql.Observation("retrainIvfPq-rows")
      val transformed = encodeAssigned(assigned, idCol, vecCol, newCbs,
          newCents, g.dim, g.m, g.residual)
        .observe(obs, count(lit(1)).as("rows"))
      transformed.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$nextRoot/encoded")
      val srcRows = spark.read.parquet(s"$curRoot/encoded").count()
      val wantRows = obs.get("rows").asInstanceOf[Long]
      val dstRows = spark.read.parquet(s"$nextRoot/encoded").count()
      if (dstRows != wantRows) {
        fs.delete(new org.apache.hadoop.fs.Path(nextRoot), true)
        throw new java.io.IOException(
          s"retrainIvfPqCorpus: rewrite row mismatch " +
            s"($dstRows != $wantRows), aborted")
      }
      newCbs.coalesce(1).write.mode("overwrite")
        .parquet(s"$nextRoot/codebooks")
      newCents.coalesce(1).write.mode("overwrite")
        .parquet(s"$nextRoot/centroids")
      // sidecar rebuild BEFORE the flip (the family's blooms-first
      // ordering): the instant the manifest switches, the live
      // population already has an exact sidecar. Crash anywhere in
      // this window is covered by the compaction lock the migration
      // holds — appends fail loudly against a left-behind lock, and
      // the documented recovery for a crashed migration is to re-run
      // it before deleting the lock (wholesale rewrite, idempotent).
      if (KeyBlooms.exists(spark, path, "idblooms"))
        KeyBlooms.rebuild(
          spark.read.parquet(s"$nextRoot/encoded")
            .select(col(idCol).as("key")),
          path, "idblooms")
      Generations.flip(spark, path, "MANIFEST", nextGen)
      for (old <- 0 until curGen) {
        if (old == 0)
          Seq("encoded", "codebooks", "centroids").foreach(d =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true))
        else fs.delete(new org.apache.hadoop.fs.Path(s"$path/gen-$old"), true)
      }
      (srcRows, dstRows)
    }
  }

  /** RETRAIN the FLAT PQ corpus's codebooks on the CURRENT
    * source-of-truth embeddings and re-encode the serving corpus onto
    * them in one online generation flip — [[retrainIvfPqCorpus]] for
    * the [[writePqCorpus]] family (r12 verdict #2: the flat corpus's
    * learned codebooks drift identically but had only a wholesale-
    * rebuild path with serving downtime). Like the IVF+PQ migration,
    * the corpus stores only lossy codes, so retraining REQUIRES the
    * original float vectors: pass the embeddings table the ingest
    * pipeline maintains (its ids become the new population). The
    * stamped geometry (dim, m, codes) is kept — this migrates codebook
    * VALUES onto the drifted distribution, not the shape. Any id-Bloom
    * sidecar rebuilds from the new encoded ids BEFORE the flip (the
    * family's blooms-first ordering). Probes planned pre-flip finish
    * on the intact old generation. Returns (rows in the old
    * generation, rows in the new one). */
  def retrainPqCorpus(embeddings: DataFrame, idCol: String,
                      vecCol: String, path: String, iters: Int = 2,
                      trainFraction: Double = 0.05): (Long, Long) = {
    val spark = embeddings.sparkSession
    Generations.withCompactionLock(spark, s"$path/_COMPACTION_LOCK") {
      val g = readGeometry(spark, path)
      require(!g.residual,
        s"the corpus at $path holds RESIDUAL codes (an IVF+PQ layout) " +
          "— migrate it with retrainIvfPqCorpus")
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      val curGen = Generations.current(spark, path, "MANIFEST")
      val curRoot = if (curGen == 0) path else s"$path/gen-$curGen"
      require(!fs.exists(new org.apache.hadoop.fs.Path(s"$curRoot/centroids")),
        s"centroids found under $curRoot — this is a cell-partitioned " +
          "writeIvfPqCorpus index; migrate it with retrainIvfPqCorpus " +
          "(its coarse quantizer must retrain with the codebooks)")
      val newCbs = trainCodebooks(embeddings, idCol, vecCol, g.dim, g.m,
        g.codes, iters, trainFraction).localCheckpoint(true)
      val nextGen = curGen + 1
      val nextRoot = s"$path/gen-$nextGen"
      fs.delete(new org.apache.hadoop.fs.Path(nextRoot), true)
      val obs = new org.apache.spark.sql.Observation("retrainPq-rows")
      val transformed = encode(embeddings, idCol, vecCol, newCbs, g.dim,
          g.m)
        .observe(obs, count(lit(1)).as("rows"))
      transformed.write.mode("overwrite").parquet(s"$nextRoot/encoded")
      val srcRows = spark.read.parquet(s"$curRoot/encoded").count()
      val wantRows = obs.get("rows").asInstanceOf[Long]
      val dstRows = spark.read.parquet(s"$nextRoot/encoded").count()
      if (dstRows != wantRows) {
        fs.delete(new org.apache.hadoop.fs.Path(nextRoot), true)
        throw new java.io.IOException(
          s"retrainPqCorpus: rewrite row mismatch " +
            s"($dstRows != $wantRows), aborted")
      }
      newCbs.coalesce(1).write.mode("overwrite")
        .parquet(s"$nextRoot/codebooks")
      if (KeyBlooms.exists(spark, path, "idblooms"))
        KeyBlooms.rebuild(
          spark.read.parquet(s"$nextRoot/encoded")
            .select(col(idCol).as("key")),
          path, "idblooms")
      Generations.flip(spark, path, "MANIFEST", nextGen)
      for (old <- 0 until curGen) {
        if (old == 0)
          Seq("encoded", "codebooks").foreach(d =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true))
        else fs.delete(new org.apache.hadoop.fs.Path(s"$path/gen-$old"), true)
      }
      (srcRows, dstRows)
    }
  }

  private def rewritePqLocked(spark: SparkSession, path: String,
                              transform: DataFrame => DataFrame,
                              opName: String): (Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val curGen = Generations.current(spark, path, "MANIFEST")
    val curRoot = if (curGen == 0) path else s"$path/gen-$curGen"
    val nextGen = curGen + 1
    val nextRoot = s"$path/gen-$nextGen"
    fs.delete(new org.apache.hadoop.fs.Path(nextRoot), true)
    val encoded = spark.read.parquet(s"$curRoot/encoded")
    // expected count observes the write's own execution (one pass; the
    // Ivf.rewriteIndexLocked discipline)
    val obs = new org.apache.spark.sql.Observation(s"$opName-rows")
    val transformed = transform(encoded)
      .observe(obs, count(lit(1)).as("rows"))
    // a FLAT writePqCorpus corpus has no cell partitioning (and no
    // centroids) — its rewrite lands plain parquet (r13: compaction and
    // retraction previously crashed on the flat family's missing cell)
    val cellPartitioned = encoded.columns.contains("cell")
    if (cellPartitioned)
      transformed.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$nextRoot/encoded")
    else
      transformed.write.mode("overwrite").parquet(s"$nextRoot/encoded")
    val srcRows = encoded.count() // parquet metadata count
    val wantRows = obs.get("rows").asInstanceOf[Long]
    val dstRows = spark.read.parquet(s"$nextRoot/encoded").count()
    if (dstRows != wantRows) {
      fs.delete(new org.apache.hadoop.fs.Path(nextRoot), true)
      throw new java.io.IOException(
        s"$opName: rewrite row mismatch ($dstRows != $wantRows), aborted")
    }
    spark.read.parquet(s"$curRoot/codebooks").coalesce(1)
      .write.mode("overwrite").parquet(s"$nextRoot/codebooks")
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$curRoot/centroids")))
      spark.read.parquet(s"$curRoot/centroids").coalesce(1)
        .write.mode("overwrite").parquet(s"$nextRoot/centroids")
    Generations.flip(spark, path, "MANIFEST", nextGen)
    for (g <- 0 until curGen) {
      if (g == 0)
        Seq("encoded", "codebooks", "centroids").foreach(d =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true))
      else fs.delete(new org.apache.hadoop.fs.Path(s"$path/gen-$g"), true)
    }
    (srcRows, dstRows)
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
    val g = readGeometry(spark, path)
    val (dim, m, nCodes) = (g.dim, g.m, g.codes)
    val root = resolveRoot(spark, path)
    val centroids = spark.read.parquet(s"$root/centroids")
    val codebooks = spark.read.parquet(s"$root/codebooks")
    val probeCells = centroids
      .crossJoin(broadcast(query.select(
        col("qv").cast("array<double>").as("__qv__"))))
      .withColumn("__d__", sqDist(col("centroid"), col("__qv__")))
      .orderBy(col("__d__").asc, col("cell").asc).limit(nprobe)
      .select("cell").collect().map(_.getInt(0)) // bounded: nprobe rows
    val enc = spark.read.parquet(s"$root/encoded")
      .filter(col("cell").isin(probeCells.toSeq: _*)) // partition-pruned
    if (!g.residual)
      annTopKPq(enc.drop("cell"), idCol, codebooks, query, dim, m, k,
        nCodesKnown = Some(nCodes))
    else {
      // residual scoring: dot(q, x) ≈ dot(q, centroid(cell)) + ADC over
      // the residual codes — the exact per-cell constant comes back
      // from the coarse quantizer, so the code budget was spent purely
      // on within-cell structure
      val qcs = broadcast(centroids
        .filter(col("cell").isin(probeCells.toSeq: _*))
        .crossJoin(broadcast(query.select(
          col("qv").cast("array<double>").as("__qv__"))))
        .select(col("cell"),
          aggregate(zip_with(col("centroid").cast("array<double>"),
            col("__qv__"), (x, y) => x * y),
            lit(0.0), (acc, v) => acc + v).as("__qc__")))
      annTopKPq(enc.join(qcs, Seq("cell")).drop("cell"), idCol,
        codebooks, query, dim, m, k, nCodesKnown = Some(nCodes),
        offsetCol = Some("__qc__"))
    }
  }

  /** Loud enforcement of the sampled-queries contract on the batched
    * serving paths: their per-query LUT broadcast is Q·m·codes doubles,
    * so an unbounded Q turns into a multi-GB broadcast failure deep
    * inside Spark — the suspectCap/geometry-stamp discipline applied to
    * the last unbounded broadcast (r11 verdict). The check is a
    * bounded probe (`limit(qCap+1)` stops the scan early), never a full
    * count of the query frame. */
  private def requireBoundedBatch(queries: DataFrame, m: Int, codes: Int,
                                  qCap: Int, entry: String): Unit = {
    require(qCap > 0, s"$entry: qCap must be positive, got $qCap")
    val over = queries.limit(qCap + 1).count() > qCap
    require(!over,
      s"$entry: the query batch exceeds qCap=$qCap rows — the per-query " +
        s"LUT broadcast (Q x m=$m x codes=$codes doubles) would blow " +
        "past broadcast limits at this Q. Use the Chunked form of this " +
        "entrypoint (annTopKPqIndexedBatchChunked / " +
        "annTopKIvfPqBatchChunked — exact: scores are per-query), raise " +
        "qCap deliberately if your cluster's broadcast budget allows, " +
        "or serve continuous traffic through the per-trigger streaming " +
        "form (Streams.annTopKPqStream / annTopKIvfPqStream)")
  }

  /** Slice an over-cap query frame into bounded chunks and serve each
    * through `serve`, unioning the per-query results — EXACT, because
    * every score and per-query top-k is independent across queries.
    * Chunk membership is a hash of the query id into
    * ceil(Q / (qCap/2)) ranges: targeting HALF the cap makes a chunk
    * overflowing it a Chernoff-tail event (mean qCap/2, bound qCap) —
    * and the inner entrypoint still enforces the cap loudly if a
    * pathological id distribution defeats the hash. ONE full count of
    * the query frame decides the split (full by necessity — the split
    * arity depends on Q itself), and on the over-cap path the frame is
    * materialized ONCE with its chunk id (eager localCheckpoint): every
    * per-chunk filter and the inner entrypoints' bounded cap probes
    * read executor-local blocks, so the query SOURCE is scanned at most
    * twice regardless of chunk count (r12 ADVICE: the previous shape
    * re-scanned the source once per chunk plus a probe action each).
    * Plan size still grows linearly with the chunk count (each chunk is
    * its own broadcast + scan subplan): right for a few dozen caps'
    * worth of queries; beyond that, the per-trigger streaming form is
    * the honest shape. Checkpoint blocks free on GC. */
  private def serveChunked(queries: DataFrame, qIdCol: String, qCap: Int)
                          (serve: DataFrame => DataFrame): DataFrame = {
    require(qCap > 1, s"qCap must exceed 1, got $qCap")
    val total = queries.count()
    if (total <= qCap) serve(queries)
    else {
      val n = math.ceil(total.toDouble / (qCap / 2)).toInt
      val sliced = queries
        .withColumn("__chunk__", pmod(hash(col(qIdCol)), lit(n)))
        .localCheckpoint(true) // the ONE materialization of the queries
      (0 until n)
        .map(i => serve(sliced.filter(col("__chunk__") === i)
          .drop("__chunk__")))
        .reduce(_.unionByName(_))
    }
  }

  /** [[annTopKPqIndexedBatch]] for UNBOUNDED query frames: qCap-sized
    * hash chunks served sequentially through the bounded path
    * ([[serveChunked]]). */
  def annTopKPqIndexedBatchChunked(spark: SparkSession, path: String,
                                   idCol: String, queries: DataFrame,
                                   qIdCol: String, qVecCol: String,
                                   k: Int, qCap: Int = 10000): DataFrame =
    serveChunked(queries, qIdCol, qCap)(q =>
      annTopKPqIndexedBatch(spark, path, idCol, q, qIdCol, qVecCol, k,
        qCap))

  /** [[annTopKIvfPqBatch]] for UNBOUNDED query frames: qCap-sized hash
    * chunks served sequentially through the bounded path
    * ([[serveChunked]]); each chunk prunes to its own probe-cell
    * union, so the scan stays cell-bounded per chunk. */
  def annTopKIvfPqBatchChunked(spark: SparkSession, path: String,
                               idCol: String, queries: DataFrame,
                               qIdCol: String, qVecCol: String, k: Int,
                               nprobe: Int = 2,
                               qCap: Int = 10000): DataFrame =
    serveChunked(queries, qIdCol, qCap)(q =>
      annTopKIvfPqBatch(spark, path, idCol, q, qIdCol, qVecCol, k,
        nprobe, qCap))

  /** Batched ADC: every query in ONE job — per-query LUTs broadcast
    * (Q·m·codes doubles, bounded by the sampled-queries contract — now
    * ENFORCED by `qCap`, default 10k: an over-cap batch fails loudly
    * before the broadcast builds), each narrow corpus row scored
    * against all Q tables, per-query top-k.
    * Deliberately Q×N (the scan-everything shape ADC exists to make
    * cheap — 8 lookups/row instead of 64 multiplies); candidates-first
    * variants belong to the LSH/IVF tiers. Self-matches are excluded. */
  def annTopKPqBatch(encoded: DataFrame, idCol: String,
                     codebooks: DataFrame, queries: DataFrame,
                     qIdCol: String, qVecCol: String,
                     dim: Int, m: Int, k: Int,
                     nCodesKnown: Option[Int] = None,
                     qCap: Int = 10000): DataFrame = {
    val subDim = dim / m
    val nCodes = nCodesKnown.getOrElse(codesPerSub(codebooks, m))
    requireBoundedBatch(queries, m, nCodes, qCap, "annTopKPqBatch")
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
      .withColumn("adc", adcFold(m, nCodes))
      .filter(col("norm") > 0.0 && col("__nq2__") > 0.0)
      .withColumn("cos_adc",
        col("adc") / (sqrt(col("__nq2__")) * col("norm")))
      .withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= k)
      .select(col("query_id"), col(idCol), col("cos_adc"))
  }

  /** Batched probe-cell ADC over a persisted [[writeIvfPqCorpus]]
    * index — the production batch serving shape, and the one batch
    * entrypoint that serves RESIDUAL corpora too (the cell rides every
    * row, so the per-(query, cell) centroid constant joins naturally).
    * Per-query probe cells resolve on the broadcast centroids; the
    * scan prunes to the DISTINCT probe cells across the batch
    * (bounded literals, the [[Ivf.annTopKIndexedBatch]] pattern); each
    * encoded row pairs only with the queries probing ITS cell through
    * one (query_id, cell) equi-join — never all query×corpus pairs.
    * Self-matches drop. */
  def annTopKIvfPqBatch(spark: SparkSession, path: String, idCol: String,
                        queries: DataFrame, qIdCol: String,
                        qVecCol: String, k: Int,
                        nprobe: Int = 2,
                        qCap: Int = 10000): DataFrame = {
    val g = readGeometry(spark, path)
    requireBoundedBatch(queries, g.m, g.codes, qCap, "annTopKIvfPqBatch")
    val root = resolveRoot(spark, path)
    val centroids = spark.read.parquet(s"$root/centroids")
    val codebooks = spark.read.parquet(s"$root/codebooks")
    val subDim = g.dim / g.m
    val qs = broadcast(queries.select(col(qIdCol).as("query_id"),
      col(qVecCol).cast("array<double>").as("__qv__")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__d__").asc, col("cell").asc)
    // (query_id, cell) probe pairs + the per-pair centroid dot (free on
    // the same tiny frame; only the residual path consumes it)
    val probes = centroids.crossJoin(qs)
      .withColumn("__d__", sqDist(col("centroid"), col("__qv__")))
      .withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= nprobe)
      .select(col("query_id"), col("cell"),
        aggregate(zip_with(col("centroid").cast("array<double>"),
          col("__qv__"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("__qc__"))
      .localCheckpoint(true) // Q×nprobe rows: one evaluation, reused thrice
    val cells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)) // bounded: ≤ min(Q·nprobe, nCells)
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
    val score =
      if (g.residual) col("__qc__") + col("adc") else col("adc")
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos_adc").desc, col(idCol).asc)
    spark.read.parquet(s"$root/encoded")
      .filter(col("cell").isin(cells.toSeq: _*)) // partition-pruned
      .join(broadcast(probes), Seq("cell"))      // row × its probers only
      .join(luts, Seq("query_id"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("adc", adcFold(g.m, g.codes))
      .filter(col("norm") > 0.0 && col("__nq2__") > 0.0)
      .withColumn("cos_adc",
        score / (sqrt(col("__nq2__")) * col("norm")))
      .withColumn("__rn__", row_number().over(wk))
      .filter(col("__rn__") <= k)
      .select(col("query_id"), col(idCol), col("cos_adc"))
  }

  /** [[annTopKPqBatch]] over a persisted corpus ([[writePqCorpus]] /
    * [[writeIvfPqCorpus]]): resolves the live generation, reads only
    * (id, codes, norm), threads the stamped geometry — the batch
    * serving entrypoint, and the per-trigger body of the streaming
    * form (graft.streaming.Streams.annTopKPqStream). */
  def annTopKPqIndexedBatch(spark: SparkSession, path: String,
                            idCol: String, queries: DataFrame,
                            qIdCol: String, qVecCol: String,
                            k: Int, qCap: Int = 10000): DataFrame = {
    val g = readGeometry(spark, path)
    require(!g.residual,
      s"the corpus at $path holds RESIDUAL codes — serve it through " +
        "annTopKIvfPqBatch (scores need the per-cell centroid term)")
    val root = resolveRoot(spark, path)
    annTopKPqBatch(
      spark.read.parquet(s"$root/encoded").select(col(idCol),
        col("codes"), col("norm")),
      idCol, spark.read.parquet(s"$root/codebooks"), queries, qIdCol,
      qVecCol, g.dim, g.m, k, nCodesKnown = Some(g.codes), qCap = qCap)
  }

  /** Recall@k of the PERSISTED IVF+PQ serving path vs exact brute
    * force — unlike [[recallReport]] (flat ADC: quantization error
    * only), this prices the full serving stack: probe-cell misses AND
    * code quantization together, at the `nprobe` the corpus actually
    * serves with. Same sampled-queries contract and pooled Σhits/Σk
    * mean as every sibling instrument. */
  def ivfPqRecallReport(embeddings: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, qIdCol: String,
                        qVecCol: String, path: String, k: Int,
                        nprobe: Int = 2): DataFrame = {
    val ann = annTopKIvfPqBatch(embeddings.sparkSession, path, idCol,
        queries, qIdCol, qVecCol, k, nprobe)
      .select(col("query_id"), col(idCol).as("cand_id"),
        lit(1L).as("__hit__"))
    Similarity.recallFromCandidates(embeddings, queries, idCol, vecCol,
      qIdCol, qVecCol, k, ann)
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
