package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.Similarity
import QHelp._

/** Embedding similarity oracle queries. The DuckDB oracle reproduces the
  * exact-decimal dot products (per-element IEEE double products, decimal
  * accumulation), so cosine scores and LSH buckets compare bit-for-bit. */
object QueriesEmbed {

  /** zipped-unnest dot/norm products of every vector against the
    * vec_id=0 query vector. Shared with QueriesText's hybrid-fusion
    * oracle (one definition of the exact-cosine spine). */
  private[graft] val dotCtes =
    """q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |zipped AS (
      |  SELECT e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
      |  FROM embeddings e, q),
      |dots AS (
      |  SELECT vec_id,
      |    sum(CAST(CAST(a AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
      |    sum(CAST(CAST(a AS DOUBLE) * CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na
      |  FROM zipped GROUP BY vec_id),
      |qn AS (
      |  SELECT sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(25,12))) AS nq
      |  FROM (SELECT unnest(qv) AS x FROM q)),
      |cosines AS (
      |  SELECT vec_id,
      |    CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) AS cos
      |  FROM dots, qn WHERE vec_id <> 0)""".stripMargin

  /** hyperplane-LSH bucket of every vector (8 integer-hash hyperplanes,
    * exact-decimal dot accumulation). */
  private val bucketCtes =
    """flat AS (
      |  SELECT vec_id, j,
      |    CAST(embedding[i+1] AS DOUBLE)
      |      * CAST((j*64 + i) * 2654435761 % 4294967296 - 2147483648 AS DOUBLE) AS p
      |  FROM embeddings, range(0, 8) rj(j), range(0, 64) ri(i)),
      |pdots AS (
      |  SELECT vec_id, j, sum(CAST(p AS DECIMAL(30,12))) AS d
      |  FROM flat GROUP BY vec_id, j),
      |buckets AS (
      |  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM pdots GROUP BY vec_id)""".stripMargin

  def register(r: QueryRegistry): Unit = {

    // scale 12, not 18: the double→decimal cast of a float32² is exact
    // only while the scaled value's tie pattern can't occur — at 18 the
    // engines' rounding modes diverged on real data (r2 local run).
    r.reg("q_embed_norm",
      """SELECT vec_id,
        |  CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE) AS norm2
        |FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          // sum of 64 float32² at scale 12: unscaled ≲ 6.4e13 < 2^53, so
          // the final decimal→double conversion is the same nearest double
          // on both engines (raw DECIMAL outputs fail the driver hash, r2)
          Similarity.dotExact(col("embedding"), col("embedding"), 12)
            .cast(DoubleType).as("norm2"))
        .orderBy("vec_id")
    }

    // Per-label centroids: decimal per-dimension sums (order-independent),
    // result round-trips through the API's array re-assembly and is
    // posexploded back so element order is checked too. vec_id < 2000
    // bounds the per-dim sum unscaled value at any SF (exactDouble's 2^53
    // window at scale 12 allows |sum| < 9007). The VARCHAR-mediated cast
    // matters: DuckDB's direct double→decimal rounds the BINARY value,
    // Spark rounds the shortest string repr (BigDecimal.valueOf) — raw
    // widened floats land in the divergence window ~1 in 10^5 (measured:
    // 1 element at sf0.01); casting through VARCHAR makes DuckDB round
    // the same shortest repr. (Float×float PRODUCTS are exact 48-bit
    // doubles — the existing product oracles never diverge.)
    r.reg("q_embed_centroid",
      """WITH ex AS (
        |  SELECT label, unnest(range(1, len(embedding)+1)) AS pos1, unnest(embedding) AS v
        |  FROM embeddings WHERE vec_id < 2000
        |)
        |SELECT label, CAST(pos1 - 1 AS INTEGER) AS pos,
        |  CAST(sum(CAST(CAST(CAST(CAST(v AS DOUBLE) AS VARCHAR) AS DECIMAL(28,12)) AS DECIMAL(28,12))) AS DOUBLE)
        |    / count(*) AS cmean
        |FROM ex GROUP BY label, pos1 ORDER BY label, pos""".stripMargin) { (s, dir) =>
      Similarity.groupCentroids(
          t(s, dir, "embeddings").filter(col("vec_id") < 2000),
          "label", "embedding")
        .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "cmean")))
        .orderBy("label", "pos")
    }

    // int8 scalar quantization: scale and every quantized element are
    // hash-checked; floor(x/s + 0.5) is the explicit half-up both
    // engines compute identically (round() ties differ per engine).
    // Quantized values are emitted as INTEGER — the driver's canonical
    // hash is dtype-sensitive and DuckDB lists don't carry TINYINT
    // through unnest uniformly.
    r.reg("q_embed_quantize",
      """WITH s AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT e.vec_id, s.scale,
        |    list_transform(e.embedding, x ->
        |      CASE WHEN s.scale = 0 THEN 0
        |           ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS INTEGER) END) AS qv
        |  FROM embeddings e JOIN s USING (vec_id))
        |SELECT vec_id, scale,
        |  CAST(unnest(range(0, len(qv))) AS INTEGER) AS pos,
        |  CAST(unnest(qv) AS INTEGER) AS qval
        |FROM q WHERE vec_id < 100 ORDER BY vec_id, pos""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"),
          Similarity.quantizeInt8(col("embedding")).as("__z__"))
        .select(col("vec_id"), col("__z__").getField("scale").as("scale"),
          posexplode(col("__z__").getField("q")).as(Seq("pos", "qv")))
        .select(col("vec_id"), col("scale"), col("pos"),
          col("qv").cast(IntegerType).as("qval"))
        .orderBy("vec_id", "pos")
    }

    r.reg("q_cosine_topk",
      s"""WITH $dotCtes
         |SELECT vec_id, cos FROM cosines
         |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }

    r.reg("q_ann_buckets",
      s"""WITH $bucketCtes
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n
         |FROM buckets GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      Similarity.bucketHistogram(t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, planes = 8)
    }

    // ext = embeddings plus planted copies (vec_id+10000) so the
    // near-dup check is non-vacuous: random vectors share no bucket-
    // candidate with cosine >= 0.9 (probed: max candidate cos < 0.5).
    r.reg("q_embed_dedup",
      """WITH ext AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
        |),
        |flat AS (
        |  SELECT vec_id, j,
        |    CAST(embedding[i+1] AS DOUBLE)
        |      * CAST((j*64 + i) * 2654435761 % 4294967296 - 2147483648 AS DOUBLE) AS p
        |  FROM ext, range(0, 8) rj(j), range(0, 64) ri(i)),
        |pdots AS (
        |  SELECT vec_id, j, sum(CAST(p AS DECIMAL(30,12))) AS d
        |  FROM flat GROUP BY vec_id, j),
        |buckets AS (
        |  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pdots GROUP BY vec_id),
        |cand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |pz AS (
        |  SELECT c.id_a, c.id_b, unnest(ea.embedding) AS a, unnest(eb.embedding) AS b
        |  FROM cand c JOIN ext ea ON ea.vec_id = c.id_a JOIN ext eb ON eb.vec_id = c.id_b),
        |pd AS (
        |  SELECT id_a, id_b,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM pz GROUP BY id_a, id_b)
        |SELECT id_a, id_b,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos
        |FROM pd
        |WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val ext = e.union(
        e.filter(col("vec_id") % 5 === 0)
          .withColumn("vec_id", col("vec_id") + 10000))
        .select("vec_id", "embedding")
      graft.llm.Dedup.embeddingNearDupPairs(ext, "vec_id", "embedding",
          dim = 64, threshold = 0.9)
        .orderBy("id_a", "id_b")
    }

    // SEMANTIC decontamination (r14): the embedding-route contamination
    // report — EXACT full corpus-vs-benchmark cosine (no LSH/IVF
    // candidate loss: a decontam miss is a silent eval leak). The
    // planted benchmark is exact copies (vec_id%97=0 → bench_id+20000)
    // plus 2×-SCALED copies (vec_id%89=1 → bench_id+30000 — doubling a
    // float only bumps the exponent, so both engines hold identical
    // vectors and cosine's scale-invariance is value-checked, not
    // assumed); iid-random non-copies stay far below 0.9 (max |cos| ~
    // 0.5 at these pair counts). The oracle brute-forces every pair
    // with the q_embed_dedup decimal-dot discipline, so the SCORES
    // hash bit-for-bit.
    r.reg("q_semantic_decontam",
      """WITH bench AS (
        |  SELECT vec_id + 20000 AS bench_id, embedding
        |  FROM embeddings WHERE vec_id % 97 = 0
        |  UNION ALL
        |  SELECT vec_id + 30000 AS bench_id,
        |    list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * 2 AS FLOAT)) AS embedding
        |  FROM embeddings WHERE vec_id % 89 = 1),
        |pz AS (
        |  SELECT c.vec_id, b.bench_id,
        |    unnest(c.embedding) AS a, unnest(b.embedding) AS bb
        |  FROM embeddings c, bench b),
        |pd AS (
        |  SELECT vec_id, bench_id,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(bb AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(bb AS DOUBLE)*CAST(bb AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM pz GROUP BY 1, 2)
        |SELECT vec_id, bench_id,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos
        |FROM pd
        |WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) >= 0.9
        |ORDER BY vec_id, bench_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val bench = e.filter(col("vec_id") % 97 === 0)
        .select((col("vec_id") + 20000).as("bench_id"), col("embedding"))
        .unionByName(e.filter(col("vec_id") % 89 === 1)
          .select((col("vec_id") + 30000).as("bench_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
      graft.llm.Dedup.semanticContaminationReport(
          e.select("vec_id", "embedding"), "vec_id", "embedding",
          bench, "bench_id", "embedding", threshold = 0.9)
        .orderBy("vec_id", "bench_id")
    }

    // The anti-join half of the semantic route (the q_decontam_clean
    // symmetry): corpus minus every vec with a >= 0.9 benchmark hit.
    r.reg("q_semantic_clean",
      """WITH bench AS (
        |  SELECT vec_id + 20000 AS bench_id, embedding
        |  FROM embeddings WHERE vec_id % 97 = 0
        |  UNION ALL
        |  SELECT vec_id + 30000 AS bench_id,
        |    list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * 2 AS FLOAT)) AS embedding
        |  FROM embeddings WHERE vec_id % 89 = 1),
        |pz AS (
        |  SELECT c.vec_id, b.bench_id,
        |    unnest(c.embedding) AS a, unnest(b.embedding) AS bb
        |  FROM embeddings c, bench b),
        |pd AS (
        |  SELECT vec_id, bench_id,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(bb AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(bb AS DOUBLE)*CAST(bb AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM pz GROUP BY 1, 2),
        |hits AS (
        |  SELECT DISTINCT vec_id FROM pd
        |  WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) >= 0.9)
        |SELECT e.vec_id FROM embeddings e
        |WHERE e.vec_id NOT IN (SELECT vec_id FROM hits)
        |ORDER BY e.vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val bench = e.filter(col("vec_id") % 97 === 0)
        .select((col("vec_id") + 20000).as("bench_id"), col("embedding"))
        .unionByName(e.filter(col("vec_id") % 89 === 1)
          .select((col("vec_id") + 30000).as("bench_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
      graft.llm.Dedup.semanticDecontaminate(
          e.select("vec_id", "embedding"), "vec_id", "embedding",
          bench, "bench_id", "embedding", threshold = 0.9)
        .select("vec_id")
        .orderBy("vec_id")
    }

    // SemDeDup (r14, Abbas et al. 2023): k-means CELLS as the semantic
    // candidate grouping, clustered on the L2-UNIT vectors (the paper's
    // normalized k-means — on the unit sphere L2 is monotone in cosine,
    // so direction-mates share cells regardless of magnitude). The
    // oracle replays the per-vector exact-decimal norm, the unit forms,
    // the iters=0 seeding (16 smallest id-hashes, the q_ivf_assign
    // construction), the first-strict-improvement argmin assignment,
    // the within-cell pair join, and the decimal-exact cosine verify
    // over planted copies (vec_id%5=0 → +10000).
    r.reg("q_semdedup",
      """WITH ext AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1500
        |  UNION ALL
        |  SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings
        |  WHERE vec_id < 1500 AND vec_id % 5 = 0),
        |nrm AS (
        |  SELECT vec_id,
        |    sqrt(CAST(sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE)
        |      AS DECIMAL(25,12))) AS DOUBLE)) AS nv
        |  FROM (SELECT vec_id, unnest(embedding) AS a FROM ext)
        |  GROUP BY vec_id),
        |un AS (
        |  SELECT e.vec_id,
        |    list_transform(e.embedding, x -> CAST(x AS DOUBLE) / n.nv) AS u
        |  FROM ext e JOIN nrm n USING (vec_id) WHERE n.nv > 0),
        |hs AS (SELECT vec_id, u,
        |        ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |       FROM un),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    u AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 16),
        |dists AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.u)+1),
        |      i -> (e.u[i] - s.centroid[i]) * (e.u[i] - s.centroid[i]))) AS d
        |  FROM un e, seeds s),
        |asg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |    FROM dists) WHERE rn = 1),
        |cand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id),
        |pz AS (
        |  SELECT c.id_a, c.id_b, unnest(ea.embedding) AS a, unnest(eb.embedding) AS b
        |  FROM cand c JOIN ext ea ON ea.vec_id = c.id_a JOIN ext eb ON eb.vec_id = c.id_b),
        |pd AS (
        |  SELECT id_a, id_b,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM pz GROUP BY id_a, id_b)
        |SELECT id_a, id_b,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos
        |FROM pd
        |WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1500)
      val ext = e.union(
        e.filter(col("vec_id") % 5 === 0)
          .withColumn("vec_id", col("vec_id") + 10000))
        .select("vec_id", "embedding")
      val unitized = ext.select(col("vec_id"),
          graft.llm.Similarity.unitVector(col("embedding")).as("embedding"))
        .filter(col("embedding").isNotNull)
      val cents = graft.llm.Ivf.train(unitized, "vec_id", "embedding",
        nCells = 16, iters = 0)
      graft.llm.Dedup.semDeDupPairs(ext, "vec_id", "embedding", cents,
          threshold = 0.9)
        .orderBy("id_a", "id_b")
    }

    // IVF top-k with iters=0: seed centroids are the 8 hash-smallest
    // sample vectors (sampling-invariant, so the oracle's full-corpus hs
    // CTE matches the 0.05-sample training scan), probe-cell selection
    // and the in-cell exact-cosine rank are plain SQL. The Lloyd-refined
    // path stays value-checked in WindowLlmSpec (subset-of-brute-force);
    // THIS entry hash-checks everything data-sized: assignment, probe
    // pruning, and the final rank. Was weak() rows-only through r7.
    val ivfTopkSql =
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    embedding AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 8),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |cdist AS (
        |  SELECT s.cell,
        |    list_sum(list_transform(range(1, len(s.centroid)+1),
        |      i -> (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
        |         * (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) AS d
        |  FROM seeds s, q),
        |probec AS (
        |  SELECT cell FROM (
        |    SELECT cell, row_number() OVER (ORDER BY d ASC, cell ASC) AS rn
        |    FROM cdist) WHERE rn <= 2),
        |dists AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM embeddings e, seeds s),
        |best AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |  FROM dists),
        |cand AS (
        |  SELECT b.vec_id FROM best b JOIN probec p USING (cell)
        |  WHERE b.rn = 1 AND b.vec_id <> 0),
        |zipped AS (
        |  SELECT e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |  FROM embeddings e JOIN cand c ON c.vec_id = e.vec_id, q),
        |dots AS (
        |  SELECT vec_id,
        |    sum(CAST(CAST(a AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE) * CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na
        |  FROM zipped GROUP BY vec_id),
        |qn AS (
        |  SELECT sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(25,12))) AS nq
        |  FROM (SELECT unnest(qv) AS x FROM q))
        |SELECT vec_id,
        |  CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) AS cos
        |FROM dots, qn
        |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin
    r.reg("q_ivf_topk", ivfTopkSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cents = graft.llm.Ivf.train(e, "vec_id", "embedding", nCells = 8, iters = 0)
      graft.llm.Ivf.annTopK(e, "vec_id", "embedding", cents, queryId = 0L,
        k = 10, nprobe = 2)
    }

    // Online retraining migration (r12): build the index on HALF the
    // corpus (its seeds differ from the full-corpus ones), append the
    // rest, then retrainIndex with iters=0/trainFraction=1 — the
    // migrated index must serve EXACTLY the canonical full-corpus
    // geometry, so the oracle is the same SQL as q_ivf_topk (seeds over
    // all vectors). This hash-checks the whole lifecycle: stale build,
    // replay-safe growth, re-train, re-assign, generation flip, search.
    r.reg("q_ivf_retrain", ivfTopkSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val idx = graft.QHelp.qtmpDir("ivfrt")
      org.apache.commons.io.FileUtils.deleteDirectory(idx)
      val path = idx.getAbsolutePath
      val half = e.filter(col("vec_id") < 250)
      val cents0 = graft.llm.Ivf.train(half, "vec_id", "embedding",
        nCells = 8, iters = 0)
      graft.llm.Ivf.writeIndex(half, "vec_id", "embedding", cents0, path)
      graft.llm.Ivf.appendToIndex(e.filter(col("vec_id") >= 250),
        "vec_id", "embedding", path)
      // the fixture carries a `label` column, so inference is ambiguous
      // by design — name the columns (the r13 explicit-params contract)
      graft.llm.Ivf.retrainIndex(s, path, nCells = 8, iters = 0,
        trainFraction = 1.0, idCol = Some("vec_id"),
        vecCol = Some("embedding"))
      graft.llm.Ivf.annTopKIndexed(e, "vec_id", "embedding", path,
        queryId = 0L, k = 10, nprobe = 2)
    }

    // Product-quantized ADC top-k (m=8 subspaces × 16 codes over dim 64,
    // iters=0 so the per-subspace codebooks are the SQL-reproducible
    // seed slices — the q_ivf_topk construction): the oracle recomputes
    // the full pipeline — codebook slicing, per-subspace argmin encode
    // (strict-improvement tie → lowest code ≡ row_number ORDER BY d, c),
    // exact decimal norms, per-query LUT dots, and the ordered ADC fold
    // (list_sum mirrors Spark's left fold) — so the 32×-compressed
    // approximate rank is hash-checked end to end.
    r.reg("q_pq_topk",
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS code,
        |    embedding
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 16),
        |cb AS (
        |  SELECT j, s.code AS c,
        |    list_transform(range(1, 9),
        |      i -> CAST(s.embedding[j*8 + i] AS DOUBLE)) AS cent
        |  FROM seeds s, range(0, 8) rj(j)),
        |dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9), i ->
        |      (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i])
        |      * (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i]))) AS d
        |  FROM embeddings e, cb WHERE e.vec_id <> 0),
        |codes AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |codelist AS (
        |  SELECT vec_id, list(c ORDER BY j) AS cl FROM codes GROUP BY vec_id),
        |norms AS (
        |  SELECT vec_id,
        |    sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |      AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings
        |        WHERE vec_id <> 0) GROUP BY vec_id),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |qn AS (
        |  SELECT CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |    AS DECIMAL(25,12))) AS DOUBLE) AS nq2
        |  FROM (SELECT unnest(qv) AS x FROM q)),
        |lutrows AS (
        |  SELECT cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9),
        |      i -> cb.cent[i] * CAST(q.qv[cb.j*8 + i] AS DOUBLE))) AS lv
        |  FROM cb, q),
        |lut AS (SELECT list(lv ORDER BY j, c) AS lt FROM lutrows)
        |SELECT cl.vec_id,
        |  list_sum(list_transform(range(0, 8), j -> lt[j*16 + cl.cl[j+1] + 1]))
        |    / (sqrt(qn.nq2) * norms.nrm) AS cos_adc
        |FROM codelist cl JOIN norms USING (vec_id), lut, qn
        |WHERE norms.nrm > 0 AND qn.nq2 > 0
        |ORDER BY cos_adc DESC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cbs = graft.llm.Pq.trainCodebooks(e, "vec_id", "embedding",
        dim = 64, m = 8, codes = 16, iters = 0)
      val enc = graft.llm.Pq.encode(e.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", cbs, 64, 8)
      graft.llm.Pq.annTopKPq(enc, "vec_id", cbs,
        e.filter(col("vec_id") === 0).select(col("embedding").as("qv")),
        dim = 64, m = 8, k = 10)
    }

    // FLAT-PQ ONLINE RETRAINING lifecycle (r13, the q_ivf_retrain
    // discipline): stale codebooks trained on HALF the corpus, the half
    // landed as a flat writePqCorpus serving corpus, then
    // retrainPqCorpus on the full corpus with iters=0/trainFraction=1 —
    // the migrated generation must serve EXACTLY the canonical
    // full-corpus geometry, so the oracle is the q_pq_topk SQL with
    // seeds drawn from the retrain population (vec_id <> 0: the corpus
    // the lifecycle actually re-encodes — the query row is not in it).
    // Hash-checks stale build → codebook retrain → wholesale re-encode
    // → generation flip → stamped serve.
    r.reg("q_pq_retrain",
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings WHERE vec_id <> 0),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS code,
        |    embedding
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 16),
        |cb AS (
        |  SELECT j, s.code AS c,
        |    list_transform(range(1, 9),
        |      i -> CAST(s.embedding[j*8 + i] AS DOUBLE)) AS cent
        |  FROM seeds s, range(0, 8) rj(j)),
        |dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9), i ->
        |      (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i])
        |      * (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i]))) AS d
        |  FROM embeddings e, cb WHERE e.vec_id <> 0),
        |codes AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |codelist AS (
        |  SELECT vec_id, list(c ORDER BY j) AS cl FROM codes GROUP BY vec_id),
        |norms AS (
        |  SELECT vec_id,
        |    sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |      AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings
        |        WHERE vec_id <> 0) GROUP BY vec_id),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |qn AS (
        |  SELECT CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |    AS DECIMAL(25,12))) AS DOUBLE) AS nq2
        |  FROM (SELECT unnest(qv) AS x FROM q)),
        |lutrows AS (
        |  SELECT cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9),
        |      i -> cb.cent[i] * CAST(q.qv[cb.j*8 + i] AS DOUBLE))) AS lv
        |  FROM cb, q),
        |lut AS (SELECT list(lv ORDER BY j, c) AS lt FROM lutrows)
        |SELECT cl.vec_id,
        |  list_sum(list_transform(range(0, 8), j -> lt[j*16 + cl.cl[j+1] + 1]))
        |    / (sqrt(qn.nq2) * norms.nrm) AS cos_adc
        |FROM codelist cl JOIN norms USING (vec_id), lut, qn
        |WHERE norms.nrm > 0 AND qn.nq2 > 0
        |ORDER BY cos_adc DESC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val corpus = e.filter(col("vec_id") =!= 0)
      val idx = graft.QHelp.qtmpDir("pqrt")
      org.apache.commons.io.FileUtils.deleteDirectory(idx)
      val path = idx.getAbsolutePath
      val half = corpus.filter(col("vec_id") < 250)
      val cbs0 = graft.llm.Pq.trainCodebooks(half, "vec_id", "embedding",
        dim = 64, m = 8, codes = 16, iters = 0)
      graft.llm.Pq.writePqCorpus(
        graft.llm.Pq.encode(half, "vec_id", "embedding", cbs0, 64, 8),
        cbs0, path, 64, 8)
      graft.llm.Pq.retrainPqCorpus(corpus, "vec_id", "embedding", path,
        iters = 0, trainFraction = 1.0)
      graft.llm.Pq.annTopKPqIndexed(s, path, "vec_id",
        e.filter(col("vec_id") === 0).select(col("embedding").as("qv")),
        k = 10)
    }

    // Combined IVF+PQ (the full FAISS-IVFPQ shape): coarse-quantizer
    // probe-cell membership (8 cells, nprobe=2 — the q_ivf_topk CTEs)
    // composed with PQ ADC ranking (the q_pq_topk CTEs) over the
    // candidates. The Spark side searches a PERSISTED cell-partitioned
    // encoded corpus — partition pruning × 32× compression — and the
    // oracle recomputes membership AND the approximate rank exactly.
    r.reg("q_ivfpq_topk",
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds8 AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    embedding AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 8),
        |seeds16 AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS code,
        |    embedding
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 16),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |cdist AS (
        |  SELECT s.cell,
        |    list_sum(list_transform(range(1, len(s.centroid)+1),
        |      i -> (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
        |         * (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) AS d
        |  FROM seeds8 s, q),
        |probec AS (
        |  SELECT cell FROM (
        |    SELECT cell, row_number() OVER (ORDER BY d ASC, cell ASC) AS rn
        |    FROM cdist) WHERE rn <= 2),
        |adists AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM embeddings e, seeds8 s),
        |best AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |  FROM adists),
        |cand AS (
        |  SELECT b.vec_id FROM best b JOIN probec p USING (cell) WHERE b.rn = 1),
        |cb AS (
        |  SELECT j, s.code AS c,
        |    list_transform(range(1, 9),
        |      i -> CAST(s.embedding[j*8 + i] AS DOUBLE)) AS cent
        |  FROM seeds16 s, range(0, 8) rj(j)),
        |dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9), i ->
        |      (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i])
        |      * (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i]))) AS d
        |  FROM embeddings e JOIN cand USING (vec_id), cb),
        |codes AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |codelist AS (
        |  SELECT vec_id, list(c ORDER BY j) AS cl FROM codes GROUP BY vec_id),
        |norms AS (
        |  SELECT vec_id,
        |    sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |      AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM (SELECT e.vec_id, unnest(e.embedding) AS x
        |        FROM embeddings e JOIN cand USING (vec_id))
        |  GROUP BY vec_id),
        |qn AS (
        |  SELECT CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |    AS DECIMAL(25,12))) AS DOUBLE) AS nq2
        |  FROM (SELECT unnest(qv) AS x FROM q)),
        |lutrows AS (
        |  SELECT cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9),
        |      i -> cb.cent[i] * CAST(q.qv[cb.j*8 + i] AS DOUBLE))) AS lv
        |  FROM cb, q),
        |lut AS (SELECT list(lv ORDER BY j, c) AS lt FROM lutrows)
        |SELECT cl.vec_id,
        |  list_sum(list_transform(range(0, 8), j -> lt[j*16 + cl.cl[j+1] + 1]))
        |    / (sqrt(qn.nq2) * norms.nrm) AS cos_adc
        |FROM codelist cl JOIN norms USING (vec_id), lut, qn
        |WHERE norms.nrm > 0 AND qn.nq2 > 0
        |ORDER BY cos_adc DESC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      // build-once-per-(JVM, sf dir) fixture (the q_ann_quantized_indexed
      // stamp pattern): the index is read-only for this query, so bench
      // passes time the SERVING shape — probe-cell resolve + pruned ADC
      // scan — not quantizer training and corpus encoding
      val qdir = graft.QHelp.qtmpDir("ivfpq")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir
      if (!fresh) {
        val cents = graft.llm.Ivf.train(e, "vec_id", "embedding",
          nCells = 8, iters = 0)
        val cbs = graft.llm.Pq.trainCodebooks(e, "vec_id", "embedding",
          dim = 64, m = 8, codes = 16, iters = 0)
        graft.llm.Pq.writeIvfPqCorpus(e, "vec_id", "embedding", cents,
          cbs, idxPath, dim = 64, m = 8)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      graft.llm.Pq.annTopKIvfPq(s, idxPath, "vec_id",
        e.filter(col("vec_id") === 0).select(col("embedding").as("qv")),
        k = 10, nprobe = 2)
    }

    // Embedding drift report: two corpus snapshots (old = vec_id % 3
    // <> 0, new = all) assign against the SAME iters=0 coarse quantizer
    // and compare per-cell occupancy — counts exact, fractions the
    // identical float op sequence both engines, every cell present via
    // the centroid spine.
    r.reg("q_embed_drift",
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds8 AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    embedding AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 8),
        |olds AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 <> 0),
        |od AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM olds e, seeds8 s),
        |oc AS (
        |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS old_n FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |    FROM od) WHERE rn = 1 GROUP BY cell),
        |nd AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM embeddings e, seeds8 s),
        |nc AS (
        |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS new_n FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |    FROM nd) WHERE rn = 1 GROUP BY cell),
        |j AS (
        |  SELECT s.cell,
        |    CAST(COALESCE(oc.old_n, 0) AS BIGINT) AS old_n,
        |    CAST(COALESCE(nc.new_n, 0) AS BIGINT) AS new_n
        |  FROM seeds8 s LEFT JOIN oc USING (cell) LEFT JOIN nc USING (cell)),
        |t AS (SELECT SUM(old_n) AS toto, SUM(new_n) AS totn FROM j)
        |SELECT CAST(cell AS INTEGER) AS cell, old_n, new_n,
        |  CAST(old_n AS DOUBLE)/CAST(toto AS DOUBLE) AS old_frac,
        |  CAST(new_n AS DOUBLE)/CAST(totn AS DOUBLE) AS new_frac,
        |  CAST(new_n AS DOUBLE)/CAST(totn AS DOUBLE)
        |    - CAST(old_n AS DOUBLE)/CAST(toto AS DOUBLE) AS delta
        |FROM j, t ORDER BY cell""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cents = graft.llm.Ivf.train(e, "vec_id", "embedding",
        nCells = 8, iters = 0)
      graft.llm.Ivf.cellDriftReport(
          e.filter(col("vec_id") % 3 =!= 0), e, "vec_id", "embedding",
          cents)
        .orderBy("cell")
    }

    // Batched IVF+PQ serving: every query in one job — per-query probe
    // cells, scan pruned to the distinct probe-cell union, each encoded
    // row paired only with the queries probing its cell, per-query ADC
    // rank. The oracle generalizes the q_ivfpq_topk CTEs per query id.
    r.reg("q_ivfpq_batch",
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds8 AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    embedding AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 8),
        |seeds16 AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS code,
        |    embedding
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 16),
        |qsel AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id % 50 = 0),
        |cdist AS (
        |  SELECT q.qid, s.cell,
        |    list_sum(list_transform(range(1, len(s.centroid)+1),
        |      i -> (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
        |         * (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) AS d
        |  FROM seeds8 s, qsel q),
        |probec AS (
        |  SELECT qid, cell FROM (
        |    SELECT qid, cell,
        |      row_number() OVER (PARTITION BY qid ORDER BY d ASC, cell ASC) AS rn
        |    FROM cdist) WHERE rn <= 2),
        |adists AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM embeddings e, seeds8 s),
        |cellof AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |    FROM adists) WHERE rn = 1),
        |cand AS (
        |  SELECT p.qid, c.vec_id FROM cellof c JOIN probec p USING (cell)
        |  WHERE c.vec_id <> p.qid),
        |cb AS (
        |  SELECT j, s.code AS c,
        |    list_transform(range(1, 9),
        |      i -> CAST(s.embedding[j*8 + i] AS DOUBLE)) AS cent
        |  FROM seeds16 s, range(0, 8) rj(j)),
        |dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9), i ->
        |      (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i])
        |      * (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i]))) AS d
        |  FROM embeddings e, cb),
        |codes AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |codelist AS (
        |  SELECT vec_id, list(c ORDER BY j) AS cl FROM codes GROUP BY vec_id),
        |norms AS (
        |  SELECT vec_id,
        |    sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |      AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        |  GROUP BY vec_id),
        |qn AS (
        |  SELECT qid, CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |    AS DECIMAL(25,12))) AS DOUBLE) AS nq2
        |  FROM (SELECT qid, unnest(qv) AS x FROM qsel) GROUP BY qid),
        |lutrows AS (
        |  SELECT q.qid, cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9),
        |      i -> cb.cent[i] * CAST(q.qv[cb.j*8 + i] AS DOUBLE))) AS lv
        |  FROM cb, qsel q),
        |lut AS (SELECT qid, list(lv ORDER BY j, c) AS lt
        |        FROM lutrows GROUP BY qid),
        |scored AS (
        |  SELECT cd.qid, cd.vec_id,
        |    list_sum(list_transform(range(0, 8),
        |      j -> l.lt[j*16 + cl.cl[j+1] + 1]))
        |      / (sqrt(qn.nq2) * n.nrm) AS s
        |  FROM cand cd
        |  JOIN codelist cl ON cl.vec_id = cd.vec_id
        |  JOIN norms n ON n.vec_id = cd.vec_id
        |  JOIN lut l ON l.qid = cd.qid
        |  JOIN qn ON qn.qid = cd.qid
        |  WHERE n.nrm > 0 AND qn.nq2 > 0)
        |SELECT qid AS query_id, vec_id, s AS cos_adc FROM (
        |  SELECT qid, vec_id, s,
        |    row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id ASC) AS rn
        |  FROM scored) WHERE rn <= 5
        |ORDER BY query_id, cos_adc DESC, vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      // shares the q_ivfpq_topk fixture (same geometry, same stamp dir)
      val qdir = graft.QHelp.qtmpDir("ivfpq")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir
      if (!fresh) {
        val cents = graft.llm.Ivf.train(e, "vec_id", "embedding",
          nCells = 8, iters = 0)
        val cbs = graft.llm.Pq.trainCodebooks(e, "vec_id", "embedding",
          dim = 64, m = 8, codes = 16, iters = 0)
        graft.llm.Pq.writeIvfPqCorpus(e, "vec_id", "embedding", cents,
          cbs, idxPath, dim = 64, m = 8)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      graft.llm.Pq.annTopKIvfPqBatch(s, idxPath, "vec_id",
          e.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding"),
          "vec_id", "embedding", k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("cos_adc").desc, col("vec_id"))
    }

    // Recall@5 of the persisted IVF+PQ serving path — probe misses AND
    // quantization error priced together at the serving nprobe
    // (completes the instrument family for the new tier): the ann side
    // is q_ivfpq_batch's per-query rank, the exact side and pooled
    // mean are the shared harness shapes.
    val ivfpqRecallSql =
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds8 AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    embedding AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 8),
        |seeds16 AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS code,
        |    embedding
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 16),
        |qsel AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id % 50 = 0),
        |cdist AS (
        |  SELECT q.qid, s.cell,
        |    list_sum(list_transform(range(1, len(s.centroid)+1),
        |      i -> (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
        |         * (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) AS d
        |  FROM seeds8 s, qsel q),
        |probec AS (
        |  SELECT qid, cell FROM (
        |    SELECT qid, cell,
        |      row_number() OVER (PARTITION BY qid ORDER BY d ASC, cell ASC) AS rn
        |    FROM cdist) WHERE rn <= 2),
        |adists AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM embeddings e, seeds8 s),
        |cellof AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |    FROM adists) WHERE rn = 1),
        |cand AS (
        |  SELECT p.qid, c.vec_id FROM cellof c JOIN probec p USING (cell)
        |  WHERE c.vec_id <> p.qid),
        |cb AS (
        |  SELECT j, s.code AS c,
        |    list_transform(range(1, 9),
        |      i -> CAST(s.embedding[j*8 + i] AS DOUBLE)) AS cent
        |  FROM seeds16 s, range(0, 8) rj(j)),
        |dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9), i ->
        |      (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i])
        |      * (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i]))) AS d
        |  FROM embeddings e, cb),
        |codes AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |codelist AS (
        |  SELECT vec_id, list(c ORDER BY j) AS cl FROM codes GROUP BY vec_id),
        |norms AS (
        |  SELECT vec_id,
        |    sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |      AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        |  GROUP BY vec_id),
        |qn AS (
        |  SELECT qid, CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |    AS DECIMAL(25,12))) AS DOUBLE) AS nq2
        |  FROM (SELECT qid, unnest(qv) AS x FROM qsel) GROUP BY qid),
        |lutrows AS (
        |  SELECT q.qid, cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9),
        |      i -> cb.cent[i] * CAST(q.qv[cb.j*8 + i] AS DOUBLE))) AS lv
        |  FROM cb, qsel q),
        |lut AS (SELECT qid, list(lv ORDER BY j, c) AS lt
        |        FROM lutrows GROUP BY qid),
        |scored AS (
        |  SELECT cd.qid, cd.vec_id,
        |    list_sum(list_transform(range(0, 8),
        |      j -> l.lt[j*16 + cl.cl[j+1] + 1]))
        |      / (sqrt(qn.nq2) * n.nrm) AS s
        |  FROM cand cd
        |  JOIN codelist cl ON cl.vec_id = cd.vec_id
        |  JOIN norms n ON n.vec_id = cd.vec_id
        |  JOIN lut l ON l.qid = cd.qid
        |  JOIN qn ON qn.qid = cd.qid
        |  WHERE n.nrm > 0 AND qn.nq2 > 0),
        |ann AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id ASC) AS rn
        |    FROM scored) WHERE rn <= 5),
        |bz AS (
        |  SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |  FROM embeddings e, qsel q WHERE e.vec_id <> q.qid),
        |bd AS (
        |  SELECT qid, vec_id,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM bz GROUP BY qid, vec_id),
        |exact AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid ORDER BY
        |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
        |        vec_id ASC) AS rn
        |    FROM bd) WHERE rn <= 5),
        |hits AS (
        |  SELECT e.qid,
        |    CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |    CAST(count(*) AS BIGINT) AS exact_k
        |  FROM exact e LEFT JOIN ann a ON a.qid = e.qid AND a.vec_id = e.vec_id
        |  GROUP BY e.qid),
        |m AS (
        |  SELECT CAST(sum(hits) AS DOUBLE)/CAST(sum(exact_k) AS DOUBLE) AS mean_recall
        |  FROM hits)
        |SELECT qid AS query_id, hits, exact_k,
        |  CAST(hits AS DOUBLE)/CAST(exact_k AS DOUBLE) AS recall, m.mean_recall
        |FROM hits, m ORDER BY query_id""".stripMargin
    r.reg("q_ivfpq_recall", ivfpqRecallSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      // shares the q_ivfpq_topk/q_ivfpq_batch fixture
      val qdir = graft.QHelp.qtmpDir("ivfpq")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir
      if (!fresh) {
        val cents = graft.llm.Ivf.train(e, "vec_id", "embedding",
          nCells = 8, iters = 0)
        val cbs = graft.llm.Pq.trainCodebooks(e, "vec_id", "embedding",
          dim = 64, m = 8, codes = 16, iters = 0)
        graft.llm.Pq.writeIvfPqCorpus(e, "vec_id", "embedding", cents,
          cbs, idxPath, dim = 64, m = 8)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      graft.llm.Pq.ivfPqRecallReport(e,
          e.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding"),
          "vec_id", "embedding", "vec_id", "embedding", idxPath, k = 5,
          nprobe = 2)
        .orderBy("query_id")
    }

    // RESIDUAL IVF+PQ (the accuracy-correct FAISS recipe): codes encode
    // x − centroid(cell(x)), search adds the exact query·centroid term
    // back per probe cell. The oracle recomputes cell assignment, the
    // per-vector residuals, the residual codebook (seed-slice residuals
    // at iters=0), the argmin encode, per-cell constants, LUT dots and
    // the ordered fold — the full residual pipeline, hash-checked.
    r.reg("q_ivfpq_residual",
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds8 AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    embedding AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 8),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |adists AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM embeddings e, seeds8 s),
        |cellof AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |    FROM adists) WHERE rn = 1),
        |resv AS (
        |  SELECT e.vec_id,
        |    list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)) AS res
        |  FROM embeddings e JOIN cellof c ON c.vec_id = e.vec_id
        |                    JOIN seeds8 s ON s.cell = c.cell),
        |rseeds AS (
        |  SELECT row_number() OVER (ORDER BY h.h ASC, h.vec_id ASC) - 1 AS code,
        |    r.res
        |  FROM resv r JOIN hs h USING (vec_id)
        |  ORDER BY h.h ASC, h.vec_id ASC LIMIT 16),
        |cbr AS (
        |  SELECT j, rs.code AS c,
        |    list_transform(range(1, 9), i -> rs.res[j*8 + i]) AS cent
        |  FROM rseeds rs, range(0, 8) rj(j)),
        |dist AS (
        |  SELECT r.vec_id, cbr.j, cbr.c,
        |    list_sum(list_transform(range(1, 9), i ->
        |      (r.res[cbr.j*8 + i] - cbr.cent[i])
        |      * (r.res[cbr.j*8 + i] - cbr.cent[i]))) AS d
        |  FROM resv r, cbr),
        |codes AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |codelist AS (
        |  SELECT vec_id, list(c ORDER BY j) AS cl FROM codes GROUP BY vec_id),
        |norms AS (
        |  SELECT vec_id,
        |    sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |      AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        |  GROUP BY vec_id),
        |qn AS (
        |  SELECT CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |    AS DECIMAL(25,12))) AS DOUBLE) AS nq2
        |  FROM (SELECT unnest(qv) AS x FROM q)),
        |cdist AS (
        |  SELECT s.cell,
        |    list_sum(list_transform(range(1, len(s.centroid)+1),
        |      i -> (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
        |         * (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) AS d
        |  FROM seeds8 s, q),
        |probec AS (
        |  SELECT cell FROM (
        |    SELECT cell, row_number() OVER (ORDER BY d ASC, cell ASC) AS rn
        |    FROM cdist) WHERE rn <= 2),
        |qc AS (
        |  SELECT s.cell,
        |    list_sum(list_transform(range(1, len(s.centroid)+1),
        |      i -> CAST(s.centroid[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) AS qcv
        |  FROM seeds8 s JOIN probec USING (cell), q),
        |lutrows AS (
        |  SELECT cbr.j, cbr.c,
        |    list_sum(list_transform(range(1, 9),
        |      i -> cbr.cent[i] * CAST(q.qv[cbr.j*8 + i] AS DOUBLE))) AS lv
        |  FROM cbr, q),
        |lut AS (SELECT list(lv ORDER BY j, c) AS lt FROM lutrows)
        |SELECT cl.vec_id,
        |  (qc.qcv + list_sum(list_transform(range(0, 8),
        |     j -> lt[j*16 + cl.cl[j+1] + 1])))
        |    / (sqrt(qn.nq2) * norms.nrm) AS cos_adc
        |FROM codelist cl
        |JOIN cellof co USING (vec_id)
        |JOIN qc ON qc.cell = co.cell
        |JOIN norms USING (vec_id), lut, qn
        |WHERE norms.nrm > 0 AND qn.nq2 > 0
        |ORDER BY cos_adc DESC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val qdir = graft.QHelp.qtmpDir("ivfpqr")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir
      if (!fresh) {
        val cents = graft.llm.Ivf.train(e, "vec_id", "embedding",
          nCells = 8, iters = 0)
        val cbr = graft.llm.Pq.trainResidualCodebooks(e, "vec_id",
          "embedding", cents, dim = 64, m = 8, codes = 16, iters = 0)
        graft.llm.Pq.writeIvfPqCorpus(e, "vec_id", "embedding", cents,
          cbr, idxPath, dim = 64, m = 8, residual = true)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      graft.llm.Pq.annTopKIvfPq(s, idxPath, "vec_id",
        e.filter(col("vec_id") === 0).select(col("embedding").as("qv")),
        k = 10, nprobe = 2)
    }

    // PQ recall@5 vs exact brute force — the instrument that prices the
    // 32× compression (family sibling of q_ann_recall / q_ivf_recall /
    // q_quantized_recall): the ann side is the full batched ADC rank
    // recomputed per query id from the q_pq_topk CTEs, the exact side
    // and pooled Σhits/Σk mean are the shared harness shapes.
    val pqRecallSql =
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS code,
        |    embedding
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 16),
        |cb AS (
        |  SELECT j, s.code AS c,
        |    list_transform(range(1, 9),
        |      i -> CAST(s.embedding[j*8 + i] AS DOUBLE)) AS cent
        |  FROM seeds s, range(0, 8) rj(j)),
        |dist AS (
        |  SELECT e.vec_id, cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9), i ->
        |      (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i])
        |      * (CAST(e.embedding[cb.j*8 + i] AS DOUBLE) - cb.cent[i]))) AS d
        |  FROM embeddings e, cb),
        |codes AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        |    FROM dist) WHERE rn = 1),
        |codelist AS (
        |  SELECT vec_id, list(c ORDER BY j) AS cl FROM codes GROUP BY vec_id),
        |norms AS (
        |  SELECT vec_id,
        |    sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |      AS DECIMAL(25,12))) AS DOUBLE)) AS nrm
        |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        |  GROUP BY vec_id),
        |qsel AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id % 25 = 0),
        |qn AS (
        |  SELECT qid, CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |    AS DECIMAL(25,12))) AS DOUBLE) AS nq2
        |  FROM (SELECT qid, unnest(qv) AS x FROM qsel) GROUP BY qid),
        |lutrows AS (
        |  SELECT q.qid, cb.j, cb.c,
        |    list_sum(list_transform(range(1, 9),
        |      i -> cb.cent[i] * CAST(q.qv[cb.j*8 + i] AS DOUBLE))) AS lv
        |  FROM cb, qsel q),
        |lut AS (SELECT qid, list(lv ORDER BY j, c) AS lt
        |        FROM lutrows GROUP BY qid),
        |adc AS (
        |  SELECT l.qid, cl.vec_id,
        |    list_sum(list_transform(range(0, 8), j -> l.lt[j*16 + cl.cl[j+1] + 1]))
        |      / (sqrt(qn.nq2) * n.nrm) AS s
        |  FROM codelist cl JOIN norms n USING (vec_id), lut l JOIN qn USING (qid)
        |  WHERE cl.vec_id <> l.qid AND n.nrm > 0 AND qn.nq2 > 0),
        |ann AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id ASC) AS rn
        |    FROM adc) WHERE rn <= 5),
        |bz AS (
        |  SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |  FROM embeddings e, qsel q WHERE e.vec_id <> q.qid),
        |bd AS (
        |  SELECT qid, vec_id,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM bz GROUP BY qid, vec_id),
        |exact AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid ORDER BY
        |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
        |        vec_id ASC) AS rn
        |    FROM bd) WHERE rn <= 5),
        |hits AS (
        |  SELECT e.qid,
        |    CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |    CAST(count(*) AS BIGINT) AS exact_k
        |  FROM exact e LEFT JOIN ann a ON a.qid = e.qid AND a.vec_id = e.vec_id
        |  GROUP BY e.qid),
        |m AS (
        |  SELECT CAST(sum(hits) AS DOUBLE)/CAST(sum(exact_k) AS DOUBLE) AS mean_recall
        |  FROM hits)
        |SELECT qid AS query_id, hits, exact_k,
        |  CAST(hits AS DOUBLE)/CAST(exact_k AS DOUBLE) AS recall, m.mean_recall
        |FROM hits, m ORDER BY query_id""".stripMargin
    r.reg("q_pq_recall", pqRecallSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 25 === 0).select("vec_id", "embedding")
      val cbs = graft.llm.Pq.trainCodebooks(e, "vec_id", "embedding",
        dim = 64, m = 8, codes = 16, iters = 0)
      graft.llm.Pq.recallReport(e, q, "vec_id", "embedding", "vec_id",
          "embedding", cbs, dim = 64, m = 8, k = 5)
        .orderBy("query_id")
    }

    // Batched IVF ANN: 20 query vectors in ONE job — per-query probe-cell
    // rank over the broadcast seeds, blockwise corpus assignment, one
    // cell equi-join, per-query top-k. Same iters=0 SQL-expressible seeds
    // as q_ivf_topk; the oracle generalizes its CTEs per query id.
    r.reg("q_ivf_batch",
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    embedding AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 8),
        |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |       WHERE vec_id % 25 = 0),
        |cdist AS (
        |  SELECT q.qid, s.cell,
        |    list_sum(list_transform(range(1, len(s.centroid)+1),
        |      i -> (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
        |         * (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) AS d
        |  FROM seeds s, qs q),
        |probec AS (
        |  SELECT qid, cell FROM (
        |    SELECT qid, cell,
        |      row_number() OVER (PARTITION BY qid ORDER BY d ASC, cell ASC) AS rn
        |    FROM cdist) WHERE rn <= 2),
        |dists AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM embeddings e, seeds s),
        |best AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |  FROM dists),
        |cand AS (
        |  SELECT p.qid, b.vec_id, q.qv
        |  FROM best b JOIN probec p USING (cell) JOIN qs q ON q.qid = p.qid
        |  WHERE b.rn = 1 AND b.vec_id <> p.qid),
        |pz AS (
        |  SELECT c.qid, c.vec_id, unnest(e.embedding) AS a, unnest(c.qv) AS b
        |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id),
        |pd AS (
        |  SELECT qid, vec_id,
        |    sum(CAST(CAST(a AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE) * CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(b AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM pz GROUP BY qid, vec_id),
        |scored AS (
        |  SELECT qid, vec_id,
        |    CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
        |      vec_id ASC) AS rn
        |  FROM pd)
        |SELECT qid AS query_id, vec_id, cos FROM scored WHERE rn <= 3
        |ORDER BY query_id, vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cents = graft.llm.Ivf.train(e, "vec_id", "embedding", nCells = 8, iters = 0)
      val q = e.filter(col("vec_id") % 25 === 0).select("vec_id", "embedding")
      graft.llm.Ivf.annTopKBatch(e, q, "vec_id", "embedding",
          "vec_id", "embedding", cents, k = 3, nprobe = 2)
        .orderBy("query_id", "vec_id")
    }

    // IVF recall@k vs brute force — the nCells/nprobe tuning instrument
    // (parity with q_ann_recall for the LSH family). Same iters=0
    // SQL-expressible seeds and probe machinery as q_ivf_batch (k=3,
    // nprobe=2, the 20-query vec_id%25 sample); the exact side is the
    // all-pairs cosine top-3, hits counted per query, mean_recall the
    // pooled Σhits/Σexact_k integer ratio.
    val ivfRecallSql =
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    embedding AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 8),
        |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |       WHERE vec_id % 25 = 0),
        |cdist AS (
        |  SELECT q.qid, s.cell,
        |    list_sum(list_transform(range(1, len(s.centroid)+1),
        |      i -> (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
        |         * (CAST(s.centroid[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) AS d
        |  FROM seeds s, qs q),
        |probec AS (
        |  SELECT qid, cell FROM (
        |    SELECT qid, cell,
        |      row_number() OVER (PARTITION BY qid ORDER BY d ASC, cell ASC) AS rn
        |    FROM cdist) WHERE rn <= 2),
        |dists AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM embeddings e, seeds s),
        |best AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |  FROM dists),
        |cand AS (
        |  SELECT p.qid, b.vec_id, q.qv
        |  FROM best b JOIN probec p USING (cell) JOIN qs q ON q.qid = p.qid
        |  WHERE b.rn = 1 AND b.vec_id <> p.qid),
        |pz AS (
        |  SELECT c.qid, c.vec_id, unnest(e.embedding) AS a, unnest(c.qv) AS b
        |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id),
        |pd AS (
        |  SELECT qid, vec_id,
        |    sum(CAST(CAST(a AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE) * CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(b AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM pz GROUP BY qid, vec_id),
        |ann AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid ORDER BY
        |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
        |        vec_id ASC) AS rn
        |    FROM pd) WHERE rn <= 3),
        |bz AS (
        |  SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |  FROM embeddings e, qs q WHERE e.vec_id <> q.qid),
        |bd AS (
        |  SELECT qid, vec_id,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM bz GROUP BY qid, vec_id),
        |exact AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid ORDER BY
        |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
        |        vec_id ASC) AS rn
        |    FROM bd) WHERE rn <= 3),
        |hits AS (
        |  SELECT e.qid,
        |    CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |    CAST(count(*) AS BIGINT) AS exact_k
        |  FROM exact e LEFT JOIN ann a ON a.qid = e.qid AND a.vec_id = e.vec_id
        |  GROUP BY e.qid),
        |m AS (
        |  SELECT CAST(sum(hits) AS DOUBLE)/CAST(sum(exact_k) AS DOUBLE) AS mean_recall
        |  FROM hits)
        |SELECT qid AS query_id, hits, exact_k,
        |  CAST(hits AS DOUBLE)/CAST(exact_k AS DOUBLE) AS recall, m.mean_recall
        |FROM hits, m ORDER BY query_id""".stripMargin
    r.reg("q_ivf_recall", ivfRecallSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cents = graft.llm.Ivf.train(e, "vec_id", "embedding", nCells = 8, iters = 0)
      val q = e.filter(col("vec_id") % 25 === 0).select("vec_id", "embedding")
      graft.llm.Ivf.recallReport(e, q, "vec_id", "embedding",
          "vec_id", "embedding", cents, k = 3, nprobe = 2)
        .orderBy("query_id")
    }

    // IVF coarse assignment with iters=0 (seed centroids = the 8 sample
    // vectors with the smallest Knuth id-hash): fully SQL-expressible, so
    // the blockwise argmin — the part of IVF that touches ALL data at
    // scale — is hash-checked even though Lloyd refinement cannot be.
    // Distances accumulate sequentially over the same element order on
    // both engines; ties resolve to the lowest cell (assign sorts its
    // centroid list, the oracle orders by d, cell).
    r.reg("q_ivf_assign",
      """WITH hs AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 2147483648) * 2654435761) % 4294967296 AS h
        |  FROM embeddings),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY h ASC, vec_id ASC) - 1 AS cell,
        |    embedding AS centroid
        |  FROM hs ORDER BY h ASC, vec_id ASC LIMIT 8),
        |dists AS (
        |  SELECT e.vec_id, s.cell,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.centroid[i] AS DOUBLE)))) AS d
        |  FROM embeddings e, seeds s),
        |best AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        |  FROM dists)
        |SELECT vec_id, CAST(cell AS INTEGER) AS cell FROM best WHERE rn = 1
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cents = graft.llm.Ivf.train(e, "vec_id", "embedding", nCells = 8, iters = 0)
      graft.llm.Ivf.assign(e, "vec_id", "embedding", cents)
        .select(col("vec_id"), col("cell"))
        .orderBy("vec_id")
    }

    r.reg("q_ann_topk",
      s"""WITH $bucketCtes,
         |qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
         |cand AS (
         |  SELECT b.vec_id FROM buckets b, qb
         |  WHERE b.bucket = qb.bucket AND b.vec_id <> 0),
         |$dotCtes
         |SELECT c.vec_id, c.cos FROM cosines c JOIN cand USING (vec_id)
         |ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin) { (s, dir) =>
      Similarity.annTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, queryId = 0L, k = 5, planes = 8)
    }

    // Batched ANN: 20 query vectors (vec_id % 25 = 0) against the whole
    // corpus in ONE job — probe-list explode, one bucket equi-join,
    // per-query row_number top-k. The oracle mirrors the probe union
    // (own bucket + 8 Hamming-1 flips) and the exact-decimal cosine;
    // candidate pairs are unique by construction (a corpus vector has
    // one bucket, a query's probe buckets are distinct) so UNION ALL on
    // the probe list is safe.
    r.reg("q_ann_batch",
      s"""WITH $bucketCtes,
         |qsel AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qv, b.bucket AS qb
         |  FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id
         |  WHERE e.vec_id % 25 = 0),
         |probes AS (
         |  SELECT qid, qv, qb AS bucket FROM qsel
         |  UNION ALL
         |  SELECT qid, qv, xor(qb, CAST(1 << j AS BIGINT)) AS bucket
         |  FROM qsel, range(0, 8) rj(j)),
         |cand AS (
         |  SELECT p.qid, b.vec_id, p.qv
         |  FROM buckets b JOIN probes p USING (bucket)
         |  WHERE b.vec_id <> p.qid),
         |pz AS (
         |  SELECT c.qid, c.vec_id, unnest(e.embedding) AS a, unnest(c.qv) AS b
         |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id),
         |pd AS (
         |  SELECT qid, vec_id,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
         |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
         |  FROM pz GROUP BY qid, vec_id),
         |scored AS (
         |  SELECT qid, vec_id,
         |    CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY
         |      CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
         |      vec_id ASC) AS rn
         |  FROM pd)
         |SELECT qid AS query_id, vec_id, cos FROM scored WHERE rn <= 3
         |ORDER BY query_id, vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 25 === 0).select("vec_id", "embedding")
      Similarity.annTopKBatch(e, q, "vec_id", "embedding", "vec_id", "embedding",
          dim = 64, k = 3, planes = 8, multiProbe = true)
        .orderBy("query_id", "vec_id")
    }

    // ANN recall@k vs brute force — the LSH tuning instrument. The same
    // 20-query sample as q_ann_batch, k=5: ANN candidates via the probed
    // bucket join, exact top-5 via all 20x500 cosines, hits counted per
    // query; mean_recall is the pooled sum(hits)/sum(exact_k) (a ratio
    // of exact integer sums — bit-stable where an IEEE mean of per-query
    // doubles is summation-order-dependent).
    val annRecallSql =
      s"""WITH $bucketCtes,
         |qsel AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qv, b.bucket AS qb
         |  FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id
         |  WHERE e.vec_id % 25 = 0),
         |probes AS (
         |  SELECT qid, qv, qb AS bucket FROM qsel
         |  UNION ALL
         |  SELECT qid, qv, xor(qb, CAST(1 << j AS BIGINT)) AS bucket
         |  FROM qsel, range(0, 8) rj(j)),
         |cand AS (
         |  SELECT p.qid, b.vec_id, p.qv
         |  FROM buckets b JOIN probes p USING (bucket)
         |  WHERE b.vec_id <> p.qid),
         |pz AS (
         |  SELECT c.qid, c.vec_id, unnest(e.embedding) AS a, unnest(c.qv) AS b
         |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id),
         |pd AS (
         |  SELECT qid, vec_id,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
         |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
         |  FROM pz GROUP BY qid, vec_id),
         |ann AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid ORDER BY
         |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
         |        vec_id ASC) AS rn
         |    FROM pd) WHERE rn <= 5),
         |bz AS (
         |  SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
         |  FROM embeddings e, qsel q WHERE e.vec_id <> q.qid),
         |bd AS (
         |  SELECT qid, vec_id,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
         |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
         |  FROM bz GROUP BY qid, vec_id),
         |exact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid ORDER BY
         |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
         |        vec_id ASC) AS rn
         |    FROM bd) WHERE rn <= 5),
         |hits AS (
         |  SELECT e.qid,
         |    CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |    CAST(count(*) AS BIGINT) AS exact_k
         |  FROM exact e LEFT JOIN ann a ON a.qid = e.qid AND a.vec_id = e.vec_id
         |  GROUP BY e.qid),
         |m AS (
         |  SELECT CAST(sum(hits) AS DOUBLE)/CAST(sum(exact_k) AS DOUBLE) AS mean_recall
         |  FROM hits)
         |SELECT qid AS query_id, hits, exact_k,
         |  CAST(hits AS DOUBLE)/CAST(exact_k AS DOUBLE) AS recall, m.mean_recall
         |FROM hits, m ORDER BY query_id""".stripMargin
    r.reg("q_ann_recall", annRecallSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 25 === 0).select("vec_id", "embedding")
      Similarity.recallReport(e, q, "vec_id", "embedding", "vec_id", "embedding",
          dim = 64, k = 5, planes = 8, multiProbe = true)
        .orderBy("query_id")
    }

    // Multi-probe: the query's bucket plus its 8 Hamming-1 neighbors
    // (one hyperplane sign flipped each) — recall strictly dominates
    // single-probe at the same plane count; the oracle mirrors the
    // probe-set union with xor.
    r.reg("q_ann_multiprobe",
      s"""WITH $bucketCtes,
         |qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
         |probes AS (
         |  SELECT bucket FROM qb
         |  UNION
         |  SELECT xor(qb.bucket, CAST(1 << j AS BIGINT)) AS bucket
         |  FROM qb, range(0, 8) rj(j)),
         |cand AS (
         |  SELECT DISTINCT b.vec_id FROM buckets b JOIN probes p USING (bucket)
         |  WHERE b.vec_id <> 0),
         |$dotCtes
         |SELECT c.vec_id, c.cos FROM cosines c JOIN cand USING (vec_id)
         |ORDER BY cos DESC, vec_id ASC LIMIT 8""".stripMargin) { (s, dir) =>
      Similarity.annTopKMultiProbe(t(s, dir, "embeddings"), "vec_id",
        "embedding", dim = 64, queryId = 0L, k = 8, planes = 8)
    }

    // Quantized brute-force top-k: the int8 corpus-scan ranker. The
    // quantized cosine is scale-free (per-vector scales cancel), so the
    // whole rank is integer dot products — exact in both engines — with
    // one IEEE division; the oracle replays quantization (floor(x/s +
    // 0.5), the q_embed_quantize recipe) and the integer sums.
    r.reg("q_ann_quantized",
      """WITH s AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings),
        |qv AS (
        |  SELECT e.vec_id,
        |    list_transform(e.embedding, x ->
        |      CASE WHEN s.scale = 0 THEN 0
        |           ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS BIGINT) END) AS q
        |  FROM embeddings e JOIN s USING (vec_id)),
        |qq AS (SELECT q FROM qv WHERE vec_id = 0),
        |z AS (
        |  SELECT a.vec_id, unnest(a.q) AS x, unnest(qq.q) AS y
        |  FROM qv a, qq WHERE a.vec_id <> 0),
        |d AS (
        |  SELECT vec_id, sum(x*y) AS dot, sum(x*x) AS na
        |  FROM z GROUP BY vec_id),
        |nq AS (SELECT sum(y*y) AS nqv FROM (SELECT unnest(q) AS y FROM qq))
        |SELECT vec_id,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nqv AS DOUBLE))) AS cos_q
        |FROM d, nq
        |WHERE na > 0 AND nqv > 0
        |ORDER BY cos_q DESC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
      Similarity.annTopKQuantized(t(s, dir, "embeddings"), "vec_id",
        "embedding", queryId = 0L, k = 10)
    }

    // Batched quantized retrieval — LSH buckets (raw vectors, so probe
    // sets match the exact batch) + int8 verify. The oracle replays the
    // bucket CTEs, the multi-probe union, quantization, and the
    // integer dots; per-query top-5 by the scale-free quantized cosine.
    r.reg("q_ann_quantized_batch",
      s"""WITH $bucketCtes,
         |s AS (
         |  SELECT vec_id,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
         |  FROM embeddings),
         |qv AS (
         |  SELECT e.vec_id,
         |    list_transform(e.embedding, x ->
         |      CASE WHEN s.scale = 0 THEN 0
         |           ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS BIGINT) END) AS q
         |  FROM embeddings e JOIN s USING (vec_id)),
         |qs AS (SELECT vec_id AS query_id, bucket FROM buckets WHERE vec_id % 50 = 0),
         |probes AS (
         |  SELECT query_id, bucket FROM qs
         |  UNION
         |  SELECT query_id, xor(bucket, CAST(1 << j AS BIGINT)) AS bucket
         |  FROM qs, range(0, 8) rj(j)),
         |cand AS (
         |  SELECT p.query_id, b.vec_id FROM buckets b JOIN probes p USING (bucket)
         |  WHERE b.vec_id <> p.query_id),
         |z AS (
         |  SELECT c.query_id, c.vec_id, unnest(a.q) AS x, unnest(qq.q) AS y
         |  FROM cand c JOIN qv a ON a.vec_id = c.vec_id
         |              JOIN qv qq ON qq.vec_id = c.query_id),
         |d AS (
         |  SELECT query_id, vec_id, sum(x*y) AS dot, sum(x*x) AS na
         |  FROM z GROUP BY query_id, vec_id),
         |nqs AS (
         |  SELECT vec_id AS query_id,
         |    list_sum(list_transform(q, v -> v*v)) AS nqv FROM qv),
         |ranked AS (
         |  SELECT query_id, vec_id,
         |    CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nqv AS DOUBLE))) AS cos_q
         |  FROM d JOIN nqs USING (query_id)
         |  WHERE na > 0 AND nqv > 0),
         |topk AS (
         |  SELECT query_id, vec_id, cos_q,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_q DESC, vec_id ASC) AS rn
         |  FROM ranked)
         |SELECT query_id, vec_id, cos_q FROM topk WHERE rn <= 5
         |ORDER BY query_id ASC, cos_q DESC, vec_id ASC""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding")
      Similarity.annTopKQuantizedBatch(e, q, "vec_id", "embedding",
          "vec_id", "embedding", dim = 64, k = 5, planes = 8)
        .orderBy(col("query_id").asc, col("cos_q").desc, col("vec_id").asc)
    }

    // Batched retrieval over the PERSISTED bucketed quantized corpus
    // (id, scale, q, bucket written at index time): the corpus side
    // reads only (id, bucket, q) — no float access at query time — and
    // must rank IDENTICALLY to q_ann_quantized_batch (same write-time
    // buckets, same int8 values), so the oracle is the same SQL. The
    // plan-level ReadSchema pruning is spec-asserted in EmbedIngestSpec.
    r.reg("q_ann_quantized_indexed",
      s"""WITH $bucketCtes,
         |s AS (
         |  SELECT vec_id,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
         |  FROM embeddings),
         |qv AS (
         |  SELECT e.vec_id,
         |    list_transform(e.embedding, x ->
         |      CASE WHEN s.scale = 0 THEN 0
         |           ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS BIGINT) END) AS q
         |  FROM embeddings e JOIN s USING (vec_id)),
         |qs AS (SELECT vec_id AS query_id, bucket FROM buckets WHERE vec_id % 50 = 0),
         |probes AS (
         |  SELECT query_id, bucket FROM qs
         |  UNION
         |  SELECT query_id, xor(bucket, CAST(1 << j AS BIGINT)) AS bucket
         |  FROM qs, range(0, 8) rj(j)),
         |cand AS (
         |  SELECT p.query_id, b.vec_id FROM buckets b JOIN probes p USING (bucket)
         |  WHERE b.vec_id <> p.query_id),
         |z AS (
         |  SELECT c.query_id, c.vec_id, unnest(a.q) AS x, unnest(qq.q) AS y
         |  FROM cand c JOIN qv a ON a.vec_id = c.vec_id
         |              JOIN qv qq ON qq.vec_id = c.query_id),
         |d AS (
         |  SELECT query_id, vec_id, sum(x*y) AS dot, sum(x*x) AS na
         |  FROM z GROUP BY query_id, vec_id),
         |nqs AS (
         |  SELECT vec_id AS query_id,
         |    list_sum(list_transform(q, v -> v*v)) AS nqv FROM qv),
         |ranked AS (
         |  SELECT query_id, vec_id,
         |    CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nqv AS DOUBLE))) AS cos_q
         |  FROM d JOIN nqs USING (query_id)
         |  WHERE na > 0 AND nqv > 0),
         |topk AS (
         |  SELECT query_id, vec_id, cos_q,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_q DESC, vec_id ASC) AS rn
         |  FROM ranked)
         |SELECT query_id, vec_id, cos_q FROM topk WHERE rn <= 5
         |ORDER BY query_id ASC, cos_q DESC, vec_id ASC""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      // tmp-dir index landing (q_embed_ingest posture: runs from any
      // checkout). Built ONCE per JVM+dir (r11 review: rebuilding the
      // corpus inside the timed query is the same fixture-dominated-
      // headline flaw the steady ingest entries fixed — the number
      // could not move when the (id, bucket, q) serving scan moved).
      // The corpus is read-only for this query, so a stamp check
      // suffices; no restore needed.
      val qdir = graft.QHelp.qtmpDir("qidx")
      val qpath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir
      if (!fresh) {
        Similarity.writeQuantizedCorpus(e, "vec_id", "embedding", qpath,
          bucketDim = Some(64), planes = 8)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      val q = e.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding")
      Similarity.annTopKQuantizedIndexedBatch(q, "vec_id", "embedding",
          qpath, "vec_id", dim = 64, k = 5, planes = 8)
        .orderBy(col("query_id").asc, col("cos_q").desc, col("vec_id").asc)
    }

    // Recall@k of the quantized ranker vs exact — what int8 costs in
    // rank quality (the tuning instrument completing the LSH/IVF
    // recall family). Candidates/probes mirror q_ann_recall; only the
    // approximate side's ORDERING is quantized (integer dots).
    val int8RecallSql =
      s"""WITH $bucketCtes,
         |s AS (
         |  SELECT vec_id,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
         |  FROM embeddings),
         |qz AS (
         |  SELECT e.vec_id,
         |    list_transform(e.embedding, x ->
         |      CASE WHEN s.scale = 0 THEN 0
         |           ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS BIGINT) END) AS q
         |  FROM embeddings e JOIN s USING (vec_id)),
         |qsel AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qv, b.bucket AS qb
         |  FROM embeddings e JOIN buckets b ON b.vec_id = e.vec_id
         |  WHERE e.vec_id % 25 = 0),
         |probes AS (
         |  SELECT qid, qb AS bucket FROM qsel
         |  UNION
         |  SELECT qid, xor(qb, CAST(1 << j AS BIGINT)) AS bucket
         |  FROM qsel, range(0, 8) rj(j)),
         |cand AS (
         |  SELECT p.qid, b.vec_id
         |  FROM buckets b JOIN probes p USING (bucket)
         |  WHERE b.vec_id <> p.qid),
         |zq AS (
         |  SELECT c.qid, c.vec_id, unnest(a.q) AS x, unnest(qq.q) AS y
         |  FROM cand c JOIN qz a ON a.vec_id = c.vec_id
         |              JOIN qz qq ON qq.vec_id = c.qid),
         |dq AS (
         |  SELECT qid, vec_id, sum(x*y) AS dot, sum(x*x) AS na
         |  FROM zq GROUP BY qid, vec_id),
         |nqs AS (
         |  SELECT vec_id AS qid, list_sum(list_transform(q, v -> v*v)) AS nqv
         |  FROM qz),
         |ann AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT d.qid, d.vec_id,
         |      row_number() OVER (PARTITION BY d.qid ORDER BY
         |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nqv AS DOUBLE))) DESC,
         |        d.vec_id ASC) AS rn
         |    FROM dq d JOIN nqs USING (qid)
         |    WHERE na > 0 AND nqv > 0) WHERE rn <= 5),
         |bz AS (
         |  SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
         |  FROM embeddings e, qsel q WHERE e.vec_id <> q.qid),
         |bd AS (
         |  SELECT qid, vec_id,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
         |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
         |  FROM bz GROUP BY qid, vec_id),
         |exact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid ORDER BY
         |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
         |        vec_id ASC) AS rn
         |    FROM bd) WHERE rn <= 5),
         |hits AS (
         |  SELECT e.qid,
         |    CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |    CAST(count(*) AS BIGINT) AS exact_k
         |  FROM exact e LEFT JOIN ann a ON a.qid = e.qid AND a.vec_id = e.vec_id
         |  GROUP BY e.qid),
         |m AS (
         |  SELECT CAST(sum(hits) AS DOUBLE)/CAST(sum(exact_k) AS DOUBLE) AS mean_recall
         |  FROM hits)
         |SELECT qid AS query_id, hits, exact_k,
         |  CAST(hits AS DOUBLE)/CAST(exact_k AS DOUBLE) AS recall, m.mean_recall
         |FROM hits, m ORDER BY query_id""".stripMargin
    r.reg("q_quantized_recall", int8RecallSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 25 === 0).select("vec_id", "embedding")
      Similarity.quantizedRecallReport(e, q, "vec_id", "embedding",
          "vec_id", "embedding", dim = 64, k = 5, planes = 8,
          multiProbe = true)
        .orderBy("query_id")
    }

    // UNIFIED recall comparison (r12): every serving tier's recall@5 on
    // ONE corpus/query-set (vec_id % 50, the q_ivfpq_recall sample) —
    // the table a corpus owner reads when choosing a tier. The oracle
    // COMPOSES the five per-tier recall oracles above: each tier's
    // full per-query SQL runs as a self-contained WITH-subquery
    // retargeted to the shared sample (the only text edits are the
    // query filter `% 25 = 0` -> `% 50 = 0` and, for the IVF block,
    // its k `rn <= 3` -> `rn <= 5`; q_ivfpq_recall already runs this
    // exact geometry), then reduces to the pooled Σhits/Σexact_k row.
    // The brute spine recomputes the exact side's row count directly.
    val recallCompareSql = {
      def pooledRow(tier: String, sql: String) =
        s"""SELECT '$tier' AS tier, CAST(sum(hits) AS BIGINT) AS hits,
           |  CAST(sum(exact_k) AS BIGINT) AS exact_k,
           |  CAST(sum(hits) AS DOUBLE)/CAST(sum(exact_k) AS DOUBLE) AS mean_recall
           |FROM (
           |$sql
           |)""".stripMargin
      def onSample(sql: String) = sql.replace("% 25 = 0", "% 50 = 0")
      val bruteSql =
        """SELECT 'brute' AS tier, cnt AS hits, cnt AS exact_k, 1.0 AS mean_recall
          |FROM (
          |WITH qsel AS (
          |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
          |  WHERE vec_id % 50 = 0),
          |bz AS (
          |  SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
          |  FROM embeddings e, qsel q WHERE e.vec_id <> q.qid),
          |bd AS (
          |  SELECT qid, vec_id,
          |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
          |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
          |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
          |  FROM bz GROUP BY qid, vec_id),
          |exact AS (
          |  SELECT qid, vec_id FROM (
          |    SELECT qid, vec_id,
          |      row_number() OVER (PARTITION BY qid ORDER BY
          |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
          |        vec_id ASC) AS rn
          |    FROM bd) WHERE rn <= 5)
          |SELECT CAST(count(*) AS BIGINT) AS cnt FROM exact
          |)""".stripMargin
      Seq(bruteSql,
        pooledRow("int8", onSample(int8RecallSql)),
        pooledRow("ivf",
          onSample(ivfRecallSql).replace("rn <= 3", "rn <= 5")),
        pooledRow("ivfpq", ivfpqRecallSql),
        pooledRow("lsh", onSample(annRecallSql)),
        pooledRow("pq", onSample(pqRecallSql)))
        .mkString("", "\nUNION ALL\n", "\nORDER BY tier")
    }
    r.reg("q_recall_compare", recallCompareSql) { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0).select("vec_id", "embedding")
      val cents = graft.llm.Ivf.train(e, "vec_id", "embedding",
        nCells = 8, iters = 0)
      val cbs = graft.llm.Pq.trainCodebooks(e, "vec_id", "embedding",
        dim = 64, m = 8, codes = 16, iters = 0)
      // the persisted IVF+PQ tier shares the q_ivfpq_* fixture
      val qdir = graft.QHelp.qtmpDir("ivfpq")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir
      if (!fresh) {
        graft.llm.Pq.writeIvfPqCorpus(e, "vec_id", "embedding", cents,
          cbs, idxPath, dim = 64, m = 8)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      Similarity.recallComparisonReport(e, q, "vec_id", "embedding",
        "vec_id", "embedding", dim = 64, k = 5, ivfCentroids = cents,
        pqCodebooks = cbs, planes = 8, multiProbe = true, nprobe = 2,
        m = 8, ivfPqPath = Some(idxPath))
    }

    // Quantized recall on a CLUSTERED fixture (r10 verdict #7): the
    // iid-random fixture above measures the WORST case for LSH recall
    // (random vectors sit near every hyperplane; ~0.27 at sf0.1) and
    // invites misreading. Real corpora are clustered — near-duplicate
    // documents, paraphrases, template families — so this entry plants
    // 3 tight members per center (per-element multiplicative jitter
    // ±2%, deterministic from (member, element), rounded back to
    // float32 so both engines stay in the exact-decimal regime) and
    // measures recall with the centers as queries: members share the
    // center's bucket almost always, and top-k is dominated by planted
    // neighbors — the regime a production corpus actually runs.
    r.reg("q_quantized_recall_clustered",
      s"""WITH centers AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
         |members AS (
         |  SELECT c.vec_id*10 + 2000000 + r AS vec_id,
         |    list_transform(range(0, 64), i ->
         |      CAST(CAST(c.embedding[i+1] AS DOUBLE)
         |        * (1.0 + CAST(((c.vec_id*10 + r)*64 + i) * 2654435761 % 101 - 50 AS DOUBLE) / 2500.0)
         |        AS FLOAT)) AS embedding
         |  FROM centers c, range(1, 4) rr(r)),
         |corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id, embedding FROM members),
         |flat AS (
         |  SELECT vec_id, j,
         |    CAST(embedding[i+1] AS DOUBLE)
         |      * CAST((j*64 + i) * 2654435761 % 4294967296 - 2147483648 AS DOUBLE) AS p
         |  FROM corpus, range(0, 8) rj(j), range(0, 64) ri(i)),
         |pdots AS (
         |  SELECT vec_id, j, sum(CAST(p AS DECIMAL(30,12))) AS d
         |  FROM flat GROUP BY vec_id, j),
         |buckets AS (
         |  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM pdots GROUP BY vec_id),
         |s AS (
         |  SELECT vec_id,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
         |  FROM corpus),
         |qz AS (
         |  SELECT e.vec_id,
         |    list_transform(e.embedding, x ->
         |      CASE WHEN s.scale = 0 THEN 0
         |           ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS BIGINT) END) AS q
         |  FROM corpus e JOIN s USING (vec_id)),
         |qsel AS (
         |  SELECT e.vec_id AS qid, e.embedding AS qv, b.bucket AS qb
         |  FROM corpus e JOIN buckets b ON b.vec_id = e.vec_id
         |  WHERE e.vec_id % 25 = 0 AND e.vec_id < 2000000),
         |probes AS (
         |  SELECT qid, qb AS bucket FROM qsel
         |  UNION
         |  SELECT qid, xor(qb, CAST(1 << j AS BIGINT)) AS bucket
         |  FROM qsel, range(0, 8) rj(j)),
         |cand AS (
         |  SELECT p.qid, b.vec_id
         |  FROM buckets b JOIN probes p USING (bucket)
         |  WHERE b.vec_id <> p.qid),
         |zq AS (
         |  SELECT c.qid, c.vec_id, unnest(a.q) AS x, unnest(qq.q) AS y
         |  FROM cand c JOIN qz a ON a.vec_id = c.vec_id
         |              JOIN qz qq ON qq.vec_id = c.qid),
         |dq AS (
         |  SELECT qid, vec_id, sum(x*y) AS dot, sum(x*x) AS na
         |  FROM zq GROUP BY qid, vec_id),
         |nqs AS (
         |  SELECT vec_id AS qid, list_sum(list_transform(q, v -> v*v)) AS nqv
         |  FROM qz),
         |ann AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT d.qid, d.vec_id,
         |      row_number() OVER (PARTITION BY d.qid ORDER BY
         |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nqv AS DOUBLE))) DESC,
         |        d.vec_id ASC) AS rn
         |    FROM dq d JOIN nqs USING (qid)
         |    WHERE na > 0 AND nqv > 0) WHERE rn <= 5),
         |bz AS (
         |  SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
         |  FROM corpus e, qsel q WHERE e.vec_id <> q.qid),
         |bd AS (
         |  SELECT qid, vec_id,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
         |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
         |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
         |  FROM bz GROUP BY qid, vec_id),
         |exact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid ORDER BY
         |        CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
         |        vec_id ASC) AS rn
         |    FROM bd) WHERE rn <= 5),
         |hits AS (
         |  SELECT e.qid,
         |    CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |    CAST(count(*) AS BIGINT) AS exact_k
         |  FROM exact e LEFT JOIN ann a ON a.qid = e.qid AND a.vec_id = e.vec_id
         |  GROUP BY e.qid),
         |m AS (
         |  SELECT CAST(sum(hits) AS DOUBLE)/CAST(sum(exact_k) AS DOUBLE) AS mean_recall
         |  FROM hits)
         |SELECT qid AS query_id, hits, exact_k,
         |  CAST(hits AS DOUBLE)/CAST(exact_k AS DOUBLE) AS recall, m.mean_recall
         |FROM hits, m ORDER BY query_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val centers = e.filter(col("vec_id") % 25 === 0)
      val members = (1 to 3).map { rr =>
        centers.select(
          (col("vec_id") * 10 + lit(2000000L + rr)).as("vec_id"),
          expr(s"""transform(embedding, (x, i) ->
            CAST(CAST(x AS DOUBLE)
              * (CAST(1.0 AS DOUBLE) + CAST(((vec_id*10 + $rr)*64 + i) * 2654435761 % 101 - 50 AS DOUBLE) / CAST(2500.0 AS DOUBLE))
            AS FLOAT))""").as("embedding"))
      }.reduce(_ unionByName _)
      val corpus = e.unionByName(members)
      Similarity.quantizedRecallReport(corpus, centers, "vec_id",
          "embedding", "vec_id", "embedding", dim = 64, k = 5,
          planes = 8, multiProbe = true)
        .orderBy("query_id")
    }

    // Embedding-side daily ingest end-to-end (the vector analog of
    // q_ingest_gate): corpus = vec_id < 400 pre-bucketed as the
    // embedding index, shard = the rest plus two planted duplicates —
    // 1000000 copies corpus vector 0 (drops vs-corpus), 1000001 copies
    // shard vector 450 (in-shard cluster keeps the smaller id). The
    // oracle recomputes LSH buckets, candidate pairs, exact-decimal
    // cosine, min-label components via recursive reachability, and the
    // vs-corpus drop — the landed parquet ids must match exactly.
    // Random fixture vectors never reach cos 0.9 (probed in
    // q_embed_dedup), so the planted families are the whole drop set.
    val embedIngestSql =
      """WITH RECURSIVE corpusv AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 400),
        |shardv AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 400
        |  UNION ALL
        |  SELECT CAST(1000000 AS BIGINT) AS vec_id, embedding
        |  FROM embeddings WHERE vec_id = 0
        |  UNION ALL
        |  SELECT CAST(1000001 AS BIGINT) AS vec_id, embedding
        |  FROM embeddings WHERE vec_id = 450),
        |allv AS (SELECT * FROM corpusv UNION ALL SELECT * FROM shardv),
        |flat AS (
        |  SELECT vec_id, j,
        |    CAST(embedding[i+1] AS DOUBLE)
        |      * CAST((j*64 + i) * 2654435761 % 4294967296 - 2147483648 AS DOUBLE) AS p
        |  FROM allv, range(0, 8) rj(j), range(0, 64) ri(i)),
        |pdots AS (
        |  SELECT vec_id, j, sum(CAST(p AS DECIMAL(30,12))) AS d
        |  FROM flat GROUP BY vec_id, j),
        |buckets AS (
        |  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pdots GROUP BY vec_id),
        |scand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  WHERE a.vec_id IN (SELECT vec_id FROM shardv)
        |    AND b.vec_id IN (SELECT vec_id FROM shardv)),
        |ccand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket
        |  WHERE a.vec_id IN (SELECT vec_id FROM corpusv)
        |    AND b.vec_id IN (SELECT vec_id FROM shardv)),
        |vpairs AS (SELECT id_a, id_b FROM scand UNION SELECT id_a, id_b FROM ccand),
        |pz AS (
        |  SELECT c.id_a, c.id_b, unnest(ea.embedding) AS a, unnest(eb.embedding) AS b
        |  FROM vpairs c JOIN allv ea ON ea.vec_id = c.id_a
        |                JOIN allv eb ON eb.vec_id = c.id_b),
        |pd AS (
        |  SELECT id_a, id_b,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM pz GROUP BY id_a, id_b),
        |hits AS (
        |  SELECT id_a, id_b FROM pd
        |  WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) >= 0.9),
        |sedges AS (
        |  SELECT h.id_a AS u, h.id_b AS v FROM hits h JOIN scand c
        |    ON h.id_a = c.id_a AND h.id_b = c.id_b
        |  UNION
        |  SELECT h.id_b AS u, h.id_a AS v FROM hits h JOIN scand c
        |    ON h.id_a = c.id_a AND h.id_b = c.id_b),
        |reach AS (
        |  SELECT u, v FROM sedges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN sedges e ON r.v = e.u),
        |nddrop AS (SELECT u AS id FROM reach GROUP BY u HAVING min(v) < u),
        |vsdrop AS (
        |  SELECT DISTINCT h.id_b AS id FROM hits h JOIN ccand c
        |    ON h.id_a = c.id_a AND h.id_b = c.id_b)
        |SELECT vec_id FROM shardv
        |WHERE vec_id NOT IN (SELECT id FROM nddrop)
        |  AND vec_id NOT IN (SELECT id FROM vsdrop)
        |ORDER BY vec_id""".stripMargin

    /** [[embedIngestSql]] with an extra landed-set predicate — the
      * retraction oracle reuses the whole ingest recompute and drops
      * the retracted ids from the expected landing. (The SQL ends with
      * its only `ORDER BY vec_id`, so the splice point is unique.) */
    def embedIngestSqlWhere(extra: String): String =
      embedIngestSql.replace(
        "ORDER BY vec_id",
        s"AND $extra\nORDER BY vec_id")

    /** Shared fixture for the embedding-ingest oracles: corpus
      * (vec_id < 400) and the shard with its two planted duplicates. */
    def embedIngestFixture(s: org.apache.spark.sql.SparkSession,
                           dir: String) = {
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val corpus = e.filter(col("vec_id") < 400)
      val shard = e.filter(col("vec_id") >= 400)
        .unionByName(e.filter(col("vec_id") === 0L)
          .select(lit(1000000L).as("vec_id"), col("embedding")))
        .unionByName(e.filter(col("vec_id") === 450L)
          .select(lit(1000001L).as("vec_id"), col("embedding")))
      (corpus, shard)
    }

    r.reg("q_embed_ingest", embedIngestSql) { (s, dir) =>
      val (corpus, shard) = embedIngestFixture(s, dir)
      // tmp-dir landing (q_dedup_index posture: runs from any checkout);
      // index rebuilds overwrite and the landing dir is cleared, so
      // repeated runs in one session stay deterministic
      val base = graft.QHelp.qtmpDir("embing")
      val outDir = new java.io.File(base, "out")
      org.apache.commons.io.FileUtils.deleteDirectory(outDir)
      graft.llm.Dedup.writeEmbeddingIndex(corpus, "vec_id", "embedding",
        64, "g_embing", new java.io.File(base, "idx").getAbsolutePath)
      val ivfDir = new java.io.File(base, "ivf").getAbsolutePath
      val cents = graft.llm.Ivf.train(corpus, "vec_id", "embedding",
        nCells = 8, iters = 0)
      graft.llm.Ivf.writeIndex(corpus, "vec_id", "embedding", cents, ivfDir)
      graft.llm.Pipeline.ingestEmbeddingShard(shard, "vec_id", "embedding",
        dim = 64, threshold = 0.9, indexName = "g_embing",
        indexPath = new java.io.File(base, "idx").getAbsolutePath,
        outPath = outDir.getAbsolutePath, shardLabel = "oracle",
        ivfPath = Some(ivfDir))
      s.read.parquet(outDir.getAbsolutePath)
        .select("vec_id").orderBy("vec_id")
    }

    // STEADY-STATE embedding-ingest shape (r10 verdict #3, the vector
    // analog of q_ingest_gate_steady): q_embed_ingest rebuilds the
    // embedding index AND trains+writes the IVF index inside the timed
    // query, so its headline number is fixture construction. This
    // entry restores a pristine snapshot of both indexes (tiny local
    // file copy) and times only the daily marginal work: shard →
    // semantic dedup ×2 → replay-safe IVF growth → landing + manifest.
    // Same fixture, same oracle — only the timing boundary moves.
    r.reg("q_embed_ingest_steady", embedIngestSql) { (s, dir) =>
      val (corpus, shard) = embedIngestFixture(s, dir)
      val base = graft.QHelp.qtmpDir("embst")
      val idx = new java.io.File(base, "idx")
      val ivf = new java.io.File(base, "ivf")
      val out = new java.io.File(base, "out")
      FixtureSnapshot.ensure(s, base, s"embst|$dir",
        Seq("g_embst_vecs"), Seq("idx", "ivf")) {
        graft.llm.Dedup.writeEmbeddingIndex(corpus, "vec_id", "embedding",
          64, "g_embst", idx.getAbsolutePath)
        val cents = graft.llm.Ivf.train(corpus, "vec_id", "embedding",
          nCells = 8, iters = 0)
        graft.llm.Ivf.writeIndex(corpus, "vec_id", "embedding", cents,
          ivf.getAbsolutePath)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(out)
      graft.llm.Pipeline.ingestEmbeddingShard(shard, "vec_id", "embedding",
        dim = 64, threshold = 0.9, indexName = "g_embst",
        indexPath = idx.getAbsolutePath, outPath = out.getAbsolutePath,
        shardLabel = "steady", ivfPath = Some(ivf.getAbsolutePath))
      s.read.parquet(out.getAbsolutePath)
        .select("vec_id").orderBy("vec_id")
    }

    // RETRACTION over the steady-embedding fixture
    // (Pipeline.retractEmbeddings): ingest the shard, then retract
    // every shard id with vec_id % 23 = 5 from the vecs index, the IVF
    // index and the landing — the landing read back must equal the
    // gate's survivors minus the retracted set (retracting
    // gate-dropped ids is a no-op, mirrored by filtering the survivor
    // set). Shares the embst snapshot.
    r.reg("q_retract_embed",
      embedIngestSqlWhere("vec_id % 23 <> 5")) { (s, dir) =>
      val (corpus, shard) = embedIngestFixture(s, dir)
      val base = graft.QHelp.qtmpDir("embst")
      val idx = new java.io.File(base, "idx")
      val ivf = new java.io.File(base, "ivf")
      val out = new java.io.File(base, "out_retract")
      FixtureSnapshot.ensure(s, base, s"embst|$dir",
        Seq("g_embst_vecs"), Seq("idx", "ivf")) {
        graft.llm.Dedup.writeEmbeddingIndex(corpus, "vec_id", "embedding",
          64, "g_embst", idx.getAbsolutePath)
        val cents = graft.llm.Ivf.train(corpus, "vec_id", "embedding",
          nCells = 8, iters = 0)
        graft.llm.Ivf.writeIndex(corpus, "vec_id", "embedding", cents,
          ivf.getAbsolutePath)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(out)
      graft.llm.Pipeline.ingestEmbeddingShard(shard, "vec_id", "embedding",
        dim = 64, threshold = 0.9, indexName = "g_embst",
        indexPath = idx.getAbsolutePath, outPath = out.getAbsolutePath,
        shardLabel = "steady", ivfPath = Some(ivf.getAbsolutePath))
      graft.llm.Pipeline.retractEmbeddings(s,
        shard.filter(col("vec_id") % 23 === 5).select("vec_id"),
        "vec_id", "g_embst", out.getAbsolutePath,
        ivfPath = Some(ivf.getAbsolutePath))
      s.read.parquet(out.getAbsolutePath)
        .select("vec_id").orderBy("vec_id")
    }

    // Per-vector FATE attribution over the q_embed_ingest fixture plus
    // an 'already_present' plant (shard re-submits corpus vec 5 under
    // its own id): every input vector classified by the FIRST stage
    // that dropped it, with the Spark-side precedence mirrored exactly
    // — already_present vectors join NO candidate pair (excluded
    // before dedup), and near_in_shard takes precedence over
    // near_vs_corpus (vs-corpus pairs are only computed for in-shard
    // survivors). A DRY RUN: the audit itself never writes.
    r.reg("q_embed_audit",
      """WITH RECURSIVE corpusv AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 400),
        |shardv AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 400
        |  UNION ALL
        |  SELECT CAST(1000000 AS BIGINT) AS vec_id, embedding
        |  FROM embeddings WHERE vec_id = 0
        |  UNION ALL
        |  SELECT CAST(1000001 AS BIGINT) AS vec_id, embedding
        |  FROM embeddings WHERE vec_id = 450
        |  UNION ALL
        |  SELECT CAST(5 AS BIGINT) AS vec_id, embedding
        |  FROM embeddings WHERE vec_id = 5),
        |freshv AS (
        |  SELECT vec_id, embedding FROM shardv
        |  WHERE vec_id NOT IN (SELECT vec_id FROM corpusv)),
        |allv AS (SELECT * FROM corpusv UNION ALL SELECT * FROM freshv),
        |flat AS (
        |  SELECT vec_id, j,
        |    CAST(embedding[i+1] AS DOUBLE)
        |      * CAST((j*64 + i) * 2654435761 % 4294967296 - 2147483648 AS DOUBLE) AS p
        |  FROM allv, range(0, 8) rj(j), range(0, 64) ri(i)),
        |pdots AS (
        |  SELECT vec_id, j, sum(CAST(p AS DECIMAL(30,12))) AS d
        |  FROM flat GROUP BY vec_id, j),
        |buckets AS (
        |  SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM pdots GROUP BY vec_id),
        |scand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  WHERE a.vec_id IN (SELECT vec_id FROM freshv)
        |    AND b.vec_id IN (SELECT vec_id FROM freshv)),
        |ccand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket
        |  WHERE a.vec_id IN (SELECT vec_id FROM corpusv)
        |    AND b.vec_id IN (SELECT vec_id FROM freshv)
        |    AND a.vec_id <> b.vec_id),
        |vpairs AS (SELECT id_a, id_b FROM scand UNION SELECT id_a, id_b FROM ccand),
        |pz AS (
        |  SELECT c.id_a, c.id_b, unnest(ea.embedding) AS a, unnest(eb.embedding) AS b
        |  FROM vpairs c JOIN allv ea ON ea.vec_id = c.id_a
        |                JOIN allv eb ON eb.vec_id = c.id_b),
        |pd AS (
        |  SELECT id_a, id_b,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS dot,
        |    sum(CAST(CAST(a AS DOUBLE)*CAST(a AS DOUBLE) AS DECIMAL(25,12))) AS na,
        |    sum(CAST(CAST(b AS DOUBLE)*CAST(b AS DOUBLE) AS DECIMAL(25,12))) AS nb
        |  FROM pz GROUP BY id_a, id_b),
        |hits AS (
        |  SELECT id_a, id_b FROM pd
        |  WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) >= 0.9),
        |sedges AS (
        |  SELECT h.id_a AS u, h.id_b AS v FROM hits h JOIN scand c
        |    ON h.id_a = c.id_a AND h.id_b = c.id_b
        |  UNION
        |  SELECT h.id_b AS u, h.id_a AS v FROM hits h JOIN scand c
        |    ON h.id_a = c.id_a AND h.id_b = c.id_b),
        |reach AS (
        |  SELECT u, v FROM sedges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN sedges e ON r.v = e.u),
        |nddrop AS (SELECT u AS id FROM reach GROUP BY u HAVING min(v) < u),
        |vsdrop AS (
        |  SELECT DISTINCT h.id_b AS id FROM hits h JOIN ccand c
        |    ON h.id_a = c.id_a AND h.id_b = c.id_b
        |  WHERE h.id_b NOT IN (SELECT id FROM nddrop))
        |SELECT s.vec_id,
        |  CASE
        |    WHEN s.vec_id IN (SELECT vec_id FROM corpusv) THEN 'already_present'
        |    WHEN s.vec_id IN (SELECT id FROM nddrop) THEN 'near_in_shard'
        |    WHEN s.vec_id IN (SELECT id FROM vsdrop) THEN 'near_vs_corpus'
        |    ELSE 'landed' END AS fate
        |FROM shardv s ORDER BY s.vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings").select("vec_id", "embedding")
      val corpus = e.filter(col("vec_id") < 400)
      val shard = e.filter(col("vec_id") >= 400)
        .unionByName(e.filter(col("vec_id") === 0L)
          .select(lit(1000000L).as("vec_id"), col("embedding")))
        .unionByName(e.filter(col("vec_id") === 450L)
          .select(lit(1000001L).as("vec_id"), col("embedding")))
        .unionByName(e.filter(col("vec_id") === 5L)
          .select(lit(5L).as("vec_id"), col("embedding")))
      // own index name/path: the audit must read a PRISTINE corpus
      // index (q_embed_ingest's run appends survivors to g_embing)
      val base = graft.QHelp.qtmpDir("embaud")
      graft.llm.Dedup.writeEmbeddingIndex(corpus, "vec_id", "embedding",
        64, "g_embaud", new java.io.File(base, "idx").getAbsolutePath)
      graft.llm.Pipeline.ingestEmbeddingAudit(shard, "vec_id", "embedding",
          dim = 64, threshold = 0.9, indexName = "g_embaud")
        .orderBy("vec_id")
    }
  }
}
