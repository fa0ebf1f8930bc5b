package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: stage-level timings for the heaviest bench pipelines, so a
  * perf pass targets the dominant stage instead of guessing (SURVEY §7
  * step 9). Cumulative pipelines share the warm file cache; deltas
  * between lines approximate per-stage cost. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
        appName = "graft-perfprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val docs = GraftSession.table(spark, dir, "documents")
    docs.count() // warm file cache
    time("shingles") {
      docs.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TextHashExprs.shingleHashes(
          org.apache.spark.sql.functions.col("text"), 3).as("sh")).count()
    }
    time("signatures") {
      llm.Dedup.signatures(docs, "doc_id", "text").count()
    }
    // sub-stages of nearDuplicatePairs (mirrors Dedup internals so a perf
    // pass can see which exchange dominates; keep in sync with Dedup)
    locally {
      import org.apache.spark.sql.functions._
      val (idCol, textCol, shingleK, numHashes, bands) =
        ("doc_id", "text", 3, 16, 4)
      val rows = numHashes / bands
      val spread = llm.Spread(docs)
      val eligible =
        spread.filter(size(split(col(textCol), " ", -1)) >= shingleK)
      val sigs = eligible.select(col(idCol).as("id"),
        graft.functions.TextHashExprs.minhashSig(
          graft.functions.TextHashExprs.shingleHashes(col(textCol), shingleK),
          numHashes).as("sig"))
      val banded = sigs.select(col("id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
            concat_ws("_", slice(col("sig"), b * rows + 1, lit(rows)))))
            .as(Seq("band", "key")))
        .repartition(col("band"), col("key"))
      time("  banded") { banded.count() }
      // r6: bucket-size count + oversized-bucket salt (rides the band
      // exchange; default cap never engages at fixture scale)
      val wBucket = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key"))
      val salted = banded
        .withColumn("__n__", count(lit(1)).over(wBucket))
        .withColumn("__salt__",
          when(col("__n__") > 10000,
            pmod(hash(col("id"), col("band")),
              greatest(ceil(col("__n__").cast("double") / 10000)
                .cast("int"), lit(1))))
            .otherwise(lit(0)))
        .select(col("id"), col("band"), col("key"), col("__salt__"))
      val candidates = salted
        .select(col("band"), col("key"), col("__salt__"), col("id").as("id_a"))
        .join(salted.select(col("band"), col("key"), col("__salt__"),
            col("id").as("id_b")),
          Seq("band", "key", "__salt__"))
        .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
      time("  candidates") { candidates.count() }
    }
    time("pairs (cand+jaccard)") {
      llm.Dedup.nearDuplicatePairs(docs, "doc_id", "text", 0.6).count()
    }
    time("dropNearDuplicates") {
      llm.Dedup.dropNearDuplicates(docs, "doc_id", "text", 0.6).count()
    }
    val emb = GraftSession.table(spark, dir, "embeddings")
    emb.count()
    time("embed pairs") {
      llm.Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 64, 0.95).count()
    }
    // r13: the training-window assembly (two-pass cumsum + member
    // explode + one window_id shuffle) — declared bound ~linear in
    // corpus tokens; run at sf0.01 vs sf0.1 for the 10x probe
    locally {
      import org.apache.spark.sql.functions.col
      time("assembleWindows(500)") {
        llm.TextStats.assembleWindows(docs.select(col("doc_id"),
          col("text")), "doc_id", "text", 500L, 3L).count()
      }
    }
    // r13: the INCREMENTAL windows landing end-to-end — index built on
    // the first half (untimed fixture), then ingestWindowsShard of the
    // second half: gate O(shard) + split + shard-local assembly + the
    // sidecar/windows/manifest writes. Declared bound ~linear in shard
    // tokens (every stage is; the corpus side is index-bucket reads).
    locally {
      import org.apache.spark.sql.functions.col
      val half = docs.agg(org.apache.spark.sql.functions
        .expr("percentile(doc_id, 0.5)")).head().getDouble(0).toLong
      val base = java.nio.file.Files
        .createTempDirectory("graft_probe_wsh").toString
      try {
        llm.Dedup.writeNearDupIndex(docs.filter(col("doc_id") <= half),
          "doc_id", "text", "probe_wsh", s"$base/idx")
        llm.Dedup.buildIdBlooms(spark, "probe_wsh", s"$base/idx")
        time("ingestWindowsShard") {
          val c = llm.Pipeline.ingestWindowsShard(
            docs.filter(col("doc_id") > half),
            docs.limit(0).select(col("doc_id"), col("text")),
            "doc_id", "text", "probe_wsh", s"$base/idx", s"$base/out",
            2048L, "probe", redactPii = false)
          c("landed")
        }
      } finally {
        Seq("bands", "shingles", "keys").foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS probe_wsh_$t"))
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(base))
      }
    }
    // r13: the lexical family — index build (one (doc, term) shuffle)
    // and the bucket-pruned BM25 serve over the persisted postings.
    // Declared bounds: build ~linear in corpus tokens; serve ~linear in
    // MATCHED postings (the pruned scan), flat-ish in corpus size.
    locally {
      import org.apache.spark.sql.functions.lit
      import spark.implicits._
      val base = java.nio.file.Files
        .createTempDirectory("graft_probe_lex").toString
      try {
        time("writeLexicalIndex") {
          llm.Lexical.writeLexicalIndex(docs, "doc_id", "text",
            "probe_lex", s"$base/lex")
          spark.table("probe_lex_postings").count()
        }
        val qf = Seq((0L, "spark window join"),
          (1L, "customer order batch stream"),
          (2L, "vector a the merge")).toDF("qid", "qtext")
        time("bm25TopKIndexed") {
          llm.Lexical.bm25TopKIndexed(spark, "probe_lex", s"$base/lex",
            qf, "qid", "qtext", k = 10).count()
        }
        // r13: retroactive decontamination, full-scan vs index-routed —
        // the probe index above covers the FULL docs table, so the
        // indexed sweep's candidate read prices the champion pruning
        // against re-shingling the whole corpus. Declared shape:
        // full scan ~linear in corpus tokens; indexed ~linear in the
        // benchmark + matched-candidate mass, flat-ish in corpus size.
        locally {
          import org.apache.spark.sql.functions.col
          val benchDf = docs.filter(col("doc_id") % 101 === 0)
            .select("doc_id", "text")
          time("contamReport(full scan)") {
            llm.Dedup.contaminationReport(docs.select("doc_id", "text"),
              benchDf, "doc_id", "text").count()
          }
          time("contamReport(indexed)") {
            llm.Lexical.contaminationReportIndexed(
              docs.select("doc_id", "text"), benchDf, "doc_id", "text",
              "probe_lex", s"$base/lex").count()
          }
        }
      } finally {
        Seq("postings", "doclens").foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS probe_lex_$t"))
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(base))
      }
    }
    // r13: the reference-LM family — train is one (ctx, w) reference
    // shuffle; score is one (id, ctx, w) corpus shuffle + two model
    // joins + a per-doc ordered fold. Declared bounds ~linear in corpus
    // tokens for both (run at sf0.01 vs sf0.1 for the 10x probe).
    locally {
      import org.apache.spark.sql.functions.col
      val ref = docs.filter(col("doc_id") % 10 === 0)
      val cand = docs.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("text"))
      val model = llm.NgramLm.train(ref, "text", 2)
        .localCheckpoint(true) // untimed fixture for the score probe
      time("lmTrain") { llm.NgramLm.train(ref, "text", 2).count() }
      time("lmScore") {
        llm.NgramLm.score(cand, "doc_id", "text", model, 2).count()
      }
    }
    // r13: span-level exact-substring dedup — gram explode + one
    // map-side-partial gram aggregate + semi join-back + per-doc
    // interval window (+ rebuild for the scrub). Declared bound ~linear
    // in corpus tokens; run at sf0.01 vs sf0.1 for the 10x probe.
    locally {
      import org.apache.spark.sql.functions.col
      val d = docs.select(col("doc_id"), col("text"))
      time("duplicateSpans(k=5)") {
        llm.Dedup.duplicateSpans(d, "doc_id", "text", 5).count()
      }
      time("scrubSpans(k=5)") {
        // sum(length(text)) forces the token-filter rebuild — a bare
        // count() lets Catalyst skip the scrub entirely (row-preserving)
        llm.Dedup.scrubDuplicateSpans(d, "doc_id", "text", 5)
          .agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.length(col("text"))))
          .head().getLong(0)
      }
    }
    // r13: the NB classifier — train is one unigram shuffle per seed;
    // score is one (id, w) corpus shuffle + a model join + per-doc
    // fold. Declared bounds ~linear in corpus tokens (run at sf0.01 vs
    // sf0.1 for the 10x probe).
    locally {
      import org.apache.spark.sql.functions.col
      val pos = docs.filter(col("doc_id") % 10 === 0).select("text")
      val neg = docs.filter(col("doc_id") % 10 === 5).select("text")
      val cand = docs.filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % 10 =!= 5).select(col("doc_id"), col("text"))
      val model = llm.Classifier.train(pos, neg, "text")
        .localCheckpoint(true) // untimed fixture for the score probe
      time("nbTrain") { llm.Classifier.train(pos, neg, "text").count() }
      time("nbScore") {
        llm.Classifier.score(cand, "doc_id", "text", model).count()
      }
    }
    // r13: multimodal perceptual dedup — decode+hash is the linear
    // full-corpus pass; the pair join runs at the 10x oracle-fixture
    // geometry (banding candidates, not all-pairs)
    locally {
      import org.apache.spark.sql.functions.col
      val ids = docs.select("doc_id")
      time("imageDhash(full)") {
        llm.Multimodal.dhashFeatures(
          llm.Multimodal.synthPng(ids, "doc_id"), "doc_id", "payload")
          .count()
      }
      time("audioEnvelope(full)") {
        llm.Multimodal.audioEnvelopeHash(
          llm.Multimodal.synthWav(ids, "doc_id"), "doc_id", "payload")
          .count()
      }
      val slice = ids.filter(col("doc_id") < 1500)
      val fixture = llm.Multimodal.synthPng(slice, "doc_id").union(
        llm.Multimodal.synthPngVariant(
          slice.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 100000L).as("doc_id"),
              col("doc_id").as("src")), "doc_id", "src"))
      time("imageNearDupPairs(1500)") {
        llm.Dedup.imageNearDupPairs(fixture, "doc_id", "payload").count()
      }
    }
    // r13: BPE — word counts and the pair aggregate are the linear
    // corpus passes; train(32) bounds the driver loop cost at the
    // full type table; encode times the fused per-word expression
    locally {
      time("bpeWordCounts") { llm.Bpe.wordCounts(docs, "text").count() }
      time("bpePairCounts") { llm.Bpe.pairCounts(docs, "text").count() }
      val merges = llm.Bpe.mergeList(llm.Bpe.train(docs, "text", 32))
      time("bpeTrain(32)") { llm.Bpe.train(docs, "text", 32).count() }
      time("bpeEncode(full)") {
        llm.Bpe.encodeTokens(docs, "doc_id", "text", merges).count()
      }
    }
    // r14 cont: the PACKED window assembly — two tiny cumsums + the
    // segment-bounded next-fit + join-back + window shuffle. Declared
    // bound ~linear in corpus tokens (the recurrence is O(segment) per
    // segment row); run at sf0.01 vs sf0.1 for the 10x probe, directly
    // comparable to assembleWindows(500) above (same unit, same corpus)
    locally {
      import org.apache.spark.sql.functions.col
      time("assembleWindowsPacked") {
        llm.TextStats.assembleWindowsPacked(docs.select(col("doc_id"),
          col("text")), "doc_id", "text", 500L, 3L).count()
      }
    }
    // r14 cont: SEMANTIC decontam (exact broadcast-bench cosine — bound
    // ~|corpus|·|bench|, bench fixed here so ~linear in corpus) and
    // SemDeDup (assign + within-cell join at fixed nCells — bound
    // ~ Σ|cell|², i.e. ~quadratic-in-corpus/nCells; nCells should grow
    // with the corpus in production, fixed here to expose the shape)
    locally {
      import org.apache.spark.sql.functions.col
      val bench = emb.filter(col("vec_id") % 101 === 0)
        .select((col("vec_id") + 900000L).as("bench_id"), col("embedding"))
      time("semanticContamReport") {
        llm.Dedup.semanticContaminationReport(emb, "vec_id", "embedding",
          bench, "bench_id", "embedding", 0.9).count()
      }
      val cents = llm.Ivf.train(
        emb.select(col("vec_id"),
          llm.Similarity.unitVector(col("embedding")).as("embedding")),
        "vec_id", "embedding", nCells = 16, iters = 0)
      time("semDeDupPairs(16cells)") {
        llm.Dedup.semDeDupPairs(emb, "vec_id", "embedding", cents,
          0.9).count()
      }
    }
    // r14 cont: the full Gopher rule report — one scan-fused pass
    locally {
      time("gopherReport(full)") {
        llm.TextStats.gopherReport(docs, "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
