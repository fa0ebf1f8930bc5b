package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row

/** Structured-Streaming upgrades of the batch time-series ops (SURVEY
  * §2.10). The reference has no streaming at all — its resample/rolling
  * are batch ops over a datetime index (`_resample.py:21-269`). Because
  * every graft aggregation is expressed as partial/merge/final, the same
  * tumbling-window aggregation runs incrementally here with a watermark
  * bounding state.
  */
object Streams {

  /** Tumbling event-time aggregation with late-data bound — the streaming
    * form of `Resample.agg`. State per (window, key) is pruned once the
    * watermark passes the window end, so state size is bounded by
    * (windows in flight x keys), not by stream length. */
  def windowedAgg(stream: DataFrame, tsCol: String, every: String,
                  watermarkDelay: String, keys: Seq[String], aggs: Column*): DataFrame = {
    val grouped = stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), every) +: keys.map(col)): _*)
    grouped.agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket", col("window.start")).drop("window")
  }

  /** Session windows (gap-based) — no reference analog; Spark-native. */
  def sessionAgg(stream: DataFrame, tsCol: String, gap: String,
                 watermarkDelay: String, keys: Seq[String], aggs: Column*): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy((session_window(col(tsCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")

  /** Streaming exact dedup by key columns: Spark keeps seen-key state,
    * bounded by the watermark when a ts column is included. */
  def dedup(stream: DataFrame, tsCol: String, watermarkDelay: String,
            keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Per-key RUNNING aggregate via mapGroupsWithState — the streaming
    * upgrade of the cumulative family (WindowOps.cumsum): each trigger
    * emits the (sum, count) accumulated across ALL batches so far for
    * every key that received rows. State is one (Double, Long) pair per
    * key — O(keys), not O(stream); for an unbounded key space use
    * [[runningSumWithTtl]], which evicts idle keys. Run the query in
    * Update output mode. */
  def runningSum(stream: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    stream
      .select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Double, Long), (String, Double, Long)](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[(Double, Long)]) =>
          var (s, n) = state.getOption.getOrElse((0.0, 0L))
          rows.foreach { case (_, v) => s += v; n += 1 }
          state.update((s, n))
          (key, s, n)
      }
      .toDF(keyCol, "running_sum", "running_n")
  }

  /** [[runningSum]] with a TTL: state for a key that stays idle past
    * `ttl` is EVICTED (ProcessingTimeTimeout + setTimeoutDuration), so
    * on an unbounded key space — the 100 TB reality, where NoTimeout
    * state is O(all keys ever seen) forever — the store holds only the
    * recently-active working set. An evicted key's final tally is
    * emitted once as a flush row; if the key returns later it restarts
    * from zero (the TTL is a correctness contract, not just a cap). */
  def runningSumWithTtl(stream: DataFrame, keyCol: String, valueCol: String,
                        ttl: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    stream
      .select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Double, Long), (String, Double, Long)](
        GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[(Double, Long)]) =>
          if (state.hasTimedOut) {
            val (s, n) = state.get
            state.remove()
            (key, s, n) // final flush of the evicted key
          } else {
            var (s, n) = state.getOption.getOrElse((0.0, 0L))
            rows.foreach { case (_, v) => s += v; n += 1 }
            state.update((s, n))
            state.setTimeoutDuration(ttl)
            (key, s, n)
          }
      }
      .toDF(keyCol, "running_sum", "running_n")
  }

  /** Stream-static enrichment join: each micro-batch joins the static
    * dimension (broadcast when small — AQE per micro-batch). The standard
    * shape for attaching dimension attributes to a 100 TB event stream
    * without restating the dimension per event. */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
             joinHow: String = "left_outer"): DataFrame =
    stream.join(dim, keys, joinHow)

  /** Stream-stream interval join (e.g. impressions ⋈ clicks): both sides
    * carry watermarks, and the time-range condition bounds how long a
    * left row waits for a match — so per-side state is
    * O(rows inside the interval), pruned as the watermark advances,
    * never O(stream). The equi-key shuffles both streams; the range
    * condition is evaluated within the key's state store. `within` is
    * the max right-after-left delay (e.g. "10 minutes"). */
  def intervalJoin(left: DataFrame, leftTs: String, right: DataFrame,
                   rightTs: String, keys: Seq[String], within: String,
                   watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val rangeCond = r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within")
    l.join(r, keyCond && rangeCond, "inner")
  }

  /** Checkpointed streaming file sink — the production shape for landing
    * a stream as parquet: exactly-once via the checkpoint's WAL + file
    * manifest (restart resumes from the last committed batch, no
    * duplicates, no data loss), append mode, optional time-based
    * partitioning for downstream pruning. Returns the writer so callers
    * pick the trigger (`.trigger(...)`) and `.start()` themselves. */
  def toParquetSink(df: DataFrame, path: String, checkpoint: String,
                    partitionOn: Seq[String] = Nil): DataStreamWriter[Row] = {
    val w = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
    if (partitionOn.nonEmpty) w.partitionBy(partitionOn: _*) else w
  }

  def toMemorySink(df: DataFrame, name: String,
                   mode: OutputMode = OutputMode.Update()): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(name).outputMode(mode)

  /** Streaming decontamination: drop incoming documents that share any
    * token k-shingle with a static benchmark corpus — the ingest-time
    * form of Dedup.contaminationReport.
    *
    * Shape: the STATIC bench side is hashed once on executors, collected
    * to a driver Set and broadcast (benchmark corpora are ~1e5 docs even
    * when the stream is unbounded — this is the one sanctioned driver
    * materialization, same class as a broadcast dim table); each incoming
    * doc is then a STATELESS filter — shingle-hash blockwise, probe the
    * broadcast set. No watermark, no state store, append-mode safe. An
    * exploded stream-static anti join would need a stateful
    * re-aggregation per doc; the broadcast probe keeps the stream
    * pipeline a pure map. For corpus-sized exclusion sets use the batch
    * `Dedup.decontaminate` instead. */
  /** Streaming near-dup flagging of an incoming doc stream against a
    * PERSISTED corpus index ([[graft.llm.Dedup.writeNearDupIndex]]) —
    * the streaming face of `nearDupPairsAgainstIndex`, for ingest
    * pipelines that must reject duplicates as shards arrive rather
    * than in a nightly batch. Every operator is stateless: band the
    * arriving doc's signature blockwise (native expressions), then two
    * stream-static equi-joins — candidate generation against the
    * bucketed bands table, exact-Jaccard verify against the bucketed
    * shingle table. No state store, no watermark, append-mode safe;
    * the corpus side reads its buckets in place on every micro-batch.
    *
    * Emits (id_a = corpus id, id_b = stream id, jaccard >= threshold).
    * A pair colliding in several bands is emitted once per band — all
    * within the single micro-batch that carries the doc, so a
    * `foreachBatch` sink dedups with a plain per-batch
    * `dropDuplicates("id_a","id_b")` and stays stateless (a streaming
    * dropDuplicates would grow a pair-keyed state store forever). */
  def nearDupPairsStream(docs: DataFrame, idCol: String, textCol: String,
                         indexName: String, threshold: Double,
                         shingleK: Int = 3, numHashes: Int = 16,
                         bands: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    graft.llm.Dedup.checkParams(spark, s"${indexName}_bands", Map(
      "shingleK" -> shingleK, "numHashes" -> numHashes, "bands" -> bands))
    val rows = numHashes / bands
    val eligible = docs.filter(size(split(col(textCol), " ", -1)) >= shingleK)
    val sigd = eligible
      .select(col(idCol).as("id_b"),
        graft.functions.TextHashExprs.shingleHashes(col(textCol), shingleK)
          .as("sh_b"))
      .withColumn("sig",
        graft.functions.TextHashExprs.minhashSig(col("sh_b"), numHashes))
    // sh_b rides the band explode: a micro-batch is bounded, so carrying
    // the shingle array to the verify join beats a third scan of the
    // stream source (which a second branch would need)
    val banded = sigd.select(col("id_b"), col("sh_b"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        concat_ws("_", slice(col("sig"), b * rows + 1, lit(rows)))))
        .as(Seq("band", "key")))
    val cand = banded
      .join(spark.table(s"${indexName}_bands"), Seq("band", "key"))
      .filter(col("id") =!= col("id_b"))
      .select(col("id").as("id_a"), col("id_b"), col("sh_b"))
    val idxSh = spark.table(s"${indexName}_shingles")
      .select(col("id").as("id_a"), col("shingles").as("sh_a"))
    cand.join(idxSh, Seq("id_a"))
      .withColumn("__i__",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("__i__") /
          (size(col("sh_a")) + size(col("sh_b")) - col("__i__")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Streaming SEMANTIC near-dup flagging of arriving embedding vectors
    * against a PERSISTED embedding index
    * ([[graft.llm.Dedup.writeEmbeddingIndex]]) — the vector face of
    * [[nearDupPairsStream]], for pipelines that must reject paraphrase
    * duplicates as vectors arrive. The batch probe
    * (`embeddingNearDupPairsAgainstIndex`) is already fully stateless —
    * blockwise LSH bucket + norm on the arriving rows, one stream-static
    * equi-join against the bucketed vecs table, exact-decimal cosine
    * verify — so the streaming form IS the batch form applied to a
    * streaming frame: no state store, no watermark, append-mode safe,
    * corpus buckets read in place every micro-batch. Emits (id_a =
    * corpus id, id_b = stream id, cos >= threshold); each pair lands in
    * the single micro-batch that carries the vector, so unlike the
    * banded text path no per-batch dedup is needed (one bucket, one
    * emission). `dim`/`planes` must match the index build. */
  def embeddingNearDupStream(vectors: DataFrame, idCol: String,
                             vecCol: String, indexName: String, dim: Int,
                             threshold: Double,
                             planes: Int = 8): DataFrame =
    graft.llm.Dedup.embeddingNearDupPairsAgainstIndex(vectors, idCol,
      vecCol, indexName, dim, threshold, planes)

  /** Streaming retrieval over the PERSISTED bucketed int8 corpus — the
    * SERVING loop of the quantized family: query vectors arrive as a
    * stream, and each micro-batch is ranked with the full batch path
    * ([[graft.llm.Similarity.annTopKQuantizedIndexedBatch]]: one bucket
    * equi-join against the (id, bucket, q) corpus, native integer-dot
    * verify, per-query row_number top-k — a WINDOW, which streaming
    * plans forbid outside foreachBatch; here the window is bounded by
    * the trigger's batch, never the stream). Results land under
    * `outPath/batch_id=<id>` with OVERWRITE, so a failure-replayed
    * micro-batch rewrites its own partition instead of duplicating
    * rows — the same crash-replay discipline as the ingest landings.
    * The corpus re-resolves its live generation at EVERY micro-batch,
    * so an online [[graft.llm.Similarity.compactQuantizedCorpus]]
    * mid-stream is picked up at the next trigger: the serving loop
    * never holds a generation across triggers, closing the
    * two-compactions reader hazard for 24/7 serving. */
  def annTopKQuantizedStream(queries: DataFrame, qIdCol: String,
                             qVecCol: String, path: String, idCol: String,
                             dim: Int, k: Int,
                             outPath: String, checkpoint: String,
                             planes: Int = 8,
                             multiProbe: Boolean = true): DataStreamWriter[Row] =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.llm.Similarity.annTopKQuantizedIndexedBatch(batch, qIdCol,
              qVecCol, path, idCol, dim, k, planes, multiProbe)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        ()
      }

  /** Streaming ADC retrieval over a persisted PQ corpus — the PQ
    * analog of [[annTopKQuantizedStream]], completing the fifth index
    * family's serving story: each micro-batch of arriving query
    * vectors ranks through the batched ADC (per-query LUTs broadcast,
    * the corpus read as (id, codes, norm) only — 32× narrower than the
    * floats), lands per-batch OVERWRITE partitions (failure-replayed
    * micro-batches rewrite themselves), and re-resolves the corpus's
    * live generation at EVERY trigger, so an online
    * [[graft.llm.Pq.compactPqCorpus]] mid-stream is picked up at the
    * next micro-batch. */
  def annTopKPqStream(queries: DataFrame, qIdCol: String,
                      qVecCol: String, path: String, idCol: String,
                      k: Int, outPath: String,
                      checkpoint: String): DataStreamWriter[Row] =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.llm.Pq.annTopKPqIndexedBatch(batch.sparkSession, path,
              idCol, batch, qIdCol, qVecCol, k)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        ()
      }

  /** Streaming BM25 retrieval over a persisted lexical index — the
    * keyword sibling of [[annTopKPqStream]], completing the SIXTH
    * family's serving story: each micro-batch of arriving query texts
    * ranks through [[graft.llm.Lexical.bm25TopKIndexed]] (the
    * bucket-pruned postings restriction — the corpus read stays
    * proportional to the batch's terms), lands per-batch OVERWRITE
    * partitions (failure-replayed micro-batches rewrite themselves),
    * and resolves the index tables through the CATALOG at every
    * trigger, so an online [[graft.llm.Lexical.compactLexicalIndex]]
    * (or an append — fresh docs AND the stats they shift) mid-stream
    * is picked up at the next micro-batch. */
  def bm25QueryStream(queries: DataFrame, qIdCol: String,
                      qTextCol: String, name: String, path: String,
                      k: Int, outPath: String,
                      checkpoint: String): DataStreamWriter[Row] =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.llm.Lexical.bm25TopKIndexed(batch.sparkSession, name,
              path, batch, qIdCol, qTextCol, k)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        ()
      }

  /** Streaming reference-LM scoring — the monitoring/serving form of
    * [[graft.llm.NgramLm.score]]: each micro-batch of arriving docs
    * scores against the reference model (per-doc integer statistics +
    * smoothed mean log-prob + perplexity) and lands under its own
    * OVERWRITE batch_id partition (failure-replayed micro-batches
    * rewrite themselves — the serving-stream discipline). The model is
    * named by CATALOG TABLE and re-resolved at every trigger (the
    * family's live-generation discipline — a captured DataFrame would
    * pin a stale file listing), so a retrain that overwrites
    * `modelTable` is picked up at the next micro-batch. The streaming
    * analog of watching a feed's quality drift in real time: a
    * collapsing logprob distribution IS the broken-scraper alarm. */
  def lmScoreStream(docs: DataFrame, idCol: String, textCol: String,
                    modelTable: String, n: Int, outPath: String,
                    checkpoint: String,
                    alpha: Double = 1.0): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          // the catalog caches the table's file index — refresh per
          // trigger (metadata-only) so an overwrite-retrain's file set
          // replaces the stale listing instead of failing the batch
          batch.sparkSession.catalog.refreshTable(modelTable)
          graft.llm.NgramLm.score(batch, idCol, textCol,
              batch.sparkSession.table(modelTable), n, alpha)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        }
        ()
      }

  /** [[lmScoreStream]] for the quality CLASSIFIER
    * ([[graft.llm.Classifier.score]]): each micro-batch scores its
    * mean log-likelihood-ratio against the `<name>_nbc` catalog table —
    * re-resolved per trigger, so a wholesale retrain is picked up at
    * the next micro-batch — and lands under its own OVERWRITE batch_id
    * partition. The real-time curated-vs-crawl meter on a live feed:
    * a sinking llr_mean distribution means the feed is turning into
    * the negative seed. */
  def classifierScoreStream(docs: DataFrame, idCol: String,
                            textCol: String, modelTable: String,
                            outPath: String, checkpoint: String,
                            alpha: Double = 1.0): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          batch.sparkSession.catalog.refreshTable(modelTable)
          graft.llm.Classifier.score(batch, idCol, textCol,
              batch.sparkSession.table(modelTable), alpha)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        }
        ()
      }

  /** Streaming BPE encode ([[graft.llm.Bpe]]): each micro-batch
    * re-resolves the live `<name>_bpe` merge table from the catalog
    * (the [[classifierScoreStream]] discipline), so a mid-stream
    * wholesale retrain ([[graft.llm.Bpe.writeBpeModel]]) is picked up
    * at the next trigger without restarting the query; the
    * numMerges-bounded merge list is the only driver materialization
    * per batch. Per-batch overwrite partitions — a failure-replayed
    * micro-batch rewrites itself. */
  def bpeEncodeStream(docs: DataFrame, idCol: String, textCol: String,
                      mergesTable: String, outPath: String,
                      checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          batch.sparkSession.catalog.refreshTable(mergesTable)
          graft.llm.Bpe.encodeTokens(batch, idCol, textCol,
              graft.llm.Bpe.mergeList(
                batch.sparkSession.table(mergesTable)))
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        }
        ()
      }

  /** Streaming UNIGRAM-LM encode ([[graft.llm.Unigram]]): the
    * [[bpeEncodeStream]] posture for the second tokenizer family —
    * each micro-batch re-resolves the live `<name>_uni` piece table
    * AND the stamp from the catalog/path, so a mid-stream wholesale
    * retrain ([[graft.llm.Unigram.writeUnigramModel]]) or re-import is
    * picked up at the next trigger without restarting the query; the
    * vocabSize-bounded piece list is the only driver materialization
    * per batch. Per-batch overwrite partitions — a failure-replayed
    * micro-batch rewrites itself. */
  def uniEncodeStream(docs: DataFrame, idCol: String, textCol: String,
                      name: String, modelPath: String, outPath: String,
                      checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          batch.sparkSession.catalog.refreshTable(s"${name}_uni")
          graft.llm.Unigram.encodeIdsIndexed(batch.sparkSession, name,
              modelPath, batch, idCol, textCol)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        }
        ()
      }

  /** Streaming WORDPIECE encode ([[graft.llm.WordPiece]]): the
    * [[bpeEncodeStream]] posture for the third tokenizer family —
    * each micro-batch re-resolves the live `<name>_wp` vocabulary and
    * stamp, so a mid-stream re-import is picked up at the next
    * trigger. Per-batch overwrite partitions. */
  def wpEncodeStream(docs: DataFrame, idCol: String, textCol: String,
                     name: String, modelPath: String, outPath: String,
                     checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          batch.sparkSession.catalog.refreshTable(s"${name}_wp")
          graft.llm.WordPiece.encodeIdsIndexed(batch.sparkSession, name,
              modelPath, batch, idCol, textCol)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        }
        ()
      }

  /** Streaming LANGUAGE ID over the persisted multiclass model — the
    * monitoring/serving form of the pipeline's [[graft.llm.Pipeline
    * .LangFilter]] gate: each micro-batch predicts through the catalog
    * table (re-resolved per trigger, so a mid-stream wholesale retrain
    * is picked up at the next batch — the [[bpeEncodeStream]]
    * posture), landing (id, predicted) per batch partition. */
  def langPredictStream(docs: DataFrame, idCol: String, textCol: String,
                        modelTable: String, outPath: String,
                        checkpoint: String,
                        alpha: Double = 1.0): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          batch.sparkSession.catalog.refreshTable(modelTable)
          graft.llm.Classifier.predictMulti(batch, idCol, textCol,
              batch.sparkSession.table(modelTable), alpha)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        }
        ()
      }

  /** Streaming ADMISSION CONTROL — the streaming form of
    * [[graft.llm.Pipeline.ingestShard]]'s `admission` refusal, where
    * throwing would kill the whole query: each micro-batch is evaluated
    * against a [[graft.operators.Checks]] expectation set (ONE
    * aggregate over the batch); a passing batch lands under
    * `goodPath/batch_id=N`, a violating batch QUARANTINES wholesale —
    * raw rows plus the failing report — under `quarantinePath/
    * batch_id=N` for operator review, and the stream keeps running. A
    * broken upstream hour parks its batches instead of poisoning the
    * corpus OR stopping ingestion. Per-batch overwrite partitions, so
    * a failure-replayed micro-batch rewrites itself (the family's sink
    * contract); the batch is checkpointed once and feeds both the
    * verdict and the write — one evaluation end-to-end. */
  def admissionStream(docs: DataFrame,
                      constraints: Seq[graft.operators.Checks.Constraint],
                      goodPath: String, quarantinePath: String,
                      checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val cp = batch.localCheckpoint(true)
          val report = graft.operators.Checks.check(cp, constraints)
            .localCheckpoint(true)
          if (report.filter(!col("passed")).isEmpty)
            cp.write.mode("overwrite")
              .parquet(s"$goodPath/batch_id=$batchId")
          else {
            cp.write.mode("overwrite")
              .parquet(s"$quarantinePath/batch_id=$batchId/rows")
            report.write.mode("overwrite")
              .parquet(s"$quarantinePath/batch_id=$batchId/report")
          }
        }
        ()
      }

  /** STREAMING training-window landing: arriving documents flow
    * straight into GPT-style training windows — each micro-batch runs
    * [[graft.llm.Pipeline.ingestWindowsShard]] as its own mini-shard
    * under the label `stream-<batchId>`: the full O(batch) gate
    * against the standing index, the stable id-hash split, a
    * batch-local chop, and the `shard_label=/split=` landing. EXACTLY
    * the batch layout — a corpus can mix daily bulk shards and a live
    * stream under one root, and [[graft.llm.Pipeline.windowsReport]] /
    * `retractFromWindows` / `globalWindowIds` cover both identically.
    * Replay safety is inherited rather than re-invented: Structured
    * Streaming re-delivers a failed micro-batch under the SAME batch
    * id, which maps to the same shard label, where the per-shard
    * manifest makes the landing O(1)-idempotent and the suspects
    * snapshot recovers a crashed index append. Windows chop per batch
    * (a window never spans micro-batches) — the shard-local layout's
    * semantics, at micro-batch grain. */
  def windowsLandingStream(docs: DataFrame, bench: DataFrame,
                           idCol: String, textCol: String,
                           indexName: String, indexPath: String,
                           outPath: String, windowSize: Long,
                           checkpoint: String,
                           minTokens: Int = 3,
                           nearDupThreshold: Double = 0.5,
                           decontamK: Int = 5,
                           redactPii: Boolean = true,
                           fullWindowsOnly: Boolean = false,
                           lmFilter: Option[graft.llm.Pipeline.LmFilter] = None,
                           classifierFilter: Option[graft.llm.Pipeline.ClassifierFilter] = None,
                           gramScrub: Option[graft.llm.Pipeline.GramScrub] = None,
                           bpeWindows: Option[graft.llm.Pipeline.BpeWindows] = None,
                           langFilter: Option[graft.llm.Pipeline.LangFilter] = None): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.llm.Pipeline.ingestWindowsShard(batch, bench, idCol,
            textCol, indexName, indexPath, outPath, windowSize,
            s"stream-$batchId", minTokens, nearDupThreshold, decontamK,
            redactPii = redactPii, fullWindowsOnly = fullWindowsOnly,
            lmFilter = lmFilter, classifierFilter = classifierFilter,
            gramScrub = gramScrub, bpeWindows = bpeWindows,
            langFilter = langFilter)
        ()
      }

  /** STREAMING MEDIA INGEST — the [[windowsLandingStream]] posture
    * applied to the three perceptual-dedup families: each micro-batch
    * runs the composed batch ingest ([[graft.llm.Pipeline
    * .ingestImageShard]] / ingestAudioShard / ingestPayloadShard) as
    * its own mini-shard under the label `stream-<batchId>` — full
    * O(batch) perceptual gate against the standing index, single
    * decode pass, `shard_label=` landing, per-shard manifest. EXACTLY
    * the batch layout, so bulk daily shards and a live stream share
    * one landing root and one retraction path. Replay safety is
    * inherited: a failed micro-batch redelivers under the same batch
    * id → same label → the manifest O(1)-returns and the suspects
    * snapshot recovers a crashed index append.
    *
    * Admission composes the [[admissionStream]] posture rather than
    * the batch path's throw (which would kill the query): a violating
    * batch parks wholesale — raw rows plus the failing report — under
    * `quarantinePath/batch_id=N` and the stream keeps running; with no
    * quarantinePath the batch ingest's loud refusal propagates and
    * stops the stream (an operator choice, not a default). The batch
    * is checkpointed once; verdict and ingest read the same
    * materialization. */
  def imageIngestStream(docs: DataFrame, idCol: String, payloadCol: String,
                        indexName: String, indexPath: String,
                        outPath: String, checkpoint: String,
                        hammingK: Int = 3, buckets: Int = 8,
                        admission: Seq[graft.operators.Checks.Constraint] = Nil,
                        quarantinePath: Option[String] = None): DataStreamWriter[Row] =
    mediaIngestStream(docs, admission, quarantinePath, checkpoint,
      (batch, label, adm) => graft.llm.Pipeline.ingestImageShard(batch,
        idCol, payloadCol, indexName, indexPath, outPath, label, hammingK,
        buckets, adm))

  /** [[imageIngestStream]] for the audio envelope family. */
  def audioIngestStream(docs: DataFrame, idCol: String, payloadCol: String,
                        indexName: String, indexPath: String,
                        outPath: String, checkpoint: String,
                        hammingK: Int = 3, buckets: Int = 8,
                        admission: Seq[graft.operators.Checks.Constraint] = Nil,
                        quarantinePath: Option[String] = None): DataStreamWriter[Row] =
    mediaIngestStream(docs, admission, quarantinePath, checkpoint,
      (batch, label, adm) => graft.llm.Pipeline.ingestAudioShard(batch,
        idCol, payloadCol, indexName, indexPath, outPath, label, hammingK,
        buckets, adm))

  /** [[imageIngestStream]] for the opaque-payload byte-envelope family. */
  def payloadIngestStream(docs: DataFrame, idCol: String, payloadCol: String,
                          indexName: String, indexPath: String,
                          outPath: String, checkpoint: String,
                          hammingK: Int = 3, buckets: Int = 8,
                          admission: Seq[graft.operators.Checks.Constraint] = Nil,
                          quarantinePath: Option[String] = None): DataStreamWriter[Row] =
    mediaIngestStream(docs, admission, quarantinePath, checkpoint,
      (batch, label, adm) => graft.llm.Pipeline.ingestPayloadShard(batch,
        idCol, payloadCol, indexName, indexPath, outPath, label, hammingK,
        buckets, adm))

  private def mediaIngestStream(docs: DataFrame,
                                constraints: Seq[graft.operators.Checks.Constraint],
                                quarantinePath: Option[String],
                                checkpoint: String,
                                ingest: (org.apache.spark.sql.Dataset[Row], String, Seq[graft.operators.Checks.Constraint]) => Map[String, Long]): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val label = s"stream-$batchId"
          (constraints, quarantinePath) match {
            case (Nil, _) => ingest(batch, label, Nil)
            case (cs, None) =>
              // no parking lot: the batch ingest's requireAll refuses
              // loudly and the failure stops the stream — the operator
              // chose refusal over quarantine
              ingest(batch, label, cs)
            case (cs, Some(qp)) =>
              val cp = batch.localCheckpoint(true)
              val report = graft.operators.Checks.check(cp, cs)
                .localCheckpoint(true)
              if (report.filter(!col("passed")).isEmpty)
                ingest(cp, label, Nil) // verdict already green — don't re-aggregate
              else {
                cp.write.mode("overwrite")
                  .parquet(s"$qp/batch_id=$batchId/rows")
                report.write.mode("overwrite")
                  .parquet(s"$qp/batch_id=$batchId/report")
              }
          }
        }
        ()
      }

  /** Streaming retrieval over the persisted IVF+PQ index — the
    * cell-pruned sibling of [[annTopKPqStream]] (which scans the whole
    * flat corpus): each micro-batch ranks through
    * [[graft.llm.Pq.annTopKIvfPqBatch]], so the scan prunes to the
    * batch's distinct probe cells and RESIDUAL corpora serve too (the
    * flat path refuses them). Per-batch overwrite partitions,
    * generation re-resolved every trigger — the family's serving
    * contract. */
  def annTopKIvfPqStream(queries: DataFrame, qIdCol: String,
                         qVecCol: String, path: String, idCol: String,
                         k: Int, outPath: String, checkpoint: String,
                         nprobe: Int = 2): DataStreamWriter[Row] =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.llm.Pq.annTopKIvfPqBatch(batch.sparkSession, path,
              idCol, batch, qIdCol, qVecCol, k, nprobe)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        ()
      }

  /** Streaming INGEST GATE — the stateless-plus-watermark front half of
    * the batch pretraining pipeline (llm/Pipeline.pretrainCorpus), for
    * documents arriving as a stream: Gopher-style quality filter (pure
    * per-row predicate since TopGramFrac went native — fuses into the
    * source micro-batch scan), PII redaction (codegen'd regex), then
    * exact-content dedup within the watermark (canonicalized md5 key,
    * state O(docs-in-watermark), bounded by the delay). Near-dedup
    * against the standing corpus composes downstream via
    * [[nearDupPairsStream]]; benchmark filtering via
    * [[decontaminateStream]]. */
  def ingestGateStream(docs: DataFrame, tsCol: String, textCol: String,
                       watermarkDelay: String,
                       minTokens: Int = 3,
                       redactPii: Boolean = true): DataFrame = {
    val quality = docs.filter(
      graft.llm.TextStats.qualityKeep(col(textCol), minTokens = minTokens))
    // the dedup key comes from the PRE-redaction text: the batch path
    // (Dedup.exact) keys raw content, and two docs differing only in
    // their PII values are different documents — keying post-redaction
    // would merge them here but not in batch
    val keyed = quality
      .withColumn("__ck__", graft.llm.Dedup.canonicalKey(col(textCol)))
    val redacted =
      if (redactPii)
        keyed.withColumn(textCol,
          graft.llm.TextStats.redactPii(col(textCol)))
      else keyed
    redacted
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("__ck__"))
      .drop("__ck__")
  }

  def decontaminateStream(docs: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          k: Int = 5): DataFrame = {
    val hashes = bench
      .select(explode(
        graft.functions.TextHashExprs.shingleHashes(col(textCol), k)).as("__h__"))
      .distinct()
      .collect().map(_.getLong(0)).toSet
    val bc = docs.sparkSession.sparkContext.broadcast(hashes)
    // null text → null shingle array → no evidence of overlap → keep
    val hit = udf((arr: Seq[Long]) => arr != null && arr.exists(bc.value.contains))
    docs.filter(!hit(graft.functions.TextHashExprs.shingleHashes(col(textCol), k)))
  }
}
