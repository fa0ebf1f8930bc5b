package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftFrame
import graft.llm.{Dedup, Lexical, Multimodal, Similarity, TextHash, TextStats}
import QHelp._

/** LLM-pipeline text oracle queries: stats, fingerprints, exact + minhash
  * dedup, simhash — the DuckDB oracle recomputes the full pipelines
  * (identical integer hash arithmetic), so signatures, LSH buckets and
  * candidate pairs are value-checked end-to-end, not just counted. */
object QueriesText {

  // DuckDB mirrors of TextHash — kept adjacent to the Scala definitions.
  private def tokIdSql(w: String): String = TextHash.tokIdSql(w)

  /** CTEs: token ids → distinct numeric 3-shingle hashes → 16-hash
    * minhash signature (mirrors TextHash.shingleHashArray exactly).
    * `src` lets a query swap the document source for an augmented CTE
    * (q_minhash_sig unions a non-BMP fixture row — the sf fixtures are
    * ASCII, so without it the driver gate is blind to code-point vs
    * UTF-16 hashing divergence). */
  private def sigCtesFrom(src: String): String =
    s"""toks AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ' '), g -> ${tokIdSql("g")}) AS tid
       |  FROM $src
       |),
       |hs AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(tid)-1),
       |      i -> ((tid[i]*31 + tid[i+1])*31 + tid[i+2]) % 2147483647)) AS gs
       |  FROM toks WHERE len(tid) >= 3
       |),
       |sig AS (
       |  SELECT doc_id, list_transform(range(0, 16), i ->
       |    list_min(list_transform(gs,
       |      h -> (h * (i*2000006 + 1012345) + i*999983 + 423307) % 2147483647))) AS sig
       |  FROM hs
       |)""".stripMargin

  private val sigCtes = sigCtesFrom("documents")

  /** banded LSH candidates + exact-Jaccard pairs atop [[sigCtesFrom]]'s
    * toks/hs/sig names — `src` parameterizes the document source so the
    * e2e pipeline oracle can run the same machinery mid-chain. */
  private def pairsCtesFrom(src: String): String =
    s"""${sigCtesFrom(src)},
       |banded AS (
       |  SELECT doc_id, unnest(range(0, 4)) AS band,
       |    unnest(list_transform(range(0, 4), b ->
       |      array_to_string(sig[b*4+1:b*4+4], '_'))) AS key
       |  FROM sig
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |),
       |pairs AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_intersect(x.gs, y.gs)) AS DOUBLE)
       |      / len(list_distinct(list_concat(x.gs, y.gs))) AS jaccard
       |  FROM cand
       |  JOIN hs x ON x.doc_id = cand.id_a
       |  JOIN hs y ON y.doc_id = cand.id_b
       |)""".stripMargin

  private val pairsCtes = pairsCtesFrom("documents")

  def register(r: QueryRegistry): Unit = {

    val stop = Seq("the", "a", "of", "and", "to")
    val stopSqlList = stop.map(w => s"'$w'").mkString(", ")

    // Non-BMP fixture row unioned into the text oracles: 𝄞 and 🚀 are
    // supplementary (one code point = two UTF-16 units), so any relapse
    // into UTF-16-unit hashing/counting hash-mismatches the DuckDB gate
    // — the sf fixtures alone are ASCII and blind to that bug class.
    val uniText = "café 𝄞 naïve 🚀🚀 code-point test."
    def withUniRow(s: org.apache.spark.sql.SparkSession,
                   docs: org.apache.spark.sql.DataFrame) =
      docs.unionByName(s.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(-1L, uniText)),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType)))))
    val uniRowSql = s"UNION ALL SELECT -1, '$uniText'"

    r.reg("q_text_stats",
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 200
         |  $uniRowSql
         |)
         |SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |  CAST(CAST(ceil(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / 4.0) AS BIGINT)
         |    + length(regexp_replace(text, '[^0-9]', '', 'g'))
         |    + length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_tokens_bpe,
         |  CAST(length(text) AS INTEGER) AS n_chars,
         |  CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS avg_token_len,
         |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS type_token_ratio,
         |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
         |    / length(text) AS punct_ratio,
         |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopSqlList))) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS stopword_ratio,
         |  CAST(list_sum(list_transform(range(1, len(string_split(text, ' '))+1),
         |    i -> ((${tokIdSql("string_split(text, ' ')[i]")} % 2147483647)
         |          * ([1,31,961,29791,923521,28629151,887503681,1742810335])[(i-1)%8 + 1])
         |         % 2147483647)) % 2147483647 AS BIGINT) AS fingerprint,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_md5
         |FROM docs ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = withUniRow(s,
        t(s, dir, "documents").filter(col("doc_id") < 200).select("doc_id", "text"))
      GraftFrame(TextStats.qualityFrame(docs, "doc_id", "text", stop))
        .sortValues(Seq("doc_id" -> true)).df
    }

    // Gopher-style rule filter: planted rows exercise both repetition
    // signals (doc -2 is one repeated 2-gram; doc -3 repeats a line).
    val spamText = "buy now buy now buy now buy now"
    val dupLineText = "line one\nline one\nline one\nend ad"
    r.reg("q_quality_rules",
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 300
         |  UNION ALL SELECT -2, 'buy now buy now buy now buy now'
         |  UNION ALL SELECT -3, 'line one' || chr(10) || 'line one' || chr(10) || 'line one' || chr(10) || 'end ad'
         |),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
         |grams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
         |  FROM toks WHERE len(t) >= 2),
         |gcnt AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
         |gtop AS (SELECT doc_id, max(c) AS topc, sum(c) AS totc FROM gcnt GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
         |  CAST(list_sum(list_transform(string_split(d.text, ' '), w -> length(w))) AS DOUBLE)
         |    / len(string_split(d.text, ' ')) AS mean_word_len,
         |  CAST(1.0 - len(list_distinct(string_split(d.text, chr(10)))) * 1.0
         |    / len(string_split(d.text, chr(10))) AS DOUBLE) AS frac_dup_lines,
         |  CAST(COALESCE(topc * 1.0 / totc, 0.0) AS DOUBLE) AS frac_top_2gram,
         |  (len(string_split(d.text, ' ')) BETWEEN 3 AND 100000
         |   AND 1.0 - len(list_distinct(string_split(d.text, chr(10)))) * 1.0
         |       / len(string_split(d.text, chr(10))) < 0.3
         |   AND COALESCE(topc * 1.0 / totc, 0.0) < 0.2) AS keep
         |FROM docs d LEFT JOIN gtop USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val extra = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(-2L, spamText),
          org.apache.spark.sql.Row(-3L, dupLineText)),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select("doc_id", "text").unionByName(extra)
      GraftFrame(TextStats.qualityRules(docs, "doc_id", "text"))
        .sortValues(Seq("doc_id" -> true)).df
    }

    // The COMPLETE published Gopher rule set (r14, Rae et al. 2021
    // A1.1): mean word length, #/ellipsis symbol ratio, bullet-start
    // and ellipsis-end line fractions, alpha-word fraction, distinct
    // stop-word hits. Planted docs make every rule non-vacuous (one
    // fails each); minStopHits=1 here so the verdict also varies
    // across the real corpus ('the' appears, the other seven rarely).
    // The oracle recomputes every metric AND the keep verdict.
    r.reg("q_gopher_rules",
      """WITH d AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |  UNION ALL SELECT CAST(-1 AS BIGINT),
        |    array_to_string(list_transform(range(0,10), x -> '- item the'), chr(10))
        |      || chr(10) || 'plain tail'
        |  UNION ALL SELECT CAST(-2 AS BIGINT),
        |    'alpha beta...' || chr(10) || 'gamma…' || chr(10) || 'delta the of'
        |  UNION ALL SELECT CAST(-3 AS BIGINT), '### ### alpha the of and # with...'
        |  UNION ALL SELECT CAST(-4 AS BIGINT), '123 456 789 000 111 222'
        |  UNION ALL SELECT CAST(-5 AS BIGINT), 'abcdefghijklmnopqrstuvwxyz0123'
        |  UNION ALL SELECT CAST(-6 AS BIGINT),
        |    array_to_string(list_transform(range(0,20), x -> 'lorem ipsum dolor'), ' ')
        |  UNION ALL SELECT CAST(-7 AS BIGINT),
        |    array_to_string(list_transform(range(0,56), x -> 'word'), ' ')
        |      || ' the of and that'),
        |g AS (
        |  SELECT doc_id,
        |    string_split(text, ' ') AS toks,
        |    string_split(text, chr(10)) AS lines,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    length(text) - length(replace(text, '#', '')) AS nhash,
        |    (length(text) - length(replace(text, '...', ''))) // 3
        |      + (length(text) - length(replace(text, '…', ''))) AS nell
        |  FROM d),
        |m AS (
        |  SELECT doc_id, n AS n_words,
        |    CASE WHEN n = 0 THEN 0.0 ELSE
        |      CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) / n
        |    END AS mean_word_len,
        |    CAST(nhash + nell AS DOUBLE)
        |      / (CASE WHEN n = 0 THEN 1 ELSE n END) AS symbol_ratio,
        |    CAST(len(list_filter(lines,
        |        l -> substr(ltrim(l),1,1) IN ('-','*','•'))) AS DOUBLE)
        |      / len(lines) AS bullet_line_frac,
        |    CAST(len(list_filter(lines,
        |        l -> right(rtrim(l),3) = '...' OR right(rtrim(l),1) = '…')) AS DOUBLE)
        |      / len(lines) AS ellipsis_line_frac,
        |    CASE WHEN n = 0 THEN 0.0 ELSE
        |      CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / n
        |    END AS alpha_word_frac,
        |    CAST(len(list_intersect(list_distinct(toks),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
        |  FROM g)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
        |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stop_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |   AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
        |   AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
        |   AND stop_hits >= 1) AS keep
        |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val extra = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(-1L,
            Seq.fill(10)("- item the").mkString("\n") + "\nplain tail"),
          org.apache.spark.sql.Row(-2L,
            "alpha beta...\ngamma…\ndelta the of"),
          org.apache.spark.sql.Row(-3L, "### ### alpha the of and # with..."),
          org.apache.spark.sql.Row(-4L, "123 456 789 000 111 222"),
          org.apache.spark.sql.Row(-5L, "abcdefghijklmnopqrstuvwxyz0123"),
          org.apache.spark.sql.Row(-6L,
            Seq.fill(20)("lorem ipsum dolor").mkString(" ")),
          org.apache.spark.sql.Row(-7L,
            Seq.fill(56)("word").mkString(" ") + " the of and that")),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      val docs = t(s, dir, "documents").filter(col("text").isNotNull)
        .select("doc_id", "text").unionByName(extra)
      // r16 optimization: materialize the report before the sort — the
      // terminal sort's range exchange SAMPLES its narrow child, so the
      // scan-fused rule evaluation ran twice per execution (measured as
      // two identical 8-task jobs). r17: a lazy persist instead of the
      // eager localCheckpoint — the sampling pass populates the cache
      // and the real pass reads it (still ONE evaluation), without
      // pinning a corpus-sized LINEAGE-TRUNCATED frame in executor
      // storage (an executor loss under localCheckpoint fails the job at
      // scale; under persist the partition recomputes). Bench clears
      // caches between passes; results identical.
      GraftFrame(TextStats.gopherReport(docs, "doc_id", "text",
          minStopHits = 1L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        .sortValues(Seq("doc_id" -> true)).df
    }

    // DATASET CARD (r14 cont): the one-pass GROUPING SETS corpus
    // summary — global + per-lang + per-source rows with doc/token/
    // char masses, gate pass rates and PII incidence. Planted docs
    // (lang 'xx', source 'planted') carry an email, a spam doc and a
    // healthy doc so every rate column varies; minStopHits=1 keeps
    // the gopher rate non-vacuous over the real corpus.
    r.reg("q_dataset_card",
      """WITH raw AS (
        |  SELECT doc_id, lang, source, text FROM documents
        |  UNION ALL SELECT CAST(-1 AS BIGINT), 'xx', 'planted',
        |    'contact me at alice.smith@example.org for the of and details today always'
        |  UNION ALL SELECT CAST(-2 AS BIGINT), 'xx', 'planted',
        |    'buy now buy now buy now buy now'
        |  UNION ALL SELECT CAST(-3 AS BIGINT), 'xx', 'planted', NULL),
        |toks AS (SELECT doc_id, lang, source, text,
        |          string_split(text, ' ') AS t FROM raw),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        |  FROM toks WHERE text IS NOT NULL AND len(t) >= 2),
        |gtop AS (SELECT doc_id, max(c) AS topc, sum(c) AS totc FROM
        |          (SELECT doc_id, g, count(*) AS c FROM grams
        |           GROUP BY doc_id, g) GROUP BY doc_id),
        |d AS (
        |  SELECT x.lang, x.source,
        |    CASE WHEN x.text IS NOT NULL THEN CAST(len(x.t) AS BIGINT) ELSE 0 END AS tok,
        |    CASE WHEN x.text IS NOT NULL THEN CAST(length(x.text) AS BIGINT) ELSE 0 END AS ch,
        |    CASE WHEN x.text IS NOT NULL THEN 1 ELSE 0 END AS nn,
        |    CASE WHEN x.text IS NOT NULL
        |          AND len(x.t) BETWEEN 3 AND 100000
        |          AND 1.0 - len(list_distinct(string_split(x.text, chr(10)))) * 1.0
        |              / len(string_split(x.text, chr(10))) < 0.3
        |          AND COALESCE(g.topc * 1.0 / g.totc, 0.0) < 0.2
        |         THEN 1 ELSE 0 END AS q,
        |    CASE WHEN x.text IS NOT NULL
        |          AND len(x.t) BETWEEN 50 AND 100000
        |          AND CAST(list_sum(list_transform(x.t, w -> length(w))) AS DOUBLE)
        |              / len(x.t) BETWEEN 3.0 AND 10.0
        |          AND CAST((length(x.text) - length(replace(x.text,'#','')))
        |              + (length(x.text) - length(replace(x.text,'...',''))) // 3
        |              + (length(x.text) - length(replace(x.text,'…',''))) AS DOUBLE)
        |              / len(x.t) <= 0.1
        |          AND CAST(len(list_filter(string_split(x.text, chr(10)),
        |              l -> substr(ltrim(l),1,1) IN ('-','*','•'))) AS DOUBLE)
        |              / len(string_split(x.text, chr(10))) <= 0.9
        |          AND CAST(len(list_filter(string_split(x.text, chr(10)),
        |              l -> right(rtrim(l),3) = '...' OR right(rtrim(l),1) = '…')) AS DOUBLE)
        |              / len(string_split(x.text, chr(10))) <= 0.3
        |          AND CAST(len(list_filter(x.t, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
        |              / len(x.t) >= 0.8
        |          AND len(list_intersect(list_distinct(x.t),
        |              ['the','be','to','of','and','that','have','with'])) >= 1
        |         THEN 1 ELSE 0 END AS gk,
        |    CASE WHEN x.text IS NOT NULL AND regexp_matches(x.text,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
        |         THEN 1 ELSE 0 END AS pii
        |  FROM toks x LEFT JOIN gtop g USING (doc_id))
        |SELECT
        |  CASE WHEN GROUPING(lang) = 0 THEN 'lang'
        |       WHEN GROUPING(source) = 0 THEN 'source' ELSE 'corpus' END AS section,
        |  CASE WHEN GROUPING(lang) = 0 THEN COALESCE(CAST(lang AS VARCHAR), '<null>')
        |       WHEN GROUPING(source) = 0 THEN COALESCE(CAST(source AS VARCHAR), '<null>')
        |       ELSE '_all_' END AS key,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(ch) AS BIGINT) AS n_chars,
        |  CASE WHEN sum(nn) = 0 THEN NULL
        |       ELSE CAST(sum(tok) AS DOUBLE) / sum(nn) END AS mean_doc_tokens,
        |  CASE WHEN sum(nn) = 0 THEN NULL
        |       ELSE CAST(sum(q) AS DOUBLE) / sum(nn) END AS quality_keep_rate,
        |  CASE WHEN sum(nn) = 0 THEN NULL
        |       ELSE CAST(sum(gk) AS DOUBLE) / sum(nn) END AS gopher_keep_rate,
        |  CASE WHEN sum(nn) = 0 THEN NULL
        |       ELSE CAST(sum(pii) AS DOUBLE) / sum(nn) END AS pii_email_rate
        |FROM d GROUP BY GROUPING SETS ((), (lang), (source))
        |ORDER BY section, key""".stripMargin) { (s, dir) =>
      val extra = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(-1L, "xx", "planted",
            "contact me at alice.smith@example.org for the of and " +
              "details today always"),
          org.apache.spark.sql.Row(-2L, "xx", "planted",
            "buy now buy now buy now buy now"),
          org.apache.spark.sql.Row(-3L, "xx", "planted", null)),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("lang", StringType),
          StructField("source", StringType),
          StructField("text", StringType))))
      val docs = t(s, dir, "documents")
        .select("doc_id", "lang", "source", "text").unionByName(extra)
      GraftFrame(TextStats.datasetCard(docs, "text",
          Seq("lang", "source"), minStopHits = 1L))
        .sortValues(Seq("section" -> true, "key" -> true)).df
    }

    // Declarative one-pass constraint suite (operators/Checks): the
    // whole expectation set is a single aggregate scan; the oracle
    // recomputes every metric AND the pass verdicts. The set mixes
    // passing and failing rows on purpose — an all-pass fixture would
    // leave the verdict column vacuous (unique(lang) and the ≤100-chars
    // bound fail at both scales).
    r.reg("q_check_constraints",
      """WITH m AS (
        |  SELECT
        |    CAST(COUNT(text) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS nn,
        |    CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ud,
        |    CAST(COUNT(DISTINCT lang) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ul,
        |    CAST(COUNT(DISTINCT (lang, source)) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS uls,
        |    CAST(COUNT(CASE WHEN n_chars >= 1 AND n_chars <= 10000 THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(n_chars) AS DOUBLE) AS b1,
        |    CAST(COUNT(CASE WHEN n_chars >= 0 AND n_chars <= 100 THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(n_chars) AS DOUBLE) AS b2,
        |    CAST(COUNT(CASE WHEN lang IN ('en', 'de', 'fr') THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(lang) AS DOUBLE) AS s1,
        |    CAST(COUNT(CASE WHEN regexp_matches(source, '^src[0-9]+$') THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(source) AS DOUBLE) AS m1,
        |    CAST(COUNT(*) AS DOUBLE) AS rc,
        |    CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
        |      / CAST(COUNT(n_chars) AS DOUBLE) AS mu,
        |    CAST(quantile_cont(n_chars, 0.9) AS DOUBLE) AS q90,
        |    CAST(COUNT(CASE WHEN n_chars = length(text) THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS sat1,
        |    CAST(COUNT(CASE WHEN n_chars > 100 THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS sat2
        |  FROM documents
        |)
        |SELECT 'not_null' AS "constraint", 'text' AS "column", nn AS observed,
        |  CAST(1.0 AS DOUBLE) AS lo, CAST(1.0 AS DOUBLE) AS hi,
        |  nn >= 1.0 AND nn <= 1.0 AS passed FROM m
        |UNION ALL SELECT 'unique', 'doc_id', ud, CAST(1.0 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), ud >= 1.0 AND ud <= 1.0 FROM m
        |UNION ALL SELECT 'unique', 'lang', ul, CAST(1.0 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), ul >= 1.0 AND ul <= 1.0 FROM m
        |UNION ALL SELECT 'unique', 'lang,source', uls, CAST(1.0 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), uls >= 1.0 AND uls <= 1.0 FROM m
        |UNION ALL SELECT 'bounds', 'n_chars', b1, CAST(1.0 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), b1 >= 1.0 AND b1 <= 1.0 FROM m
        |UNION ALL SELECT 'bounds', 'n_chars', b2, CAST(0.9 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), b2 >= 0.9 AND b2 <= 1.0 FROM m
        |UNION ALL SELECT 'in_set', 'lang', s1, CAST(0.5 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), s1 >= 0.5 AND s1 <= 1.0 FROM m
        |UNION ALL SELECT 'matches', 'source', m1, CAST(1.0 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), m1 >= 1.0 AND m1 <= 1.0 FROM m
        |UNION ALL SELECT 'row_count', '*', rc, CAST(100 AS DOUBLE),
        |  CAST(10000000 AS DOUBLE), rc >= 100 AND rc <= 10000000 FROM m
        |UNION ALL SELECT 'mean', 'n_chars', mu, CAST(100.0 AS DOUBLE),
        |  CAST(500.0 AS DOUBLE), mu >= 100.0 AND mu <= 500.0 FROM m
        |UNION ALL SELECT 'p0.9', 'n_chars', q90, CAST(300.0 AS DOUBLE),
        |  CAST(520.0 AS DOUBLE), q90 >= 300.0 AND q90 <= 520.0 FROM m
        |UNION ALL SELECT 'satisfies', 'n_chars_consistent', sat1,
        |  CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
        |  sat1 >= 1.0 AND sat1 <= 1.0 FROM m
        |UNION ALL SELECT 'satisfies', 'long_docs', sat2,
        |  CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
        |  sat2 >= 1.0 AND sat2 <= 1.0 FROM m""".stripMargin) { (s, dir) =>
      import graft.operators.Checks
      Checks.check(t(s, dir, "documents"), Seq(
        Checks.NotNull("text"),
        Checks.Unique(Seq("doc_id")),
        Checks.Unique(Seq("lang")),
        Checks.Unique(Seq("lang", "source")),
        Checks.Bounds("n_chars", 1, 10000),
        Checks.Bounds("n_chars", 0, 100, 0.9),
        Checks.InSet("lang", Seq("en", "de", "fr"), 0.5),
        Checks.Matches("source", "^src[0-9]+$"),
        Checks.RowCountBetween(100L, 10000000L),
        Checks.MeanBetween("n_chars", 100.0, 500.0),
        Checks.PercentileBetween("n_chars", 0.9, 300.0, 520.0),
        Checks.Satisfies("n_chars_consistent", "n_chars = length(text)"),
        Checks.Satisfies("long_docs", "n_chars > 100")))
    }

    // Per-group (fleet-view) constraint report: one map-side-combined
    // groupBy pass; RowCountBetween bounds each LANGUAGE's share here,
    // and the 60-char bound (minRatio 0.98) fails for some languages only — the oracle
    // checks verdicts vary BY group, not just globally.
    r.reg("q_check_constraints_by",
      """WITH m AS (
        |  SELECT lang,
        |    CAST(COUNT(text) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS nn,
        |    CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ud,
        |    CAST(COUNT(CASE WHEN n_chars >= 60 AND n_chars <= 10000 THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(n_chars) AS DOUBLE) AS b1,
        |    CAST(COUNT(*) AS DOUBLE) AS rc,
        |    CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
        |      / CAST(COUNT(n_chars) AS DOUBLE) AS mu
        |  FROM documents GROUP BY lang
        |)
        |SELECT * FROM (
        |  SELECT lang, 'bounds' AS "constraint", 'n_chars' AS "column",
        |    b1 AS observed, CAST(0.98 AS DOUBLE) AS lo,
        |    CAST(1.0 AS DOUBLE) AS hi, b1 >= 0.98 AND b1 <= 1.0 AS passed
        |  FROM m
        |  UNION ALL SELECT lang, 'mean', 'n_chars', mu, CAST(100.0 AS DOUBLE),
        |    CAST(500.0 AS DOUBLE), mu >= 100.0 AND mu <= 500.0 FROM m
        |  UNION ALL SELECT lang, 'not_null', 'text', nn, CAST(1.0 AS DOUBLE),
        |    CAST(1.0 AS DOUBLE), nn >= 1.0 AND nn <= 1.0 FROM m
        |  UNION ALL SELECT lang, 'row_count', '*', rc, CAST(60 AS DOUBLE),
        |    CAST(100000 AS DOUBLE), rc >= 60 AND rc <= 100000 FROM m
        |  UNION ALL SELECT lang, 'unique', 'doc_id', ud, CAST(1.0 AS DOUBLE),
        |    CAST(1.0 AS DOUBLE), ud >= 1.0 AND ud <= 1.0 FROM m
        |) ORDER BY lang, "constraint", "column", lo""".stripMargin) { (s, dir) =>
      import graft.operators.Checks
      Checks.checkBy(t(s, dir, "documents"), Seq("lang"), Seq(
        Checks.NotNull("text"),
        Checks.Unique(Seq("doc_id")),
        Checks.Bounds("n_chars", 60, 10000, 0.98),
        Checks.RowCountBetween(60L, 100000L),
        Checks.MeanBetween("n_chars", 100.0, 500.0)))
    }

    // Vector-shard admission constraints over the embeddings table:
    // dimension uniformity and element finiteness — the checks the
    // embedding ingest gate's admission parameter runs at the door.
    // The dim=32 row fails on every vector (observed 0.0) so the
    // verdict column is non-vacuous at both scales.
    r.reg("q_check_constraints_vec",
      """WITH m AS (
        |  SELECT
        |    CAST(COUNT(embedding) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS nn,
        |    CAST(COUNT(CASE WHEN len(embedding) = 64 THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(embedding) AS DOUBLE) AS d64,
        |    CAST(COUNT(CASE WHEN len(embedding) = 32 THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(embedding) AS DOUBLE) AS d32,
        |    CAST(COUNT(CASE WHEN len(list_filter(embedding,
        |        x -> isnan(x) OR isinf(x))) = 0 THEN 1 END) AS DOUBLE)
        |      / CAST(COUNT(embedding) AS DOUBLE) AS fin
        |  FROM embeddings
        |)
        |SELECT 'finite_vector' AS "constraint", 'embedding' AS "column",
        |  fin AS observed, CAST(1.0 AS DOUBLE) AS lo,
        |  CAST(1.0 AS DOUBLE) AS hi, fin >= 1.0 AND fin <= 1.0 AS passed FROM m
        |UNION ALL SELECT 'not_null', 'embedding', nn, CAST(1.0 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), nn >= 1.0 AND nn <= 1.0 FROM m
        |UNION ALL SELECT 'vector_dim', 'embedding', d32, CAST(1.0 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), d32 >= 1.0 AND d32 <= 1.0 FROM m
        |UNION ALL SELECT 'vector_dim', 'embedding', d64, CAST(1.0 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), d64 >= 1.0 AND d64 <= 1.0 FROM m
        |ORDER BY "constraint", observed""".stripMargin) { (s, dir) =>
      import graft.operators.Checks
      import org.apache.spark.sql.functions.col
      Checks.check(t(s, dir, "embeddings"), Seq(
        Checks.FiniteVector("embedding"),
        Checks.NotNull("embedding"),
        Checks.VectorDim("embedding", 32),
        Checks.VectorDim("embedding", 64)))
        .orderBy(col("constraint"), col("observed"))
    }

    // str accessor completion: get / join / slice_replace (the last three
    // reference `_str_accessor.py` members) — negative-index get and the
    // Python slice identity s[:start] + repl + s[stop:] value-checked.
    r.reg("q_str_ops2",
      """SELECT doc_id,
        |  CASE WHEN length(source) > 2 THEN substr(source, 3, 1) END AS get2,
        |  CASE WHEN length(source) >= 1 THEN substr(source, -1, 1) END AS get_last,
        |  array_to_string(string_split(text, ' '), '-') AS joined,
        |  substr(source, 1, 2) || 'XY' || substr(source, 6) AS slice_rep
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.api.StrOps.RichStrColumn
      t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          col("source").strGet(2).as("get2"),
          col("source").strGet(-1).as("get_last"),
          col("text").strJoinTokens(" ", "-").as("joined"),
          col("source").strSliceReplace(2, 5, "XY").as("slice_rep"))
        .orderBy("doc_id")
    }

    r.reg("q_str_ops",
      """SELECT doc_id,
        |  upper(source) AS up, lower(source) AS lo, trim(source) AS tr,
        |  CAST(length(text) AS INTEGER) AS len,
        |  CAST(contains(text, 'spark') AS BOOLEAN) AS has_spark,
        |  CAST(starts_with(source, 'src') AS BOOLEAN) AS sw,
        |  CAST(ends_with(source, '1') AS BOOLEAN) AS ew,
        |  replace(source, 'src', 'origin_') AS rep,
        |  regexp_replace(text, '[aeiou]', '_', 'g') AS devowel,
        |  lpad(source, 10, '0') AS padded,
        |  substr(text, 1, 12) AS sliced,
        |  CAST(length(text) - length(regexp_replace(text, 'data', '', 'g')) AS INTEGER) AS data_chars,
        |  CAST(strpos(text, 'join') - 1 AS INTEGER) AS find_join,
        |  regexp_extract(source, '([0-9]+)', 1) AS src_num,
        |  CAST(regexp_matches(text, '^(?:key|data)') AS BOOLEAN) AS starts_kw,
        |  reverse(source) AS rev,
        |  repeat(source, 2) AS rep2,
        |  lpad(source, 8, '0') AS zf,
        |  ltrim(text) AS ls, rtrim(text) AS rs,
        |  upper(substr(source, 1, 1)) || lower(substr(source, 2)) AS cap,
        |  CASE WHEN length(source) = 0 THEN ''
        |       ELSE list_aggregate(list_transform(string_split(source, ''),
        |              x -> CASE WHEN x = lower(x) THEN upper(x) ELSE lower(x) END),
        |            'string_agg', '') END AS sw_case,
        |  CASE WHEN length(source) >= 11 THEN source
        |       ELSE rpad(lpad(source,
        |              CAST(length(source) + floor((11 - length(source)) / 2)
        |                   + ((11 - length(source)) % 2) AS INTEGER),
        |              '*'), 11, '*') END AS ctr,
        |  array_to_string(CASE WHEN strpos(source, 'r') = 0 THEN [source, '', '']
        |       ELSE [substr(source, 1, strpos(source, 'r') - 1), 'r',
        |             substr(source, strpos(source, 'r') + 1)] END, chr(31)) AS part3,
        |  array_to_string(CASE WHEN strpos(reverse(text), ' ') = 0 THEN ['', '', text]
        |       ELSE [substr(text, 1, length(text) - strpos(reverse(text), ' ')), ' ',
        |             substr(text, length(text) - strpos(reverse(text), ' ') + 2)]
        |       END, chr(31)) AS rpart3,
        |  CASE WHEN starts_with(source, 'src') THEN substr(source, 4)
        |       ELSE source END AS rmp,
        |  CASE WHEN ends_with(source, '1') THEN substr(source, 1, length(source) - 1)
        |       ELSE source END AS rms,
        |  translate(source, 'src', 'XYZ') AS tl,
        |  coalesce(array_to_string(regexp_extract_all(text, 'da[a-z]+'), chr(31)), '') AS fa,
        |  CAST(CASE WHEN strpos(reverse(text), reverse('data')) = 0 THEN -1
        |       ELSE length(text) - 4 - strpos(reverse(text), reverse('data')) + 1
        |       END AS INTEGER) AS rf,
        |  CAST(CASE WHEN strpos(text, 'data') = 0 THEN NULL
        |       ELSE strpos(text, 'data') - 1 END AS INTEGER) AS idx0,
        |  CAST(CASE WHEN strpos(reverse(text), reverse('data')) = 0 THEN NULL
        |       ELSE length(text) - 4 - strpos(reverse(text), reverse('data')) + 1
        |       END AS INTEGER) AS ridx,
        |  CAST(regexp_matches(source,
        |    '^[^A-Za-z]*(?:[A-Z][a-z]*[^A-Za-z]+)*(?:[A-Z][a-z]*)?[^A-Za-z]*$')
        |    AND regexp_matches(source, '[A-Za-z]') AS BOOLEAN) AS ist,
        |  CAST(regexp_matches(upper(substr(source, 1, 1)) || lower(substr(source, 2)),
        |    '^[^A-Za-z]*(?:[A-Z][a-z]*[^A-Za-z]+)*(?:[A-Z][a-z]*)?[^A-Za-z]*$')
        |    AND regexp_matches(source, '[A-Za-z]') AS BOOLEAN) AS ist_cap,
        |  CAST(regexp_matches(source, '^[0-9]+$') AS BOOLEAN) AS isdec,
        |  nfc_normalize(text) AS nfc,
        |  rtrim(regexp_replace(substr(text, 1, 30), '(.{1,12})( +|$)',
        |    '\1' || chr(10), 'g'), chr(10)) AS wr,
        |  list_extract(string_split(text, ' '), 3) AS w2,
        |  CAST(regexp_matches(text, '^(?:[a-z ]+)$') AS BOOLEAN) AS fm,
        |  CAST(regexp_matches(source, '^[A-Za-z]+$') AS BOOLEAN) AS isal,
        |  CAST(regexp_matches(source, '^[A-Za-z0-9]+$') AS BOOLEAN) AS isaln,
        |  CAST(regexp_matches(source, '^\s+$') AS BOOLEAN) AS issp,
        |  CAST(source = lower(source) AND regexp_matches(source, '[A-Za-z]') AS BOOLEAN) AS islo,
        |  CAST(source = upper(source) AND regexp_matches(source, '[A-Za-z]') AS BOOLEAN) AS isup,
        |  CAST(regexp_matches(source, '^[0-9]+$') AS BOOLEAN) AS isdg,
        |  CASE WHEN source IS NULL OR lang IS NULL THEN NULL
        |       ELSE source || '|' || lang END AS catl
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.api.StrOps._
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          col("source").strUpper.as("up"), col("source").strLower.as("lo"),
          col("source").strStrip.as("tr"),
          col("text").strLen.as("len"),
          col("text").strContains("spark").as("has_spark"),
          col("source").strStartswith("src").as("sw"),
          col("source").strEndswith("1").as("ew"),
          col("source").strReplaceLit("src", "origin_").as("rep"),
          col("text").strReplace("[aeiou]", "_").as("devowel"),
          col("source").strPadLeft(10, "0").as("padded"),
          col("text").strSlice(0, 12).as("sliced"),
          (col("text").strCount("data") * 4).as("data_chars"),
          col("text").strFind("join").as("find_join"),
          col("source").strExtract("([0-9]+)", 1).as("src_num"),
          col("text").strMatch("key|data").as("starts_kw"),
          col("source").strReverse.as("rev"),
          col("source").strRepeat(2).as("rep2"),
          col("source").strZfill(8).as("zf"),
          col("text").strLstrip.as("ls"), col("text").strRstrip.as("rs"),
          col("source").strCapitalize.as("cap"),
          col("source").strSwapcase.as("sw_case"),
          col("source").strCenter(11, "*").as("ctr"),
          // partition/rpartition/findall produce array columns; the driver's
          // pandas row-sort cannot hash ndarray cells, so the oracle-checked
          // form joins the parts with a US (0x1f) separator on both engines.
          array_join(col("source").strPartition("r"), "\u001f").as("part3"),
          array_join(col("text").strRpartition(" "), "\u001f").as("rpart3"),
          col("source").strRemoveprefix("src").as("rmp"),
          col("source").strRemovesuffix("1").as("rms"),
          col("source").strTranslate("src", "XYZ").as("tl"),
          array_join(col("text").strFindall("da[a-z]+"), "\u001f").as("fa"),
          col("text").strRfind("data").as("rf"),
          col("text").strIndexOf("data").as("idx0"),
          col("text").strRindex("data").as("ridx"),
          col("source").strIstitle.as("ist"),
          col("source").strCapitalize.strIstitle.as("ist_cap"),
          col("source").strIsdecimal.as("isdec"),
          col("text").strNormalize.as("nfc"),
          col("text").strSlice(0, 30).strWrap(12).as("wr"),
          col("text").strSplitGet(" ", 2).as("w2"),
          col("text").strFullmatch("[a-z ]+").as("fm"),
          col("source").strIsalpha.as("isal"),
          col("source").strIsalnum.as("isaln"),
          col("source").strIsspace.as("issp"),
          col("source").strIslower.as("islo"),
          col("source").strIsupper.as("isup"),
          col("source").strIsdigit.as("isdg"),
          col("source").strCatAligned(col("lang"), "|").as("catl"))
        .orderBy("doc_id")
    }

    // dt accessor completion: weekday alias, leap-year flag, time-of-day
    // string, monthly period end instant (next month start − 1 µs).
    r.reg("q_dt_ops2",
      """SELECT event_id,
        |  CAST((dayofweek(ts) + 6) % 7 AS INTEGER) AS wd,
        |  (year(ts) % 4 = 0 AND (year(ts) % 100 <> 0 OR year(ts) % 400 = 0)) AS leap,
        |  strftime(ts, '%H:%M:%S') AS tod,
        |  date_trunc('month', ts) + INTERVAL 1 MONTH - INTERVAL 1 MICROSECOND AS end_time
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
      import graft.api.DtOps.RichDtColumn
      t(s, dir, "events").filter(col("event_id") < 200)
        .select(col("event_id"),
          col("ts").dtWeekday.cast(IntegerType).as("wd"),
          col("ts").dtIsLeapYear.as("leap"),
          col("ts").dtTime.as("tod"),
          col("ts").dtEndTimeMonth.as("end_time"))
        .orderBy("event_id")
    }

    r.reg("q_dt_ops",
      """SELECT event_id,
        |  CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS mo,
        |  CAST(day(ts) AS INTEGER) AS d, CAST(hour(ts) AS INTEGER) AS h,
        |  CAST(minute(ts) AS INTEGER) AS mi, CAST(second(ts) AS INTEGER) AS sec,
        |  CAST(quarter(ts) AS INTEGER) AS q, CAST(dayofyear(ts) AS INTEGER) AS doy,
        |  CAST(weekofyear(ts) AS INTEGER) AS w,
        |  CAST((dayofweek(ts) + 6) % 7 AS INTEGER) AS dw_pandas,
        |  CAST(day(last_day(ts)) AS INTEGER) AS dim,
        |  CAST(day(ts) = 1 AS BOOLEAN) AS is_ms,
        |  date_trunc('hour', ts) AS fl_hour,
        |  date_trunc('day', ts) AS norm,
        |  strftime(ts, '%Y-%m-%d %H') AS fmt,
        |  monthname(ts) AS mn, dayname(ts) AS dn,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep,
        |  CAST(strftime(ts, '%f') AS INTEGER) AS micro,
        |  CAST(isoyear(ts) AS INTEGER) AS iso_y,
        |  CAST(isodow(ts) AS INTEGER) AS iso_d,
        |  strftime(ts, '%Y-%m') AS per_m,
        |  CAST(year(ts) AS VARCHAR) || 'Q' || CAST(quarter(ts) AS VARCHAR) AS per_q,
        |  strftime(ts, '%Y-%m-%d') AS per_d,
        |  CAST(epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS DOUBLE) / 1000000 AS sec_of_day,
        |  timezone('UTC', timezone('America/New_York', ts)) AS tz_loc,
        |  CAST(day(ts) = 1 AND (month(ts) - 1) % 3 = 0 AS BOOLEAN) AS is_qs,
        |  CAST(CAST(ts AS DATE) = last_day(ts) AND month(ts) % 3 = 0 AS BOOLEAN) AS is_qe,
        |  CAST(dayofyear(ts) = 1 AS BOOLEAN) AS is_ys,
        |  CAST(month(ts) = 12 AND day(ts) = 31 AS BOOLEAN) AS is_ye,
        |  CAST(day(ts) = day(last_day(ts)) AS BOOLEAN) AS is_me,
        |  CASE WHEN date_trunc('hour', ts) = ts THEN ts
        |       ELSE date_trunc('hour', ts) + INTERVAL 1 HOUR END AS ceil_h,
        |  CASE WHEN (epoch_us(ts) - epoch_us(date_trunc('hour', ts)))
        |          < (epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) - epoch_us(ts))
        |       THEN date_trunc('hour', ts)
        |       ELSE date_trunc('hour', ts) + INTERVAL 1 HOUR END AS round_h
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin) { (s, dir) =>
      import graft.api.DtOps._
      t(s, dir, "events").filter(col("event_id") < 500)
        .select(col("event_id"),
          col("ts").dtYear.as("y"), col("ts").dtMonth.as("mo"),
          col("ts").dtDay.as("d"), col("ts").dtHour.as("h"),
          col("ts").dtMinute.as("mi"), col("ts").dtSecond.as("sec"),
          col("ts").dtQuarter.as("q"), col("ts").dtDayofyear.as("doy"),
          col("ts").dtWeek.as("w"),
          col("ts").dtDayofweek.as("dw_pandas"),
          col("ts").dtDaysInMonth.as("dim"),
          col("ts").dtIsMonthStart.as("is_ms"),
          col("ts").dtFloor("hour").cast(TimestampNTZType).as("fl_hour"),
          col("ts").dtNormalize.cast(TimestampNTZType).as("norm"),
          col("ts").dtStrftime("yyyy-MM-dd HH").as("fmt"),
          col("ts").dtMonthName.as("mn"), col("ts").dtDayName.as("dn"),
          col("ts").dtEpochSeconds.as("ep"),
          col("ts").dtMicrosecond.as("micro"),
          col("ts").dtIsoYear.as("iso_y"),
          col("ts").dtIsoDow.as("iso_d"),
          col("ts").dtToPeriod("M").as("per_m"),
          col("ts").dtToPeriod("Q").as("per_q"),
          col("ts").dtToPeriod("D").as("per_d"),
          graft.api.DtOps.secondsBetween(col("ts").dtNormalize, col("ts")).as("sec_of_day"),
          col("ts").dtTzLocalize("America/New_York").cast(TimestampNTZType).as("tz_loc"),
          col("ts").dtIsQuarterStart.as("is_qs"),
          col("ts").dtIsQuarterEnd.as("is_qe"),
          col("ts").dtIsYearStart.as("is_ys"),
          col("ts").dtIsYearEnd.as("is_ye"),
          col("ts").dtIsMonthEnd.as("is_me"),
          col("ts").dtCeil("hour").cast(TimestampNTZType).as("ceil_h"),
          col("ts").dtRound("hour").cast(TimestampNTZType).as("round_h"))
        .orderBy("event_id")
    }

    r.reg("q_str_dummies",
      """SELECT doc_id,
        |  CAST(list_contains(string_split(lang, ','), 'de') AS INTEGER) AS lang_de,
        |  CAST(list_contains(string_split(lang, ','), 'en') AS INTEGER) AS lang_en,
        |  CAST(list_contains(string_split(lang, ','), 'fr') AS INTEGER) AS lang_fr
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents").filter(col("doc_id") < 200))
        .strGetDummies("lang", ",", Seq("de", "en", "fr"))
        .select("doc_id", "lang_de", "lang_en", "lang_fr")
        .sortValues(Seq("doc_id" -> true)).df
    }

    r.reg("q_factorize",
      """SELECT doc_id, lang,
        |  CAST(dense_rank() OVER (ORDER BY lang) - 1 AS INTEGER) AS lang_code
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // categorical-codes analog (SURVEY §2.3: no Spark categorical type;
      // codes via dense_rank over the value order). Window over a
      // low-cardinality VALUE column — partition-safe in practice via
      // two-phase: distinct codes then broadcast join.
      val docs = t(s, dir, "documents")
      val codes = docs.select("lang").distinct()
        .withColumn("lang_code",
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("lang"))) - 1).cast("int"))
      docs.join(broadcast(codes), Seq("lang"))
        .select("doc_id", "lang", "lang_code")
        .orderBy("doc_id")
    }

    // categorical accessor emulation end-to-end: asKnown dictionary +
    // broadcast-joined dense codes (reference _categorical.py:14-129)
    r.reg("q_categorical",
      """SELECT c_custkey, c_mktsegment,
        |  CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS INTEGER)
        |    AS c_mktsegment_code
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      graft.api.GraftCategorical(t(s, dir, "customer"), "c_mktsegment")
        .asKnown.codes
        .select("c_custkey", "c_mktsegment", "c_mktsegment_code")
        .orderBy("c_custkey")
    }

    // Corpus vocabulary: top-50 tokens by frequency — the tokenizer-vocab
    // pass; deterministic cut via the (count desc, token asc) tie-break.
    r.reg("q_vocab_topk",
      """SELECT token, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin) { (s, dir) =>
      TextStats.vocabulary(t(s, dir, "documents"), "text", 50)
    }

    // Per-doc salient terms: tf·(N/df) with one IEEE double division —
    // every value (tf, df, N products < 2^53) is exact, the division is
    // correctly rounded on both engines, so score hashes bit-for-bit.
    r.reg("q_tfidf_topk",
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |terms AS (
        |  SELECT doc_id, t AS term FROM (
        |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t FROM d)
        |  WHERE t <> '' AND len(t) >= 2),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM d),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf, dfx.df,
        |    CAST(t.tf * n.n_docs AS DOUBLE) / dfx.df AS score
        |  FROM tf t JOIN dfx USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
        |  FROM scored)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  score, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
      TextStats.tfIdfTopTerms(
          t(s, dir, "documents").filter(col("doc_id") < 300)
            .select("doc_id", "text"),
          "doc_id", "text", k = 5)
        .orderBy("doc_id", "rank")
    }

    r.reg("q_lang_predict",
      """WITH scored AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), w -> w IN ('data', 'table'))) AS s_de,
        |    len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS s_en,
        |    len(list_filter(string_split(text, ' '), w -> w IN ('query', 'join'))) AS s_fr
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        |  CASE WHEN s_fr > (CASE WHEN s_en > s_de THEN s_en ELSE s_de END) THEN 'fr'
        |       ELSE (CASE WHEN s_en > s_de THEN 'en' ELSE 'de' END) END AS predicted
        |FROM scored ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val markers = Map(
        "de" -> Seq("data", "table"),
        "en" -> Seq("the", "a"),
        "fr" -> Seq("query", "join"))
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          TextStats.langPredict(col("text"), markers).as("predicted"))
        .orderBy("doc_id")
    }

    r.reg("q_dedup_exact",
      """WITH ext AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
        |),
        |keyed AS (
        |  SELECT doc_id, text,
        |    row_number() OVER (
        |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn
        |  FROM ext)
        |SELECT doc_id FROM keyed WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val ext = docs.union(
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.exact(ext, "doc_id", "text").select("doc_id").orderBy("doc_id")
    }

    r.reg("q_minhash_sig",
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  $uniRowSql
         |),
         |${sigCtesFrom("docs")}
         |SELECT doc_id,
         |  CAST(unnest(range(0, 16)) AS INTEGER) AS hash_idx,
         |  unnest(sig) AS sig_val
         |FROM sig WHERE doc_id < 50 ORDER BY doc_id, hash_idx""".stripMargin) { (s, dir) =>
      Dedup.signatures(
          withUniRow(s, t(s, dir, "documents").select("doc_id", "text")),
          "doc_id", "text")
        .filter(col("doc_id") < 50 && size(col("shingles")) > 0)
        .select(col("doc_id"), posexplode(col("sig")).as(Seq("hash_idx", "sig_val")))
        .orderBy("doc_id", "hash_idx")
    }

    r.reg("q_minhash_pairs",
      s"""WITH $pairsCtes
         |SELECT id_a, id_b, jaccard FROM pairs
         |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.nearDuplicatePairs(t(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5)
        .orderBy("id_a", "id_b")
    }

    r.reg("q_near_dedup",
      s"""WITH $pairsCtes
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id_b FROM pairs WHERE jaccard >= 0.5)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.dropNearDuplicates(t(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5)
        .select("doc_id").orderBy("doc_id")
    }

    // Incremental near-dedup against a PERSISTED index: documents play
    // the already-indexed corpus; a shard of re-idded copies (doc_id % 7
    // = 2, +100000) plays the new ingest, so every shard doc plants a
    // cross-shard duplicate (jaccard 1.0) plus whatever natural
    // similarity exists. The oracle computes the same banded candidates
    // restricted to corpus x shard; the Spark side must find them by
    // joining the BUCKETED index tables (no corpus re-shuffle — the
    // zero-exchange side is asserted in WindowLlmSpec).
    r.reg("q_dedup_index",
      s"""WITH ext AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 2
         |),
         |${sigCtesFrom("ext")},
         |banded AS (
         |  SELECT doc_id, unnest(range(0, 4)) AS band,
         |    unnest(list_transform(range(0, 4), b ->
         |      array_to_string(sig[b*4+1:b*4+4], '_'))) AS key
         |  FROM sig
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.key = b.key
         |   AND a.doc_id < 100000 AND b.doc_id >= 100000
         |),
         |pairs AS (
         |  SELECT id_a, id_b,
         |    CAST(len(list_intersect(x.gs, y.gs)) AS DOUBLE)
         |      / len(list_distinct(list_concat(x.gs, y.gs))) AS jaccard
         |  FROM cand
         |  JOIN hs x ON x.doc_id = cand.id_a
         |  JOIN hs y ON y.doc_id = cand.id_b
         |)
         |SELECT id_a, id_b, jaccard FROM pairs
         |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val shard = docs.filter(col("doc_id") % 7 === 2)
        .withColumn("doc_id", col("doc_id") + 100000)
      // index landing spot derived from the JVM temp dir, not a repo
      // absolute path: the registered query must run from any checkout
      val idxPath = graft.QHelp.qtmpDir("ndidx")
        .getAbsolutePath
      Dedup.writeNearDupIndex(docs, "doc_id", "text", "g_ndi", idxPath)
      Dedup.nearDupPairsAgainstIndex(shard, "doc_id", "text", "g_ndi",
          threshold = 0.5)
        .orderBy("id_a", "id_b")
    }

    // Corpus drift report: two overlapping snapshots of documents play
    // the old and new corpus versions (old additionally excludes src0,
    // planting an APPEARING domain whose old-side stats must be NULL).
    // Exact integer sums divided as doubles — the oracle recomputes the
    // identical float op sequence, so means and deltas hash
    // cross-engine.
    r.reg("q_drift_report", {
      def sideSql(name: String, filter: String, tag: String) =
        s"""$name AS (
           |  SELECT source, COUNT(*) AS ${tag}_n,
           |    SUM(len(string_split(text, ' '))) AS ${tag}_tokens,
           |    SUM(length(text)) AS ${tag}_chars,
           |    SUM(len(list_filter(string_split(text, ' '),
           |      w -> w IN ($stopSqlList)))) AS ${tag}_stop,
           |    SUM(len(list_distinct(string_split(text, ' ')))) AS ${tag}_distinct
           |  FROM documents WHERE $filter GROUP BY source)"""
      val metricSql = Seq("tokens" -> "tokens", "chars" -> "chars",
        "stopwords" -> "stop", "distinct" -> "distinct").map { case (m, c) =>
        s"""SELECT source, '$m' AS metric, old_n, new_n,
           |  CAST(old_$c AS DOUBLE) / CAST(old_n AS DOUBLE) AS old_mean,
           |  CAST(new_$c AS DOUBLE) / CAST(new_n AS DOUBLE) AS new_mean,
           |  CAST(new_$c AS DOUBLE) / CAST(new_n AS DOUBLE)
           |    - CAST(old_$c AS DOUBLE) / CAST(old_n AS DOUBLE) AS delta
           |FROM j""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${sideSql("oa", "doc_id % 10 <> 1 AND source <> 'src0'", "old")},
         |${sideSql("na", "doc_id % 10 <> 2", "new")},
         |j AS (
         |  SELECT COALESCE(oa.source, na.source) AS source,
         |    old_n, old_tokens, old_chars, old_stop, old_distinct,
         |    new_n, new_tokens, new_chars, new_stop, new_distinct
         |  FROM oa FULL JOIN na ON oa.source = na.source)
         |$metricSql
         |ORDER BY source, metric""".stripMargin
    }) { (s, dir) =>
      val docs = t(s, dir, "documents").select("doc_id", "text", "source")
      val old = docs.filter(col("doc_id") % 10 =!= 1 && col("source") =!= "src0")
      val nw = docs.filter(col("doc_id") % 10 =!= 2)
      TextStats.driftReport(old, nw, "text", "source", stop)
        .orderBy("source", "metric")
    }

    // Bloom-sidecar exact gate: documents % 3 <> 0 play the indexed
    // corpus (keys boundary + per-bucket Blooms); a re-idded shard of
    // documents % 5 = 0 probes it — ids sharing 15 as a factor carry
    // corpus content and must drop, the rest are genuinely new. The
    // Bloom path is TRANSPARENT to results (no false negatives; false
    // positives only widen the verify join), so the oracle is the exact
    // key-membership recompute — identical answer, different cost: the
    // bloom-negative majority never reads the corpus (plan-asserted in
    // KeyBloomsSpec).
    r.reg("q_exact_gate_bloom",
      s"""WITH corpusk AS (
         |  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck
         |  FROM documents WHERE doc_id % 3 <> 0
         |),
         |shard AS (
         |  SELECT doc_id + 200000 AS doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck
         |  FROM documents WHERE doc_id % 5 = 0
         |)
         |SELECT s.doc_id FROM shard s
         |WHERE s.ck NOT IN (SELECT ck FROM corpusk)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      val shard = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 200000)
      val idxPath = graft.QHelp.qtmpDir("blmidx")
        .getAbsolutePath
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "g_blm", idxPath)
      graft.llm.KeyBlooms.build(s, "g_blm", idxPath, nBlooms = 8)
      Dedup.dropExactAgainstIndexBloom(shard, "doc_id", "text", "g_blm",
          idxPath)
        .select("doc_id").orderBy("doc_id")
    }

    // SimHash near-dup pairs at the r12 production geometry: 64-bit
    // signatures (per-position mixed bits — the minhash affine family)
    // split into 4 bands of 16 bits (hammingK=3, pigeonhole: Hamming
    // ≤ 3 ⇒ one 16-bit band agrees exactly — the Manku/Jain/Sarma
    // web-dedup geometry, 65,536 keys per band); the oracle recomputes
    // the signatures, the band joins, and the integer popcount verify —
    // all exact arithmetic. Fixture buckets never reach the 10k cap, so
    // the capped Spark path and the uncapped SQL agree exactly.
    r.reg("q_simhash_pairs",
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct(string_split(text, ' ')), w -> ${tokIdSql("w")} % 2147483647) AS hs
         |  FROM documents),
         |sh AS (SELECT doc_id, CAST(${graft.llm.TextHash.simhashTermsSql("hs", 64)} AS BIGINT) AS s FROM h),
         |banded AS (
         |  SELECT doc_id, s, b.band, (s >> (b.band * 16)) & 65535 AS key
         |  FROM sh, (SELECT unnest(range(0, 4)) AS band) b),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.s AS sa, b.s AS sb
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.simhashNearDupPairs(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b")
    }

    // SimHash drop-composite (r12): pairs → min-label components → keep
    // component minima. The oracle runs the FAITHFUL transitive
    // reachability (recursive CTE), not the drop-id_b shortcut — at
    // hamming ≤ 3 over the full table, chains through intermediates
    // (a~b~c with a,c not directly close) exist and the shortcut would
    // keep docs the component rule drops.
    r.reg("q_simhash_dedup",
      s"""WITH RECURSIVE h AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct(string_split(text, ' ')), w -> ${tokIdSql("w")} % 2147483647) AS hs
         |  FROM documents),
         |sh AS (SELECT doc_id, CAST(${graft.llm.TextHash.simhashTermsSql("hs", 64)} AS BIGINT) AS s FROM h),
         |banded AS (
         |  SELECT doc_id, s, b.band, (s >> (b.band * 16)) & 65535 AS key
         |  FROM sh, (SELECT unnest(range(0, 4)) AS band) b),
         |prs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.s, b.s)) <= 3),
         |sedges AS (
         |  SELECT id_a AS u, id_b AS v FROM prs
         |  UNION SELECT id_b AS u, id_a AS v FROM prs),
         |reach AS (
         |  SELECT u, v FROM sedges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN sedges e ON r.v = e.u),
         |drp AS (SELECT u AS id FROM reach GROUP BY u HAVING min(v) < u)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM drp)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.dropSimhashNearDuplicates(t(s, dir, "documents"), "doc_id",
          "text")
        .select("doc_id").orderBy("doc_id")
    }

    // Cap-engagement observability (r13, r12 ADVICE): the buckets the
    // simhash degenerate-bucket cap WOULD split at maxBucketSize=8 —
    // the report that makes silent recall loss observable. The fixture
    // has 28/34 such buckets at sf0.001/sf0.01 (probed), so the oracle
    // is non-vacuous at both scales; the production default cap (10k)
    // yields the empty report that certifies exact recall.
    r.reg("q_simhash_capped",
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct(string_split(text, ' ')), w -> ${tokIdSql("w")} % 2147483647) AS hs
         |  FROM documents),
         |sh AS (SELECT doc_id, CAST(${graft.llm.TextHash.simhashTermsSql("hs", 64)} AS BIGINT) AS s FROM h),
         |banded AS (
         |  SELECT doc_id, b.band, (s >> (b.band * 16)) & 65535 AS key
         |  FROM sh, (SELECT unnest(range(0, 4)) AS band) b)
         |SELECT CAST(band AS INT) AS band, CAST(key AS BIGINT) AS key,
         |  count(*) AS n_docs,
         |  CAST(ceil(count(*) / 8.0) AS INT) AS n_subbuckets
         |FROM banded GROUP BY band, key HAVING count(*) > 8
         |ORDER BY band, key""".stripMargin) { (s, dir) =>
      Dedup.simhashCappedBuckets(t(s, dir, "documents"), "doc_id", "text",
          maxBucketSize = 8)
        .orderBy("band", "key")
    }

    r.reg("q_simhash",
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct(string_split(text, ' ')), w -> ${tokIdSql("w")} % 2147483647) AS hs
         |  FROM documents WHERE doc_id < 100)
         |SELECT doc_id, CAST(${graft.llm.TextHash.simhashTermsSql("hs", 64)} AS BIGINT) AS simhash
         |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.simhashGroups(
          t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
        .orderBy("doc_id")
    }

    // Benchmark decontamination over a deterministic id split (doc_id % 10
    // = 0 plays the benchmark): the oracle recomputes the identical
    // 5-shingle hash sets, so per-doc overlap counts are value-checked —
    // the hits are exactly the planted cross-split near-duplicates, not
    // random prose (k=5 is past the fixture's chance-collision length).
    val decontamCtes =
      s"""train AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
         |bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
         |ttoks AS (
         |  SELECT doc_id,
         |    list_transform(string_split(text, ' '), g -> ${tokIdSql("g")}) AS tid
         |  FROM train),
         |ths AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(tid)-3),
         |    i -> ((((tid[i]*31 + tid[i+1])*31 + tid[i+2])*31 + tid[i+3])*31 + tid[i+4]) % 2147483647)) AS gs
         |  FROM ttoks WHERE len(tid) >= 5),
         |btoks AS (
         |  SELECT doc_id,
         |    list_transform(string_split(text, ' '), g -> ${tokIdSql("g")}) AS tid
         |  FROM bench),
         |bhs AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(tid)-3),
         |    i -> ((((tid[i]*31 + tid[i+1])*31 + tid[i+2])*31 + tid[i+3])*31 + tid[i+4]) % 2147483647)) AS gs
         |  FROM btoks WHERE len(tid) >= 5),
         |bh AS (SELECT DISTINCT unnest(gs) AS h FROM bhs)""".stripMargin

    // END-TO-END pipeline: quality gate → exact dedup → near dedup →
    // decontamination → split → shuffle position, composed as ONE plan
    // (llm/Pipeline.pretrainCorpus) and recomputed stage-for-stage in
    // SQL. The final (doc_id, split, shuffle_pos) triple is sensitive to
    // every stage: a doc wrongly kept/dropped anywhere shifts EVERY
    // later shuffle position, so the hash check has no slack.
    val pipeTTrain = (0.8 * 4294967296L).toLong
    val pipeTVal = (0.9 * 4294967296L).toLong
    // the 6-stage chain up to decontamination, shared by q_pipeline_e2e
    // and the r12 mixed variant (q_pipeline_mix) — one definition, so
    // the two oracles can never drift
    val pipeCleanCtes =
      s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
         |pbench AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
         |qtoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM base),
         |qgrams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
         |  FROM qtoks WHERE len(t) >= 2),
         |qgcnt AS (SELECT doc_id, g, count(*) AS c FROM qgrams GROUP BY doc_id, g),
         |qgtop AS (SELECT doc_id, max(c) AS topc, sum(c) AS totc FROM qgcnt GROUP BY doc_id),
         |kept AS (
         |  SELECT d.doc_id, d.text FROM base d LEFT JOIN qgtop USING (doc_id)
         |  WHERE len(string_split(d.text, ' ')) BETWEEN 3 AND 100000
         |    AND 1.0 - len(list_distinct(string_split(d.text, chr(10)))) * 1.0
         |          / len(string_split(d.text, chr(10))) < 0.3
         |    AND COALESCE(topc * 1.0 / totc, 0.0) < 0.2),
         |keyed AS (
         |  SELECT doc_id, text, row_number() OVER (
         |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn
         |  FROM kept),
         |ex AS (SELECT doc_id, text FROM keyed WHERE rn = 1),
         |${pairsCtesFrom("ex")},
         |nd AS (SELECT doc_id, text FROM ex
         |       WHERE doc_id NOT IN (SELECT id_b FROM pairs WHERE jaccard >= 0.5)),
         |ndtoks AS (
         |  SELECT doc_id, list_transform(string_split(text, ' '), g -> ${tokIdSql("g")}) AS tid
         |  FROM nd),
         |ndhs AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(tid)-3),
         |    i -> ((((tid[i]*31 + tid[i+1])*31 + tid[i+2])*31 + tid[i+3])*31 + tid[i+4]) % 2147483647)) AS gs
         |  FROM ndtoks WHERE len(tid) >= 5),
         |pbtoks AS (
         |  SELECT doc_id, list_transform(string_split(text, ' '), g -> ${tokIdSql("g")}) AS tid
         |  FROM pbench),
         |pbhs AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(tid)-3),
         |    i -> ((((tid[i]*31 + tid[i+1])*31 + tid[i+2])*31 + tid[i+3])*31 + tid[i+4]) % 2147483647)) AS gs
         |  FROM pbtoks WHERE len(tid) >= 5),
         |pbh AS (SELECT DISTINCT unnest(gs) AS h FROM pbhs),
         |clean AS (
         |  SELECT doc_id FROM nd WHERE doc_id NOT IN (
         |    SELECT DISTINCT doc_id
         |    FROM (SELECT doc_id, unnest(gs) AS h FROM ndhs) th JOIN pbh USING (h)))""".stripMargin
    def pipeFinal(from: String): String =
      s"""SELECT doc_id,
         |  CASE WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |       WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(row_number() OVER (
         |    ORDER BY (doc_id % 2147483648) * 2654435761 % 4294967296) - 1
         |    AS BIGINT) AS shuffle_pos
         |FROM $from ORDER BY doc_id""".stripMargin

    r.reg("q_pipeline_e2e", pipeCleanCtes + "\n" + pipeFinal("clean")) {
      (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.llm.Pipeline.pretrainCorpus(
          docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "doc_id", "text")
        .select("doc_id", "split", "shuffle_pos")
        .orderBy("doc_id")
    }

    // The composed pipeline WITH the temperature-mixing stage (r12):
    // same chain through decontamination, then alpha=0.5 doc-count
    // mixing on the CLEAN survivors' per-source sizes — thresholds
    // p_d = sqrt(cmin/c_d) recomputed exactly (integer counts, IEEE
    // sqrt, integer floor, Knuth-hash compare), split and shuffle
    // positions re-derived over the MIXED survivor set. Value-checks
    // that the stage composes inside the one-plan build, not just
    // standalone (q_temperature_mix covers the operator alone).
    r.reg("q_pipeline_mix", pipeCleanCtes +
      s""",
         |mixsrc AS (
         |  SELECT c.doc_id, d.source FROM clean c JOIN documents d USING (doc_id)),
         |mc AS (SELECT source, COUNT(*) AS cnt FROM mixsrc GROUP BY source),
         |mm AS (SELECT MIN(cnt) AS cmin FROM mc),
         |mthr AS (
         |  SELECT source,
         |    CAST(floor(sqrt(CAST(cmin AS DOUBLE) / CAST(cnt AS DOUBLE))
         |      * 4294967296) AS BIGINT) AS thr
         |  FROM mc, mm),
         |mixed AS (
         |  SELECT m.doc_id FROM mixsrc m JOIN mthr USING (source)
         |  WHERE (m.doc_id % 2147483648) * 2654435761 % 4294967296 < thr)
         |""".stripMargin + pipeFinal("mixed")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.llm.Pipeline.pretrainCorpus(
          docs.filter(col("doc_id") % 10 =!= 0)
            .select("doc_id", "text", "source"),
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "doc_id", "text",
          temperatureMix = Some(
            graft.llm.Pipeline.TemperatureMix("source", alpha = 0.5)))
        .select("doc_id", "split", "shuffle_pos")
        .orderBy("doc_id")
    }

    // The composed pipeline in the UP-sampling direction (r13): same
    // chain through decontamination, then the curated-set recipe — the
    // CLEAN survivors' skewed derived domains (60/30/10 by doc_id; the
    // fixture's natural domains are balanced and would make the oracle
    // vacuous) repeat with deterministic epoch copies at alpha=0.5,
    // every copy split-assigned by DOCUMENT id (no cross-split leakage)
    // and shuffle-positioned by the composite id*11+epoch. The oracle
    // recomputes factors, the epoch keep decision, the split, and every
    // composite-keyed shuffle position.
    r.reg("q_pipeline_upsample", pipeCleanCtes +
      s""",
         |updom AS (
         |  SELECT c.doc_id,
         |    CASE WHEN c.doc_id % 10 < 6 THEN 'head'
         |         WHEN c.doc_id % 10 < 9 THEN 'mid' ELSE 'tail' END AS dom
         |  FROM clean c),
         |uc AS (SELECT dom, COUNT(*) AS cnt FROM updom GROUP BY dom),
         |um AS (SELECT MAX(cnt) AS cmax FROM uc),
         |uf AS (
         |  SELECT dom,
         |    LEAST(sqrt(CAST(cmax AS DOUBLE) / CAST(cnt AS DOUBLE)), 10.0) AS fac
         |  FROM uc, um),
         |ut AS (
         |  SELECT dom, CAST(floor(fac) AS BIGINT) AS fullr,
         |    CAST(floor((fac - floor(fac)) * 4294967296) AS BIGINT) AS thr
         |  FROM uf),
         |ur AS (SELECT unnest(range(0, 11)) AS epoch),
         |upsampled AS (
         |  SELECT d.doc_id, CAST(r.epoch AS BIGINT) AS epoch
         |  FROM updom d JOIN ut USING (dom) JOIN ur r ON r.epoch <= ut.fullr
         |  WHERE r.epoch < ut.fullr
         |     OR ((d.doc_id % 2147483648 + r.epoch * 7919) % 2147483648)
         |        * 2654435761 % 4294967296 < ut.thr)
         |SELECT doc_id, epoch,
         |  CASE WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |       WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(row_number() OVER (
         |    ORDER BY ((doc_id * 11 + epoch) % 2147483648) * 2654435761 % 4294967296) - 1
         |    AS BIGINT) AS shuffle_pos
         |FROM upsampled ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.llm.Pipeline.pretrainCorpus(
          docs.filter(col("doc_id") % 10 =!= 0)
            .select(col("doc_id"), col("text"),
              when(col("doc_id") % 10 < 6, "head")
                .when(col("doc_id") % 10 < 9, "mid")
                .otherwise("tail").as("dom")),
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "doc_id", "text",
          temperatureMix = Some(graft.llm.Pipeline.TemperatureMix(
            "dom", alpha = 0.5, up = true)))
        .select("doc_id", "epoch", "split", "shuffle_pos")
        .orderBy("doc_id", "epoch")
    }

    // BUDGET mixing rides the Pipeline (r13): the explicit-recipe stage
    // at the TemperatureMix slot — budgets act on the CLEAN survivors'
    // n_chars masses (derived in-oracle: a literal budget would change
    // meaning across scales), 'tail' absent from the recipe drops, and
    // every copy's split/composite-keyed shuffle position recomputes
    // end to end (the q_pipeline_upsample machinery, recipe-driven).
    r.reg("q_pipeline_budget", pipeCleanCtes +
      s""",
         |bdom AS (
         |  SELECT c.doc_id, d.n_chars,
         |    CASE WHEN c.doc_id % 10 < 6 THEN 'head'
         |         WHEN c.doc_id % 10 < 9 THEN 'mid' ELSE 'tail' END AS dom
         |  FROM clean c JOIN documents d USING (doc_id)),
         |bc AS (SELECT dom, SUM(n_chars) AS w FROM bdom GROUP BY dom),
         |bb AS (
         |  SELECT dom, w,
         |    CASE dom
         |      WHEN 'head' THEN CAST(floor(CAST('0.4' AS DOUBLE) * CAST(w AS DOUBLE)) AS BIGINT)
         |      WHEN 'mid'  THEN CAST(floor(CAST('2.5' AS DOUBLE) * CAST(w AS DOUBLE)) AS BIGINT)
         |    END AS bud
         |  FROM bc WHERE dom IN ('head', 'mid')),
         |bf AS (
         |  SELECT dom,
         |    LEAST(CAST(bud AS DOUBLE) / CAST(w AS DOUBLE), 10.0) AS fac
         |  FROM bb),
         |bt AS (
         |  SELECT dom, CAST(floor(fac) AS BIGINT) AS fullr,
         |    CAST(floor((fac - floor(fac)) * 4294967296) AS BIGINT) AS thr
         |  FROM bf),
         |br AS (SELECT unnest(range(0, 11)) AS epoch),
         |budgeted AS (
         |  SELECT d.doc_id, CAST(r.epoch AS BIGINT) AS epoch
         |  FROM bdom d JOIN bt USING (dom) JOIN br r ON r.epoch <= bt.fullr
         |  WHERE r.epoch < bt.fullr
         |     OR ((d.doc_id % 2147483648 + r.epoch * 7919) % 2147483648)
         |        * 2654435761 % 4294967296 < bt.thr)
         |SELECT doc_id, epoch,
         |  CASE WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |       WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(row_number() OVER (
         |    ORDER BY ((doc_id * 11 + epoch) % 2147483648) * 2654435761 % 4294967296) - 1
         |    AS BIGINT) AS shuffle_pos
         |FROM budgeted ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("text"), col("n_chars"),
          when(col("doc_id") % 10 < 6, "head")
            .when(col("doc_id") % 10 < 9, "mid")
            .otherwise("tail").as("dom"))
      val bench = docs.filter(col("doc_id") % 10 === 0)
        .select("doc_id", "text")
      // budgets from the CLEAN survivors' masses — the same frame the
      // stage itself aggregates (shares the chain up to decontam)
      val cleanMasses = graft.llm.Pipeline.pretrainCorpus(train, bench,
          "doc_id", "text", persistStages = false)
        .groupBy("dom").agg(sum(col("n_chars").cast("long")).as("w"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val budgets = Map(
        "head" -> math.floor(0.4 * cleanMasses("head").toDouble).toLong,
        "mid" -> math.floor(2.5 * cleanMasses("mid").toDouble).toLong)
      graft.llm.Pipeline.pretrainCorpus(train, bench, "doc_id", "text",
          budgetMix = Some(graft.llm.Pipeline.BudgetMix("dom", "n_chars",
            budgets)))
        .select("doc_id", "epoch", "split", "shuffle_pos")
        .orderBy("doc_id", "epoch")
    }

    // IMPORTANCE mixing rides the Pipeline (r13): the per-ROW DSIR-
    // shaped axis at the mixing slot — char mass plays the importance
    // weight of each CLEAN survivor, systematic resampling selects
    // exactly 321 copies (cumulative weights in Knuth-hash traversal
    // order; the multiplicity is pure integer arithmetic), and every
    // copy's split (document-keyed) and composite-keyed shuffle
    // position recompute end to end.
    r.reg("q_pipeline_importance", pipeCleanCtes +
      s""",
         |impw AS (
         |  SELECT c.doc_id, length(d.text) AS wgt,
         |    (c.doc_id % 2147483648) * 2654435761 % 4294967296 AS h
         |  FROM clean c JOIN documents d USING (doc_id)),
         |impc AS (
         |  SELECT doc_id, wgt, SUM(wgt) OVER (ORDER BY h) AS cum FROM impw),
         |impt AS (SELECT SUM(wgt) AS W FROM impw),
         |impm AS (
         |  SELECT doc_id,
         |    CAST((cum * 321) // W - ((cum - wgt) * 321) // W AS BIGINT) AS mult
         |  FROM impc, impt),
         |imixed AS (
         |  SELECT doc_id, CAST(unnest(range(0, mult)) AS BIGINT) AS epoch
         |  FROM impm WHERE mult >= 1)
         |SELECT doc_id, epoch,
         |  CASE WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |       WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |       ELSE 'test' END AS split,
         |  CAST(row_number() OVER (
         |    ORDER BY ((doc_id * 322 + epoch) % 2147483648) * 2654435761 % 4294967296) - 1
         |    AS BIGINT) AS shuffle_pos
         |FROM imixed ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.llm.Pipeline.pretrainCorpus(
          docs.filter(col("doc_id") % 10 =!= 0)
            .select(col("doc_id"), col("text"),
              length(col("text")).as("wgt")),
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "doc_id", "text",
          importanceMix = Some(
            graft.llm.Pipeline.ImportanceMix("wgt", n = 321L)))
        .select("doc_id", "epoch", "split", "shuffle_pos")
        .orderBy("doc_id", "epoch")
    }

    // The composed corpus -> TRAINING-FILES last mile (r13): the full
    // pipeline chain through decontamination, split assignment, then the
    // per-split GPT-style concat-and-chop INTO THE LANDED PARQUET — the
    // Spark side runs Pipeline.buildAndWriteWindows to disk and reads
    // the landing back, so the oracle hash-checks the composed product
    // (every pipeline stage + split isolation + window assembly + the
    // partitioned write), not just the lazy plan. The oracle recomputes
    // window ids AND the token-exact assembled text per split: a doc
    // wrongly kept/dropped/split anywhere shifts every later window of
    // that split, so the check has no slack.
    r.reg("q_pipeline_windows", pipeCleanCtes +
      s""",
         |wdocs AS (
         |  SELECT c.doc_id, d.text,
         |    CASE WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |         WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM clean c JOIN documents d USING (doc_id)),
         |wd AS (SELECT split, doc_id, string_split(text, ' ') AS toks,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM wdocs),
         |wc AS (SELECT split, doc_id, toks, n,
         |        CAST(sum(n) OVER (PARTITION BY split
         |          ORDER BY (doc_id % 2147483648) * 2654435761 % 4294967296
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start FROM wd),
         |ww AS (SELECT split, doc_id, toks, n, start,
         |        CAST(floor(start/200.0) AS BIGINT) AS wf,
         |        CASE WHEN n > 0 THEN CAST(floor((start+n-1)/200.0) AS BIGINT)
         |             ELSE CAST(floor(start/200.0) AS BIGINT) END AS wl FROM wc),
         |wr AS (SELECT unnest(range(0,
         |        (SELECT CAST(ceil(sum(n)/200.0) AS BIGINT) + 1 FROM wd))) AS window_id),
         |wmem AS (SELECT w.split, r.window_id,
         |          GREATEST(r.window_id*200 - w.start, 0) AS f,
         |          LEAST((r.window_id+1)*200 - w.start, w.n) AS t2,
         |          GREATEST(w.start - r.window_id*200, 0) AS pos, w.toks
         |         FROM ww w JOIN wr r ON r.window_id BETWEEN w.wf AND w.wl),
         |wparts AS (SELECT split, window_id, pos,
         |            array_to_string(toks[CAST(f+1 AS INT):CAST(t2 AS INT)], ' ') AS part,
         |            t2 - f AS len FROM wmem WHERE t2 > f)
         |SELECT split, window_id, string_agg(part, ' ' ORDER BY pos) AS window_text,
         |  CAST(sum(len) AS BIGINT) AS n_tokens
         |FROM wparts GROUP BY split, window_id
         |ORDER BY split, window_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      // per-JVM root (r16): the literal shared path raced when two
      // verify JVMs ran concurrently (the r15-verdict fixture-isolation
      // class, missed for the landing outputs)
      val out = graft.QHelp.qtmpDir("pipeline_windows").getAbsolutePath
      // a fresh landing every run: the crash-replay manifest guard would
      // otherwise O(1)-return a PREVIOUS scale factor's landing
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.llm.Pipeline.buildAndWriteWindows(
        docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
        docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
        "doc_id", "text", out, windowSize = 200L)
      s.read.parquet(out)
        .select("split", "window_id", "window_text", "n_tokens")
        .orderBy("split", "window_id")
    }

    // Incremental DAILY-INGEST gate (llm/Pipeline.ingestShardFrame): the
    // corpus (doc_id < 250) is indexed once (bands + shingles + keys);
    // the shard plants one doc family per drop reason — exact dup of a
    // corpus doc (+200000), exact in-shard dup (+300000), near dup of a
    // corpus doc (+400000, one appended token), near in-shard dup
    // (+500000) — and docs 420-449 play the benchmark. The oracle
    // recomputes every stage: quality gate, canonical keying, in-shard
    // exact (rn=1), exact-vs-corpus-keys, 5-gram decontamination, then
    // near-dedup with FAITHFUL min-label connected components (recursive
    // reachability CTE — the drop-id_b shortcut is NOT equivalent when a
    // doc's only smaller neighbor is itself dropped via a larger
    // intermediate) and the corpus-vs-shard candidate drop. Surviving
    // (doc_id, canonical key) pairs are hash-compared. The corpus-side
    // zero-exchange property is asserted in IngestSpec.
    val ingestCtes =
      s"""icorpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 250),
         |sbase AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 250 AND doc_id < 420),
         |shard AS (
         |  SELECT doc_id, text FROM sbase
         |  UNION ALL SELECT doc_id + 200000, text FROM icorpus WHERE doc_id % 7 = 2
         |  UNION ALL SELECT doc_id + 300000, text FROM sbase WHERE doc_id % 5 = 3
         |  UNION ALL SELECT doc_id + 400000, text || ' tonight' FROM icorpus WHERE doc_id % 11 = 4
         |  UNION ALL SELECT doc_id + 500000, text || ' tonight' FROM sbase WHERE doc_id % 13 = 6),
         |ibench AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 420 AND doc_id < 450),
         |qtoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM shard),
         |qgrams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
         |  FROM qtoks WHERE len(t) >= 2),
         |qgcnt AS (SELECT doc_id, g, count(*) AS c FROM qgrams GROUP BY doc_id, g),
         |qgtop AS (SELECT doc_id, max(c) AS topc, sum(c) AS totc FROM qgcnt GROUP BY doc_id),
         |kept AS (
         |  SELECT d.doc_id, d.text FROM shard d LEFT JOIN qgtop USING (doc_id)
         |  WHERE len(string_split(d.text, ' ')) BETWEEN 3 AND 100000
         |    AND 1.0 - len(list_distinct(string_split(d.text, chr(10)))) * 1.0
         |          / len(string_split(d.text, chr(10))) < 0.3
         |    AND COALESCE(topc * 1.0 / totc, 0.0) < 0.2),
         |keyed AS (
         |  SELECT doc_id, text,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck,
         |    row_number() OVER (
         |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn
         |  FROM kept),
         |ckeys AS (
         |  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck
         |  FROM icorpus),
         |fresh AS (
         |  SELECT doc_id, text, ck FROM keyed
         |  WHERE rn = 1 AND ck NOT IN (SELECT ck FROM ckeys)),
         |ftoks AS (
         |  SELECT doc_id, list_transform(string_split(text, ' '), g -> ${tokIdSql("g")}) AS tid
         |  FROM fresh),
         |fhs AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(tid)-3),
         |    i -> ((((tid[i]*31 + tid[i+1])*31 + tid[i+2])*31 + tid[i+3])*31 + tid[i+4]) % 2147483647)) AS gs
         |  FROM ftoks WHERE len(tid) >= 5),
         |ibtoks AS (
         |  SELECT doc_id, list_transform(string_split(text, ' '), g -> ${tokIdSql("g")}) AS tid
         |  FROM ibench),
         |ibhs AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(tid)-3),
         |    i -> ((((tid[i]*31 + tid[i+1])*31 + tid[i+2])*31 + tid[i+3])*31 + tid[i+4]) % 2147483647)) AS gs
         |  FROM ibtoks WHERE len(tid) >= 5),
         |ibh AS (SELECT DISTINCT unnest(gs) AS h FROM ibhs),
         |clean AS (
         |  SELECT doc_id, text, ck FROM fresh WHERE doc_id NOT IN (
         |    SELECT DISTINCT doc_id
         |    FROM (SELECT doc_id, unnest(gs) AS h FROM fhs) q JOIN ibh USING (h))),
         |allnd AS (
         |  SELECT doc_id, text FROM icorpus
         |  UNION ALL SELECT doc_id, text FROM clean),
         |${pairsCtesFrom("allnd")},
         |sedges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs WHERE jaccard >= 0.5 AND id_a >= 250
         |  UNION
         |  SELECT id_b AS u, id_a AS v FROM pairs WHERE jaccard >= 0.5 AND id_a >= 250),
         |reach AS (
         |  SELECT u, v FROM sedges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN sedges e ON r.v = e.u),
         |nddrop AS (SELECT u AS id FROM reach GROUP BY u HAVING min(v) < u),
         |vsdrop AS (
         |  SELECT DISTINCT id_b AS id FROM pairs
         |  WHERE jaccard >= 0.5 AND id_a < 250)""".stripMargin

    /** Shared fixture for the two ingest oracles: corpus (< 250), the
      * planted shard, and the benchmark slice (420-449). */
    def ingestFixture(s: org.apache.spark.sql.SparkSession, dir: String) = {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") < 250)
      val sbase = docs.filter(col("doc_id") >= 250 && col("doc_id") < 420)
      val shard = sbase
        .unionByName(corpus.filter(col("doc_id") % 7 === 2)
          .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
        .unionByName(sbase.filter(col("doc_id") % 5 === 3)
          .select((col("doc_id") + 300000L).as("doc_id"), col("text")))
        .unionByName(corpus.filter(col("doc_id") % 11 === 4)
          .select((col("doc_id") + 400000L).as("doc_id"),
            concat(col("text"), lit(" tonight")).as("text")))
        .unionByName(sbase.filter(col("doc_id") % 13 === 6)
          .select((col("doc_id") + 500000L).as("doc_id"),
            concat(col("text"), lit(" tonight")).as("text")))
      val bench = docs.filter(col("doc_id") >= 420 && col("doc_id") < 450)
      (corpus, shard, bench)
    }

    r.reg("q_ingest_gate",
      s"""WITH RECURSIVE $ingestCtes
         |SELECT doc_id, ck FROM clean
         |WHERE doc_id NOT IN (SELECT id FROM nddrop)
         |  AND doc_id NOT IN (SELECT id FROM vsdrop)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val (corpus, shard, bench) = ingestFixture(s, dir)
      // index landing derived from the JVM temp dir (q_dedup_index
      // posture): the registered query must run from any checkout
      val idxPath = graft.QHelp.qtmpDir("ingidx")
        .getAbsolutePath
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "g_ing", idxPath)
      graft.llm.Pipeline.ingestShardFrame(shard, bench, "doc_id", "text",
          "g_ing", idxPath, redactPii = false)
        .select(col("doc_id"), col("__ck__").as("ck"))
        .orderBy("doc_id")
    }

    // The INCREMENTAL corpus→training-files mile, composed and
    // oracle-checked end to end (r13): the ingest gate's survivors
    // (the SHARED CTE chain above — the two oracles cannot drift) are
    // split by the stable id-hash and chopped into SHARD-LOCAL windows
    // whose permutation folds the shard label into the seed; the
    // oracle recomputes the gate, the split, the seeded Knuth order,
    // and the token-exact assembled text of every landed window.
    val wshSeed = 0L ^ scala.util.hashing.MurmurHash3.stringHash("d01").toLong
    val wshSeedRem = wshSeed % 2147483648L
    r.reg("q_ingest_windows",
      s"""WITH RECURSIVE $ingestCtes,
         |survivors AS (
         |  SELECT doc_id, text FROM clean
         |  WHERE doc_id NOT IN (SELECT id FROM nddrop)
         |    AND doc_id NOT IN (SELECT id FROM vsdrop)),
         |wdocs AS (
         |  SELECT doc_id, text,
         |    CASE WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |         WHEN (doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |         ELSE 'test' END AS split,
         |    (((doc_id % 2147483648 + $wshSeedRem) % 2147483648 + 2147483648) % 2147483648)
         |      * 2654435761 % 4294967296 AS ordkey
         |  FROM survivors),
         |wd AS (SELECT split, doc_id, ordkey, string_split(text, ' ') AS toks,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM wdocs),
         |wc AS (SELECT split, doc_id, toks, n,
         |        CAST(sum(n) OVER (PARTITION BY split ORDER BY ordkey
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start FROM wd),
         |ww AS (SELECT split, doc_id, toks, n, start,
         |        CAST(floor(start/150.0) AS BIGINT) AS wf,
         |        CASE WHEN n > 0 THEN CAST(floor((start+n-1)/150.0) AS BIGINT)
         |             ELSE CAST(floor(start/150.0) AS BIGINT) END AS wl FROM wc),
         |wr AS (SELECT unnest(range(0,
         |        (SELECT CAST(ceil(sum(n)/150.0) AS BIGINT) + 1 FROM wd))) AS window_id),
         |wmem AS (SELECT w.split, r.window_id,
         |          GREATEST(r.window_id*150 - w.start, 0) AS f,
         |          LEAST((r.window_id+1)*150 - w.start, w.n) AS t2,
         |          GREATEST(w.start - r.window_id*150, 0) AS pos, w.toks
         |         FROM ww w JOIN wr r ON r.window_id BETWEEN w.wf AND w.wl),
         |wparts AS (SELECT split, window_id, pos,
         |            array_to_string(toks[CAST(f+1 AS INT):CAST(t2 AS INT)], ' ') AS part,
         |            t2 - f AS len FROM wmem WHERE t2 > f)
         |SELECT split, window_id, string_agg(part, ' ' ORDER BY pos) AS window_text,
         |  CAST(sum(len) AS BIGINT) AS n_tokens
         |FROM wparts GROUP BY split, window_id
         |ORDER BY split, window_id""".stripMargin) { (s, dir) =>
      val (corpus, shard, bench) = ingestFixture(s, dir)
      val idxPath = graft.QHelp.qtmpDir("ingwidx").getAbsolutePath
      val outPath = graft.QHelp.qtmpDir("ingwout").getAbsolutePath
      // a fresh landing every run: the per-shard manifest would
      // otherwise O(1)-return a PREVIOUS scale factor's counts
      val p = new org.apache.hadoop.fs.Path(outPath)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "g_ingw", idxPath)
      graft.llm.Pipeline.ingestWindowsShard(shard, bench, "doc_id",
        "text", "g_ingw", idxPath, outPath, windowSize = 150L,
        shardLabel = "d01", redactPii = false)
      s.read.parquet(outPath)
        .select("split", "window_id", "window_text", "n_tokens")
        .orderBy("split", "window_id")
    }

    // STEADY-STATE daily-ingest shape (r10 verdict #3): q_ingest_gate
    // times fixture construction — the corpus-index rebuild dominates
    // (~40 actions, warm-up spread [26.5..7.2] in the r10 record) and
    // the number cannot move when the GATE's marginal cost moves, which
    // is the thing a corpus owner watches daily. This entry times the
    // per-day cost alone: restore the pristine pre-built index (a tiny
    // fixture-sized file copy), then shard → 6-stage gate → index
    // append → landing + manifest. The index is built ONCE per
    // JVM+dir (first call, or Bench's untimed prepare pass) and
    // snapshotted (FixtureSnapshot); each later call restores the
    // snapshot, so every timed run does identical steady-state work.
    r.reg("q_ingest_gate_steady",
      s"""WITH RECURSIVE $ingestCtes
         |SELECT doc_id FROM clean
         |WHERE doc_id NOT IN (SELECT id FROM nddrop)
         |  AND doc_id NOT IN (SELECT id FROM vsdrop)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val (corpus, shard, bench) = ingestFixture(s, dir)
      val base = graft.QHelp.qtmpDir("ingst")
      val idx = new java.io.File(base, "idx")
      val out = new java.io.File(base, "out")
      FixtureSnapshot.ensure(s, base, s"ingst|$dir",
        Seq("g_ingst_bands", "g_ingst_shingles", "g_ingst_keys"),
        Seq("idx")) {
        Dedup.writeNearDupIndex(corpus, "doc_id", "text", "g_ingst",
          idx.getAbsolutePath)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(out)
      graft.llm.Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "g_ingst", idx.getAbsolutePath, out.getAbsolutePath, "steady",
        redactPii = false)
      s.read.parquet(out.getAbsolutePath).select("doc_id").orderBy("doc_id")
    }

    // RETRACTION over the steady-ingest fixture (Pipeline
    // .retractDocuments): ingest the shard against the pristine
    // restored index, then retract every shard id with doc_id % 17 = 3
    // from ALL sinks — the landing read back must equal the gate's
    // survivors minus the retracted set. Retracting ids the gate
    // dropped is a no-op by construction (they never entered any
    // sink), which the oracle mirrors by filtering the survivor set.
    // Shares the ingst snapshot: both entries restore the identical
    // pristine state before working.
    r.reg("q_retract_docs",
      s"""WITH RECURSIVE $ingestCtes
         |SELECT doc_id FROM clean
         |WHERE doc_id NOT IN (SELECT id FROM nddrop)
         |  AND doc_id NOT IN (SELECT id FROM vsdrop)
         |  AND doc_id % 17 <> 3
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val (corpus, shard, bench) = ingestFixture(s, dir)
      val base = graft.QHelp.qtmpDir("ingst")
      val idx = new java.io.File(base, "idx")
      val out = new java.io.File(base, "out_retract")
      FixtureSnapshot.ensure(s, base, s"ingst|$dir",
        Seq("g_ingst_bands", "g_ingst_shingles", "g_ingst_keys"),
        Seq("idx")) {
        Dedup.writeNearDupIndex(corpus, "doc_id", "text", "g_ingst",
          idx.getAbsolutePath)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(out)
      graft.llm.Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "g_ingst", idx.getAbsolutePath, out.getAbsolutePath, "steady",
        redactPii = false)
      graft.llm.Pipeline.retractDocuments(s,
        shard.filter(col("doc_id") % 17 === 3).select("doc_id"),
        "doc_id", "g_ingst", out.getAbsolutePath)
      s.read.parquet(out.getAbsolutePath).select("doc_id").orderBy("doc_id")
    }

    // Per-doc FATE attribution over the same fixture: every input doc
    // classified by the FIRST stage that dropped it (or 'landed') — the
    // report a corpus owner reads before re-tuning thresholds. Same CTE
    // chain as q_ingest_gate; the CASE mirrors ingestAudit's precedence
    // exactly, so each planted family must land on its own reason.
    r.reg("q_ingest_audit",
      s"""WITH RECURSIVE $ingestCtes
         |SELECT s.doc_id,
         |  CASE
         |    WHEN s.doc_id NOT IN (SELECT doc_id FROM kept) THEN 'quality'
         |    WHEN s.doc_id NOT IN (SELECT doc_id FROM keyed WHERE rn = 1) THEN 'exact_in_shard'
         |    WHEN s.doc_id NOT IN (SELECT doc_id FROM fresh) THEN 'exact_vs_corpus'
         |    WHEN s.doc_id NOT IN (SELECT doc_id FROM clean) THEN 'contaminated'
         |    WHEN s.doc_id IN (SELECT id FROM nddrop) THEN 'near_in_shard'
         |    WHEN s.doc_id IN (SELECT id FROM vsdrop) THEN 'near_vs_corpus'
         |    ELSE 'landed' END AS fate
         |FROM shard s ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      val (corpus, shard, bench) = ingestFixture(s, dir)
      val idxPath = graft.QHelp.qtmpDir("ingaidx")
        .getAbsolutePath
      // own index name/path: the audit must read a PRISTINE corpus index
      // (q_ingest_gate's run appends its survivors to g_ing)
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "g_inga", idxPath)
      graft.llm.Pipeline.ingestAudit(shard, bench, "doc_id", "text",
          "g_inga", redactPii = false)
        .orderBy("doc_id")
    }

    r.reg("q_decontaminate",
      s"""WITH $decontamCtes
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
         |FROM (SELECT doc_id, unnest(gs) AS h FROM ths) th JOIN bh USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.contaminationReport(
          docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "doc_id", "text")
        .orderBy("doc_id")
    }

    r.reg("q_decontam_clean",
      s"""WITH $decontamCtes
         |SELECT doc_id FROM train
         |WHERE doc_id NOT IN (
         |  SELECT DISTINCT doc_id
         |  FROM (SELECT doc_id, unnest(gs) AS h FROM ths) th JOIN bh USING (h))
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.decontaminate(
          docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "doc_id", "text")
        .select("doc_id").orderBy("doc_id")
    }

    // INDEX-ROUTED decontamination (r13): the champion-term pruned path
    // must produce the IDENTICAL report to the full-scan form — same CTE
    // chain as q_decontaminate, but the Spark side routes candidates
    // through the persisted postings index (rarest-term election +
    // bucket-pruned postings read) and verifies on the candidate docs
    // only. The equality IS the claim: pruning drops corpus IO, never
    // results. Index fixture on the train split builds once per
    // (JVM, sf dir) — serving shape, not construction, rides Verify.
    r.reg("q_decontam_indexed",
      s"""WITH $decontamCtes
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
         |FROM (SELECT doc_id, unnest(gs) AS h FROM ths) th JOIN bh USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val trainDf = docs.filter(col("doc_id") % 10 =!= 0)
        .select("doc_id", "text")
      val benchDf = docs.filter(col("doc_id") % 10 === 0)
        .select("doc_id", "text")
      val qdir = graft.QHelp.qtmpDir("lexdcidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_lexd_postings")
      if (!fresh) {
        Lexical.writeLexicalIndex(trainDf, "doc_id", "text", "g_lexd",
          idxPath)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      Lexical.contaminationReportIndexed(trainDf, benchDf, "doc_id",
          "text", "g_lexd", idxPath)
        .orderBy("doc_id")
    }

    // Reference-corpus n-gram LM (CCNet shape, r13): documents with
    // doc_id % 10 = 0 play the high-quality reference, the rest are
    // candidates. The bigram chain is shared by the three oracles —
    // model counts, per-doc integer statistics (the join/multiplicity
    // machinery: every hit count and count mass is exact), and the
    // FILTER DECISION at logprob >= -3.5 (ln is engine libm — values
    // differ in the last ulp cross-engine, but the nearest doc sits
    // ~2e-4 from the threshold at both scales, ten orders above ulp
    // noise, so the DECISION is deterministic; the exact score values
    // are spec-pinned against a StrictMath driver reference instead).
    val lmCtes =
      s"""lmref AS (SELECT text FROM documents WHERE doc_id % 10 = 0),
         |lmcand AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
         |lmtoks AS (SELECT ${graft.llm.NgramLm.toksSql("text")} AS t FROM lmref),
         |lmgrams AS (
         |  SELECT unnest(list_transform(range(1, len(t)),
         |    i -> struct_pack(ctx := t[i], w := t[i+1]))) AS g
         |  FROM lmtoks WHERE len(t) >= 2),
         |lmcnts AS (SELECT g.ctx AS ctx, g.w AS w,
         |  CAST(count(*) AS BIGINT) AS cnt FROM lmgrams GROUP BY 1, 2),
         |lmctx AS (SELECT ctx, CAST(sum(cnt) AS BIGINT) AS ctx_cnt
         |  FROM lmcnts GROUP BY ctx),
         |lmv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM lmcnts),
         |lmctoks AS (SELECT doc_id, ${graft.llm.NgramLm.toksSql("text")} AS t FROM lmcand),
         |lmcgrams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |    i -> struct_pack(ctx := t[i], w := t[i+1]))) AS g
         |  FROM lmctoks WHERE len(t) >= 2),
         |lmcks AS (SELECT doc_id, g.ctx AS ctx, g.w AS w,
         |  CAST(count(*) AS BIGINT) AS k FROM lmcgrams GROUP BY 1, 2, 3),
         |lmcj AS (
         |  SELECT lmcks.doc_id, lmcks.ctx, lmcks.w, lmcks.k, c.cnt, x.ctx_cnt
         |  FROM lmcks LEFT JOIN lmcnts c ON lmcks.ctx = c.ctx AND lmcks.w = c.w
         |             LEFT JOIN lmctx x ON lmcks.ctx = x.ctx)""".stripMargin

    def lmModel(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.llm.NgramLm.train(
        t(s, dir, "documents").filter(col("doc_id") % 10 === 0), "text", 2)
    def lmCand(s: org.apache.spark.sql.SparkSession, dir: String) =
      t(s, dir, "documents").filter(col("doc_id") % 10 =!= 0)
        .select("doc_id", "text")

    r.reg("q_ngram_lm",
      s"""WITH $lmCtes
         |SELECT c.ctx, c.w, c.cnt, x.ctx_cnt
         |FROM lmcnts c JOIN lmctx x USING (ctx)
         |ORDER BY ctx, w""".stripMargin) { (s, dir) =>
      lmModel(s, dir).orderBy("ctx", "w")
    }

    r.reg("q_lm_stats",
      s"""WITH $lmCtes,
         |lmagg AS (
         |  SELECT doc_id,
         |    CAST(sum(k) AS BIGINT) AS n_grams,
         |    CAST(sum(CASE WHEN cnt IS NOT NULL THEN k ELSE 0 END) AS BIGINT) AS n_hit,
         |    CAST(sum(CASE WHEN ctx_cnt IS NOT NULL THEN k ELSE 0 END) AS BIGINT) AS n_ctx_hit,
         |    CAST(sum(k * coalesce(cnt, 0)) AS BIGINT) AS sum_cnt,
         |    CAST(sum(k * coalesce(ctx_cnt, 0)) AS BIGINT) AS sum_ctx
         |  FROM lmcj GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams,
         |  coalesce(a.n_hit, 0) AS n_hit,
         |  coalesce(a.n_ctx_hit, 0) AS n_ctx_hit,
         |  coalesce(a.sum_cnt, 0) AS sum_cnt,
         |  coalesce(a.sum_ctx, 0) AS sum_ctx
         |FROM lmcand d LEFT JOIN lmagg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      // model materialized ONCE (r16 optimization): score references the
      // model plan multiply (stats aggregate + join) plus an eager
      // non-empty probe — an unmaterialized trainer plan re-runs the
      // training aggregation per reference. localCheckpoint is inside
      // the timed region (every run re-trains); results are identical.
      graft.llm.NgramLm.score(lmCand(s, dir), "doc_id", "text",
          lmModel(s, dir).localCheckpoint(true), n = 2)
        .select("doc_id", "n_grams", "n_hit", "n_ctx_hit", "sum_cnt",
          "sum_ctx")
        .orderBy("doc_id")
    }

    // the persisted round-trip (the q_bm25_indexed pattern): serving
    // through the bucketed `_lm` table — ctx totals and V re-derived
    // from the live table — must hash-match the SAME chain as the
    // one-shot q_lm_stats. Fixture builds once per (JVM, sf dir).
    r.reg("q_lm_indexed",
      s"""WITH $lmCtes,
         |lmagg AS (
         |  SELECT doc_id,
         |    CAST(sum(k) AS BIGINT) AS n_grams,
         |    CAST(sum(CASE WHEN cnt IS NOT NULL THEN k ELSE 0 END) AS BIGINT) AS n_hit,
         |    CAST(sum(CASE WHEN ctx_cnt IS NOT NULL THEN k ELSE 0 END) AS BIGINT) AS n_ctx_hit,
         |    CAST(sum(k * coalesce(cnt, 0)) AS BIGINT) AS sum_cnt,
         |    CAST(sum(k * coalesce(ctx_cnt, 0)) AS BIGINT) AS sum_ctx
         |  FROM lmcj GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams,
         |  coalesce(a.n_hit, 0) AS n_hit,
         |  coalesce(a.n_ctx_hit, 0) AS n_ctx_hit,
         |  coalesce(a.sum_cnt, 0) AS sum_cnt,
         |  coalesce(a.sum_ctx, 0) AS sum_ctx
         |FROM lmcand d LEFT JOIN lmagg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val qdir = graft.QHelp.qtmpDir("lmidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_plm_lm")
      if (!fresh) {
        graft.llm.NgramLm.writeLm(
          t(s, dir, "documents").filter(col("doc_id") % 10 === 0), "text",
          "g_plm", idxPath)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      graft.llm.NgramLm.scoreIndexed(s, "g_plm", idxPath, lmCand(s, dir),
          "doc_id", "text")
        .select("doc_id", "n_grams", "n_hit", "n_ctx_hit", "sum_cnt",
          "sum_ctx")
        .orderBy("doc_id")
    }

    r.reg("q_lm_filter",
      s"""WITH $lmCtes,
         |lmsc AS (
         |  SELECT doc_id,
         |    list_sum(list(k * ln((CAST(coalesce(cnt, 0) AS DOUBLE) + 1.0) /
         |      (CAST(coalesce(ctx_cnt, 0) AS DOUBLE) + CAST(v AS DOUBLE)))
         |      ORDER BY ctx, w)) / CAST(sum(k) AS DOUBLE) AS logprob
         |  FROM lmcj, lmv GROUP BY doc_id)
         |SELECT doc_id FROM lmcand
         |WHERE doc_id NOT IN (SELECT doc_id FROM lmsc WHERE logprob < -3.5)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.llm.NgramLm.filterByLm(lmCand(s, dir), "doc_id", "text",
          lmModel(s, dir).localCheckpoint(true), minLogprob = -3.5, n = 2)
        .select("doc_id").orderBy("doc_id")
    }

    // Trained quality classifier (GPT-3/CCNet shape, r13): docs with
    // doc_id % 10 = 0 play the curated (positive) seed, % 10 = 5 the
    // crawl (negative) seed; the other 80% are candidates. The unigram
    // NB chain is shared by four oracles — model counts, per-doc
    // integer statistics, the FILTER DECISION at llr_mean >= 0.002
    // (nearest candidate sits 2.1e-5 from the threshold at sf0.01 and
    // 1.2e-4 at sf0.001 — seven orders above cross-engine ln ulp
    // noise; exact llr values are spec-pinned against StrictMath), and
    // the persisted `_nbc` round trip which must hash-match the
    // one-shot stats.
    val nbCtes =
      s"""nbpos AS (SELECT text FROM documents WHERE doc_id % 10 = 0),
         |nbneg AS (SELECT text FROM documents WHERE doc_id % 10 = 5),
         |nbcand AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % 10 NOT IN (0, 5)),
         |nbptk AS (SELECT ${graft.llm.NgramLm.toksSql("text")} AS t FROM nbpos),
         |nbposc AS (SELECT w, CAST(count(*) AS BIGINT) AS pos_cnt
         |  FROM (SELECT unnest(t) AS w FROM nbptk) GROUP BY w),
         |nbntk AS (SELECT ${graft.llm.NgramLm.toksSql("text")} AS t FROM nbneg),
         |nbnegc AS (SELECT w, CAST(count(*) AS BIGINT) AS neg_cnt
         |  FROM (SELECT unnest(t) AS w FROM nbntk) GROUP BY w),
         |nbmodel AS (SELECT coalesce(p.w, n.w) AS w,
         |    coalesce(pos_cnt, 0) AS pos_cnt,
         |    coalesce(neg_cnt, 0) AS neg_cnt
         |  FROM nbposc p FULL OUTER JOIN nbnegc n ON p.w = n.w),
         |nbtot AS (SELECT CAST(count(*) AS BIGINT) AS v,
         |  sum(pos_cnt) AS npos, sum(neg_cnt) AS nneg FROM nbmodel),
         |nbctk AS (SELECT doc_id, ${graft.llm.NgramLm.toksSql("text")} AS t FROM nbcand),
         |nbks AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
         |  FROM (SELECT doc_id, unnest(t) AS w FROM nbctk) GROUP BY doc_id, w),
         |nbj AS (SELECT nbks.doc_id, nbks.w, nbks.k,
         |    coalesce(m.pos_cnt, 0) AS pos0, coalesce(m.neg_cnt, 0) AS neg0,
         |    m.w IS NOT NULL AS hit
         |  FROM nbks LEFT JOIN nbmodel m USING (w)),
         |nbagg AS (
         |  SELECT doc_id,
         |    CAST(sum(k) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN pos0 > 0 THEN k ELSE 0 END) AS BIGINT) AS n_hit_pos,
         |    CAST(sum(CASE WHEN neg0 > 0 THEN k ELSE 0 END) AS BIGINT) AS n_hit_neg,
         |    CAST(sum(k * pos0) AS BIGINT) AS sum_pos_cnt,
         |    CAST(sum(k * neg0) AS BIGINT) AS sum_neg_cnt
         |  FROM nbj GROUP BY doc_id)""".stripMargin
    val nbStatsSql =
      s"""WITH $nbCtes
         |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
         |  coalesce(a.n_hit_pos, 0) AS n_hit_pos,
         |  coalesce(a.n_hit_neg, 0) AS n_hit_neg,
         |  coalesce(a.sum_pos_cnt, 0) AS sum_pos_cnt,
         |  coalesce(a.sum_neg_cnt, 0) AS sum_neg_cnt
         |FROM nbcand d LEFT JOIN nbagg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin

    def nbSeed(s: org.apache.spark.sql.SparkSession, dir: String,
               m: Int): org.apache.spark.sql.DataFrame =
      t(s, dir, "documents").filter(col("doc_id") % 10 === m).select("text")
    def nbModel(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.llm.Classifier.train(nbSeed(s, dir, 0), nbSeed(s, dir, 5),
        "text")
    def nbCand(s: org.apache.spark.sql.SparkSession, dir: String) =
      t(s, dir, "documents")
        .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
        .select("doc_id", "text")

    r.reg("q_nb_model",
      s"""WITH $nbCtes
         |SELECT w, pos_cnt, neg_cnt FROM nbmodel ORDER BY w""".stripMargin) {
      (s, dir) => nbModel(s, dir).orderBy("w")
    }

    r.reg("q_nb_stats", nbStatsSql) { (s, dir) =>
      // model materialized ONCE (r16 optimization — the q_lm_stats note)
      graft.llm.Classifier.score(nbCand(s, dir), "doc_id", "text",
          nbModel(s, dir).localCheckpoint(true))
        .select("doc_id", "n_tokens", "n_hit_pos", "n_hit_neg",
          "sum_pos_cnt", "sum_neg_cnt")
        .orderBy("doc_id")
    }

    r.reg("q_nb_filter",
      s"""WITH $nbCtes,
         |nbsc AS (
         |  SELECT doc_id,
         |    list_sum(list(k * (
         |      ln((CAST(pos0 AS DOUBLE) + 1.0) /
         |        (CAST(npos AS DOUBLE) + CAST(v AS DOUBLE)))
         |      - ln((CAST(neg0 AS DOUBLE) + 1.0) /
         |        (CAST(nneg AS DOUBLE) + CAST(v AS DOUBLE)))) ORDER BY w))
         |      / CAST(sum(k) AS DOUBLE) AS llr_mean
         |  FROM nbj, nbtot GROUP BY doc_id)
         |SELECT doc_id FROM nbcand
         |WHERE doc_id NOT IN (SELECT doc_id FROM nbsc WHERE llr_mean < 0.002)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // model materialized ONCE (r16 optimization — the q_lm_stats note)
      graft.llm.Classifier.filterByClassifier(nbCand(s, dir), "doc_id",
          "text", nbModel(s, dir).localCheckpoint(true),
          minLlrMean = 0.002)
        .select("doc_id").orderBy("doc_id")
    }

    // persisted `_nbc` round trip (the q_lm_indexed pattern): serving
    // through the bucketed table — Npos/Nneg/V re-derived live — must
    // hash-match the SAME chain as the one-shot q_nb_stats. Fixture
    // builds once per (JVM, sf dir).
    r.reg("q_nb_indexed", nbStatsSql) { (s, dir) =>
      val qdir = graft.QHelp.qtmpDir("nbcidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_pnbc_nbc")
      if (!fresh) {
        graft.llm.Classifier.writeClassifier(nbSeed(s, dir, 0),
          nbSeed(s, dir, 5), "text", "g_pnbc", idxPath)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      graft.llm.Classifier.scoreIndexed(s, "g_pnbc", idxPath,
          nbCand(s, dir), "doc_id", "text")
        .select("doc_id", "n_tokens", "n_hit_pos", "n_hit_neg",
          "sum_pos_cnt", "sum_neg_cnt")
        .orderBy("doc_id")
    }

    // Multiclass NB — trained language ID (the fastText/CCNet role;
    // the model-based upgrade of the marker-heuristic q_lang_predict):
    // docs with doc_id % 5 = 0 are the labeled seed (their own `lang`
    // column), the rest are candidates. Integer per-(doc, label)
    // statistics are hash-exact; the PREDICTION argmax is oracle-safe —
    // min top-2 score margin 3.0e-3 / 3.2e-3 at the two scales, ten
    // orders above the ln-fold's cross-engine ulp accumulation.
    val nbmCtes =
      s"""nbmtr AS (SELECT lang AS label, text FROM documents WHERE doc_id % 5 = 0),
         |nbmcand AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
         |nbmm AS (SELECT label, w, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT label, unnest(${graft.llm.NgramLm.toksSql("text")}) AS w
         |        FROM nbmtr) GROUP BY label, w),
         |nbmtot AS (SELECT label, sum(cnt) AS nl FROM nbmm GROUP BY label),
         |nbmv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM nbmm),
         |nbmlbl AS (SELECT DISTINCT label FROM nbmm),
         |nbmks AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
         |  FROM (SELECT doc_id, unnest(${graft.llm.NgramLm.toksSql("text")}) AS w
         |        FROM nbmcand) GROUP BY doc_id, w),
         |nbmj AS (SELECT nbmks.doc_id, nbmlbl.label, nbmks.w, nbmks.k,
         |    coalesce(m.cnt, 0) AS c0
         |  FROM nbmks CROSS JOIN nbmlbl
         |  LEFT JOIN nbmm m ON m.label = nbmlbl.label AND m.w = nbmks.w),
         |nbmagg AS (
         |  SELECT doc_id, label,
         |    CAST(sum(k) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN c0 > 0 THEN k ELSE 0 END) AS BIGINT) AS n_hit,
         |    CAST(sum(k * c0) AS BIGINT) AS sum_cnt,
         |    list_sum(list(k * ln((CAST(c0 AS DOUBLE) + 1.0) /
         |      (CAST(nl AS DOUBLE) + CAST(v AS DOUBLE))) ORDER BY w)) AS score
         |  FROM nbmj JOIN nbmtot USING (label), nbmv
         |  GROUP BY doc_id, label)""".stripMargin

    def nbmModel(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.llm.Classifier.trainMulti(
        t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
          .select("lang", "text"), "lang", "text")
    def nbmCand(s: org.apache.spark.sql.SparkSession, dir: String) =
      t(s, dir, "documents").filter(col("doc_id") % 5 =!= 0)
        .select("doc_id", "text")

    r.reg("q_nbm_stats",
      s"""WITH $nbmCtes
         |SELECT doc_id, label, n_tokens, n_hit, sum_cnt FROM nbmagg
         |ORDER BY doc_id, label""".stripMargin) { (s, dir) =>
      // model materialized ONCE (r16 optimization): scoreMulti references
      // the model plan four times (totals, vocab, labels, join) plus the
      // eager non-empty probe — the q_lm_stats note
      graft.llm.Classifier.scoreMulti(nbmCand(s, dir), "doc_id", "text",
          nbmModel(s, dir).localCheckpoint(true))
        .select("doc_id", "label", "n_tokens", "n_hit", "sum_cnt")
        .orderBy("doc_id", "label")
    }

    r.reg("q_nbm_predict",
      s"""WITH $nbmCtes,
         |nbmrk AS (SELECT doc_id, label,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, label) AS r
         |  FROM nbmagg)
         |SELECT d.doc_id, rk.label AS predicted
         |FROM nbmcand d LEFT JOIN (
         |  SELECT doc_id, label FROM nbmrk WHERE r = 1) rk USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      // model materialized ONCE (r16 optimization — the q_nbm_stats note)
      graft.llm.Classifier.predictMulti(nbmCand(s, dir), "doc_id",
          "text", nbmModel(s, dir).localCheckpoint(true))
        .orderBy("doc_id")
    }

    // Persisted MULTICLASS model round trip (r14 — the FOURTEENTH
    // maintained family): serving the per-(doc, label) statistics
    // through the bucketed `_nbm` table — label totals, V and the
    // label set re-derived live — must hash-match the SAME CTE chain
    // as the one-shot q_nbm_stats. Fixture builds once per (JVM, dir).
    r.reg("q_nbm_indexed",
      s"""WITH $nbmCtes
         |SELECT doc_id, label, n_tokens, n_hit, sum_cnt FROM nbmagg
         |ORDER BY doc_id, label""".stripMargin) { (s, dir) =>
      val qdir = graft.QHelp.qtmpDir("nbmidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_pnbm_nbm")
      if (!fresh) {
        graft.llm.Classifier.writeMulti(
          t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
            .select("lang", "text"),
          "lang", "text", "g_pnbm", idxPath)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      graft.llm.Classifier.scoreMultiIndexed(s, "g_pnbm", idxPath,
          nbmCand(s, dir), "doc_id", "text")
        .select("doc_id", "label", "n_tokens", "n_hit", "sum_cnt")
        .orderBy("doc_id", "label")
    }

    // The composed pipeline WITH the classifier gate (1c): the shared
    // 6-stage chain with the NB llr_mean >= 0.002 decision SPLICED
    // between the rule-quality gate and exact dedup — exactly where
    // chain() runs it. The gate is decisive (drops ~half the quality
    // survivors; nearest doc sits 3.0e-5 / 2.1e-5 from the threshold at
    // sf0.001 / sf0.01) and every downstream stage (exact, near,
    // decontam, split, shuffle_pos) re-derives over the gated set, so a
    // doc wrongly kept or dropped shifts every later position — no
    // slack. Model seeds are the q_nb_model fixture (%10 = 0 / 5).
    val clfStageCtes =
      s"""clfktk AS (SELECT doc_id, ${graft.llm.NgramLm.toksSql("text")} AS t FROM kept),
         |clfks AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
         |  FROM (SELECT doc_id, unnest(t) AS w FROM clfktk) GROUP BY doc_id, w),
         |clfj AS (SELECT clfks.doc_id, clfks.k,
         |    coalesce(m.pos_cnt, 0) AS pos0, coalesce(m.neg_cnt, 0) AS neg0,
         |    clfks.w AS w
         |  FROM clfks LEFT JOIN nbmodel m USING (w)),
         |clfsc AS (SELECT doc_id,
         |    list_sum(list(k * (
         |      ln((CAST(pos0 AS DOUBLE) + 1.0) /
         |        (CAST(npos AS DOUBLE) + CAST(v AS DOUBLE)))
         |      - ln((CAST(neg0 AS DOUBLE) + 1.0) /
         |        (CAST(nneg AS DOUBLE) + CAST(v AS DOUBLE)))) ORDER BY w))
         |      / CAST(sum(k) AS DOUBLE) AS llr_mean
         |  FROM clfj, nbtot GROUP BY doc_id),
         |clfkept AS (SELECT k.doc_id, k.text FROM kept k
         |  JOIN clfsc USING (doc_id) WHERE llr_mean >= 0.002),""".stripMargin
    val pipeClfCtes = {
      val spliced = pipeCleanCtes.replace("keyed AS (",
        nbCtes + ",\n" + clfStageCtes + "\nkeyed AS (")
      val rerooted = spliced.replace("AS rn\n  FROM kept),",
        "AS rn\n  FROM clfkept),")
      require(spliced != pipeCleanCtes && rerooted != spliced,
        "q_pipeline_clf splice anchors drifted — update the replaces")
      rerooted
    }
    r.reg("q_pipeline_clf", pipeClfCtes + "\n" + pipeFinal("clean")) {
      (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.llm.Pipeline.pretrainCorpus(
          docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "doc_id", "text",
          // model materialized ONCE (r16 optimization — q_lm_stats note)
          classifierFilter = Some(graft.llm.Pipeline.ClassifierFilter(
            nbModel(s, dir).localCheckpoint(true), minLlrMean = 0.002)))
        .select("doc_id", "split", "shuffle_pos")
        .orderBy("doc_id")
    }

    // The composed pipeline WITH the LANGUAGE gate (1a, r14): the
    // CCNet-style lang-ID filter every production pipeline runs before
    // its quality models — multiclass NB trained on the %5==0 labeled
    // seed (the q_nbm fixture), argmax prediction over the quality
    // survivors, keep {en, zh}. The gate is decisive (drops the three
    // other languages' survivors) and every downstream stage (exact,
    // near, decontam, split, shuffle_pos) re-derives over the gated
    // set; the argmax's cross-engine safety rides the q_nbm_predict
    // margin argument (training members score far above alternatives).
    val pipeLangCtes = {
      val tok = graft.llm.NgramLm.toksSql("text")
      val lngCtes =
        s"""lngtr AS (SELECT lang AS label, text FROM documents WHERE doc_id % 5 = 0),
           |lngm AS (SELECT label, w, CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT label, unnest($tok) AS w FROM lngtr) GROUP BY label, w),
           |lngtot AS (SELECT label, sum(cnt) AS nl FROM lngm GROUP BY label),
           |lngv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM lngm),
           |lnglbl AS (SELECT DISTINCT label FROM lngm),
           |lngks AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS k
           |  FROM (SELECT doc_id, unnest($tok) AS w FROM kept) GROUP BY doc_id, w),
           |lngj AS (SELECT lngks.doc_id, lnglbl.label, lngks.w, lngks.k,
           |    coalesce(m.cnt, 0) AS c0
           |  FROM lngks CROSS JOIN lnglbl
           |  LEFT JOIN lngm m ON m.label = lnglbl.label AND m.w = lngks.w),
           |lngsc AS (SELECT doc_id, label,
           |    list_sum(list(k * ln((CAST(c0 AS DOUBLE) + 1.0) /
           |      (CAST(nl AS DOUBLE) + CAST(v AS DOUBLE))) ORDER BY w)) AS score
           |  FROM lngj JOIN lngtot USING (label), lngv
           |  GROUP BY doc_id, label),
           |lngpred AS (SELECT doc_id, label FROM (
           |  SELECT doc_id, label, row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score DESC, label) AS r FROM lngsc) WHERE r = 1),
           |lngkept AS (SELECT k.doc_id, k.text FROM kept k
           |  JOIN lngpred USING (doc_id) WHERE label IN ('en', 'zh'))""".stripMargin
      val spliced = pipeCleanCtes.replace("keyed AS (",
        lngCtes + ",\nkeyed AS (")
      val rerooted = spliced.replace("AS rn\n  FROM kept),",
        "AS rn\n  FROM lngkept),")
      require(spliced != pipeCleanCtes && rerooted != spliced,
        "q_pipeline_lang splice anchors drifted — update the replaces")
      rerooted
    }

    r.reg("q_pipeline_lang", pipeLangCtes + "\n" + pipeFinal("clean")) {
      (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.llm.Pipeline.pretrainCorpus(
          docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "doc_id", "text",
          // model materialized ONCE (r16 optimization): the lang gate's
          // scoreMulti references the model plan four times plus the
          // eager non-empty probe; an unmaterialized trainMulti plan
          // re-runs the training aggregation per reference and inflates
          // the composed plan (the q_nbm_stats note)
          langFilter = Some(graft.llm.Pipeline.LangFilter(
            graft.llm.Classifier.trainMulti(
              docs.filter(col("doc_id") % 5 === 0).select("lang", "text"),
              "lang", "text").localCheckpoint(true),
            keep = Set("en", "zh"))))
        .select("doc_id", "split", "shuffle_pos")
        .orderBy("doc_id")
    }

    // The composed pipeline WITH the span-scrub stage (0c): ExactSubstr
    // at k=5 cuts corpus-duplicated 5-gram regions from every doc
    // BEFORE the quality gate — at both scales the scrub touches ~50
    // docs and EMPTIES the ~17 whole-doc duplicates (which then fail
    // minTokens instead of reaching exact dedup), so quality, both
    // dedups, decontam, split and every shuffle position re-derive over
    // scrubbed text. The oracle recomputes the scrub token-exactly and
    // feeds the rebuilt text through the same downstream chain.
    val pipeSpanCtes = {
      val scrub =
        s"""sptoks AS (SELECT doc_id, ${graft.llm.NgramLm.toksSql("text")} AS t FROM base),
           |spocc AS (
           |  SELECT doc_id,
           |    CAST(unnest(range(1, len(t) - 5 + 2)) AS INTEGER) AS pos,
           |    unnest(list_transform(range(1, len(t) - 5 + 2),
           |      p -> array_to_string(t[p:p+5-1], ' '))) AS gram
           |  FROM sptoks WHERE len(t) >= 5),
           |spdup AS (SELECT gram FROM spocc GROUP BY gram HAVING count(*) >= 2),
           |sphit AS (SELECT doc_id, pos FROM spocc
           |  WHERE gram IN (SELECT gram FROM spdup)),
           |spmark AS (
           |  SELECT doc_id, pos,
           |    CASE WHEN coalesce(pos > max(pos + 5) OVER (
           |        PARTITION BY doc_id ORDER BY pos
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), TRUE)
           |      THEN 1 ELSE 0 END AS nw
           |  FROM sphit),
           |spgrp AS (SELECT doc_id, pos,
           |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
           |  FROM spmark),
           |spspans AS (SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
           |  CAST(max(pos) + 5 AS INTEGER) AS span_end
           |  FROM spgrp GROUP BY doc_id, grp),
           |sppos AS (SELECT doc_id,
           |    CAST(unnest(range(1, len(t)+1)) AS INTEGER) AS i,
           |    unnest(t) AS tok
           |  FROM sptoks),
           |spkept2 AS (
           |  SELECT p.doc_id, p.i, p.tok FROM sppos p
           |  WHERE NOT EXISTS (SELECT 1 FROM spspans sx
           |    WHERE sx.doc_id = p.doc_id
           |      AND p.i >= sx.span_start AND p.i < sx.span_end)),
           |sprebuilt AS (SELECT doc_id,
           |    coalesce(string_agg(tok, ' ' ORDER BY i), '') AS rebuilt
           |  FROM spkept2 GROUP BY doc_id),
           |spdocspans AS (SELECT DISTINCT doc_id FROM spspans),
           |spbase AS (
           |  SELECT d.doc_id,
           |    CASE WHEN sp.doc_id IS NULL THEN d.text
           |         ELSE coalesce(r.rebuilt, '') END AS text
           |  FROM base d
           |  LEFT JOIN spdocspans sp USING (doc_id)
           |  LEFT JOIN sprebuilt r ON r.doc_id = d.doc_id),
           |""".stripMargin
      val spliced = pipeCleanCtes.replace("qtoks AS (", scrub + "qtoks AS (")
      val r1 = spliced.replace("AS t FROM base),\nqgrams AS (",
        "AS t FROM spbase),\nqgrams AS (")
      val r2 = r1.replace("FROM base d LEFT JOIN qgtop",
        "FROM spbase d LEFT JOIN qgtop")
      require(spliced != pipeCleanCtes && r1 != spliced && r2 != r1,
        "q_pipeline_spans splice anchors drifted — update the replaces")
      r2
    }
    r.reg("q_pipeline_spans", pipeSpanCtes + "\n" + pipeFinal("clean")) {
      (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.llm.Pipeline.pretrainCorpus(
          docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "doc_id", "text",
          spanScrub = Some(graft.llm.Pipeline.SpanScrub(k = 5)))
        .select("doc_id", "split", "shuffle_pos")
        .orderBy("doc_id")
    }

    // PII redaction: fixture prose carries no PII, so planted rows
    // exercise each pattern class (email, phone with punctuation, IPv4,
    // digits that must NOT match) and the redacted strings themselves are
    // hash-compared.
    r.reg("q_pii_redact",
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 50
        |  UNION ALL SELECT -10, 'contact john.doe+spam@example.co.uk or call +1 (555) 123-4567 now'
        |  UNION ALL SELECT -11, 'server at 192.168.1.100 logged jane_a99@sub.domain.io twice'
        |  UNION ALL SELECT -12, 'no pii here, just text with numbers 42 and 3.14'
        |  UNION ALL SELECT -13, 'ids 123-45-6789 and bare 5551234567 plus a@b.io'
        |)
        |SELECT doc_id, redacted, (redacted <> text) AS has_pii FROM (
        |  SELECT doc_id, text,
        |    regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        |      '\+?\d[\d \-()]{7,}\d', '[PHONE]', 'g') AS redacted
        |  FROM docs)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val planted = Seq(
        (-10L, "contact john.doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
        (-11L, "server at 192.168.1.100 logged jane_a99@sub.domain.io twice"),
        (-12L, "no pii here, just text with numbers 42 and 3.14"),
        (-13L, "ids 123-45-6789 and bare 5551234567 plus a@b.io"))
      val plantedDf = s.createDataFrame(
        java.util.Arrays.asList(planted.map(p =>
          org.apache.spark.sql.Row(p._1, p._2)): _*),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      val docs = t(s, dir, "documents").filter(col("doc_id") < 50)
        .select("doc_id", "text").unionByName(plantedDf)
      val red = TextStats.redactPii(col("text"))
      docs.select(col("doc_id"), red.as("redacted"),
          (red =!= col("text")).as("has_pii"))
        .orderBy("doc_id")
    }

    // Within-doc repeated-line removal: fixture docs are single-line, so
    // planted multi-line rows exercise dedup + order preservation; the
    // oracle reassembles by first-occurrence position exactly like the
    // Spark side.
    r.reg("q_dedup_lines",
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |  UNION ALL SELECT -20, 'line one' || chr(10) || 'line one' || chr(10) || 'end'
        |  UNION ALL SELECT -21, 'b' || chr(10) || 'a' || chr(10) || 'b' || chr(10) || 'a'
        |),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM docs),
        |ex AS (SELECT doc_id, unnest(range(1, len(arr)+1)) AS pos, arr FROM ls),
        |lines AS (SELECT doc_id, pos, arr[pos] AS line FROM ex),
        |firsts AS (SELECT doc_id, line, min(pos) AS fp FROM lines GROUP BY doc_id, line)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY fp) AS text
        |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val planted = Seq(
        (-20L, "line one\nline one\nend"),
        (-21L, "b\na\nb\na"))
      val plantedDf = s.createDataFrame(
        java.util.Arrays.asList(planted.map(p =>
          org.apache.spark.sql.Row(p._1, p._2)): _*),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
        .select("doc_id", "text").unionByName(plantedDf)
      TextStats.dropRepeatedLines(docs, "doc_id", "text").orderBy("doc_id")
    }

    // Span-level exact-substring dedup (Lee et al. 2021 ExactSubstr,
    // Spark-shaped): duplicated 4-gram fingerprints over a third of the
    // documents table plus planted rows covering each geometry — a
    // whole-doc duplicate (-30/-31, the copy embedded mid-doc so the
    // span is interior), in-doc self-repetition with adjacent-window
    // merge (-32), and an untouched doc with irregular whitespace that
    // must come back VERBATIM (-33). The oracle recomputes the gram
    // explode, the global duplicate decision, the interval merge (same
    // window frames) and — for the scrub — the token-exact rebuilt text.
    def spanPlanted(s: org.apache.spark.sql.SparkSession,
                    dir: String): org.apache.spark.sql.DataFrame = {
      val planted = Seq(
        (-30L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (-31L, "prefix words alpha beta gamma delta epsilon zeta eta theta iota kappa suffix words"),
        (-32L, "one two three four one two three four tail bit"),
        (-33L, "unique doc nothing  shared here at all   today"))
      val plantedDf = s.createDataFrame(
        java.util.Arrays.asList(planted.map(p =>
          org.apache.spark.sql.Row(p._1, p._2)): _*),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      t(s, dir, "documents").filter(col("doc_id") % 3 === 1)
        .select("doc_id", "text").unionByName(plantedDf)
    }
    def spanCtes(minSpan: Int): String =
      s"""spdocs AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
         |  UNION ALL SELECT -30, 'alpha beta gamma delta epsilon zeta eta theta iota kappa'
         |  UNION ALL SELECT -31, 'prefix words alpha beta gamma delta epsilon zeta eta theta iota kappa suffix words'
         |  UNION ALL SELECT -32, 'one two three four one two three four tail bit'
         |  UNION ALL SELECT -33, 'unique doc nothing  shared here at all   today'
         |),
         |sptoks AS (SELECT doc_id, ${graft.llm.NgramLm.toksSql("text")} AS t FROM spdocs),
         |spocc AS (
         |  SELECT doc_id,
         |    CAST(unnest(range(1, len(t) - 4 + 2)) AS INTEGER) AS pos,
         |    unnest(list_transform(range(1, len(t) - 4 + 2),
         |      p -> array_to_string(t[p:p+4-1], ' '))) AS gram
         |  FROM sptoks WHERE len(t) >= 4),
         |spdup AS (SELECT gram FROM spocc GROUP BY gram HAVING count(*) >= 2),
         |sphit AS (SELECT doc_id, pos FROM spocc
         |  WHERE gram IN (SELECT gram FROM spdup)),
         |spmark AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN coalesce(pos > max(pos + 4) OVER (
         |        PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), TRUE)
         |      THEN 1 ELSE 0 END AS nw
         |  FROM sphit),
         |spgrp AS (SELECT doc_id, pos,
         |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM spmark),
         |spspans AS (SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
         |  CAST(max(pos) + 4 AS INTEGER) AS span_end
         |  FROM spgrp GROUP BY doc_id, grp
         |  HAVING max(pos) + 4 - min(pos) >= $minSpan)""".stripMargin

    r.reg("q_dup_spans",
      s"""WITH ${spanCtes(0)}
         |SELECT doc_id, span_start, span_end FROM spspans
         |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
      graft.llm.Dedup.duplicateSpans(spanPlanted(s, dir), "doc_id", "text",
          k = 4)
        .orderBy("doc_id", "span_start")
    }

    r.reg("q_span_scrub",
      s"""WITH ${spanCtes(6)},
         |sppos AS (SELECT doc_id,
         |    CAST(unnest(range(1, len(t)+1)) AS INTEGER) AS i,
         |    unnest(t) AS tok
         |  FROM sptoks),
         |spkept AS (
         |  SELECT p.doc_id, p.i, p.tok FROM sppos p
         |  WHERE NOT EXISTS (SELECT 1 FROM spspans s
         |    WHERE s.doc_id = p.doc_id
         |      AND p.i >= s.span_start AND p.i < s.span_end)),
         |sprebuilt AS (SELECT doc_id,
         |    coalesce(string_agg(tok, ' ' ORDER BY i), '') AS rebuilt,
         |    count(*) AS n_kept
         |  FROM spkept GROUP BY doc_id),
         |spdocspans AS (SELECT DISTINCT doc_id FROM spspans)
         |SELECT d.doc_id,
         |  CASE WHEN sp.doc_id IS NULL THEN d.text
         |       ELSE coalesce(r.rebuilt, '') END AS text,
         |  CASE WHEN sp.doc_id IS NULL THEN CAST(0 AS INTEGER)
         |       ELSE CAST(len(t.t) - coalesce(r.n_kept, 0) AS INTEGER)
         |       END AS tokens_removed
         |FROM spdocs d
         |JOIN sptoks t USING (doc_id)
         |LEFT JOIN spdocspans sp USING (doc_id)
         |LEFT JOIN sprebuilt r ON r.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      graft.llm.Dedup.scrubDuplicateSpans(spanPlanted(s, dir), "doc_id",
          "text", k = 4, minSpanTokens = 6)
        .select("doc_id", "text", "tokens_removed")
        .orderBy("doc_id")
    }

    // Index-routed span scrub (the NINTH family's serving path): the
    // gram LEDGER builds on doc_id % 3 = 0, a first shard (% 3 = 2)
    // APPENDS its counts, then the arriving shard (the q_span_scrub
    // fixture) scrubs against the SUMMED ledger + its own occurrences —
    // cross-corpus duplication (natural docs repeating base/appended
    // grams) and shard-internal duplication (the planted pairs) fall
    // out of one decision. The oracle recomputes ledger counts from
    // both source populations, the combined >= 2 decision, the interval
    // merge and the token-exact rebuilt shard text. Fixture (index +
    // append) builds once per (JVM, sf dir).
    r.reg("q_span_indexed",
      s"""WITH ixsrc AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 3 = 0 OR doc_id % 3 = 2),
         |ixtoks AS (SELECT doc_id, ${graft.llm.NgramLm.toksSql("text")} AS t FROM ixsrc),
         |ixocc AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(t) - 4 + 2),
         |      p -> array_to_string(t[p:p+4-1], ' '))) AS gram
         |  FROM ixtoks WHERE len(t) >= 4),
         |ixcnt AS (SELECT gram, count(*) AS ic FROM ixocc GROUP BY gram),
         |spdocs AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
         |  UNION ALL SELECT -30, 'alpha beta gamma delta epsilon zeta eta theta iota kappa'
         |  UNION ALL SELECT -31, 'prefix words alpha beta gamma delta epsilon zeta eta theta iota kappa suffix words'
         |  UNION ALL SELECT -32, 'one two three four one two three four tail bit'
         |  UNION ALL SELECT -33, 'unique doc nothing  shared here at all   today'
         |),
         |sptoks AS (SELECT doc_id, ${graft.llm.NgramLm.toksSql("text")} AS t FROM spdocs),
         |spocc AS (
         |  SELECT doc_id,
         |    CAST(unnest(range(1, len(t) - 4 + 2)) AS INTEGER) AS pos,
         |    unnest(list_transform(range(1, len(t) - 4 + 2),
         |      p -> array_to_string(t[p:p+4-1], ' '))) AS gram
         |  FROM sptoks WHERE len(t) >= 4),
         |spsc AS (SELECT gram, count(*) AS sc FROM spocc GROUP BY gram),
         |spdup AS (
         |  SELECT s.gram FROM spsc s LEFT JOIN ixcnt USING (gram)
         |  WHERE s.sc + coalesce(ic, 0) >= 2),
         |sphit AS (SELECT doc_id, pos FROM spocc
         |  WHERE gram IN (SELECT gram FROM spdup)),
         |spmark AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN coalesce(pos > max(pos + 4) OVER (
         |        PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), TRUE)
         |      THEN 1 ELSE 0 END AS nw
         |  FROM sphit),
         |spgrp AS (SELECT doc_id, pos,
         |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM spmark),
         |spspans AS (SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
         |  CAST(max(pos) + 4 AS INTEGER) AS span_end
         |  FROM spgrp GROUP BY doc_id, grp
         |  HAVING max(pos) + 4 - min(pos) >= 6),
         |sppos AS (SELECT doc_id,
         |    CAST(unnest(range(1, len(t)+1)) AS INTEGER) AS i,
         |    unnest(t) AS tok
         |  FROM sptoks),
         |spkept AS (
         |  SELECT p.doc_id, p.i, p.tok FROM sppos p
         |  WHERE NOT EXISTS (SELECT 1 FROM spspans s
         |    WHERE s.doc_id = p.doc_id
         |      AND p.i >= s.span_start AND p.i < s.span_end)),
         |sprebuilt AS (SELECT doc_id,
         |    coalesce(string_agg(tok, ' ' ORDER BY i), '') AS rebuilt,
         |    count(*) AS n_kept
         |  FROM spkept GROUP BY doc_id),
         |spdocspans AS (SELECT DISTINCT doc_id FROM spspans)
         |SELECT d.doc_id,
         |  CASE WHEN sp.doc_id IS NULL THEN d.text
         |       ELSE coalesce(r.rebuilt, '') END AS text,
         |  CASE WHEN sp.doc_id IS NULL THEN CAST(0 AS INTEGER)
         |       ELSE CAST(len(t.t) - coalesce(r.n_kept, 0) AS INTEGER)
         |       END AS tokens_removed
         |FROM spdocs d
         |JOIN sptoks t USING (doc_id)
         |LEFT JOIN spdocspans sp USING (doc_id)
         |LEFT JOIN sprebuilt r ON r.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val qdir = graft.QHelp.qtmpDir("gramidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_gram_grams")
      if (!fresh) {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        graft.llm.Dedup.writeGramIndex(
          docs.filter(col("doc_id") % 3 === 0), "doc_id", "text",
          "g_gram", idxPath, k = 4)
        graft.llm.Dedup.appendShardGrams(
          docs.filter(col("doc_id") % 3 === 2), "doc_id", "text",
          "g_gram", idxPath, "shard-a")
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      graft.llm.Dedup.scrubSpansAgainstIndex(spanPlanted(s, dir),
          "doc_id", "text", "g_gram", idxPath, minSpanTokens = 6)
        .select("doc_id", "text", "tokens_removed")
        .orderBy("doc_id")
    }

    // CORPUS-level boilerplate removal: 50 planted docs carry the same
    // 'COOKIE BANNER' prefix line (doc-freq 51 > 3 -> stripped from every
    // doc), one planted doc is banner-only (must survive with EMPTY
    // text, not vanish), and naturally-duplicated single-line texts in
    // the documents table exercise the threshold on organic data too.
    r.reg("q_boilerplate_lines",
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200
        |  UNION ALL SELECT 100000 + doc_id, 'COOKIE BANNER' || chr(10) || text
        |    FROM documents WHERE doc_id < 50
        |  UNION ALL SELECT -30, 'COOKIE BANNER'
        |),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM docs),
        |ex AS (SELECT doc_id, unnest(range(1, len(arr)+1)) AS pos, arr FROM ls),
        |lines AS (SELECT doc_id, pos, arr[pos] AS line FROM ex),
        |freq AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line),
        |kept AS (
        |  SELECT l.doc_id, l.pos, l.line
        |  FROM lines l JOIN freq f USING (line) WHERE f.df <= 3),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(r.text, '') AS text
        |FROM docs d LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "documents").select("doc_id", "text")
      val docs = base.filter(col("doc_id") < 200)
        .unionByName(base.filter(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(lit("COOKIE BANNER\n"), col("text")).as("text")))
        .unionByName(s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(-30L, "COOKIE BANNER")),
          StructType(Seq(StructField("doc_id", LongType),
            StructField("text", StringType)))))
      TextStats.dropBoilerplateLines(docs, "doc_id", "text", maxDocFreq = 3)
        .orderBy("doc_id")
    }

    // Corpus version diff: v2 drops every 7th doc (removed), re-texts
    // every 5th (changed), adds two new ids — diffWith must report
    // exactly the delta. The oracle mirrors the md5-signature compare
    // (chr(31) separator, chr(30) null sentinel) over sorted non-keys.
    r.reg("q_frame_diff",
      """WITH v1 AS (
        |  SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 400
        |),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' (edited)' ELSE text END AS text,
        |    lang, source
        |  FROM documents WHERE doc_id < 400 AND doc_id % 7 <> 0
        |  UNION ALL SELECT -100, 'brand new doc alpha', 'en', 'web'
        |  UNION ALL SELECT -101, 'brand new doc beta', 'en', 'web'
        |),
        |sig1 AS (SELECT doc_id, md5(concat_ws(chr(31),
        |    COALESCE(lang, chr(30)), COALESCE(source, chr(30)),
        |    COALESCE(text, chr(30)))) AS h FROM v1),
        |sig2 AS (SELECT doc_id, md5(concat_ws(chr(31),
        |    COALESCE(lang, chr(30)), COALESCE(source, chr(30)),
        |    COALESCE(text, chr(30)))) AS h FROM v2)
        |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change
        |FROM sig1 a FULL OUTER JOIN sig2 b USING (doc_id)
        |WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h <> b.h
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val v1 = t(s, dir, "documents").filter(col("doc_id") < 400)
        .select("doc_id", "text", "lang", "source")
      val v2 = v1.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" (edited)"))).otherwise(col("text")))
        .unionByName(s.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(-100L, "brand new doc alpha", "en", "web"),
            org.apache.spark.sql.Row(-101L, "brand new doc beta", "en", "web")),
          StructType(Seq(StructField("doc_id", LongType),
            StructField("text", StringType), StructField("lang", StringType),
            StructField("source", StringType)))))
      graft.api.GraftFrame(v1).diffWith(graft.api.GraftFrame(v2), Seq("doc_id"))
        .orderBy("doc_id")
    }

    // Sequence packing: shard = floor(exclusive-cumsum / capacity) under
    // doc_id order — the oracle recomputes the same window cumsum, so
    // every shard assignment is value-checked.
    r.reg("q_pack_shards",
      """SELECT doc_id, n_chars,
        |  CAST(floor((sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)
        |    / 10000.0) AS BIGINT) AS shard
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextStats.packIntoShards(
          t(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", "doc_id", 10000L)
        .orderBy("doc_id")
    }

    // Context-window chunking (r12): each doc's tokens split into
    // ≤10-token chunks with 3 tokens of overlap (stride 7); the oracle
    // recomputes the chunk count formula, every slice and the joined
    // text, so chunk boundaries are value-checked per row. DuckDB list
    // slices are 1-based inclusive and clamp like Spark's slice().
    r.reg("q_chunk_tokens",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT doc_id, toks,
        |        CASE WHEN len(toks) <= 10 THEN 1
        |             ELSE 1 + CAST(ceil((len(toks) - 10) * 1.0 / 7) AS INT) END AS nc
        |      FROM t),
        |e AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM n)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  array_to_string(toks[chunk_id*7+1 : chunk_id*7+10], ' ') AS chunk_text,
        |  CAST(len(toks[chunk_id*7+1 : chunk_id*7+10]) AS INT) AS n_tokens
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      TextStats.chunkByTokens(
          t(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", maxTokens = 10, overlap = 3)
        .orderBy("doc_id", "chunk_id")
    }

    // The LINEAR (posexplode-then-group) chunker (r13): same chunk
    // semantics at maxTokens=8/overlap=2, recomputed with the identical
    // slice formula — a hash match proves the one-shuffle restructure
    // is bit-equivalent to the blockwise form it relieves.
    r.reg("q_chunk_tokens_grouped",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT doc_id, toks,
        |        CASE WHEN len(toks) <= 8 THEN 1
        |             ELSE 1 + CAST(ceil((len(toks) - 8) * 1.0 / 6) AS INT) END AS nc
        |      FROM t),
        |e AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM n)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  array_to_string(toks[chunk_id*6+1 : chunk_id*6+8], ' ') AS chunk_text,
        |  CAST(len(toks[chunk_id*6+1 : chunk_id*6+8]) AS INT) AS n_tokens
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      TextStats.chunkByTokensGrouped(
          t(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", maxTokens = 8, overlap = 2)
        .orderBy("doc_id", "chunk_id")
    }

    // Concat-and-chop token windows (r12): global offsets under the
    // seed-3 shuffle permutation, 1000-unit windows; the oracle replays
    // the hash order, the exclusive cumsum, and both floor divisions —
    // boundary-straddling docs' window RANGES are value-checked.
    r.reg("q_token_windows",
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (
        |      ORDER BY (doc_id + 3) % 2147483648 * 2654435761 % 4294967296
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars
        |      AS BIGINT) AS token_start
        |  FROM documents)
        |SELECT doc_id, n_chars, token_start,
        |  CAST(floor(token_start / 1000.0) AS BIGINT) AS window_first,
        |  CASE WHEN n_chars > 0
        |       THEN CAST(floor((token_start + n_chars - 1) / 1000.0) AS BIGINT)
        |       ELSE CAST(floor(token_start / 1000.0) AS BIGINT)
        |  END AS window_last,
        |  CASE WHEN n_chars > 0
        |       THEN CAST(floor((token_start + n_chars - 1) / 1000.0) AS BIGINT)
        |       ELSE CAST(floor(token_start / 1000.0) AS BIGINT)
        |  END - CAST(floor(token_start / 1000.0) AS BIGINT) + 1 AS n_windows
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextStats.tokenWindows(
          t(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", windowSize = 1000L, seed = 3L)
        .orderBy("doc_id")
    }

    // Window-assembly mapping (r12): tokenWindows spans exploded to one
    // row per (window, doc) with the doc-local slice [tok_from, tok_to)
    // and the window-local write offset; the oracle recomputes the
    // exclusive cumsum, the span bounds, and all three slice formulas.
    r.reg("q_token_window_members",
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (
        |      ORDER BY (doc_id + 3) % 2147483648 * 2654435761 % 4294967296
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars
        |      AS BIGINT) AS token_start
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, n_chars, token_start,
        |    CAST(floor(token_start / 1000.0) AS BIGINT) AS wf,
        |    CASE WHEN n_chars > 0
        |         THEN CAST(floor((token_start + n_chars - 1) / 1000.0) AS BIGINT)
        |         ELSE CAST(floor(token_start / 1000.0) AS BIGINT)
        |    END AS wl
        |  FROM c),
        |r AS (
        |  SELECT unnest(range(0,
        |    (SELECT CAST(ceil(sum(n_chars) / 1000.0) AS BIGINT) + 1
        |     FROM documents))) AS window_id)
        |SELECT w.doc_id, w.n_chars, w.token_start, r.window_id,
        |  GREATEST(r.window_id * 1000 - w.token_start, 0) AS tok_from,
        |  LEAST((r.window_id + 1) * 1000 - w.token_start, w.n_chars) AS tok_to,
        |  GREATEST(w.token_start - r.window_id * 1000, 0) AS window_pos
        |FROM w JOIN r ON r.window_id BETWEEN w.wf AND w.wl
        |ORDER BY doc_id, window_id""".stripMargin) { (s, dir) =>
      TextStats.tokenWindowMembers(
          t(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", windowSize = 1000L, seed = 3L)
        .orderBy("doc_id", "window_id")
    }

    // Assembled training windows (r12): the end of the concat-and-chop
    // chain — window TEXT built token-exactly from every member doc's
    // slice in write-offset order; the oracle recomputes the whole
    // assembly (real token counts, cumsum, spans, slices, ordered
    // string_agg), so a hash match proves windows are token-identical
    // cross-engine, not just counted alike.
    r.reg("q_assemble_windows",
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS toks,
        |             CAST(len(string_split(text,' ')) AS BIGINT) AS n
        |           FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, toks, n,
        |       CAST(sum(n) OVER (ORDER BY (doc_id + 3) % 2147483648 * 2654435761 % 4294967296
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start FROM d),
        |w AS (SELECT doc_id, toks, n, start,
        |       CAST(floor(start/500.0) AS BIGINT) AS wf,
        |       CASE WHEN n>0 THEN CAST(floor((start+n-1)/500.0) AS BIGINT)
        |            ELSE CAST(floor(start/500.0) AS BIGINT) END AS wl FROM c),
        |r AS (SELECT unnest(range(0, (SELECT CAST(ceil(sum(n)/500.0) AS BIGINT)+1 FROM d))) AS window_id),
        |mem AS (SELECT w.doc_id, r.window_id,
        |         GREATEST(r.window_id*500 - w.start, 0) AS f,
        |         LEAST((r.window_id+1)*500 - w.start, w.n) AS t2,
        |         GREATEST(w.start - r.window_id*500, 0) AS pos, w.toks
        |        FROM w JOIN r ON r.window_id BETWEEN w.wf AND w.wl),
        |parts AS (SELECT window_id, pos,
        |           array_to_string(toks[CAST(f+1 AS INT):CAST(t2 AS INT)], ' ') AS part,
        |           t2 - f AS len FROM mem WHERE t2 > f)
        |SELECT window_id, string_agg(part, ' ' ORDER BY pos) AS window_text,
        |  CAST(sum(len) AS BIGINT) AS n_tokens
        |FROM parts GROUP BY window_id ORDER BY window_id""".stripMargin) { (s, dir) =>
      TextStats.assembleWindows(
          t(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", windowSize = 500L, seed = 3L)
        .orderBy("window_id")
    }

    // PACKED training windows (r14): the doc-aware "fewer truncations"
    // layout — docs never split unless they exceed the window (C=64 <
    // the 99-token max doc, so the oversize pre-split path is
    // exercised); next-fit runs inside bounded 32-piece permutation
    // segments. The oracle replays the permutation rank, the segment
    // recurrence (recursive CTE — the placement depends on the running
    // fill, exactly what the engine's native PackNextFit expression
    // computes), dense global ids via dense_rank over (seg, win), and
    // the token-exact window text AND span tiling, so a hash match
    // value-checks the whole packing law cross-engine.
    r.reg("q_windows_packed",
      """WITH RECURSIVE
        |d AS (SELECT doc_id, string_split(text,' ') AS toks,
        |        CAST(len(string_split(text,' ')) AS BIGINT) AS n
        |      FROM documents WHERE text IS NOT NULL),
        |d2 AS (SELECT * FROM d WHERE n > 0),
        |p0 AS (SELECT doc_id, n,
        |        unnest(range(0, CAST(floor((n-1)/64.0) AS BIGINT) + 1)) AS piece
        |       FROM d2),
        |p2 AS (SELECT doc_id, piece,
        |        LEAST(64, n - piece*64) AS plen,
        |        ((doc_id + 3) % 2147483648) * 2654435761 % 4294967296 AS h
        |       FROM p0),
        |rk AS (SELECT doc_id, piece, plen,
        |        row_number() OVER (ORDER BY h, piece) AS rnk FROM p2),
        |sg AS (SELECT doc_id, piece, plen,
        |        CAST(floor((rnk-1)/32.0) AS BIGINT) AS seg,
        |        CAST((rnk-1)%32 AS BIGINT) AS pos FROM rk),
        |pk AS (
        |  SELECT seg, pos, doc_id, piece, plen,
        |         CAST(0 AS BIGINT) AS win, plen AS fill
        |  FROM sg WHERE pos = 0
        |  UNION ALL
        |  SELECT c.seg, c.pos, c.doc_id, c.piece, c.plen,
        |    CASE WHEN k.fill + c.plen <= 64 THEN k.win ELSE k.win + 1 END,
        |    CASE WHEN k.fill + c.plen <= 64 THEN k.fill + c.plen ELSE c.plen END
        |  FROM pk k JOIN sg c ON c.seg = k.seg AND c.pos = k.pos + 1),
        |wid AS (SELECT seg, win,
        |         dense_rank() OVER (ORDER BY seg, win) - 1 AS window_id
        |        FROM (SELECT DISTINCT seg, win FROM pk)),
        |mem AS (SELECT k.seg, k.pos, k.doc_id, k.piece, k.plen,
        |               k.fill - k.plen AS off, w.window_id
        |        FROM pk k JOIN wid w ON w.seg = k.seg AND w.win = k.win),
        |parts AS (SELECT m.window_id, m.off, m.doc_id, m.plen AS len,
        |           array_to_string(
        |             d.toks[CAST(m.piece*64+1 AS INT):CAST(m.piece*64+m.plen AS INT)],
        |             ' ') AS part
        |          FROM mem m JOIN d2 d USING (doc_id))
        |SELECT window_id,
        |  string_agg(part, ' ' ORDER BY off) AS window_text,
        |  string_agg(doc_id || ':' || off || ':' || len, ' ' ORDER BY off)
        |    AS spans_text,
        |  CAST(sum(len) AS BIGINT) AS n_tokens
        |FROM parts GROUP BY window_id ORDER BY window_id""".stripMargin) { (s, dir) =>
      TextStats.assembleWindowsPacked(
          t(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", windowSize = 64L, seed = 3L,
          segmentDocs = 32, withDocSpans = true)
        .select(col("window_id"), col("window_text"),
          concat_ws(" ", transform(col("doc_spans"), sp =>
            concat_ws(":", sp.getField("id").cast("string"),
              sp.getField("pos").cast("string"),
              sp.getField("len").cast("string")))).as("spans_text"),
          col("n_tokens"))
        .orderBy("window_id")
    }

    // REAL codec round trip: Spark synthesizes a PNG per doc on the
    // executors (pixels are a pure integer function of doc_id), decodes
    // it back with JDK ImageIO, and reports actual decoded
    // width/height/pixel-checksum. The oracle has no codec — it predicts
    // the same values arithmetically — so a hash match proves the
    // encode→decode path is lossless and real, not a stub.
    r.reg("q_multimodal_features",
      """SELECT doc_id, 'png' AS format,
        |  CAST(doc_id % 13 + 4 AS INTEGER) AS width,
        |  CAST(doc_id % 7 + 3 AS INTEGER) AS height,
        |  CAST(list_sum(flatten(list_transform(range(0, doc_id % 7 + 3), y ->
        |    list_transform(range(0, doc_id % 13 + 4), x ->
        |      3*((doc_id*31 + x*7 + y*13) % 256)
        |      + 5*((x*y + doc_id) % 256)
        |      + 7*((x + y*3) % 256))))) % 1000000007 AS BIGINT) AS checksum
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      Multimodal.decodeImageFeatures(
          Multimodal.synthPng(docs, "doc_id"), "doc_id", "payload")
        .orderBy("doc_id")
    }

    // decode → nearest-neighbor resize (real pixel remap) → re-encode →
    // decode again; the oracle predicts the resized checksum from the
    // NN source-pixel mapping sx = x*w/8, sy = y*h/5 (integer floor).
    r.reg("q_multimodal_resize",
      """SELECT doc_id, 'png' AS format,
        |  CAST(8 AS INTEGER) AS width, CAST(5 AS INTEGER) AS height,
        |  CAST(list_sum(flatten(list_transform(range(0, 5), y ->
        |    list_transform(range(0, 8), x ->
        |      3*((doc_id*31 + ((x*(doc_id % 13 + 4))//8)*7
        |            + ((y*(doc_id % 7 + 3))//5)*13) % 256)
        |      + 5*((((x*(doc_id % 13 + 4))//8)*((y*(doc_id % 7 + 3))//5) + doc_id) % 256)
        |      + 7*((((x*(doc_id % 13 + 4))//8) + ((y*(doc_id % 7 + 3))//5)*3) % 256)))))
        |    % 1000000007 AS BIGINT) AS checksum
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      Multimodal.decodeImageFeatures(
          Multimodal.resizeImage(
            Multimodal.synthPng(docs, "doc_id"), "doc_id", "payload", 8, 5),
          "doc_id", "payload")
        .orderBy("doc_id")
    }

    // REAL audio codec round trip: Spark writes a PCM s16le WAV per doc
    // (hand-built RIFF header, samples a pure integer function of
    // doc_id), decodes it back with javax.sound.sampled, and reports the
    // actual parsed format + frame count + sample checksum; the oracle
    // predicts the same values arithmetically — a hash match proves the
    // container parse and PCM stream are real and lossless.
    r.reg("q_multimodal_wav",
      """SELECT doc_id,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(16 AS INTEGER) AS bits,
        |  CAST(doc_id % 400 + 100 AS BIGINT) AS frames,
        |  CAST(((list_sum(list_transform(range(0, doc_id % 400 + 100),
        |      i -> (doc_id*31 + i*7) % 65536 - 32768)) % 1000000007)
        |    + 1000000007) % 1000000007 AS BIGINT) AS checksum
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      Multimodal.decodeAudioFeatures(
          Multimodal.synthWav(docs, "doc_id"), "doc_id", "payload")
        .orderBy("doc_id")
    }

    // Byte-level triage of an OPAQUE payload (formats with no JDK codec,
    // e.g. video containers): length, magic byte, byte checksum — the
    // pre-decode pass of a real pipeline.
    r.reg("q_multimodal_bytes",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS format_byte,
        |  CAST(ascii(substr(text, 1, 1)) % 64 + 1 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS height,
        |  CAST(list_sum(list_transform(range(1, length(text)+1),
        |    i -> ascii(substr(text, i, 1)))) % 1000000007 AS BIGINT) AS checksum
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      Multimodal.byteFeatures(
          Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload")
        .orderBy("doc_id")
    }

    r.reg("q_frame_plan",
      """SELECT doc_id, n_bytes, frame_no, frame_no * 64 AS "offset" FROM (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |    unnest(range(0, greatest(CAST(floor(octet_length(encode(text)) / 64.0) AS BIGINT), 1))) AS frame_no
        |  FROM documents WHERE doc_id < 50)
        |ORDER BY doc_id, frame_no""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 50)
      Multimodal.framePlan(
          Multimodal.withPayload(docs, "text", "payload"), "doc_id", "payload", 64)
        .orderBy("doc_id", "frame_no")
    }

    // ------------------------------------------------------------------
    // Multimodal perceptual dedup (r13): dHash over REAL decoded PNGs
    // and energy-envelope hashes over REAL parsed WAVs, paired through
    // the shared Hamming banding. The oracle has no codec — it
    // recomputes every hash from the synthetic-pixel/-sample integer
    // arithmetic — so a match proves Spark's decode→hash path is real
    // AND that the banded pair join is complete (the SQL side is the
    // BRUTE-FORCE popcount join; pigeonhole banding must equal it when
    // no bucket reaches the cap).

    // dHash CTE chain builder: image rows (rid = row id, pid = pixel-
    // source id, pert = 1 on planted variants whose (0,0) red shifts by
    // +64, role disambiguates a same-rid replay) → 9×8 NN grayscale
    // grid → 64-bit difference hash assembled in two 31-bit halves +
    // the sign bit (bit 63 is -2^63 in signed BIGINT).
    def dhashChain(imgsBody: String): String =
      s"""imgs AS (
         |$imgsBody),
         |gsrc AS (
         |  SELECT rid, role, pid, pert, gy, gx,
         |    (gx*(pid%13+4))//9 AS sx, (gy*(pid%7+3))//8 AS sy
         |  FROM imgs, (SELECT unnest(range(0,8)) AS gy),
         |    (SELECT unnest(range(0,9)) AS gx)),
         |gpix AS (
         |  SELECT rid, role, gy, gx,
         |    (299*(((pid*31 + 7*sx + 13*sy) % 256
         |            + CASE WHEN pert=1 AND sx=0 AND sy=0 THEN 64 ELSE 0 END) % 256)
         |     + 587*((sx*sy + pid) % 256)
         |     + 114*((sx + 3*sy) % 256)) // 1000 AS gray
         |  FROM gsrc),
         |dh AS (
         |  SELECT c.rid, c.role,
         |    CAST(COALESCE(SUM(CASE WHEN n.gray > c.gray AND c.gy*8+c.gx < 32
         |        THEN (1::BIGINT << (c.gy*8+c.gx)) ELSE 0 END), 0) AS BIGINT)
         |    + CAST(COALESCE(SUM(CASE WHEN n.gray > c.gray
         |          AND c.gy*8+c.gx BETWEEN 32 AND 62
         |        THEN (1::BIGINT << (c.gy*8+c.gx-32)) ELSE 0 END), 0) AS BIGINT)
         |      * 4294967296
         |    + CASE WHEN MAX(CASE WHEN n.gray > c.gray AND c.gy*8+c.gx = 63
         |        THEN 1 ELSE 0 END) = 1
         |      THEN -9223372036854775807 - 1 ELSE 0 END AS dhash
         |  FROM gpix c JOIN gpix n
         |    ON n.rid = c.rid AND n.role = c.role AND n.gy = c.gy
         |      AND n.gx = c.gx + 1
         |  WHERE c.gx < 8
         |  GROUP BY c.rid, c.role)""".stripMargin
    val dhashCtes = dhashChain(
      """  SELECT doc_id AS rid, 'x' AS role, doc_id AS pid, 0 AS pert
        |  FROM documents WHERE doc_id < 150
        |  UNION ALL
        |  SELECT doc_id + 100000, 'x', doc_id, 1
        |  FROM documents WHERE doc_id < 150 AND doc_id % 7 = 0""".stripMargin)

    def imageFixture(s: org.apache.spark.sql.SparkSession,
                             dir: String) = {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 150)
        .select("doc_id")
      Multimodal.synthPng(docs, "doc_id").union(
        Multimodal.synthPngVariant(
          docs.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 100000L).as("doc_id"),
              col("doc_id").as("src")),
          "doc_id", "src"))
    }

    // Real decode → perceptual dHash, value-checked bit-for-bit against
    // the pixel-arithmetic recompute (base images only).
    r.reg("q_image_dhash",
      s"""WITH $dhashCtes
         |SELECT i.rid AS doc_id,
         |  CAST(i.pid % 13 + 4 AS INTEGER) AS width,
         |  CAST(i.pid % 7 + 3 AS INTEGER) AS height,
         |  dh.dhash
         |FROM imgs i JOIN dh ON dh.rid = i.rid
         |WHERE i.pert = 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 150)
        .select("doc_id")
      Multimodal.dhashFeatures(
          Multimodal.synthPng(docs, "doc_id"), "doc_id", "payload")
        .orderBy("doc_id")
    }

    // Banded image near-dup pairs vs the brute-force popcount join:
    // 150 base images + 22 planted byte-distinct retouched variants
    // (probed: 2289 pairs at both scales incl. all 22 planted — the
    // synthetic pixel patterns also collide incidentally, which makes
    // the completeness check non-vacuous far beyond the plants).
    r.reg("q_image_pairs",
      s"""WITH $dhashCtes
         |SELECT a.rid AS id_a, b.rid AS id_b,
         |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
         |FROM dh a JOIN dh b ON a.rid < b.rid
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.imageNearDupPairs(imageFixture(s, dir), "doc_id", "payload")
        .orderBy("id_a", "id_b")
    }

    // Image drop-composite: pairs → transitive components (faithful
    // recursive-CTE reachability — chains exist in the incidental
    // collisions) → keep each component's minimum.
    r.reg("q_image_dedup",
      s"""WITH RECURSIVE $dhashCtes,
         |prs AS (
         |  SELECT a.rid AS id_a, b.rid AS id_b
         |  FROM dh a JOIN dh b ON a.rid < b.rid
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 3),
         |sedges AS (
         |  SELECT id_a AS u, id_b AS v FROM prs
         |  UNION SELECT id_b AS u, id_a AS v FROM prs),
         |reach AS (
         |  SELECT u, v FROM sedges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN sedges e ON r.v = e.u),
         |drp AS (SELECT u AS id FROM reach GROUP BY u HAVING min(v) < u)
         |SELECT rid AS doc_id FROM imgs
         |WHERE rid NOT IN (SELECT id FROM drp)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.dropImageNearDuplicates(imageFixture(s, dir), "doc_id",
          "payload")
        .select("doc_id").orderBy("doc_id")
    }

    // The persisted dHash index LIFECYCLE (the ELEVENTH maintained
    // family): build `<name>_dhash` once per (JVM, sf dir) over the 150
    // base images, then GATE a shard — 22 retouched variants (must
    // drop: Hamming ≤ 3 of their source), one crash-replayed corpus row
    // (same id, same payload — must drop at Hamming 0: the gate is its
    // own replay guard), and 50 fresh images (land unless incidentally
    // within Hamming 3 of some corpus image — the oracle recomputes
    // exactly which). SQL is the brute-force recompute of every hash
    // and the NOT EXISTS gate, so the zero-exchange banded serve is
    // value-checked end to end.
    r.reg("q_image_gate", {
      val chain = dhashChain(
        """  SELECT doc_id AS rid, 'corpus' AS role, doc_id AS pid, 0 AS pert
          |  FROM documents WHERE doc_id < 150
          |  UNION ALL
          |  SELECT doc_id + 100000, 'shard', doc_id, 1
          |  FROM documents WHERE doc_id < 150 AND doc_id % 7 = 0
          |  UNION ALL
          |  SELECT 5, 'shard', 5, 0 FROM documents WHERE doc_id = 5
          |  UNION ALL
          |  SELECT doc_id, 'shard', doc_id, 0
          |  FROM documents WHERE doc_id >= 150 AND doc_id < 200""".stripMargin)
      s"""WITH $chain
         |SELECT s.rid AS doc_id FROM dh s
         |WHERE s.role = 'shard' AND NOT EXISTS (
         |  SELECT 1 FROM dh c
         |  WHERE c.role = 'corpus'
         |    AND bit_count(xor(c.dhash, s.dhash)) <= 3)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val qdir = graft.QHelp.qtmpDir("dhidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_dhix_dhash")
      val base = t(s, dir, "documents").filter(col("doc_id") < 150)
        .select("doc_id")
      if (!fresh) {
        Dedup.writeDhashIndex(Multimodal.synthPng(base, "doc_id"),
          "doc_id", "payload", "g_dhix", idxPath)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      val shard = Multimodal.synthPngVariant(
          base.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 100000L).as("doc_id"),
              col("doc_id").as("src")), "doc_id", "src")
        .union(Multimodal.synthPng(
          base.filter(col("doc_id") === 5), "doc_id"))
        .union(Multimodal.synthPng(
          t(s, dir, "documents")
            .filter(col("doc_id") >= 150 && col("doc_id") < 200)
            .select("doc_id"), "doc_id"))
      Dedup.dropImageAgainstIndex(shard, "doc_id", "payload", "g_dhix")
        .select("doc_id").orderBy("doc_id")
    }

    // Envelope-hash CTE chain builder: audio rows (pert = 1 shifts
    // sample 0 by +9999 mod 2^16, role disambiguates a same-rid
    // replay) → 64 segment energies (boundaries s·n/64, floor) →
    // adjacent-segment comparison bits; bit 63 is always 0 so the
    // hash assembles in two halves with no sign-bit case.
    def ehashChain(audsBody: String): String =
      s"""auds AS (
         |$audsBody),
         |seg AS (
         |  SELECT rid, role, s,
         |    COALESCE(list_sum(list_transform(
         |      range(s*(pid%400+100)//64, (s+1)*(pid%400+100)//64),
         |      i -> abs(CASE WHEN pert = 1 AND i = 0
         |               THEN (pid*31 + 9999) % 65536 - 32768
         |               ELSE (pid*31 + i*7) % 65536 - 32768 END))), 0) AS e
         |  FROM auds, (SELECT unnest(range(0,64)) AS s)),
         |eh AS (
         |  SELECT a.rid, a.role,
         |    CAST(COALESCE(SUM(CASE WHEN a.e > b.e AND a.s < 32
         |        THEN (1::BIGINT << a.s) ELSE 0 END), 0) AS BIGINT)
         |    + CAST(COALESCE(SUM(CASE WHEN a.e > b.e AND a.s >= 32
         |        THEN (1::BIGINT << (a.s-32)) ELSE 0 END), 0) AS BIGINT)
         |      * 4294967296 AS ehash
         |  FROM seg a JOIN seg b
         |    ON b.rid = a.rid AND b.role = a.role AND b.s = a.s + 1
         |  WHERE a.s < 63 GROUP BY a.rid, a.role)""".stripMargin
    val ehashCtes = ehashChain(
      """  SELECT doc_id AS rid, 'x' AS role, doc_id AS pid, 0 AS pert
        |  FROM documents WHERE doc_id < 150
        |  UNION ALL
        |  SELECT doc_id + 200000, 'x', doc_id, 1
        |  FROM documents WHERE doc_id < 150 AND doc_id % 5 = 0""".stripMargin)

    // Real WAV parse → envelope hash, value-checked against the
    // sample-arithmetic recompute (base audio only).
    r.reg("q_audio_envelope",
      s"""WITH $ehashCtes
         |SELECT a.rid AS doc_id,
         |  CAST(a.pid % 400 + 100 AS BIGINT) AS frames, eh.ehash
         |FROM auds a JOIN eh ON eh.rid = a.rid
         |WHERE a.pert = 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 150)
        .select("doc_id")
      Multimodal.audioEnvelopeHash(
          Multimodal.synthWav(docs, "doc_id"), "doc_id", "payload")
        .orderBy("doc_id")
    }

    // Banded audio near-dup pairs vs brute force: 150 base recordings
    // + 30 planted first-sample edits (probed: 301 pairs incl. all 30
    // planted at both scales).
    r.reg("q_audio_pairs",
      s"""WITH $ehashCtes
         |SELECT a.rid AS id_a, b.rid AS id_b,
         |  CAST(bit_count(xor(a.ehash, b.ehash)) AS INTEGER) AS hamming
         |FROM eh a JOIN eh b ON a.rid < b.rid
         |WHERE bit_count(xor(a.ehash, b.ehash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 150)
        .select("doc_id")
      val fixture = Multimodal.synthWav(docs, "doc_id").union(
        Multimodal.synthWavVariant(
          docs.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 200000L).as("doc_id"),
              col("doc_id").as("src")),
          "doc_id", "src"))
      Dedup.audioNearDupPairs(fixture, "doc_id", "payload")
        .orderBy("id_a", "id_b")
    }

    // The persisted ENVELOPE index lifecycle — the audio modality's
    // daily-ingest gate (the TWELFTH maintained family; the q_image_gate
    // machinery over PCM envelopes): corpus = 150 base recordings,
    // shard = 30 first-sample edits (drop at Hamming ≤ 1), one same-id
    // replay (drops at Hamming 0 — the gate is its own replay guard),
    // 50 fresh recordings (land unless incidentally close).
    r.reg("q_audio_gate", {
      val chain = ehashChain(
        """  SELECT doc_id AS rid, 'corpus' AS role, doc_id AS pid, 0 AS pert
          |  FROM documents WHERE doc_id < 150
          |  UNION ALL
          |  SELECT doc_id + 200000, 'shard', doc_id, 1
          |  FROM documents WHERE doc_id < 150 AND doc_id % 5 = 0
          |  UNION ALL
          |  SELECT 5, 'shard', 5, 0 FROM documents WHERE doc_id = 5
          |  UNION ALL
          |  SELECT doc_id, 'shard', doc_id, 0
          |  FROM documents WHERE doc_id >= 150 AND doc_id < 200""".stripMargin)
      s"""WITH $chain
         |SELECT s.rid AS doc_id FROM eh s
         |WHERE s.role = 'shard' AND NOT EXISTS (
         |  SELECT 1 FROM eh c
         |  WHERE c.role = 'corpus'
         |    AND bit_count(xor(c.ehash, s.ehash)) <= 3)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val qdir = graft.QHelp.qtmpDir("ehidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_ehix_ehash")
      val base = t(s, dir, "documents").filter(col("doc_id") < 150)
        .select("doc_id")
      if (!fresh) {
        Dedup.writeEnvelopeIndex(Multimodal.synthWav(base, "doc_id"),
          "doc_id", "payload", "g_ehix", idxPath)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      val shard = Multimodal.synthWavVariant(
          base.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 200000L).as("doc_id"),
              col("doc_id").as("src")), "doc_id", "src")
        .union(Multimodal.synthWav(
          base.filter(col("doc_id") === 5), "doc_id"))
        .union(Multimodal.synthWav(
          t(s, dir, "documents")
            .filter(col("doc_id") >= 150 && col("doc_id") < 200)
            .select("doc_id"), "doc_id"))
      Dedup.dropAudioAgainstIndex(shard, "doc_id", "payload", "g_ehix")
        .select("doc_id").orderBy("doc_id")
    }

    // Byte-envelope CTE chain builder — the OPAQUE-payload (no JDK
    // codec: video containers) fingerprint: payload = utf-8 bytes of
    // the doc text (ASCII fixture, so byte i == ascii(char i+1)),
    // pert = 1 replaces byte 0 with 'Z' (90) — a one-segment edit
    // whose hash provably moves at most one bit.
    def bhashChain(rowsBody: String): String =
      s"""prows AS (
         |$rowsBody),
         |ptxt AS (
         |  SELECT p.rid, p.role, p.pert, d.text, length(d.text) AS n
         |  FROM prows p JOIN documents d ON d.doc_id = p.pid),
         |pseg AS (
         |  SELECT rid, role, s,
         |    COALESCE(list_sum(list_transform(range(s*n//64, (s+1)*n//64),
         |      i -> CASE WHEN pert = 1 AND i = 0 THEN 90
         |           ELSE ascii(substr(text, CAST(i+1 AS INTEGER), 1)) END)),
         |      0) AS e
         |  FROM ptxt, (SELECT unnest(range(0,64)) AS s)),
         |ph AS (
         |  SELECT a.rid, a.role,
         |    CAST(COALESCE(SUM(CASE WHEN a.e > b.e AND a.s < 32
         |        THEN (1::BIGINT << a.s) ELSE 0 END), 0) AS BIGINT)
         |    + CAST(COALESCE(SUM(CASE WHEN a.e > b.e AND a.s >= 32
         |        THEN (1::BIGINT << (a.s-32)) ELSE 0 END), 0) AS BIGINT)
         |      * 4294967296 AS bhash
         |  FROM pseg a JOIN pseg b
         |    ON b.rid = a.rid AND b.role = a.role AND b.s = a.s + 1
         |  WHERE a.s < 63 GROUP BY a.rid, a.role)""".stripMargin
    val bhashCtes = bhashChain(
      """  SELECT doc_id AS rid, 'x' AS role, doc_id AS pid, 0 AS pert
        |  FROM documents WHERE doc_id < 150
        |  UNION ALL
        |  SELECT doc_id + 300000, 'x', doc_id, 1
        |  FROM documents WHERE doc_id < 150 AND doc_id % 4 = 0""".stripMargin)

    def payloadFixture(s: org.apache.spark.sql.SparkSession, dir: String) = {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 150)
        .select("doc_id", "text")
      Multimodal.withPayload(docs, "text", "payload")
        .select("doc_id", "payload")
        .union(docs.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 300000L).as("doc_id"),
            encode(concat(lit("Z"), expr("substring(text, 2)")), "UTF-8")
              .as("payload")))
    }

    // Codec-independent fingerprint, value-checked against the byte
    // arithmetic (base payloads only).
    r.reg("q_payload_envelope",
      s"""WITH $bhashCtes
         |SELECT p.rid AS doc_id,
         |  CAST(length(d.text) AS BIGINT) AS n_bytes, ph.bhash
         |FROM prows p JOIN documents d ON d.doc_id = p.pid
         |  JOIN ph ON ph.rid = p.rid
         |WHERE p.pert = 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 150)
      Multimodal.byteEnvelopeHash(
          Multimodal.withPayload(docs, "text", "payload"), "doc_id",
          "payload")
        .orderBy("doc_id")
    }

    // Banded opaque-payload near-dup pairs vs brute force: 150 base
    // payloads + 38 planted one-byte edits.
    r.reg("q_payload_pairs",
      s"""WITH $bhashCtes
         |SELECT a.rid AS id_a, b.rid AS id_b,
         |  CAST(bit_count(xor(a.bhash, b.bhash)) AS INTEGER) AS hamming
         |FROM ph a JOIN ph b ON a.rid < b.rid
         |WHERE bit_count(xor(a.bhash, b.bhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.payloadNearDupPairs(payloadFixture(s, dir), "doc_id",
          "payload")
        .orderBy("id_a", "id_b")
    }

    // The persisted byte-envelope index lifecycle — the THIRTEENTH
    // maintained family (the q_image_gate machinery for the opaque
    // modality): planted edits and a same-id replay drop, fresh
    // arrivals land unless incidentally close.
    r.reg("q_payload_gate", {
      val chain = bhashChain(
        """  SELECT doc_id AS rid, 'corpus' AS role, doc_id AS pid, 0 AS pert
          |  FROM documents WHERE doc_id < 150
          |  UNION ALL
          |  SELECT doc_id + 300000, 'shard', doc_id, 1
          |  FROM documents WHERE doc_id < 150 AND doc_id % 4 = 0
          |  UNION ALL
          |  SELECT 5, 'shard', 5, 0 FROM documents WHERE doc_id = 5
          |  UNION ALL
          |  SELECT doc_id, 'shard', doc_id, 0
          |  FROM documents WHERE doc_id >= 150 AND doc_id < 200""".stripMargin)
      s"""WITH $chain
         |SELECT s.rid AS doc_id FROM ph s
         |WHERE s.role = 'shard' AND NOT EXISTS (
         |  SELECT 1 FROM ph c
         |  WHERE c.role = 'corpus'
         |    AND bit_count(xor(c.bhash, s.bhash)) <= 3)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val qdir = graft.QHelp.qtmpDir("bhidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_bhix_bhash")
      val base = t(s, dir, "documents").filter(col("doc_id") < 150)
        .select("doc_id", "text")
      if (!fresh) {
        Dedup.writePayloadIndex(
          Multimodal.withPayload(base, "text", "payload"),
          "doc_id", "payload", "g_bhix", idxPath)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      val shard = base.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"),
          encode(concat(lit("Z"), expr("substring(text, 2)")), "UTF-8")
            .as("payload"))
        .union(Multimodal.withPayload(
          base.filter(col("doc_id") === 5), "text", "payload")
          .select("doc_id", "payload"))
        .union(Multimodal.withPayload(
          t(s, dir, "documents")
            .filter(col("doc_id") >= 150 && col("doc_id") < 200)
            .select("doc_id", "text"), "text", "payload")
          .select("doc_id", "payload"))
      Dedup.dropPayloadAgainstIndex(shard, "doc_id", "payload", "g_bhix")
        .select("doc_id").orderBy("doc_id")
    }

    // ------------------------------------------------------------------
    // BPE tokenizer training (r13): the oracle REPLAYS whole training
    // iterations in SQL — pair counts over the current symbolization,
    // argmax with the code-point tie-break, then the merge applied
    // greedily left-to-right non-overlapping (the Scala mergePair
    // semantics) — so the learned merge table, the encode, and the
    // vocab ids are all value-checked bit-for-bit, not counted.
    //
    // Symbol encoding (r14 fix): each symbol is wrapped in its OWN
    // leading+trailing space (' a  b  c ', double-space separators).
    // The r13 single-space form made `replace(' l r ', ' lr ')` skip
    // adjacent overlapping merge sites because consecutive occurrences
    // SHARED the separator space (' a a a a ' → ' aa a a ', losing the
    // second pair), silently diverging from mergePair on words like
    // 'aaaa'. With per-symbol wrapping the occurrences are disjoint
    // substrings and one `replace` IS leftmost greedy non-overlapping
    // (' q  q  q  q ' → ' qq  qq '). The injected fixture word below
    // makes this non-vacuous: 2500 'qqqq' tokens force the rank-0
    // merge (q,q) — ~6.5k pairs vs the corpus max ~3.8k — and rank 1
    // (qq,qq), both applying at ADJACENT positions.
    //
    // Training corpus: documents doc_id < 400 plus the fixture word.
    val bpeFixtureWord = "qqqq"
    val bpeFixtureReps = 2500
    // encode-side fixture doc: every adjacent-overlap shape —
    // 'qqqqq' → [qqqq, q], 'qqqq' → [qqqq], 'qqq' → [qq, q]
    val bpeEncodeFixture = "qqqqq qqqq qqq qq q"

    def bpeTrainFixture(s: org.apache.spark.sql.SparkSession, dir: String) = {
      import s.implicits._
      t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"), col("text"))
        .unionByName(Seq((-7L,
          Array.fill(bpeFixtureReps)(bpeFixtureWord).mkString(" ")))
          .toDF("doc_id", "text"))
    }
    def bpeEncodeDocs(s: org.apache.spark.sql.SparkSession, dir: String) = {
      import s.implicits._
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
        .unionByName(Seq((-7L, bpeEncodeFixture)).toDF("doc_id", "text"))
    }

    // spaced symbol form of a word: ' c1  c2  ...  cn ' — each symbol
    // wrapped in its own spaces (see the r14 note above)
    def spacedSql(w: String): String =
      s"' ' || array_to_string(list_transform(range(1, length($w)+1), " +
        s"q -> substr($w, CAST(q AS INTEGER), 1)), '  ') || ' '"

    /** w0 (type counts + spaced form) and nMerges chained
      * (pair-count, argmax, replace) iterations: p_r/b_r/w_r. */
    def bpeTrainCtes(nMerges: Int): String = {
      val init =
        s"""w0 AS MATERIALIZED (
           |  SELECT w, CAST(count(*) AS BIGINT) AS cnt, ${spacedSql("w")} AS sp
           |  FROM (SELECT unnest(string_split(text, ' ')) AS w
           |        FROM documents WHERE doc_id < 400
           |        UNION ALL
           |        SELECT '$bpeFixtureWord' FROM range($bpeFixtureReps))
           |  WHERE length(w) >= 1 GROUP BY w)""".stripMargin
      val iters = (1 to nMerges).map { r =>
        val p = r - 1
        s"""p$r AS MATERIALIZED (
           |  SELECT toks[CAST(i AS INTEGER)] AS l,
           |    toks[CAST(i AS INTEGER)+1] AS rr,
           |    CAST(SUM(cnt) AS BIGINT) AS c
           |  FROM (SELECT cnt, string_split(trim(sp), '  ') AS toks,
           |          unnest(range(1, len(string_split(trim(sp), '  ')))) AS i
           |        FROM w$p)
           |  GROUP BY 1, 2),
           |b$r AS MATERIALIZED (SELECT l, rr, c FROM p$r ORDER BY c DESC, l, rr LIMIT 1),
           |w$r AS MATERIALIZED (
           |  SELECT w, cnt,
           |    replace(sp, (SELECT ' '||l||'  '||rr||' ' FROM b$r),
           |                (SELECT ' '||l||rr||' ' FROM b$r)) AS sp
           |  FROM w$p)""".stripMargin
      }
      (init +: iters).mkString(",\n")
    }

    // Iteration-0 adjacent-pair counts (the statistic every merge
    // maximizes), as a standalone distributed operator over the FULL
    // documents table.
    r.reg("q_bpe_pairs",
      """WITH wc AS (
        |  SELECT w, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w),
        |prs AS (SELECT w, cnt, unnest(range(1, length(w))) AS i FROM wc)
        |SELECT substr(w, CAST(i AS INTEGER), 1) AS "left",
        |  substr(w, CAST(i AS INTEGER)+1, 1) AS "right",
        |  CAST(SUM(cnt) AS BIGINT) AS pair_count
        |FROM prs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      graft.llm.Bpe.pairCounts(t(s, dir, "documents"), "text")
        .orderBy("left", "right")
    }

    // The learned merge table: 8 unrolled iterations, hash-exact on
    // (rank, left, right, merged, pair_count).
    r.reg("q_bpe_train", {
      val sel = (1 to 8).map(r =>
        s"SELECT ${r - 1} AS rank, l AS \"left\", rr AS \"right\", " +
          s"l||rr AS merged, c AS pair_count FROM b$r")
        .mkString("\nUNION ALL\n")
      s"""WITH ${bpeTrainCtes(8)}
         |$sel
         |ORDER BY rank""".stripMargin
    }) { (s, dir) =>
      graft.llm.Bpe.train(bpeTrainFixture(s, dir), "text", 8)
        .orderBy("rank")
    }

    // The 8 learned merges applied in rank order to a word `w`, as one
    // nested-replace expression over the double-spaced symbol form —
    // shared by the token, window and pipeline oracles.
    val bpeNestedSql = (1 to 8).foldLeft(spacedSql("w")) { (acc, r) =>
      s"replace($acc, (SELECT ' '||l||'  '||rr||' ' FROM b$r), " +
        s"(SELECT ' '||l||rr||' ' FROM b$r))"
    }

    // Build the persisted g_pbpe model once per (JVM, sf dir) — shared
    // by q_bpe_indexed and the BPE windows landing query. Returns the
    // model path.
    def ensurePbpeModel(s: org.apache.spark.sql.SparkSession,
                        dir: String): String = {
      val qdir = graft.QHelp.qtmpDir("bpeidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_pbpe_bpe")
      if (!fresh) {
        graft.llm.Bpe.writeBpeModel(bpeTrainFixture(s, dir), "text",
          "g_pbpe", idxPath, numMerges = 8)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      idxPath
    }

    // Distributed encode under the trained merges (docs < 100), exploded
    // as (doc_id, word_pos, tok_pos, token): SQL applies the 8 learned
    // merges in rank order via nested greedy replaces. (Shared by
    // q_bpe_tokens and the persisted-model round trip q_bpe_indexed —
    // the served path must be TRANSPARENT to results.)
    val bpeTokensSql = {
      val nested = bpeNestedSql
      s"""WITH ${bpeTrainCtes(8)},
         |docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100
         |         UNION ALL
         |         SELECT CAST(-7 AS BIGINT), '$bpeEncodeFixture'),
         |wrds AS (
         |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM docs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |enc AS (
         |  SELECT doc_id, word_pos,
         |    string_split(trim($nested), '  ') AS etoks
         |  FROM wrds)
         |SELECT doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |  etoks[CAST(j AS INTEGER)] AS token
         |FROM (SELECT doc_id, word_pos, etoks,
         |        unnest(range(1, len(etoks)+1)) AS j FROM enc)
         |ORDER BY doc_id, word_pos, tok_pos""".stripMargin
    }

    r.reg("q_bpe_tokens", bpeTokensSql) { (s, dir) =>
      val merges = graft.llm.Bpe.mergeList(
        graft.llm.Bpe.train(bpeTrainFixture(s, dir), "text", 8))
      graft.llm.Bpe.encodeTokens(bpeEncodeDocs(s, dir),
          "doc_id", "text", merges)
        .orderBy("doc_id", "word_pos", "tok_pos")
    }

    // Persisted-model round trip (the TENTH maintained family): build
    // `<name>_bpe` / `<name>_bpe_vocab` once per (JVM, sf dir), serve
    // the encode through the catalog tables, and hash-match the SAME
    // SQL chain as the one-shot — the q_nb_indexed discipline.
    r.reg("q_bpe_indexed", bpeTokensSql) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      graft.llm.Bpe.encodeIndexed(s, "g_pbpe", idxPath,
          bpeEncodeDocs(s, dir), "doc_id", "text")
        .orderBy("doc_id", "word_pos", "tok_pos")
    }

    // Vocabulary ids: base code points 0..B-1 in code-point order,
    // merged symbols B + rank — both recomputed in SQL. Duplicate
    // merged surfaces (two ranks concatenating to the same string)
    // collapse to the min id on BOTH sides (r14 — mirrors vocabFrame's
    // dedup so encode joins can never fan out).
    r.reg("q_bpe_vocab", {
      val mrg = (1 to 8).map(r =>
        s"SELECT l||rr AS token, ${r - 1} AS rnk FROM b$r")
        .mkString("\nUNION ALL\n")
      s"""WITH ${bpeTrainCtes(8)},
         |chars AS (
         |  SELECT DISTINCT substr(w, CAST(i AS INTEGER), 1) AS token
         |  FROM (SELECT w, unnest(range(1, length(w)+1)) AS i FROM w0)),
         |basev AS (
         |  SELECT token,
         |    CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
         |  FROM chars),
         |mrg AS ($mrg)
         |SELECT token, MIN(token_id) AS token_id FROM (
         |  SELECT token, token_id FROM basev
         |  UNION ALL
         |  SELECT token, CAST(rnk + (SELECT count(*) FROM basev) AS BIGINT)
         |  FROM mrg)
         |GROUP BY token
         |ORDER BY token_id""".stripMargin
    }) { (s, dir) =>
      val train = bpeTrainFixture(s, dir)
      graft.llm.Bpe.vocabFrame(train, "text",
          graft.llm.Bpe.train(train, "text", 8))
        .orderBy("token_id")
    }

    // BPE-token-ID training windows, landed through the FULL pipeline
    // (r14): the composed corpus→training-files last mile where
    // windowSize counts BPE tokens under the persisted g_pbpe model and
    // windows land as array<long> token ids — the artifact a trainer
    // actually loads. The Spark side runs buildAndWriteWindows to disk
    // (every pipeline stage + split isolation + the id-space chop + the
    // partitioned write) and reads the landing back; the oracle
    // recomputes EVERYTHING — the clean chain, the 8 training
    // iterations, the vocab ids, each clean doc's full id sequence, the
    // per-split cumsum/chop, and the assembled id arrays (compared as
    // space-joined strings) — so a hash match proves the landed token
    // ids are bit-identical end-to-end, with no slack anywhere.
    // chars -> base ids -> deduped vocab, shared by the windows oracles
    val bpeVocabCtes =
      s"""bchars AS (
         |  SELECT DISTINCT substr(w, CAST(i AS INTEGER), 1) AS token
         |  FROM (SELECT w, unnest(range(1, length(w)+1)) AS i FROM w0)),
         |bbasev AS (
         |  SELECT token,
         |    CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
         |  FROM bchars),
         |bvocab AS (
         |  SELECT token, MIN(token_id) AS token_id FROM (
         |    SELECT token, token_id FROM bbasev
         |    UNION ALL
         |    ${(1 to 8).map(r =>
               s"SELECT l||rr AS token, CAST(${r - 1} + " +
                 s"(SELECT count(*) FROM bbasev) AS BIGINT) FROM b$r")
               .mkString("\n    UNION ALL\n    ")})
         |  GROUP BY token)""".stripMargin

    r.reg("q_pipeline_windows_bpe", pipeCleanCtes +
      s""",
         |${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |bwdocs AS (
         |  SELECT c.doc_id, d.text,
         |    CASE WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |         WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM clean c JOIN documents d USING (doc_id)),
         |bwrd AS (
         |  SELECT split, doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT split, doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM bwdocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |bencw AS (
         |  SELECT split, doc_id, word_pos,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM bwrd),
         |btokw AS (
         |  SELECT split, doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |    etoks[CAST(j AS INTEGER)] AS token
         |  FROM (SELECT split, doc_id, word_pos, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM bencw)),
         |bidw AS (
         |  SELECT b.split, b.doc_id, b.word_pos, b.tok_pos,
         |    COALESCE(v.token_id, -1) AS token_id
         |  FROM btokw b LEFT JOIN bvocab v USING (token)),
         |bdoc AS (
         |  SELECT split, doc_id,
         |    list(token_id ORDER BY word_pos, tok_pos) AS ids,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM bidw GROUP BY split, doc_id),
         |bwc AS (SELECT split, doc_id, ids, n,
         |  CAST(sum(n) OVER (PARTITION BY split
         |    ORDER BY (doc_id % 2147483648) * 2654435761 % 4294967296
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start
         |  FROM bdoc),
         |bww AS (SELECT split, doc_id, ids, n, start,
         |  CAST(floor(start/300.0) AS BIGINT) AS wf,
         |  CASE WHEN n > 0 THEN CAST(floor((start+n-1)/300.0) AS BIGINT)
         |       ELSE CAST(floor(start/300.0) AS BIGINT) END AS wl
         |  FROM bwc),
         |bwrg AS (SELECT unnest(range(0,
         |  (SELECT CAST(ceil(sum(n)/300.0) AS BIGINT) + 1 FROM bdoc))) AS window_id),
         |bwm AS (SELECT w.split, r.window_id,
         |  GREATEST(r.window_id*300 - w.start, 0) AS f,
         |  LEAST((r.window_id+1)*300 - w.start, w.n) AS t2,
         |  GREATEST(w.start - r.window_id*300, 0) AS pos, w.ids
         |  FROM bww w JOIN bwrg r ON r.window_id BETWEEN w.wf AND w.wl),
         |bwp AS (SELECT split, window_id, pos,
         |  ids[CAST(f+1 AS INT):CAST(t2 AS INT)] AS part, t2 - f AS len
         |  FROM bwm WHERE t2 > f)
         |SELECT split, window_id,
         |  array_to_string(list_transform(flatten(list(part ORDER BY pos)),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  CAST(sum(len) AS BIGINT) AS n_tokens
         |FROM bwp GROUP BY split, window_id
         |ORDER BY split, window_id""".stripMargin) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val docs = t(s, dir, "documents")
      // per-JVM root (r16): the literal shared path raced when two
      // verify JVMs ran concurrently (the r15-verdict fixture-isolation
      // class, missed for the landing outputs)
      val out = graft.QHelp.qtmpDir("pipeline_windows_bpe").getAbsolutePath
      // a fresh landing every run: the crash-replay manifest guard would
      // otherwise O(1)-return a PREVIOUS scale factor's landing
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.llm.Pipeline.buildAndWriteWindows(
        docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
        docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
        "doc_id", "text", out, windowSize = 300L,
        bpeWindows = Some(graft.llm.Pipeline.BpeWindows("g_pbpe", idxPath)))
      s.read.parquet(out)
        .select(col("split"), col("window_id"),
          concat_ws(" ",
            transform(col("window_ids"), x => x.cast("string")))
            .as("ids_text"),
          col("n_tokens"))
        .orderBy("split", "window_id")
    }

    // EVAL (strided) windows, LANDED through the full pipeline (r15):
    // the held-out perplexity layout a trainer evaluates with — window
    // w covers token span [w·120, w·120 + 300) of each split's
    // permutation stream, consecutive windows overlapping by 180 ids —
    // landed beside the training form with the same manifest/replay
    // discipline (buildAndWriteWindows with a strided BpeWindows spec).
    // The oracle recomputes the clean chain, the 8 training iterations,
    // the vocab, each clean doc's id sequence, the per-split cumsum and
    // the STRIDED membership formulas (window_first/window_last/f/t2/
    // pos) over the LANDED parquet — a hash match proves the landed
    // eval windows are bit-identical end to end.
    r.reg("q_eval_windows", pipeCleanCtes +
      s""",
         |${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |ewdocs AS (
         |  SELECT c.doc_id, d.text,
         |    CASE WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |         WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM clean c JOIN documents d USING (doc_id)),
         |ewrd AS (
         |  SELECT split, doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT split, doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM ewdocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |eenc AS (
         |  SELECT split, doc_id, word_pos,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM ewrd),
         |etok AS (
         |  SELECT split, doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |    etoks[CAST(j AS INTEGER)] AS token
         |  FROM (SELECT split, doc_id, word_pos, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM eenc)),
         |eid AS (
         |  SELECT e.split, e.doc_id, e.word_pos, e.tok_pos,
         |    COALESCE(v.token_id, -1) AS token_id
         |  FROM etok e LEFT JOIN bvocab v USING (token)),
         |edoc AS (
         |  SELECT split, doc_id,
         |    list(token_id ORDER BY word_pos, tok_pos) AS ids,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM eid GROUP BY split, doc_id),
         |ecu AS (SELECT split, doc_id, ids, n,
         |  CAST(sum(n) OVER (PARTITION BY split
         |    ORDER BY (doc_id % 2147483648) * 2654435761 % 4294967296
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start
         |  FROM edoc),
         |ewm AS (SELECT split, doc_id, ids, n, start,
         |  unnest(range(
         |    GREATEST(CAST(0 AS BIGINT),
         |      CAST(floor((start - 300) / 120.0) AS BIGINT) + 1),
         |    CAST(floor((start + n - 1) / 120.0) AS BIGINT) + 1)) AS window_id
         |  FROM ecu WHERE n > 0),
         |ewp AS (SELECT split, window_id,
         |  GREATEST(window_id*120 - start, 0) AS f,
         |  LEAST(window_id*120 + 300 - start, n) AS t2,
         |  GREATEST(start - window_id*120, 0) AS pos, ids
         |  FROM ewm)
         |SELECT split, window_id,
         |  array_to_string(list_transform(
         |    flatten(list(ids[CAST(f+1 AS INT):CAST(t2 AS INT)] ORDER BY pos)),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  CAST(sum(t2 - f) AS BIGINT) AS n_tokens
         |FROM ewp WHERE t2 > f GROUP BY split, window_id
         |ORDER BY split, window_id""".stripMargin) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val docs = t(s, dir, "documents")
      // per-JVM root (r16): the literal shared path raced when two
      // verify JVMs ran concurrently (the r15-verdict fixture-isolation
      // class, missed for the landing outputs)
      val out = graft.QHelp.qtmpDir("eval_windows").getAbsolutePath
      // a fresh landing every run: the crash-replay manifest guard would
      // otherwise O(1)-return a PREVIOUS scale factor's landing
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.llm.Pipeline.buildAndWriteWindows(
        docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
        docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
        "doc_id", "text", out, windowSize = 300L,
        bpeWindows = Some(graft.llm.Pipeline.BpeWindows("g_pbpe", idxPath,
          stride = Some(120L))))
      s.read.parquet(out)
        .select(col("split"), col("window_id"),
          concat_ws(" ",
            transform(col("window_ids"), x => x.cast("string")))
            .as("ids_text"),
          col("n_tokens"))
        .orderBy("split", "window_id")
    }

    // POST-LANDING TEXT-window contamination screen (r15 cont): the
    // word-shingle sibling of the id screen for landings that store
    // window_text — distinct window shingles joined to the benchmark
    // shingle set, counted per window. The oracle recomputes the text
    // landing (chain + per-split chop), each window's TOKEN stream,
    // the engine-agnostic shingle hashes on both sides, and the
    // distinct-hit counts. Non-vacuous for the q_windows_decontam
    // reason: 5-word window shingles CROSS doc boundaries inside a
    // window (the chop concatenates docs), which the doc-level build
    // decontam never saw.
    r.reg("q_windows_decontam_text", pipeCleanCtes +
      s""",
         |wdocs AS (
         |  SELECT c.doc_id, d.text,
         |    CASE WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |         WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM clean c JOIN documents d USING (doc_id)),
         |wd AS (SELECT split, doc_id, string_split(text, ' ') AS toks,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM wdocs),
         |wc AS (SELECT split, doc_id, toks, n,
         |        CAST(sum(n) OVER (PARTITION BY split
         |          ORDER BY (doc_id % 2147483648) * 2654435761 % 4294967296
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start FROM wd),
         |ww AS (SELECT split, doc_id, toks, n, start,
         |        CAST(floor(start/200.0) AS BIGINT) AS wf,
         |        CASE WHEN n > 0 THEN CAST(floor((start+n-1)/200.0) AS BIGINT)
         |             ELSE CAST(floor(start/200.0) AS BIGINT) END AS wl FROM wc),
         |wr AS (SELECT unnest(range(0,
         |        (SELECT CAST(ceil(sum(n)/200.0) AS BIGINT) + 1 FROM wd))) AS window_id),
         |wmem AS (SELECT w.split, r.window_id,
         |          GREATEST(r.window_id*200 - w.start, 0) AS f,
         |          LEAST((r.window_id+1)*200 - w.start, w.n) AS t2,
         |          GREATEST(w.start - r.window_id*200, 0) AS pos, w.toks
         |         FROM ww w JOIN wr r ON r.window_id BETWEEN w.wf AND w.wl),
         |wtok2 AS (SELECT split, window_id,
         |          flatten(list(toks[CAST(f+1 AS INT):CAST(t2 AS INT)]
         |            ORDER BY pos)) AS wt
         |          FROM wmem WHERE t2 > f GROUP BY split, window_id),
         |wsh AS (
         |  SELECT split, window_id,
         |    list_distinct(list_transform(range(1, len(tid)-1),
         |      i -> (((tid[i]*31 + tid[i+1])*31 + tid[i+2])) % 2147483647)) AS gs
         |  FROM (SELECT split, window_id,
         |          list_transform(wt, g -> ${tokIdSql("g")}) AS tid
         |        FROM wtok2)
         |  WHERE len(tid) >= 3),
         |tb AS (
         |  SELECT list_distinct(list_transform(range(1, len(tid)-1),
         |    i -> (((tid[i]*31 + tid[i+1])*31 + tid[i+2])) % 2147483647)) AS gs
         |  FROM (SELECT list_transform(string_split(text, ' '), g -> ${tokIdSql("g")}) AS tid
         |        FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL)
         |  WHERE len(tid) >= 3),
         |tbh AS (SELECT DISTINCT unnest(gs) AS h FROM tb)
         |SELECT split, window_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM (SELECT split, window_id, unnest(gs) AS h FROM wsh) ws
         |  JOIN tbh USING (h)
         |GROUP BY split, window_id
         |ORDER BY split, window_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      // per-JVM root (r16): the literal shared path raced when two
      // verify JVMs ran concurrently (the r15-verdict fixture-isolation
      // class, missed for the landing outputs)
      val out = graft.QHelp.qtmpDir("windows_decontam_text").getAbsolutePath
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.llm.Pipeline.buildAndWriteWindows(
        docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
        docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
        "doc_id", "text", out, windowSize = 200L)
      graft.llm.Pipeline.windowsContaminationScreenText(s, out,
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "text", k = 3)
        .orderBy("split", "window_id")
    }

    // POST-LANDING id-space benchmark decontamination screen (r15):
    // "do my landed training windows contain eval text?" answered over
    // the window_ids arrays themselves — every 5-consecutive-id gram
    // of every landed window joins against the benchmark's id grams
    // under the SAME persisted model (grams containing the -1 OOV
    // sentinel excluded on both sides). The oracle recomputes the
    // landed windows end to end (chain + training + vocab + chop) AND
    // the benchmark's id encode, re-derives both gram sets and the
    // positional hit counts — non-vacuous by construction: the chain's
    // WORD-shingle decontamination ran at k=5 words, so finer 5-ID
    // (~1.5 word) overlaps survive it and the screen must find them.
    r.reg("q_windows_decontam", pipeCleanCtes +
      s""",
         |${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |bwdocs AS (
         |  SELECT c.doc_id, d.text,
         |    CASE WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |         WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM clean c JOIN documents d USING (doc_id)),
         |bwrd AS (
         |  SELECT split, doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT split, doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM bwdocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |bencw AS (
         |  SELECT split, doc_id, word_pos,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM bwrd),
         |btokw AS (
         |  SELECT split, doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |    etoks[CAST(j AS INTEGER)] AS token
         |  FROM (SELECT split, doc_id, word_pos, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM bencw)),
         |bidw AS (
         |  SELECT b.split, b.doc_id, b.word_pos, b.tok_pos,
         |    COALESCE(v.token_id, -1) AS token_id
         |  FROM btokw b LEFT JOIN bvocab v USING (token)),
         |bdoc AS (
         |  SELECT split, doc_id,
         |    list(token_id ORDER BY word_pos, tok_pos) AS ids,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM bidw GROUP BY split, doc_id),
         |bwc AS (SELECT split, doc_id, ids, n,
         |  CAST(sum(n) OVER (PARTITION BY split
         |    ORDER BY (doc_id % 2147483648) * 2654435761 % 4294967296
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start
         |  FROM bdoc),
         |bww AS (SELECT split, doc_id, ids, n, start,
         |  CAST(floor(start/300.0) AS BIGINT) AS wf,
         |  CASE WHEN n > 0 THEN CAST(floor((start+n-1)/300.0) AS BIGINT)
         |       ELSE CAST(floor(start/300.0) AS BIGINT) END AS wl
         |  FROM bwc),
         |bwm AS (SELECT w.split, w.doc_id, w.ids, w.n, w.start,
         |  unnest(range(w.wf, w.wl + 1)) AS window_id
         |  FROM bww w WHERE w.n > 0),
         |bwp AS (SELECT split, window_id,
         |  GREATEST(window_id*300 - start, 0) AS f,
         |  LEAST((window_id+1)*300 - start, n) AS t2,
         |  GREATEST(start - window_id*300, 0) AS pos, ids
         |  FROM bwm),
         |wdwin AS (
         |  SELECT split, window_id,
         |    flatten(list(ids[CAST(f+1 AS INT):CAST(t2 AS INT)]
         |      ORDER BY pos)) AS ids
         |  FROM bwp WHERE t2 > f GROUP BY split, window_id),
         |wdcg AS (
         |  SELECT split, window_id,
         |    ids[CAST(i+1 AS INT):CAST(i+5 AS INT)] AS g
         |  FROM (SELECT split, window_id, ids,
         |          unnest(range(0, len(ids) - 4)) AS i
         |        FROM wdwin WHERE len(ids) >= 5)),
         |wdcf AS (
         |  SELECT split, window_id,
         |    array_to_string(list_transform(g, x -> CAST(x AS VARCHAR)), ':') AS gram
         |  FROM wdcg WHERE NOT list_contains(g, -1)),
         |wbdoc AS (
         |  SELECT doc_id, list(token_id ORDER BY word_pos, tok_pos) AS ids
         |  FROM (
         |    SELECT t.doc_id, t.word_pos, t.tok_pos,
         |      COALESCE(v.token_id, -1) AS token_id
         |    FROM (
         |      SELECT doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |        etoks[CAST(j AS INTEGER)] AS token
         |      FROM (SELECT doc_id, word_pos, etoks,
         |              unnest(range(1, len(etoks)+1)) AS j
         |            FROM (
         |              SELECT doc_id, word_pos,
         |                string_split(trim($bpeNestedSql), '  ') AS etoks
         |              FROM (
         |                SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |                  toks[CAST(i AS INTEGER)] AS w
         |                FROM (SELECT doc_id, string_split(text, ' ') AS toks,
         |                        unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |                      FROM documents
         |                      WHERE doc_id % 10 = 0 AND text IS NOT NULL)
         |                WHERE toks[CAST(i AS INTEGER)] <> ''))))
         |      t LEFT JOIN bvocab v USING (token))
         |  GROUP BY doc_id),
         |wbg0 AS (
         |  SELECT ids[CAST(i+1 AS INT):CAST(i+5 AS INT)] AS g
         |  FROM (SELECT ids, unnest(range(0, len(ids) - 4)) AS i
         |        FROM wbdoc WHERE len(ids) >= 5)),
         |wbg AS (
         |  SELECT DISTINCT
         |    array_to_string(list_transform(g, x -> CAST(x AS VARCHAR)), ':') AS gram
         |  FROM wbg0 WHERE NOT list_contains(g, -1))
         |SELECT split, window_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM wdcf JOIN wbg USING (gram)
         |GROUP BY split, window_id
         |ORDER BY split, window_id""".stripMargin
        ) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val docs = t(s, dir, "documents")
      // per-JVM root (r16): the literal shared path raced when two
      // verify JVMs ran concurrently (the r15-verdict fixture-isolation
      // class, missed for the landing outputs)
      val out = graft.QHelp.qtmpDir("windows_decontam").getAbsolutePath
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.llm.Pipeline.buildAndWriteWindows(
        docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
        docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
        "doc_id", "text", out, windowSize = 300L,
        bpeWindows = Some(graft.llm.Pipeline.BpeWindows("g_pbpe", idxPath)))
      graft.llm.Pipeline.windowsContaminationScreen(s, out,
          docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
          "text", graft.llm.Pipeline.BpeWindows("g_pbpe", idxPath), k = 5)
        .orderBy("split", "window_id")
    }

    // PACKED id windows through the FULL pipeline (r14 cont — the
    // capstone of the doc-aware layout): the composed chain lands
    // fixed-shape 120-id windows (EOD per doc, pad = eod+1, docs never
    // split unless their id mass exceeds 120 — at ~8 merges most docs
    // DO split, so the oversize path is live in the composed oracle
    // too). The oracle recomputes the clean chain, training, vocab,
    // per-split id sequences with EOD, the per-SPLIT permutation rank,
    // the 16-piece-segment next-fit recurrence, dense per-split ids
    // and the padded arrays end to end.
    r.reg("q_pipeline_windows_packed",
      pipeCleanCtes.replaceFirst("^WITH ", "WITH RECURSIVE ") +
      s""",
         |${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |pweod AS (SELECT max(token_id) + 1 AS e FROM bvocab),
         |pwdocs AS (
         |  SELECT c.doc_id, d.text,
         |    CASE WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTTrain THEN 'train'
         |         WHEN (c.doc_id % 2147483648) * 2654435761 % 4294967296 < $pipeTVal THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM clean c JOIN documents d USING (doc_id)),
         |pwwrd AS (
         |  SELECT split, doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT split, doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM pwdocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |pwenc AS (
         |  SELECT split, doc_id, word_pos,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM pwwrd),
         |pwtok AS (
         |  SELECT split, doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |    etoks[CAST(j AS INTEGER)] AS token
         |  FROM (SELECT split, doc_id, word_pos, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM pwenc)),
         |pwid AS (
         |  SELECT b.split, b.doc_id, b.word_pos, b.tok_pos,
         |    COALESCE(v.token_id, -1) AS token_id
         |  FROM pwtok b LEFT JOIN bvocab v USING (token)),
         |pwdoc AS (
         |  SELECT split, doc_id,
         |    list_append(list(token_id ORDER BY word_pos, tok_pos),
         |      (SELECT e FROM pweod)) AS ids,
         |    CAST(count(*) + 1 AS BIGINT) AS n
         |  FROM pwid GROUP BY split, doc_id),
         |pw0 AS (SELECT split, doc_id, n,
         |        unnest(range(0, CAST(floor((n-1)/120.0) AS BIGINT) + 1)) AS piece
         |        FROM pwdoc),
         |pw2 AS (SELECT split, doc_id, piece,
         |        LEAST(120, n - piece*120) AS plen,
         |        (doc_id % 2147483648) * 2654435761 % 4294967296 AS h
         |        FROM pw0),
         |pwrk AS (SELECT split, doc_id, piece, plen,
         |        row_number() OVER (PARTITION BY split ORDER BY h, piece) AS rnk
         |        FROM pw2),
         |pwsg AS (SELECT split, doc_id, piece, plen,
         |        CAST(floor((rnk-1)/16.0) AS BIGINT) AS seg,
         |        CAST((rnk-1)%16 AS BIGINT) AS pos FROM pwrk),
         |pwpk AS (
         |  SELECT split, seg, pos, doc_id, piece, plen,
         |         CAST(0 AS BIGINT) AS win, plen AS fill
         |  FROM pwsg WHERE pos = 0
         |  UNION ALL
         |  SELECT c.split, c.seg, c.pos, c.doc_id, c.piece, c.plen,
         |    CASE WHEN k.fill + c.plen <= 120 THEN k.win ELSE k.win + 1 END,
         |    CASE WHEN k.fill + c.plen <= 120 THEN k.fill + c.plen ELSE c.plen END
         |  FROM pwpk k JOIN pwsg c
         |    ON c.split = k.split AND c.seg = k.seg AND c.pos = k.pos + 1),
         |pwwid AS (SELECT split, seg, win,
         |         dense_rank() OVER (PARTITION BY split ORDER BY seg, win) - 1 AS window_id
         |        FROM (SELECT DISTINCT split, seg, win FROM pwpk)),
         |pwmem AS (SELECT k.split, k.doc_id, k.piece, k.plen,
         |               k.fill - k.plen AS off, w.window_id
         |        FROM pwpk k JOIN pwwid w
         |          ON w.split = k.split AND w.seg = k.seg AND w.win = k.win),
         |pwprt AS (SELECT m.split, m.window_id, m.off, m.plen AS len,
         |           d.ids[CAST(m.piece*120+1 AS INT):CAST(m.piece*120+m.plen AS INT)] AS part
         |          FROM pwmem m JOIN pwdoc d
         |            ON d.split = m.split AND d.doc_id = m.doc_id),
         |pwwin AS (SELECT split, window_id,
         |  flatten(list(part ORDER BY off)) AS ids,
         |  CAST(sum(len) AS BIGINT) AS n_tokens
         |  FROM pwprt GROUP BY split, window_id)
         |SELECT split, window_id,
         |  array_to_string(list_transform(
         |    list_concat(ids, list_transform(range(0, 120 - n_tokens),
         |      x -> pe.e + 1)),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  n_tokens
         |FROM pwwin, pweod pe ORDER BY split, window_id""".stripMargin) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val vocab = graft.llm.Bpe.vocabMap(s.table("g_pbpe_bpe_vocab"))
      val eod = vocab.values.max + 1L
      val docs = t(s, dir, "documents")
      // per-JVM root (r16): the literal shared path raced when two
      // verify JVMs ran concurrently (the r15-verdict fixture-isolation
      // class, missed for the landing outputs)
      val out = graft.QHelp.qtmpDir("pipeline_windows_packed").getAbsolutePath
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.llm.Pipeline.buildAndWriteWindows(
        docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
        docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
        "doc_id", "text", out, windowSize = 120L,
        bpeWindows = Some(graft.llm.Pipeline.BpeWindows("g_pbpe", idxPath,
          eodId = Some(eod), packed = true, padId = Some(eod + 1L),
          segmentDocs = 16)))
      s.read.parquet(out)
        .select(col("split"), col("window_id"),
          concat_ws(" ",
            transform(col("window_ids"), x => x.cast("string")))
            .as("ids_text"),
          col("n_tokens"))
        .orderBy("split", "window_id")
    }

    // EOD insertion + doc-boundary spans (r14): the two trainer-facing
    // refinements of the id-space window assembly — every document
    // contributes one trailing end-of-document id (reserved as
    // max(vocab id)+1, recomputed identically on both engines) and each
    // window carries its (doc, offset, length) tiling for cross-doc
    // attention masking. The oracle recomputes the trained model, the
    // per-doc id arrays WITH the appended EOD (zero-token docs reduce
    // to a lone EOD — a LEFT join keeps them), the seed-5 permutation
    // (full pmod form: the fixture doc id is NEGATIVE), the 120-token
    // chop, and both the flattened id stream and the span tiling.
    r.reg("q_windows_bpe_eod", {
      val hv = "((((doc_id % 2147483648) + 2147483648) % 2147483648 + 5)" +
        " % 2147483648) * 2654435761 % 4294967296"
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |eodv AS (SELECT max(token_id) + 1 AS e FROM bvocab),
         |edocs AS (SELECT doc_id, text FROM documents
         |          WHERE doc_id < 100 AND text IS NOT NULL
         |          UNION ALL
         |          SELECT CAST(-7 AS BIGINT), '$bpeEncodeFixture'),
         |ewrd AS (
         |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM edocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |eenc AS (
         |  SELECT doc_id, word_pos,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM ewrd),
         |etok AS (
         |  SELECT doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |    etoks[CAST(j AS INTEGER)] AS token
         |  FROM (SELECT doc_id, word_pos, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM eenc)),
         |eid AS (
         |  SELECT t.doc_id, t.word_pos, t.tok_pos,
         |    COALESCE(v.token_id, -1) AS token_id
         |  FROM etok t LEFT JOIN bvocab v USING (token)),
         |edoc AS (
         |  SELECT d.doc_id,
         |    list_append(COALESCE(g.ids0, CAST([] AS BIGINT[])),
         |      (SELECT e FROM eodv)) AS ids
         |  FROM (SELECT DISTINCT doc_id FROM edocs) d
         |  LEFT JOIN (SELECT doc_id,
         |      list(token_id ORDER BY word_pos, tok_pos) AS ids0
         |    FROM eid GROUP BY doc_id) g USING (doc_id)),
         |edn AS (SELECT doc_id, ids, CAST(len(ids) AS BIGINT) AS n FROM edoc),
         |ecu AS (SELECT doc_id, ids, n,
         |  CAST(sum(n) OVER (ORDER BY $hv
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start
         |  FROM edn),
         |eww AS (SELECT doc_id, ids, n, start,
         |  CAST(floor(start/120.0) AS BIGINT) AS wf,
         |  CASE WHEN n > 0 THEN CAST(floor((start+n-1)/120.0) AS BIGINT)
         |       ELSE CAST(floor(start/120.0) AS BIGINT) END AS wl
         |  FROM ecu),
         |erg AS (SELECT unnest(range(0,
         |  (SELECT CAST(ceil(sum(n)/120.0) AS BIGINT) + 1 FROM edn))) AS window_id),
         |emem AS (SELECT w.doc_id, r.window_id,
         |  GREATEST(r.window_id*120 - w.start, 0) AS f,
         |  LEAST((r.window_id+1)*120 - w.start, w.n) AS t2,
         |  GREATEST(w.start - r.window_id*120, 0) AS pos, w.ids
         |  FROM eww w JOIN erg r ON r.window_id BETWEEN w.wf AND w.wl),
         |eprt AS (SELECT doc_id, window_id, pos,
         |  ids[CAST(f+1 AS INT):CAST(t2 AS INT)] AS part, t2 - f AS len
         |  FROM emem WHERE t2 > f)
         |SELECT window_id,
         |  array_to_string(list_transform(flatten(list(part ORDER BY pos)),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  string_agg(doc_id || ':' || pos || ':' || len, ' ' ORDER BY pos)
         |    AS spans_text,
         |  CAST(sum(len) AS BIGINT) AS n_tokens
         |FROM eprt GROUP BY window_id
         |ORDER BY window_id""".stripMargin
    }) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val merges = graft.llm.Bpe.mergeList(s.table("g_pbpe_bpe"))
      val vocab = graft.llm.Bpe.vocabMap(s.table("g_pbpe_bpe_vocab"))
      val _ = idxPath
      graft.llm.Bpe.assembleWindowsIds(bpeEncodeDocs(s, dir), "doc_id",
          "text", windowSize = 120L, seed = 5L, merges, vocab,
          eodId = Some(vocab.values.max + 1L), withDocSpans = true)
        .select(col("window_id"),
          concat_ws(" ",
            transform(col("window_ids"), x => x.cast("string")))
            .as("ids_text"),
          concat_ws(" ", transform(col("doc_spans"), sp =>
            concat_ws(":", sp.getField("id").cast("string"),
              sp.getField("pos").cast("string"),
              sp.getField("len").cast("string")))).as("spans_text"),
          col("n_tokens"))
        .orderBy("window_id")
    }

    // SLIDING id-space windows (r14): the eval layout — window w covers
    // [w*40, w*40+100) over the same concatenated permutation stream,
    // so consecutive windows overlap by 60 tokens. The oracle recomputes
    // the trained model, per-doc id arrays, the seed-7 permutation
    // (full-pmod form — the fixture doc id is negative), and the
    // STRIDED membership formulas (wf = max(0, floor((s-100)/40)+1),
    // wl = floor((e-1)/40), clip both ends), so the overlap logic is
    // value-checked, not just counted.
    r.reg("q_windows_bpe_strided", {
      val hv = "((((doc_id % 2147483648) + 2147483648) % 2147483648 + 7)" +
        " % 2147483648) * 2654435761 % 4294967296"
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |sdocs AS (SELECT doc_id, text FROM documents
         |          WHERE doc_id < 100 AND text IS NOT NULL
         |          UNION ALL
         |          SELECT CAST(-7 AS BIGINT), '$bpeEncodeFixture'),
         |swrd AS (
         |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM sdocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |senc AS (
         |  SELECT doc_id, word_pos,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM swrd),
         |stok AS (
         |  SELECT doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |    etoks[CAST(j AS INTEGER)] AS token
         |  FROM (SELECT doc_id, word_pos, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM senc)),
         |sid AS (
         |  SELECT t.doc_id, t.word_pos, t.tok_pos,
         |    COALESCE(v.token_id, -1) AS token_id
         |  FROM stok t LEFT JOIN bvocab v USING (token)),
         |sdoc AS (
         |  SELECT doc_id, list(token_id ORDER BY word_pos, tok_pos) AS ids,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM sid GROUP BY doc_id),
         |scu AS (SELECT doc_id, ids, n,
         |  CAST(sum(n) OVER (ORDER BY $hv
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start
         |  FROM sdoc),
         |sw AS (SELECT doc_id, ids, n, start,
         |  unnest(range(
         |    GREATEST(CAST(0 AS BIGINT),
         |      CAST(floor((start - 100) / 40.0) AS BIGINT) + 1),
         |    CAST(floor((start + n - 1) / 40.0) AS BIGINT) + 1)) AS window_id
         |  FROM scu WHERE n > 0),
         |sprt AS (SELECT window_id,
         |  GREATEST(window_id*40 - start, 0) AS f,
         |  LEAST(window_id*40 + 100 - start, n) AS t2,
         |  GREATEST(start - window_id*40, 0) AS pos, ids
         |  FROM sw)
         |SELECT window_id,
         |  array_to_string(list_transform(
         |    flatten(list(ids[CAST(f+1 AS INT):CAST(t2 AS INT)] ORDER BY pos)),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  CAST(sum(t2 - f) AS BIGINT) AS n_tokens
         |FROM sprt WHERE t2 > f GROUP BY window_id
         |ORDER BY window_id""".stripMargin
    }) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val _ = idxPath
      val merges = graft.llm.Bpe.mergeList(s.table("g_pbpe_bpe"))
      val vocab = graft.llm.Bpe.vocabMap(s.table("g_pbpe_bpe_vocab"))
      graft.llm.Bpe.assembleWindowsIdsStrided(bpeEncodeDocs(s, dir),
          "doc_id", "text", windowSize = 100L, stride = 40L, seed = 7L,
          merges, vocab)
        .select(col("window_id"),
          concat_ws(" ",
            transform(col("window_ids"), x => x.cast("string")))
            .as("ids_text"),
          col("n_tokens"))
        .orderBy("window_id")
    }

    // PACKED id-space windows (r14): the doc-aware layout in the unit a
    // trainer loads — every window is EXACTLY 96 ids (pad = eod+1 fills
    // [n_tokens, 96)), docs ≤ 96 ids (incl. their EOD) land whole, the
    // ~56-word docs whose encodes exceed 96 pre-split losslessly. The
    // oracle replays training + vocab + per-doc encode + EOD, then the
    // seed-11 permutation (full-pmod hash — the fixture doc id is
    // negative), the 16-piece-segment NEXT-FIT recurrence (recursive
    // CTE), dense ids, padded id text and span tiling end to end.
    r.reg("q_windows_packed_bpe", {
      val hv = "((((doc_id % 2147483648) + 2147483648) % 2147483648 + 11)" +
        " % 2147483648) * 2654435761 % 4294967296"
      s"""WITH RECURSIVE ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |pbeod AS (SELECT max(token_id) + 1 AS e FROM bvocab),
         |pbdocs AS (SELECT doc_id, text FROM documents
         |           WHERE doc_id < 100 AND text IS NOT NULL
         |           UNION ALL
         |           SELECT CAST(-7 AS BIGINT), '$bpeEncodeFixture'),
         |pbwrd AS (
         |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM pbdocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |pbenc AS (
         |  SELECT doc_id, word_pos,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM pbwrd),
         |pbtok AS (
         |  SELECT doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |    etoks[CAST(j AS INTEGER)] AS token
         |  FROM (SELECT doc_id, word_pos, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM pbenc)),
         |pbid AS (
         |  SELECT t.doc_id, t.word_pos, t.tok_pos,
         |    COALESCE(v.token_id, -1) AS token_id
         |  FROM pbtok t LEFT JOIN bvocab v USING (token)),
         |pbdoc AS (
         |  SELECT d.doc_id,
         |    list_append(COALESCE(g.ids0, CAST([] AS BIGINT[])),
         |      (SELECT e FROM pbeod)) AS ids
         |  FROM (SELECT DISTINCT doc_id FROM pbdocs) d
         |  LEFT JOIN (SELECT doc_id,
         |      list(token_id ORDER BY word_pos, tok_pos) AS ids0
         |    FROM pbid GROUP BY doc_id) g USING (doc_id)),
         |pbdn AS (SELECT doc_id, ids, CAST(len(ids) AS BIGINT) AS n FROM pbdoc),
         |pb0 AS (SELECT doc_id, n,
         |        unnest(range(0, CAST(floor((n-1)/96.0) AS BIGINT) + 1)) AS piece
         |        FROM pbdn WHERE n > 0),
         |pb2 AS (SELECT doc_id, piece,
         |        LEAST(96, n - piece*96) AS plen, $hv AS h
         |        FROM pb0),
         |pbrk AS (SELECT doc_id, piece, plen,
         |        row_number() OVER (ORDER BY h, piece) AS rnk FROM pb2),
         |pbsg AS (SELECT doc_id, piece, plen,
         |        CAST(floor((rnk-1)/16.0) AS BIGINT) AS seg,
         |        CAST((rnk-1)%16 AS BIGINT) AS pos FROM pbrk),
         |pbpk AS (
         |  SELECT seg, pos, doc_id, piece, plen,
         |         CAST(0 AS BIGINT) AS win, plen AS fill
         |  FROM pbsg WHERE pos = 0
         |  UNION ALL
         |  SELECT c.seg, c.pos, c.doc_id, c.piece, c.plen,
         |    CASE WHEN k.fill + c.plen <= 96 THEN k.win ELSE k.win + 1 END,
         |    CASE WHEN k.fill + c.plen <= 96 THEN k.fill + c.plen ELSE c.plen END
         |  FROM pbpk k JOIN pbsg c ON c.seg = k.seg AND c.pos = k.pos + 1),
         |pbwid AS (SELECT seg, win,
         |         dense_rank() OVER (ORDER BY seg, win) - 1 AS window_id
         |        FROM (SELECT DISTINCT seg, win FROM pbpk)),
         |pbmem AS (SELECT k.doc_id, k.piece, k.plen,
         |               k.fill - k.plen AS off, w.window_id
         |        FROM pbpk k JOIN pbwid w ON w.seg = k.seg AND w.win = k.win),
         |pbprt AS (SELECT m.window_id, m.off, m.doc_id, m.plen AS len,
         |           d.ids[CAST(m.piece*96+1 AS INT):CAST(m.piece*96+m.plen AS INT)] AS part
         |          FROM pbmem m JOIN pbdn d USING (doc_id)),
         |pbwin AS (SELECT window_id,
         |  flatten(list(part ORDER BY off)) AS ids,
         |  string_agg(doc_id || ':' || off || ':' || len, ' ' ORDER BY off)
         |    AS spans_text,
         |  CAST(sum(len) AS BIGINT) AS n_tokens
         |  FROM pbprt GROUP BY window_id)
         |SELECT window_id,
         |  array_to_string(list_transform(
         |    list_concat(ids, list_transform(range(0, 96 - n_tokens),
         |      x -> pe.e + 1)),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  spans_text, n_tokens
         |FROM pbwin, pbeod pe ORDER BY window_id""".stripMargin
    }) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val _ = idxPath
      val merges = graft.llm.Bpe.mergeList(s.table("g_pbpe_bpe"))
      val vocab = graft.llm.Bpe.vocabMap(s.table("g_pbpe_bpe_vocab"))
      val eod = vocab.values.max + 1L
      graft.llm.Bpe.assembleWindowsIdsPacked(bpeEncodeDocs(s, dir),
          "doc_id", "text", windowSize = 96L, seed = 11L, merges, vocab,
          eodId = Some(eod), padId = Some(eod + 1L), withDocSpans = true,
          segmentDocs = 16)
        .select(col("window_id"),
          concat_ws(" ",
            transform(col("window_ids"), x => x.cast("string")))
            .as("ids_text"),
          concat_ws(" ", transform(col("doc_spans"), sp =>
            concat_ws(":", sp.getField("id").cast("string"),
              sp.getField("pos").cast("string"),
              sp.getField("len").cast("string")))).as("spans_text"),
          col("n_tokens"))
        .orderBy("window_id")
    }

    // TOKENIZER FERTILITY by language (r14 cont): tokens-per-word and
    // OOV share per lang under the persisted model — the tokenizer-QC
    // metric multilingual work tunes. The oracle replays training +
    // vocab + the per-word encode and aggregates by lang; the planted
    // 'xx' doc carries a char the training corpus never saw ('ø'), so
    // the OOV column is non-vacuous at both scales, and the planted
    // 'zz' doc is WORD-LESS (empty text) so the zero-word-group
    // semantics — the group SURFACES with n_words 0 / fertility null,
    // absence would hide a broken-extraction language — are
    // value-checked, not avoided by fixture luck (r14 advice): groups
    // derive from fdocs and outer-join the word/token masses.
    r.reg("q_bpe_fertility",
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |fdocs AS (SELECT doc_id, lang, text FROM documents
         |          WHERE doc_id < 100 AND text IS NOT NULL
         |          UNION ALL
         |          SELECT CAST(-8 AS BIGINT), 'xx', 'øøø foo the'
         |          UNION ALL
         |          SELECT CAST(-9 AS BIGINT), 'zz', ''),
         |fgrp AS (SELECT DISTINCT lang FROM fdocs),
         |fwrd AS (
         |  SELECT doc_id, lang, toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM fdocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |fenc AS (
         |  SELECT doc_id, lang,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM fwrd),
         |ftok AS (SELECT doc_id, lang, unnest(etoks) AS token FROM fenc),
         |fid AS (
         |  SELECT t.lang, COALESCE(v.token_id, -1) AS tid
         |  FROM ftok t LEFT JOIN bvocab v USING (token)),
         |fw AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words
         |       FROM fwrd GROUP BY lang),
         |ft AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
         |        CAST(sum(CASE WHEN tid < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |       FROM fid GROUP BY lang)
         |SELECT lang,
         |  COALESCE(n_words, 0) AS n_words,
         |  COALESCE(n_tokens, 0) AS n_tokens,
         |  COALESCE(n_oov, 0) AS n_oov,
         |  CASE WHEN COALESCE(n_words, 0) = 0 THEN NULL
         |       ELSE CAST(COALESCE(n_tokens, 0) AS DOUBLE)
         |            / COALESCE(n_words, 0) END AS fertility,
         |  CASE WHEN COALESCE(n_tokens, 0) = 0 THEN NULL
         |       ELSE CAST(COALESCE(n_oov, 0) AS DOUBLE)
         |            / COALESCE(n_tokens, 0) END AS oov_rate
         |FROM fgrp LEFT JOIN fw USING (lang) LEFT JOIN ft USING (lang)
         |ORDER BY lang""".stripMargin) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val extra = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row("xx", "øøø foo the"),
          org.apache.spark.sql.Row("zz", "")),
        StructType(Seq(StructField("lang", StringType),
          StructField("text", StringType))))
      val fdocs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .select("lang", "text").unionByName(extra)
      graft.llm.Bpe.fertilityReport(s, "g_pbpe", idxPath, fdocs,
          "text", "lang")
        .orderBy("lang")
    }

    // ------------------------------------------------------------------
    // BYTE-LEVEL BPE (r14): the GPT-2 symbolization — words start as
    // UTF-8 BYTES (uppercase hex pairs on both engines: Spark
    // hex(encode(w,'UTF-8')) == DuckDB hex(w)), so the 256-entry base
    // alphabet covers every script and NO code point is ever OOV;
    // multibyte characters are SPLIT (é = C3 A9) and merges re-join
    // them from data. The oracle replays whole training iterations over
    // the hex-pair symbol form — same double-space replace semantics as
    // the code-point family — with an injected fixture (1500× 'héé':
    // byte pairs (C3,A9) ×2 and the adjacent-overlap (A9,C3) inside one
    // word) making the byte split and the overlap non-vacuous.
    val bpeByteReps = 1500
    def bpeByteTrainFixture(s: org.apache.spark.sql.SparkSession,
                            dir: String) = {
      import s.implicits._
      t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"), col("text"))
        .unionByName(Seq((-8L,
          Array.fill(bpeByteReps)("héé").mkString(" ")))
          .toDF("doc_id", "text"))
    }
    val bpeByteEncodeFixture = "héé hééé 中中 z"
    def bpeByteEncodeDocs(s: org.apache.spark.sql.SparkSession,
                          dir: String) = {
      import s.implicits._
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
        .unionByName(Seq((-8L, bpeByteEncodeFixture)).toDF("doc_id", "text"))
    }

    def spacedBytesSql(w: String): String =
      s"' ' || array_to_string(list_transform(range(1, length(hex($w))//2 + 1), " +
        s"q -> substr(hex($w), CAST(q*2-1 AS INTEGER), 2)), '  ') || ' '"

    def bpeByteTrainCtes(nMerges: Int): String = {
      val init =
        s"""yw0 AS MATERIALIZED (
           |  SELECT w, CAST(count(*) AS BIGINT) AS cnt, ${spacedBytesSql("w")} AS sp
           |  FROM (SELECT unnest(string_split(text, ' ')) AS w
           |        FROM documents WHERE doc_id < 400
           |        UNION ALL
           |        SELECT 'héé' FROM range($bpeByteReps))
           |  WHERE length(w) >= 1 GROUP BY w)""".stripMargin
      val iters = (1 to nMerges).map { r =>
        val p = r - 1
        s"""yp$r AS MATERIALIZED (
           |  SELECT toks[CAST(i AS INTEGER)] AS l,
           |    toks[CAST(i AS INTEGER)+1] AS rr,
           |    CAST(SUM(cnt) AS BIGINT) AS c
           |  FROM (SELECT cnt, string_split(trim(sp), '  ') AS toks,
           |          unnest(range(1, len(string_split(trim(sp), '  ')))) AS i
           |        FROM yw$p)
           |  GROUP BY 1, 2),
           |yb$r AS MATERIALIZED (SELECT l, rr, c FROM yp$r ORDER BY c DESC, l, rr LIMIT 1),
           |yw$r AS MATERIALIZED (
           |  SELECT w, cnt,
           |    replace(sp, (SELECT ' '||l||'  '||rr||' ' FROM yb$r),
           |                (SELECT ' '||l||rr||' ' FROM yb$r)) AS sp
           |  FROM yw$p)""".stripMargin
      }
      (init +: iters).mkString(",\n")
    }

    // The byte-level merge table: 8 unrolled iterations over hex-pair
    // symbols, hash-exact on (rank, left, right, merged, pair_count).
    r.reg("q_bpe_bytes", {
      val sel = (1 to 8).map(r =>
        s"SELECT ${r - 1} AS rank, l AS \"left\", rr AS \"right\", " +
          s"l||rr AS merged, c AS pair_count FROM yb$r")
        .mkString("\nUNION ALL\n")
      s"""WITH ${bpeByteTrainCtes(8)}
         |$sel
         |ORDER BY rank""".stripMargin
    }) { (s, dir) =>
      graft.llm.Bpe.train(bpeByteTrainFixture(s, dir), "text", 8,
          byteLevel = true)
        .orderBy("rank")
    }

    // Byte-level encode under the trained merges, exploded per token —
    // hex-pair base symbols re-joined by the learned merges; the
    // non-ASCII fixture words prove multibyte characters SPLIT at the
    // base level and reassemble only where a merge was learned.
    r.reg("q_bpe_bytes_tokens", {
      val nested = (1 to 8).foldLeft(spacedBytesSql("w")) { (acc, r) =>
        s"replace($acc, (SELECT ' '||l||'  '||rr||' ' FROM yb$r), " +
          s"(SELECT ' '||l||rr||' ' FROM yb$r))"
      }
      s"""WITH ${bpeByteTrainCtes(8)},
         |ydocs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100
         |          UNION ALL
         |          SELECT CAST(-8 AS BIGINT), '$bpeByteEncodeFixture'),
         |ywrd AS (
         |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM ydocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |yenc AS (
         |  SELECT doc_id, word_pos,
         |    string_split(trim($nested), '  ') AS etoks
         |  FROM ywrd)
         |SELECT doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |  etoks[CAST(j AS INTEGER)] AS token
         |FROM (SELECT doc_id, word_pos, etoks,
         |        unnest(range(1, len(etoks)+1)) AS j FROM yenc)
         |ORDER BY doc_id, word_pos, tok_pos""".stripMargin
    }) { (s, dir) =>
      val merges = graft.llm.Bpe.mergeList(
        graft.llm.Bpe.train(bpeByteTrainFixture(s, dir), "text", 8,
          byteLevel = true))
      graft.llm.Bpe.encodeTokens(bpeByteEncodeDocs(s, dir),
          "doc_id", "text", merges, byteLevel = true)
        .orderBy("doc_id", "word_pos", "tok_pos")
    }

    // GPT-2 pre-tokenization composed with byte-level training (r14):
    // the regex word stream — letter/digit/punctuation runs each
    // optionally carrying ONE LEADING SPACE into the token (the
    // defining GPT-2 feature: ' héé' and 'héé' are different words,
    // detokenization is plain concatenation) — feeds byte-level BPE.
    // Both engines extract with the same RE2-compatible pattern; the
    // injected fixture text ('héé' ×1500 space-joined) extracts as ONE
    // bare 'héé' + 1499 ' héé' (leading space IN the word), so the
    // space byte 20 participates in merges and the replay checks the
    // pattern semantics, not just the merge loop.
    val gpt2Pat = " ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"
    val gpt2PatSql = """ ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"""
    def bpeGpt2TrainCtes(nMerges: Int): String = {
      val init =
        s"""gw0 AS MATERIALIZED (
           |  SELECT w, CAST(count(*) AS BIGINT) AS cnt, ${spacedBytesSql("w")} AS sp
           |  FROM (SELECT unnest(regexp_extract_all(text, '$gpt2PatSql')) AS w
           |        FROM documents WHERE doc_id < 400
           |        UNION ALL SELECT 'héé'
           |        UNION ALL SELECT ' héé' FROM range(${bpeByteReps - 1}))
           |  WHERE length(w) >= 1 GROUP BY w)""".stripMargin
      val iters = (1 to nMerges).map { r =>
        val p = r - 1
        s"""gp$r AS MATERIALIZED (
           |  SELECT toks[CAST(i AS INTEGER)] AS l,
           |    toks[CAST(i AS INTEGER)+1] AS rr,
           |    CAST(SUM(cnt) AS BIGINT) AS c
           |  FROM (SELECT cnt, string_split(trim(sp), '  ') AS toks,
           |          unnest(range(1, len(string_split(trim(sp), '  ')))) AS i
           |        FROM gw$p)
           |  GROUP BY 1, 2),
           |gb$r AS MATERIALIZED (SELECT l, rr, c FROM gp$r ORDER BY c DESC, l, rr LIMIT 1),
           |gw$r AS MATERIALIZED (
           |  SELECT w, cnt,
           |    replace(sp, (SELECT ' '||l||'  '||rr||' ' FROM gb$r),
           |                (SELECT ' '||l||rr||' ' FROM gb$r)) AS sp
           |  FROM gw$p)""".stripMargin
      }
      (init +: iters).mkString(",\n")
    }
    def bpeGpt2TrainFixture(s: org.apache.spark.sql.SparkSession,
                            dir: String) = {
      import s.implicits._
      t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"), col("text"))
        .unionByName(Seq((-8L,
          Array.fill(bpeByteReps)("héé").mkString(" ")))
          .toDF("doc_id", "text"))
    }

    r.reg("q_bpe_gpt2", {
      val sel = (1 to 8).map(r =>
        s"SELECT ${r - 1} AS rank, l AS \"left\", rr AS \"right\", " +
          s"l||rr AS merged, c AS pair_count FROM gb$r")
        .mkString("\nUNION ALL\n")
      s"""WITH ${bpeGpt2TrainCtes(8)}
         |$sel
         |ORDER BY rank""".stripMargin
    }) { (s, dir) =>
      graft.llm.Bpe.train(bpeGpt2TrainFixture(s, dir), "text", 8,
          byteLevel = true, wordPattern = Some(gpt2Pat))
        .orderBy("rank")
    }

    // the GPT-2 encode: regex words (leading spaces in-token) through
    // the byte-level merges — token streams concatenate back to the
    // ORIGINAL text bytes including its separators
    r.reg("q_bpe_gpt2_tokens", {
      val nested = (1 to 8).foldLeft(spacedBytesSql("w")) { (acc, r) =>
        s"replace($acc, (SELECT ' '||l||'  '||rr||' ' FROM gb$r), " +
          s"(SELECT ' '||l||rr||' ' FROM gb$r))"
      }
      s"""WITH ${bpeGpt2TrainCtes(8)},
         |gdocs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100
         |          UNION ALL
         |          SELECT CAST(-8 AS BIGINT), '$bpeByteEncodeFixture'),
         |gwrd AS (
         |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id,
         |          regexp_extract_all(text, '$gpt2PatSql') AS toks,
         |          unnest(range(1, len(regexp_extract_all(text, '$gpt2PatSql'))+1)) AS i
         |        FROM gdocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |genc AS (
         |  SELECT doc_id, word_pos,
         |    string_split(trim($nested), '  ') AS etoks
         |  FROM gwrd)
         |SELECT doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |  etoks[CAST(j AS INTEGER)] AS token
         |FROM (SELECT doc_id, word_pos, etoks,
         |        unnest(range(1, len(etoks)+1)) AS j FROM genc)
         |ORDER BY doc_id, word_pos, tok_pos""".stripMargin
    }) { (s, dir) =>
      val merges = graft.llm.Bpe.mergeList(
        graft.llm.Bpe.train(bpeGpt2TrainFixture(s, dir), "text", 8,
          byteLevel = true, wordPattern = Some(gpt2Pat)))
      graft.llm.Bpe.encodeTokens(bpeByteEncodeDocs(s, dir),
          "doc_id", "text", merges, byteLevel = true,
          wordPattern = Some(gpt2Pat))
        .orderBy("doc_id", "word_pos", "tok_pos")
    }

    // The shared SFT oracle chain (q_sft_examples / q_sft_pack /
    // q_sft_truncate / q_kto_pairs): each doc's words side-tag into
    // prompt (first half) and response, replay the per-word BPE
    // encode, and aggregate into (pids, rids) id lists plus the vocab
    // max (sftm) — ONE definition so a fix to the encode/side-tagging
    // arithmetic can never leave the four oracles diverged.
    val sftSideCtes: String =
      s"""sft0 AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |  FROM documents WHERE doc_id < 100 AND text IS NOT NULL),
         |sft1 AS (SELECT doc_id, ws, CAST(len(ws)//2 AS BIGINT) AS np
         |  FROM sft0 WHERE len(ws) >= 2),
         |sftw AS (
         |  SELECT doc_id, np, i,
         |    CASE WHEN i <= np THEN 0 ELSE 1 END AS side,
         |    ws[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, np, ws, unnest(range(1, len(ws)+1)) AS i
         |        FROM sft1)),
         |sfte AS (
         |  SELECT doc_id, np, i, side,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM sftw),
         |sftt AS (
         |  SELECT doc_id, np, i, side, CAST(j AS INT) AS j,
         |    etoks[CAST(j AS INT)] AS token
         |  FROM (SELECT doc_id, np, i, side, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM sfte)),
         |sfti AS (
         |  SELECT t.doc_id, t.i, t.side, t.j,
         |    COALESCE(v.token_id, -1) AS tid
         |  FROM sftt t LEFT JOIN bvocab v USING (token)),
         |sftm AS (SELECT CAST(max(token_id) AS BIGINT) AS mx FROM bvocab),
         |sfta AS (
         |  SELECT doc_id,
         |    list(tid ORDER BY i, j) FILTER (WHERE side = 0) AS pids,
         |    list(tid ORDER BY i, j) FILTER (WHERE side = 1) AS rids
         |  FROM sfti GROUP BY doc_id)""".stripMargin

    // SFT example assembly (r15): (prompt, response) pairs → training
    // tensors under the persisted model — input_ids = enc(prompt) ++
    // [sep] ++ enc(response) ++ [eod] with the loss-mask boundary
    // loss_from = |enc(prompt)| + 1. Pairs derive from documents (first
    // half of each doc's words as prompt, rest as response) so the
    // fixture is corpus-shaped at every scale; the oracle replays the
    // per-word encode on BOTH sides of the boundary, tags each word's
    // side, and re-derives the concatenated ids, the structural sep/eod
    // ids (vocab max + 1/+2) and the mask boundary exactly.
    r.reg("q_sft_examples",
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |$sftSideCtes
         |SELECT doc_id,
         |  array_to_string(list_transform(
         |    list_concat(list_concat(list_concat(
         |      COALESCE(pids, []), [mx+1]), rids), [mx+2]),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  CAST(COALESCE(len(pids), 0) + len(rids) + 2 AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(len(pids), 0) + 1 AS BIGINT) AS loss_from
         |FROM sfta, sftm
         |WHERE rids IS NOT NULL AND len(rids) >= 1
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val vocabMax = graft.llm.Bpe
        .vocabMap(s.table("g_pbpe_bpe_vocab")).values.max
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val pairs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 2)
        .withColumn("__np__", (size(col("__ws__")) / 2).cast("int"))
        .select(col("doc_id"),
          array_join(slice(col("__ws__"), lit(1), col("__np__")), " ")
            .as("prompt"),
          array_join(slice(col("__ws__"), col("__np__") + 1,
            size(col("__ws__")) - col("__np__")), " ").as("response"))
      graft.llm.Sft.assembleExamplesIndexed(s, "g_pbpe", idxPath, pairs,
          "doc_id", "prompt", "response",
          sepId = Some(vocabMax + 1L), eodId = Some(vocabMax + 2L))
        .select(col("doc_id"),
          concat_ws(" ",
            transform(col("input_ids"), x => x.cast("string")))
            .as("ids_text"),
          col("n_tokens"), col("loss_from"))
        .orderBy("doc_id")
    }

    // PROMPT-LEFT TRUNCATION (r16): the q_sft_examples layout under
    // maxLen=32 with truncation=prompt_left — the published keep-end
    // convention: ids drop from the FRONT of the prompt side (the sep
    // marker at its tail survives) until prompt+response fit the
    // budget; the response and its loss mask are never cut, and an
    // example whose response side alone exceeds the budget drops. The
    // oracle replays the overflow arithmetic (ov = max(0, |p|+|r|-32),
    // ids = pfull[ov+1:] || rfull, loss_from = |pfull| - ov) over the
    // same side-tagged encode — both the truncated and the
    // response-too-long-drop populations are live on the corpus.
    r.reg("q_sft_truncate",
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |$sftSideCtes,
         |sftz AS (
         |  SELECT doc_id,
         |    list_concat(COALESCE(pids, []), [mx+1]) AS pfull,
         |    list_concat(rids, [mx+2]) AS rfull
         |  FROM sfta, sftm
         |  WHERE rids IS NOT NULL AND len(rids) >= 1),
         |sfty AS (
         |  SELECT doc_id, pfull, rfull,
         |    greatest(0, len(pfull) + len(rfull) - 32) AS ov
         |  FROM sftz WHERE len(rfull) <= 32)
         |SELECT doc_id,
         |  array_to_string(list_transform(
         |    list_concat(pfull[CAST(ov+1 AS INT):], rfull),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  CAST(len(pfull) - ov + len(rfull) AS BIGINT) AS n_tokens,
         |  CAST(len(pfull) - ov AS BIGINT) AS loss_from
         |FROM sfty
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val vocabMax = graft.llm.Bpe
        .vocabMap(s.table("g_pbpe_bpe_vocab")).values.max
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val pairs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 2)
        .withColumn("__np__", (size(col("__ws__")) / 2).cast("int"))
        .select(col("doc_id"),
          array_join(slice(col("__ws__"), lit(1), col("__np__")), " ")
            .as("prompt"),
          array_join(slice(col("__ws__"), col("__np__") + 1,
            size(col("__ws__")) - col("__np__")), " ").as("response"))
      graft.llm.Sft.assembleExamplesIndexed(s, "g_pbpe", idxPath, pairs,
          "doc_id", "prompt", "response",
          sepId = Some(vocabMax + 1L), eodId = Some(vocabMax + 2L),
          maxLen = Some(32L), truncation = "prompt_left")
        .select(col("doc_id"),
          concat_ws(" ",
            transform(col("input_ids"), x => x.cast("string")))
            .as("ids_text"),
          col("n_tokens"), col("loss_from"))
        .orderBy("doc_id")
    }

    // BINARY-LABELED (KTO) assembly (r16): the q_sft_examples layout
    // with the UNPAIRED desirable/undesirable bit riding through —
    // label = (doc_id % 3 = 0) makes both populations live; rows with
    // doc_id % 7 = 0 carry NULL labels and must drop (an unlabeled row
    // trains neither direction).
    r.reg("q_kto_pairs",
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |$sftSideCtes
         |SELECT doc_id,
         |  array_to_string(list_transform(
         |    list_concat(list_concat(list_concat(
         |      COALESCE(pids, []), [mx+1]), rids), [mx+2]),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  CAST(COALESCE(len(pids), 0) + len(rids) + 2 AS BIGINT)
         |    AS n_tokens,
         |  CAST(COALESCE(len(pids), 0) + 1 AS BIGINT) AS loss_from,
         |  (doc_id % 3 = 0) AS desirable
         |FROM sfta, sftm
         |WHERE rids IS NOT NULL AND len(rids) >= 1 AND doc_id % 7 <> 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val vocabMax = graft.llm.Bpe
        .vocabMap(s.table("g_pbpe_bpe_vocab")).values.max
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val rows = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 2)
        .withColumn("__np__", (size(col("__ws__")) / 2).cast("int"))
        .select(col("doc_id"),
          array_join(slice(col("__ws__"), lit(1), col("__np__")), " ")
            .as("prompt"),
          array_join(slice(col("__ws__"), col("__np__") + 1,
            size(col("__ws__")) - col("__np__")), " ").as("completion"),
          when(col("doc_id") % 7 === 0, lit(null).cast("boolean"))
            .otherwise(col("doc_id") % 3 === 0).as("label"))
      graft.llm.Sft.assembleBinaryPreference(s, "g_pbpe", idxPath, rows,
          "doc_id", "prompt", "completion", "label",
          sepId = Some(vocabMax + 1L), eodId = Some(vocabMax + 2L))
        .select(col("doc_id"),
          concat_ws(" ",
            transform(col("input_ids"), x => x.cast("string")))
            .as("ids_text"),
          col("n_tokens"), col("loss_from"), col("desirable"))
        .orderBy("doc_id")
    }

    // T5 SPAN CORRUPTION (r16 cont): the denoising pretraining
    // objective over per-doc id streams (first 200 ids, key = doc_id,
    // seed 0, span 3 / block 20, sentinelBase = mx+100). The oracle
    // replays the ENTIRE geometry in SQL: the two-round
    // xorshift-multiply per-(key, block) offset draw (>> as integer
    // ops), the per-block input splice (before-span ++ sentinel_k ++
    // after-span), the target stream (sentinel_k ++ span ids, closed
    // by the final sentinel), and the uncorrupted tail passthrough.
    r.reg("q_span_corrupt",
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |sc0 AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |  FROM documents WHERE doc_id < 100 AND text IS NOT NULL),
         |scw AS (
         |  SELECT doc_id, i, ws[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS i
         |        FROM sc0)),
         |sce AS (
         |  SELECT doc_id, i,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM scw),
         |sct AS (
         |  SELECT doc_id, i, CAST(j AS INT) AS j,
         |    etoks[CAST(j AS INT)] AS token
         |  FROM (SELECT doc_id, i, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM sce)),
         |sci AS (
         |  SELECT t.doc_id, t.i, t.j, COALESCE(v.token_id, -1) AS tid
         |  FROM sct t LEFT JOIN bvocab v USING (token)),
         |scm AS (SELECT CAST(max(token_id) AS BIGINT) AS mx FROM bvocab),
         |sca AS (
         |  SELECT doc_id, (list(tid ORDER BY i, j))[1:200] AS ids
         |  FROM sci GROUP BY doc_id),
         |scc AS (
         |  SELECT doc_id, ids, CAST(len(ids)//20 AS BIGINT) AS nb
         |  FROM sca WHERE len(ids) >= 1),
         |scb AS (
         |  SELECT doc_id, ids, blk,
         |    (xor(r2, r2 >> 13) * 2246822519) % 4294967296 % 18 AS o,
         |    mx
         |  FROM (
         |    SELECT doc_id, ids, blk, ((xor(s0, s0 >> 15) * 2654435761)
         |        % 4294967296) % 2147483648 AS r2, mx
         |    FROM (
         |      SELECT doc_id, ids,
         |        (doc_id % 2147483648 +
         |         (blk * 1779033703) % 2147483648) % 2147483648 AS s0,
         |        blk, mx
         |      FROM (SELECT doc_id, ids, unnest(range(0, nb)) AS blk
         |            FROM scc), scm))),
         |sck AS (
         |  SELECT doc_id, blk,
         |    list_concat(list_concat(
         |      ids[CAST(blk*20+1 AS INT):CAST(blk*20+o AS INT)],
         |      [CAST(mx+100-blk AS BIGINT)]),
         |      ids[CAST(blk*20+o+4 AS INT):CAST((blk+1)*20 AS INT)])
         |      AS inp_b,
         |    list_concat([CAST(mx+100-blk AS BIGINT)],
         |      ids[CAST(blk*20+o+1 AS INT):CAST(blk*20+o+3 AS INT)])
         |      AS tgt_b
         |  FROM scb),
         |scg AS (
         |  SELECT doc_id,
         |    flatten(list(inp_b ORDER BY blk)) AS inp,
         |    flatten(list(tgt_b ORDER BY blk)) AS tgt
         |  FROM sck GROUP BY doc_id)
         |SELECT d.doc_id,
         |  array_to_string(list_transform(
         |    list_concat(COALESCE(g.inp, []),
         |      d.ids[CAST(d.nb*20+1 AS INT):CAST(len(d.ids) AS INT)]),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  array_to_string(list_transform(
         |    list_concat(COALESCE(g.tgt, []),
         |      [CAST(mx+100-d.nb AS BIGINT)]),
         |    x -> CAST(x AS VARCHAR)), ' ') AS tgt_text,
         |  d.nb AS n_spans
         |FROM scc d LEFT JOIN scg g USING (doc_id), scm
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      ensurePbpeModel(s, dir)
      val merges = graft.llm.Bpe.mergeList(s.table("g_pbpe_bpe"))
      val vocab = graft.llm.Bpe.vocabMap(s.table("g_pbpe_bpe_vocab"))
      val mx = vocab.values.max
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .withColumn("__ids__", slice(flatten(transform(words, w =>
          graft.functions.TextHashExprs.bpeEncodeIds(w, merges, vocab,
            byteLevel = false))), 1, 200))
        .filter(size(col("__ids__")) >= 1)
        .select(col("doc_id"), col("__ids__"))
      graft.llm.Denoise.spanCorrupt(docs, "doc_id", "__ids__",
          sentinelBase = mx + 100L)
        .select(col("doc_id"),
          concat_ws(" ",
            transform(col("__ids__"), x => x.cast("string")))
            .as("ids_text"),
          concat_ws(" ",
            transform(col("target_ids"), x => x.cast("string")))
            .as("tgt_text"),
          col("n_spans"))
        .orderBy("doc_id")
    }

    // PREFIX-LM split (r16 cont): UL2's S-denoiser over the same
    // per-doc id streams — ONE deterministic cut c ∈ [1, n−1] drawn
    // from the shared two-round hash at draw index 0; input = ids[:c],
    // target = ids[c:]; both sides always non-empty. The oracle
    // replays the hash and the slice arithmetic exactly.
    r.reg("q_prefix_lm",
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |sc0 AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |  FROM documents WHERE doc_id < 100 AND text IS NOT NULL),
         |scw AS (
         |  SELECT doc_id, i, ws[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS i
         |        FROM sc0)),
         |sce AS (
         |  SELECT doc_id, i,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM scw),
         |sct AS (
         |  SELECT doc_id, i, CAST(j AS INT) AS j,
         |    etoks[CAST(j AS INT)] AS token
         |  FROM (SELECT doc_id, i, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM sce)),
         |sci AS (
         |  SELECT t.doc_id, t.i, t.j, COALESCE(v.token_id, -1) AS tid
         |  FROM sct t LEFT JOIN bvocab v USING (token)),
         |sca AS (
         |  SELECT doc_id, (list(tid ORDER BY i, j))[1:200] AS ids
         |  FROM sci GROUP BY doc_id),
         |scc AS (
         |  SELECT doc_id, ids, len(ids) AS n,
         |    (xor(r2, r2 >> 13) * 2246822519) % 4294967296
         |      % (len(ids) - 1) + 1 AS c
         |  FROM (
         |    SELECT doc_id, ids, ((xor(s0, s0 >> 15) * 2654435761)
         |        % 4294967296) % 2147483648 AS r2
         |    FROM (SELECT doc_id, ids,
         |            doc_id % 2147483648 AS s0
         |          FROM sca WHERE len(ids) >= 2)))
         |SELECT doc_id,
         |  array_to_string(list_transform(ids[1:CAST(c AS INT)],
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  array_to_string(list_transform(
         |    ids[CAST(c+1 AS INT):CAST(n AS INT)],
         |    x -> CAST(x AS VARCHAR)), ' ') AS tgt_text,
         |  CAST(c AS BIGINT) AS split_at
         |FROM scc
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      ensurePbpeModel(s, dir)
      val merges = graft.llm.Bpe.mergeList(s.table("g_pbpe_bpe"))
      val vocab = graft.llm.Bpe.vocabMap(s.table("g_pbpe_bpe_vocab"))
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .withColumn("__ids__", slice(flatten(transform(words, w =>
          graft.functions.TextHashExprs.bpeEncodeIds(w, merges, vocab,
            byteLevel = false))), 1, 200))
        .filter(size(col("__ids__")) >= 1)
        .select(col("doc_id"), col("__ids__"))
      graft.llm.Denoise.prefixLm(docs, "doc_id", "__ids__")
        .select(col("doc_id"),
          concat_ws(" ",
            transform(col("__ids__"), x => x.cast("string")))
            .as("ids_text"),
          concat_ws(" ",
            transform(col("target_ids"), x => x.cast("string")))
            .as("tgt_text"),
          col("split_at"))
        .orderBy("doc_id")
    }

    // BEST-OF-N / REJECTION SAMPLING (r16): the RFT selection shape —
    // N scored candidates per prompt, keep the top k at or above the
    // score floor, ranked (score DESC, cand_id ASC) so ties never flap.
    // Candidates derive from documents (three suffix-start variants of
    // each doc's response half; a deterministic mod-19 score makes ties
    // and sub-floor rejections live on the corpus); the oracle replays
    // the admission filter and the window rank exactly.
    r.reg("q_rft_best",
      s"""WITH c0 AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |  FROM documents WHERE doc_id < 400 AND text IS NOT NULL),
         |c1 AS (SELECT doc_id, len(ws) AS n,
         |    CAST(len(ws)//2 AS BIGINT) AS np
         |  FROM c0 WHERE len(ws) >= 2),
         |c2 AS (SELECT doc_id, j,
         |    doc_id * 3 + j AS cand_id,
         |    CAST((doc_id * 7 + j * 13) % 19 AS DOUBLE) AS score
         |  FROM (SELECT doc_id, np, n,
         |          CAST(unnest([0, 1, 2]) AS BIGINT) AS j FROM c1)
         |  WHERE np + 1 + j <= n),
         |c3 AS (SELECT doc_id, j, score,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cand_id ASC) - 1 AS BIGINT)
         |      AS cand_rank
         |  FROM c2 WHERE score >= 3.0)
         |SELECT doc_id, j, score, cand_rank FROM c3 WHERE cand_rank < 2
         |ORDER BY doc_id, cand_rank""".stripMargin) { (s, dir) =>
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val base = t(s, dir, "documents")
        .filter(col("doc_id") < 400 && col("text").isNotNull)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 2)
        .withColumn("__np__", (size(col("__ws__")) / 2).cast("long"))
      val cands = base
        .withColumn("j", explode(array(lit(0L), lit(1L), lit(2L))))
        .filter(col("__np__") + 1 + col("j") <= size(col("__ws__")))
        .withColumn("cand_id", col("doc_id") * 3 + col("j"))
        .withColumn("response", array_join(
          slice(col("__ws__"), (col("__np__") + 1 + col("j")).cast("int"),
            (size(col("__ws__")) - col("__np__") - col("j")).cast("int")),
          " "))
        .withColumn("score",
          ((col("doc_id") * 7 + col("j") * 13) % 19).cast("double"))
      graft.llm.Sft.bestOfN(cands, "doc_id", "cand_id", "score",
          k = 2, minScore = Some(3.0))
        .select(col("doc_id"), col("j"), col("score"), col("cand_rank"))
        .orderBy("doc_id", "cand_rank")
    }

    // PACKED SFT windows (r15 cont — the whole post-training chain
    // value-checked): assembled examples (the q_sft_examples layout,
    // maxLen=128) pack whole into fixed-shape 128-id windows via the
    // shared next-fit kernel. The oracle recomputes EVERYTHING —
    // training, vocab, the side-tagged example assembly, the seed-11
    // permutation rank, the 16-example-segment next-fit recurrence
    // (recursive CTE), dense window ids, padded arrays and the span
    // tiling — so a hash match proves the packed SFT artifact is
    // bit-identical end to end.
    r.reg("q_sft_pack", {
      val hv = "((((doc_id % 2147483648) + 2147483648) % 2147483648 + 11)" +
        " % 2147483648) * 2654435761 % 4294967296"
      s"""WITH RECURSIVE ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |$sftSideCtes,
         |spk0 AS (
         |  SELECT doc_id,
         |    list_concat(list_concat(list_concat(
         |      pids, [mx+1]), rids), [mx+2]) AS ids,
         |    CAST(len(pids) + len(rids) + 2 AS BIGINT) AS n
         |  FROM sfta, sftm
         |  WHERE rids IS NOT NULL AND len(rids) >= 1
         |    AND len(pids) + len(rids) + 2 <= 128),
         |spkr AS (SELECT doc_id, ids, n,
         |  row_number() OVER (ORDER BY $hv) AS rnk FROM spk0),
         |spks AS (SELECT doc_id, ids, n,
         |  CAST(floor((rnk-1)/16.0) AS BIGINT) AS seg,
         |  CAST((rnk-1)%16 AS BIGINT) AS pos FROM spkr),
         |spkk AS (
         |  SELECT seg, pos, doc_id, n,
         |         CAST(0 AS BIGINT) AS win, n AS fill
         |  FROM spks WHERE pos = 0
         |  UNION ALL
         |  SELECT c.seg, c.pos, c.doc_id, c.n,
         |    CASE WHEN k.fill + c.n <= 128 THEN k.win ELSE k.win + 1 END,
         |    CASE WHEN k.fill + c.n <= 128 THEN k.fill + c.n ELSE c.n END
         |  FROM spkk k JOIN spks c ON c.seg = k.seg AND c.pos = k.pos + 1),
         |spkw AS (SELECT seg, win,
         |         dense_rank() OVER (ORDER BY seg, win) - 1 AS window_id
         |        FROM (SELECT DISTINCT seg, win FROM spkk)),
         |spkm AS (SELECT k.doc_id, k.n, k.fill - k.n AS off, w.window_id
         |        FROM spkk k JOIN spkw w ON w.seg = k.seg AND w.win = k.win),
         |spkp AS (SELECT m.window_id, m.off, m.doc_id, m.n AS len, e.ids
         |        FROM spkm m JOIN spk0 e USING (doc_id)),
         |spkwin AS (SELECT window_id,
         |  flatten(list(ids ORDER BY off)) AS ids,
         |  string_agg(doc_id || ':' || off || ':' || len, ' ' ORDER BY off)
         |    AS spans_text,
         |  CAST(sum(len) AS BIGINT) AS n_tokens
         |  FROM spkp GROUP BY window_id)
         |SELECT window_id,
         |  array_to_string(list_transform(
         |    list_concat(ids, list_transform(range(0, 128 - n_tokens),
         |      x -> m.mx + 3)),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  spans_text, n_tokens
         |FROM spkwin, sftm m ORDER BY window_id""".stripMargin
    }) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val vocabMax = graft.llm.Bpe
        .vocabMap(s.table("g_pbpe_bpe_vocab")).values.max
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val pairs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 2)
        .withColumn("__np__", (size(col("__ws__")) / 2).cast("int"))
        .select(col("doc_id"),
          array_join(slice(col("__ws__"), lit(1), col("__np__")), " ")
            .as("prompt"),
          array_join(slice(col("__ws__"), col("__np__") + 1,
            size(col("__ws__")) - col("__np__")), " ").as("response"))
      val assembled = graft.llm.Sft.assembleExamplesIndexed(s, "g_pbpe",
        idxPath, pairs, "doc_id", "prompt", "response",
        sepId = Some(vocabMax + 1L), eodId = Some(vocabMax + 2L),
        maxLen = Some(128L))
      graft.llm.Sft.packExamples(assembled, "doc_id", "input_ids",
          windowSize = 128L, seed = 11L, padId = Some(vocabMax + 3L),
          segmentDocs = 16)
        .select(col("window_id"),
          concat_ws(" ",
            transform(col("window_ids"), x => x.cast("string")))
            .as("ids_text"),
          concat_ws(" ", transform(col("doc_spans"), sp =>
            concat_ws(":", sp.getField("id").cast("string"),
              sp.getField("pos").cast("string"),
              sp.getField("len").cast("string")))).as("spans_text"),
          col("n_tokens"))
        .orderBy("window_id")
    }

    // PREFERENCE PAIRS (r15 cont — the DPO/reward-model layout): one
    // prompt, two responses, both encoded against the SHARED prompt
    // prefix with one loss boundary. Pairs derive from documents
    // (first third of words = prompt, middle = chosen, rest =
    // rejected); the oracle side-tags each word 0/1/2 and re-derives
    // both id sequences, the structural ids and the shared boundary.
    r.reg("q_dpo_pairs",
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |dpo0 AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |  FROM documents WHERE doc_id < 100 AND text IS NOT NULL),
         |dpo1 AS (SELECT doc_id, ws,
         |    CAST(len(ws)//3 AS BIGINT) AS np,
         |    CAST(2*len(ws)//3 AS BIGINT) AS nc2
         |  FROM dpo0 WHERE len(ws) >= 3),
         |dpow AS (
         |  SELECT doc_id, i,
         |    CASE WHEN i <= np THEN 0 WHEN i <= nc2 THEN 1 ELSE 2 END AS side,
         |    ws[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, np, nc2, ws,
         |          unnest(range(1, len(ws)+1)) AS i FROM dpo1)),
         |dpoe AS (
         |  SELECT doc_id, i, side,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM dpow),
         |dpot AS (
         |  SELECT doc_id, i, side, CAST(j AS INT) AS j,
         |    etoks[CAST(j AS INT)] AS token
         |  FROM (SELECT doc_id, i, side, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM dpoe)),
         |dpoi AS (
         |  SELECT t.doc_id, t.i, t.side, t.j,
         |    COALESCE(v.token_id, -1) AS tid
         |  FROM dpot t LEFT JOIN bvocab v USING (token)),
         |dpom AS (SELECT CAST(max(token_id) AS BIGINT) AS mx FROM bvocab),
         |dpoa AS (
         |  SELECT doc_id,
         |    list(tid ORDER BY i, j) FILTER (WHERE side = 0) AS pids,
         |    list(tid ORDER BY i, j) FILTER (WHERE side = 1) AS cids,
         |    list(tid ORDER BY i, j) FILTER (WHERE side = 2) AS rids
         |  FROM dpoi GROUP BY doc_id)
         |SELECT doc_id,
         |  array_to_string(list_transform(
         |    list_concat(list_concat(list_concat(
         |      COALESCE(pids, []), [mx+1]), cids), [mx+2]),
         |    x -> CAST(x AS VARCHAR)), ' ') AS chosen_text,
         |  array_to_string(list_transform(
         |    list_concat(list_concat(list_concat(
         |      COALESCE(pids, []), [mx+1]), rids), [mx+2]),
         |    x -> CAST(x AS VARCHAR)), ' ') AS rejected_text,
         |  CAST(COALESCE(len(pids), 0) + len(cids) + 2 AS BIGINT) AS n_chosen,
         |  CAST(COALESCE(len(pids), 0) + len(rids) + 2 AS BIGINT) AS n_rejected,
         |  CAST(COALESCE(len(pids), 0) + 1 AS BIGINT) AS loss_from
         |FROM dpoa, dpom
         |WHERE cids IS NOT NULL AND len(cids) >= 1
         |  AND rids IS NOT NULL AND len(rids) >= 1
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val vocabMax = graft.llm.Bpe
        .vocabMap(s.table("g_pbpe_bpe_vocab")).values.max
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val pairs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 3)
        .withColumn("__np__", (size(col("__ws__")) / 3).cast("int"))
        .withColumn("__nc2__",
          (size(col("__ws__")) * 2 / 3).cast("int"))
        .select(col("doc_id"),
          array_join(slice(col("__ws__"), lit(1), col("__np__")), " ")
            .as("prompt"),
          array_join(slice(col("__ws__"), col("__np__") + 1,
            col("__nc2__") - col("__np__")), " ").as("chosen"),
          array_join(slice(col("__ws__"), col("__nc2__") + 1,
            size(col("__ws__")) - col("__nc2__")), " ").as("rejected"))
      graft.llm.Sft.assemblePreferencePairsIndexed(s, "g_pbpe", idxPath,
          pairs, "doc_id", "prompt", "chosen", "rejected",
          sepId = Some(vocabMax + 1L), eodId = Some(vocabMax + 2L))
        .select(col("doc_id"),
          concat_ws(" ",
            transform(col("chosen_ids"), x => x.cast("string")))
            .as("chosen_text"),
          concat_ws(" ",
            transform(col("rejected_ids"), x => x.cast("string")))
            .as("rejected_text"),
          col("n_chosen"), col("n_rejected"), col("loss_from"))
        .orderBy("doc_id")
    }

    // MULTI-TURN CONVERSATION SFT assembly (r16): each doc's words split
    // into four quarters form a [user, assistant, user, assistant]
    // conversation; the chat template opens each turn with its role id
    // (user mx+3, assistant mx+4), closes with the shared end id (mx+5),
    // and the document ends with eod (mx+6). Loss lands on assistant
    // turns only: span = (start of enc(content), |enc| + |suffix|), the
    // eod joining the LAST span (the final turn is an assistant turn).
    // The oracle recomputes the per-word encode on every quarter, the
    // template arithmetic, both spans, and the mask boundary exactly —
    // quarter boundaries are integer divisions, identical on both
    // engines at any magnitude.
    r.reg("q_sft_multiturn",
      s"""WITH ${bpeTrainCtes(8)},
         |$bpeVocabCtes,
         |mt0 AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |  FROM documents WHERE doc_id < 100 AND text IS NOT NULL),
         |mt1 AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n
         |  FROM mt0 WHERE len(ws) >= 4),
         |mtw AS (
         |  SELECT doc_id, i,
         |    CASE WHEN i <= n//4 THEN 1
         |         WHEN i <= n//2 THEN 2
         |         WHEN i <= (3*n)//4 THEN 3 ELSE 4 END AS q,
         |    ws[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, n, ws, unnest(range(1, len(ws)+1)) AS i
         |        FROM mt1)),
         |mte AS (
         |  SELECT doc_id, i, q,
         |    string_split(trim($bpeNestedSql), '  ') AS etoks
         |  FROM mtw),
         |mtt AS (
         |  SELECT doc_id, i, q, CAST(j AS INT) AS j,
         |    etoks[CAST(j AS INT)] AS token
         |  FROM (SELECT doc_id, i, q, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM mte)),
         |mti AS (
         |  SELECT t.doc_id, t.i, t.q, t.j,
         |    COALESCE(v.token_id, -1) AS tid
         |  FROM mtt t LEFT JOIN bvocab v USING (token)),
         |mtm AS (SELECT CAST(max(token_id) AS BIGINT) AS mx FROM bvocab),
         |mta AS (
         |  SELECT doc_id,
         |    list(tid ORDER BY i, j) FILTER (WHERE q = 1) AS q1,
         |    list(tid ORDER BY i, j) FILTER (WHERE q = 2) AS q2,
         |    list(tid ORDER BY i, j) FILTER (WHERE q = 3) AS q3,
         |    list(tid ORDER BY i, j) FILTER (WHERE q = 4) AS q4
         |  FROM mti GROUP BY doc_id)
         |SELECT doc_id,
         |  array_to_string(list_transform(
         |    [mx+3] || q1 || [mx+5] || [mx+4] || q2 || [mx+5] ||
         |    [mx+3] || q3 || [mx+5] || [mx+4] || q4 || [mx+5] || [mx+6],
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  CAST(len(q1)+len(q2)+len(q3)+len(q4) + 9 AS BIGINT) AS n_tokens,
         |  (CAST(len(q1)+3 AS VARCHAR) || ':' ||
         |   CAST(len(q2)+1 AS VARCHAR) || ' ' ||
         |   CAST(len(q1)+len(q2)+len(q3)+7 AS VARCHAR) || ':' ||
         |   CAST(len(q4)+2 AS VARCHAR)) AS spans_text,
         |  CAST(len(q1)+3 AS BIGINT) AS loss_from,
         |  CAST(4 AS BIGINT) AS n_turns
         |FROM mta, mtm
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val idxPath = ensurePbpeModel(s, dir)
      val mx = graft.llm.Bpe
        .vocabMap(s.table("g_pbpe_bpe_vocab")).values.max
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      def quarter(b0: org.apache.spark.sql.Column,
                  b1: org.apache.spark.sql.Column) =
        array_join(slice(col("__ws__"), (b0 + 1).cast("int"),
          (b1 - b0).cast("int")), " ")
      val convs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 4)
        .withColumn("__n__", size(col("__ws__")).cast("long"))
        .withColumn("__b1__", expr("__n__ div 4"))
        .withColumn("__b2__", expr("__n__ div 2"))
        .withColumn("__b3__", expr("(3 * __n__) div 4"))
        .select(col("doc_id"), array(
          struct(lit("user").as("role"),
            quarter(lit(0L), col("__b1__")).as("content")),
          struct(lit("assistant").as("role"),
            quarter(col("__b1__"), col("__b2__")).as("content")),
          struct(lit("user").as("role"),
            quarter(col("__b2__"), col("__b3__")).as("content")),
          struct(lit("assistant").as("role"),
            quarter(col("__b3__"), col("__n__")).as("content")))
          .as("turns"))
        // r16 optimization: the fixture is 100 conversations in one scan
        // split, and per-row assembly cost (4 per-turn encodes + the
        // template/span HOF chains) dominates — spread across cores so
        // the assembly isn't a single serial task (measured 2 × ~1.2 s
        // single-task evaluations: the terminal sort's range sampling
        // plus the real pass)
        .repartition(s.sparkContext.defaultParallelism)
      graft.llm.Sft.assembleConversationIndexed(s, "g_pbpe", idxPath,
          convs, "doc_id", "turns",
          graft.llm.Sft.chatTemplate(
            Map("user" -> (mx + 3L), "assistant" -> (mx + 4L)), mx + 5L),
          eodId = Some(mx + 6L))
        .select(col("doc_id"),
          concat_ws(" ",
            transform(col("input_ids"), x => x.cast("string")))
            .as("ids_text"),
          col("n_tokens"),
          concat_ws(" ", transform(col("loss_spans"), sp =>
            concat_ws(":", sp.getField("pos").cast("string"),
              sp.getField("len").cast("string")))).as("spans_text"),
          col("loss_from"), col("n_turns"))
        .orderBy("doc_id")
    }

    // IMPORTED pretrained tokenizer (r15): the persisted model built
    // from a hand-constructed PUBLISHED-style merges/vocab pair (the
    // GPT-2 merges.txt/vocab.json shape, alias surface forms decoded
    // through the public bytes_to_unicode table) instead of training —
    // the production-common case (most teams train under a published
    // tokenizer). The oracle carries the SAME literal pair: the 5
    // merges replay as a fixed replace chain over the spaced-hex byte
    // form, the vocab is 256 base byte rows + 5 literal merged rows,
    // and the served ids must hash-match bit-for-bit. The fixture doc
    // exercises full merges ('the', ' cat' → one id each), a partial
    // merge inside a longer word ('theft' → the,f,t), the leading-space
    // pre-tokenizer, and multibyte byte-split ('中' → three base ids).
    val impMerges = Seq(("74", "68"), ("7468", "65"), ("61", "74"),
      ("20", "63"), ("2063", "6174"))
    val impFixture = "the cat theft 中"
    def ensureImpModel(s: org.apache.spark.sql.SparkSession): String = {
      val qdir = graft.QHelp.qtmpDir("bpeimp")
      val p = qdir.getAbsolutePath
      val fresh = s.catalog.tableExists("g_impbpe_bpe") &&
        new java.io.File(qdir, "_graft_bpe_meta.json").isFile
      if (!fresh) {
        import s.implicits._
        val merges = Seq((0, "t", "h"), (1, "th", "e"), (2, "a", "t"),
          (3, "Ġ", "c"), (4, "Ġc", "at")).toDF("rank", "left", "right")
        val vocab = ((0 until 256).map(b =>
          (graft.llm.Bpe.gpt2AliasForByte(b), b.toLong)) ++
          Seq(("th", 256L), ("the", 257L), ("at", 258L), ("Ġc", 259L),
            ("Ġcat", 260L))).toDF("token", "token_id")
        graft.llm.Bpe.importBpeModel(s, merges, vocab, "g_impbpe", p,
          gpt2Alias = true)
      }
      p
    }
    r.reg("q_bpe_import", {
      val nested = impMerges.foldLeft(spacedBytesSql("w")) {
        case (acc, (l, rr)) =>
          s"replace($acc, ' $l  $rr ', ' $l$rr ')"
      }
      s"""WITH idocs AS (SELECT doc_id, text FROM documents
         |        WHERE doc_id < 100 AND text IS NOT NULL
         |        UNION ALL
         |        SELECT CAST(-8 AS BIGINT), '$impFixture'),
         |iwrd AS (
         |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id,
         |          regexp_extract_all(text, '$gpt2PatSql') AS toks,
         |          unnest(range(1, len(regexp_extract_all(text, '$gpt2PatSql'))+1)) AS i
         |        FROM idocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |ienc AS (
         |  SELECT doc_id, word_pos,
         |    string_split(trim($nested), '  ') AS etoks
         |  FROM iwrd),
         |itok AS (
         |  SELECT doc_id, word_pos, CAST(j - 1 AS INTEGER) AS tok_pos,
         |    etoks[CAST(j AS INTEGER)] AS token
         |  FROM (SELECT doc_id, word_pos, etoks,
         |          unnest(range(1, len(etoks)+1)) AS j FROM ienc)),
         |ivoc AS (
         |  SELECT lpad(upper(to_hex(r)), 2, '0') AS token,
         |         CAST(r AS BIGINT) AS token_id
         |  FROM range(256) t(r)
         |  UNION ALL
         |  SELECT token, token_id FROM (VALUES
         |    ('7468', CAST(256 AS BIGINT)), ('746865', 257),
         |    ('6174', 258), ('2063', 259), ('20636174', 260))
         |    AS v(token, token_id))
         |SELECT doc_id, word_pos, tok_pos,
         |  COALESCE(v.token_id, -1) AS token_id
         |FROM itok LEFT JOIN ivoc v USING (token)
         |ORDER BY doc_id, word_pos, tok_pos""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val path = ensureImpModel(s)
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .unionByName(Seq((-8L, impFixture)).toDF("doc_id", "text"))
      graft.llm.Bpe.encodeIdsIndexed(s, "g_impbpe", path, docs,
          "doc_id", "text")
        .orderBy("doc_id", "word_pos", "tok_pos")
    }

    // ------------------------------------------------------------------
    // Lexical retrieval (r13): BM25 ranked search + hybrid RRF fusion.
    // The oracle recomputes the ENTIRE scoring pipeline — tokenization,
    // postings, document frequencies, corpus stats, the per-term
    // log-free-idf BM25 score (every step IEEE correctly-rounded; see
    // Lexical's scaladoc for why ln() is not oracle-safe), the ordered
    // per-(query, doc) fold, and the ranked top-k — so scores are
    // hash-checked bit-for-bit, not just counted.

    r.reg("q_bm25_topk",
      s"""WITH ${bm25Ctes(bm25FixtureQueries)}
         |SELECT query_id, doc_id, n_terms, score, "rank"
         |FROM lranked WHERE "rank" <= 10
         |ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      Lexical.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        bm25QueryFrame(s), "qid", "qtext", k = 10)
    }

    // The PERSISTED index path must be transparent to results: build
    // the inverted index from the fixture, serve through the
    // bucket-pruned postings restriction, and hash-match the SAME CTE
    // chain as the one-shot oracle — tokenizer geometry from the stamp,
    // df over the restriction, stats from the doclens boundary.
    r.reg("q_bm25_indexed",
      s"""WITH ${bm25Ctes(bm25FixtureQueries)}
         |SELECT query_id, doc_id, n_terms, score, "rank"
         |FROM lranked WHERE "rank" <= 10
         |ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      // build-once-per-(JVM, sf dir) fixture (the q_ann_quantized_indexed
      // stamp pattern): the index is read-only for this query, so bench
      // passes time the SERVING shape — term InSet resolve +
      // bucket-pruned postings scan + stats fold — not index
      // construction. The catalog check matters: a fresh JVM inherits
      // the stamp file but not the table registrations.
      val qdir = graft.QHelp.qtmpDir("lexidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_lex_postings")
      if (!fresh) {
        Lexical.writeLexicalIndex(t(s, dir, "documents"), "doc_id", "text",
          "g_lex", idxPath)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      Lexical.bm25TopKIndexed(s, "g_lex", idxPath,
        bm25QueryFrame(s), "qid", "qtext", k = 10)
    }

    // The PRODUCTION hybrid: the lexical leg served from the PERSISTED
    // inverted index (the g_lex fixture above — bucket-pruned postings,
    // stats from the live doclens boundary) fused with the exact-cosine
    // run; must hash-match the SAME chain as the one-shot q_hybrid_rrf
    // — the persisted route is transparent through the fusion too.
    r.reg("q_hybrid_rrf_indexed",
      s"""WITH ${bm25Ctes("(CAST(0 AS BIGINT), 'spark window join')")},
         |${QueriesEmbed.dotCtes},
         |annrank AS (
         |  SELECT vec_id AS doc_id,
         |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS arank
         |  FROM cosines),
         |runs AS (
         |  SELECT query_id, doc_id, 'bm25' AS run,
         |    (CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST("rank" AS DOUBLE))) AS s
         |  FROM lranked WHERE "rank" <= 20
         |  UNION ALL
         |  SELECT CAST(0 AS BIGINT) AS query_id, doc_id, 'ann' AS run,
         |    (CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(arank AS DOUBLE))) AS s
         |  FROM annrank WHERE arank <= 20),
         |fused AS (
         |  SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_runs,
         |    list_sum(list(s ORDER BY run)) AS rrf_score
         |  FROM runs GROUP BY query_id, doc_id)
         |SELECT query_id, doc_id, n_runs, rrf_score, "rank" FROM (
         |  SELECT query_id, doc_id, n_runs, rrf_score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT) AS "rank"
         |  FROM fused)
         |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      import s.implicits._
      val qdir = graft.QHelp.qtmpDir("lexidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_lex_postings")
      if (!fresh) {
        Lexical.writeLexicalIndex(t(s, dir, "documents"), "doc_id", "text",
          "g_lex", idxPath)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      val oneQ = Seq((0L, "spark window join")).toDF("qid", "qtext")
      val bm25Run = Lexical.bm25TopKIndexed(s, "g_lex", idxPath, oneQ,
        "qid", "qtext", k = 20)
      val annW = org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("vec_id").asc)
      val annRun = Similarity.bruteForceTopK(t(s, dir, "embeddings"),
          "vec_id", "embedding", queryId = 0L, k = 20)
        .withColumn("rank", row_number().over(annW).cast("long"))
        .withColumn("query_id", lit(0L))
        .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
      Lexical.rrfFuse(
        Seq("ann" -> annRun,
          "bm25" -> bm25Run.select("query_id", "doc_id", "rank")),
        "query_id", "doc_id", "rank", k = 10)
    }

    // Hybrid lexical+vector retrieval: the BM25 run over `documents`
    // and the exact-cosine run over `embeddings` (the two fixtures
    // share the 0..N id domain) fused by reciprocal rank — integer
    // ranks, one correctly-rounded division per contribution, ordered
    // fold by run tag, so the fusion is hash-checked end to end.
    r.reg("q_hybrid_rrf",
      s"""WITH ${bm25Ctes("(CAST(0 AS BIGINT), 'spark window join')")},
         |${QueriesEmbed.dotCtes},
         |annrank AS (
         |  SELECT vec_id AS doc_id,
         |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS arank
         |  FROM cosines),
         |runs AS (
         |  SELECT query_id, doc_id, 'bm25' AS run,
         |    (CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST("rank" AS DOUBLE))) AS s
         |  FROM lranked WHERE "rank" <= 20
         |  UNION ALL
         |  SELECT CAST(0 AS BIGINT) AS query_id, doc_id, 'ann' AS run,
         |    (CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(arank AS DOUBLE))) AS s
         |  FROM annrank WHERE arank <= 20),
         |fused AS (
         |  SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_runs,
         |    list_sum(list(s ORDER BY run)) AS rrf_score
         |  FROM runs GROUP BY query_id, doc_id)
         |SELECT query_id, doc_id, n_runs, rrf_score, "rank" FROM (
         |  SELECT query_id, doc_id, n_runs, rrf_score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT) AS "rank"
         |  FROM fused)
         |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin) { (s, dir) =>
      import s.implicits._
      val oneQ = Seq((0L, "spark window join")).toDF("qid", "qtext")
      val bm25Run = Lexical.bm25TopK(t(s, dir, "documents"), "doc_id",
        "text", oneQ, "qid", "qtext", k = 20)
      val annW = org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("vec_id").asc)
      val annRun = Similarity.bruteForceTopK(t(s, dir, "embeddings"),
          "vec_id", "embedding", queryId = 0L, k = 20)
        .withColumn("rank", row_number().over(annW).cast("long"))
        .withColumn("query_id", lit(0L))
        .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
      Lexical.rrfFuse(
        Seq("ann" -> annRun,
          "bm25" -> bm25Run.select("query_id", "doc_id", "rank")),
        "query_id", "doc_id", "rank", k = 10)
    }

    // ------------------------------------------------------------------
    // UNIGRAM-LM tokenizer (Kudo 2018 — the SECOND tokenizer family,
    // SentencePiece-unigram shape). Three value-checked surfaces:
    //
    //  q_unigram_seed   — the seed-candidate substring counts over the
    //                     real corpus (exact string + integer SQL).
    //  q_unigram_em     — the EM E-step lattice sums under a DYADIC
    //                     literal model: every probability is a power
    //                     of two, so every path product, forward/
    //                     backward sum and occupancy numerator is an
    //                     EXACT double on both engines — the DuckDB
    //                     path-enumeration replay (recursive CTE over
    //                     all segmentations) matches bit-for-bit with
    //                     zero float tolerance, proving the lattice
    //                     forward-backward against the path-sum
    //                     identity it implements.
    //  q_unigram_encode — fixed-point Viterbi segmentation of the real
    //                     corpus's word types under a literal micro-nat
    //                     model: scores are BIGINT sums, so the replay
    //                     (enumerate every segmentation incl. the OOV
    //                     single-char fallback, rank by score DESC,
    //                     n_pieces ASC, piece-length list DESC) must
    //                     reproduce ids, score and piece count exactly.

    r.reg("q_unigram_seed",
      """WITH wt AS (
        |  SELECT w AS word, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL) s
        |  WHERE w <> '' GROUP BY 1 HAVING count(*) >= 2),
        |subs AS (
        |  SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece, cnt
        |  FROM (SELECT word, cnt, unnest(range(1, length(word)+1)) AS i FROM wt) a,
        |       (SELECT unnest(range(1, 4)) AS l) b
        |  WHERE CAST(i AS BIGINT) + CAST(l AS BIGINT) - 1 <= length(word))
        |SELECT piece, CAST(sum(cnt) AS BIGINT) AS seed_count
        |FROM subs GROUP BY 1
        |ORDER BY seed_count DESC, piece LIMIT 300""".stripMargin) { (s, dir) =>
      graft.llm.Unigram.seedCandidates(t(s, dir, "documents"), "text",
          maxPieceLen = 3, minWordCount = 2L)
        .orderBy(col("seed_count").desc, col("piece").asc)
        .limit(300)
    }

    // literal dyadic E-step model + words (mirrored verbatim in SQL)
    val uniEmModel = Seq(("a", 0L, 0.25), ("ab", 1L, 0.5),
      ("b", 2L, 0.125), ("bc", 3L, 0.25), ("c", 4L, 0.0625))
    val uniEmWords = Seq("ab", "abc", "bab", "ca", "aab", "zzz")

    r.reg("q_unigram_em",
      s"""WITH RECURSIVE pieces(piece, pid, p) AS (
         |  SELECT * FROM (VALUES ('a', CAST(0 AS BIGINT), CAST(0.25 AS DOUBLE)),
         |    ('ab', 1, 0.5), ('b', 2, 0.125), ('bc', 3, 0.25),
         |    ('c', 4, 0.0625)) v),
         |words(word) AS (SELECT * FROM (VALUES
         |  ${uniEmWords.map(w => s"('$w')").mkString(", ")}) w),
         |paths(word, pos, w, pids) AS (
         |  SELECT word, 0, CAST(1.0 AS DOUBLE), CAST([] AS BIGINT[]) FROM words
         |  UNION ALL
         |  SELECT p.word, p.pos + length(pc.piece), p.w * pc.p,
         |    list_append(p.pids, pc.pid)
         |  FROM paths p JOIN pieces pc
         |    ON p.pos < length(p.word)
         |   AND substr(p.word, p.pos + 1, length(pc.piece)) = pc.piece),
         |fp AS (SELECT * FROM paths WHERE pos = length(word)),
         |z AS (SELECT word, sum(w) AS z FROM fp GROUP BY 1),
         |occ AS (SELECT word, unnest(pids) AS pid, w FROM fp),
         |numer AS (SELECT word, pid, sum(w) AS numer FROM occ GROUP BY 1, 2)
         |SELECT n.word, n.pid AS piece_id, n.numer, z.z
         |FROM numer n JOIN z USING (word)
         |ORDER BY word, piece_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // doubles compare bit-for-bit here BECAUSE the fixture is dyadic:
      // every path product and lattice sum is exact in IEEE double, so
      // forward-backward (Spark) == path enumeration (DuckDB) with no
      // decimal mediation needed
      graft.llm.Unigram.eStepFrame(uniEmWords.toDF("w"), "w", uniEmModel)
        .select(col("word"), explode(col("parts")).as("p"), col("z"))
        .select(col("word"), col("p.pid").as("piece_id"),
          col("p.numer").as("numer"), col("z"))
        .orderBy("word", "piece_id")
    }

    // literal micro-nat Viterbi model over the corpus vocabulary's
    // common fragments; several code points are deliberately absent so
    // the OOV single-char fallback is exercised on real words
    val uniVitModel: Seq[(String, Long, Long)] = Seq(
      ("a", 0L, -2400000L), ("an", 1L, -3600000L), ("ble", 2L, -5200000L),
      ("d", 3L, -2900000L), ("dow", 4L, -5600000L), ("e", 5L, -2300000L),
      ("er", 6L, -3200000L), ("he", 7L, -3300000L), ("in", 8L, -3500000L),
      ("me", 9L, -3900000L), ("n", 10L, -2700000L), ("o", 11L, -2500000L),
      ("or", 12L, -3400000L), ("r", 13L, -2600000L), ("rge", 14L, -5400000L),
      ("s", 15L, -2450000L), ("scan", 16L, -6100000L), ("sort", 17L, -6200000L),
      ("st", 18L, -3100000L), ("t", 19L, -2350000L), ("ta", 20L, -3700000L),
      ("th", 21L, -3000000L), ("win", 22L, -5000000L))

    // The Viterbi path-enumeration replay over a `wt(word, …)` CTE —
    // the lattice argmax recomputed by enumerating EVERY segmentation
    // (vocab edges + the per-code-point OOV fallback) and ranking by
    // (score DESC, n_pieces ASC, piece-length list DESC), shared by
    // all four unigram oracles so the tie-break can never diverge
    // between them. `idsStep` parameterizes the ids accumulation (the
    // byte-fallback oracle expands OOV edges to UTF-8 byte ids).
    // Emits `ubest(word, score, np, ids)`.
    def uniModelValues(model: Seq[(String, Long, Long)]): String =
      model.map { case (p, id, lp) =>
        s"('$p', CAST($id AS BIGINT), CAST($lp AS BIGINT))" }
        .mkString(", ")
    def uniPathCtes(idsStep: String = "list_append(p.ids, u.pid)",
                    modelValues: String = uniModelValues(uniVitModel)): String =
      s"""up(piece, pid, lp) AS (SELECT * FROM (VALUES
         |  $modelValues) v),
         |ext AS (SELECT piece, pid, lp, length(piece) AS plen FROM up
         |        UNION ALL
         |        SELECT NULL, CAST(-1 AS BIGINT),
         |          CAST(-100000000 AS BIGINT), 1),
         |paths(word, pos, score, np, ids, lens) AS (
         |  SELECT word, 0, CAST(0 AS BIGINT), 0,
         |    CAST([] AS BIGINT[]), CAST([] AS INTEGER[]) FROM wt
         |  UNION ALL
         |  SELECT p.word, p.pos + u.plen, p.score + u.lp, p.np + 1,
         |    $idsStep, list_append(p.lens, u.plen)
         |  FROM paths p JOIN ext u
         |    ON p.pos < length(p.word)
         |   AND (u.pid = -1 OR substr(p.word, p.pos + 1, u.plen) = u.piece)),
         |fp AS (SELECT * FROM paths WHERE pos = length(word)),
         |ubest AS (SELECT word, score, np, ids FROM (
         |  SELECT word, score, np, ids, row_number() OVER (PARTITION BY word
         |    ORDER BY score DESC, np ASC, lens DESC) AS rn FROM fp)
         |  WHERE rn = 1)""".stripMargin

    r.reg("q_unigram_encode",
      s"""WITH RECURSIVE wt AS (
         |  SELECT w AS word, count(*) AS cnt FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w
         |    FROM documents WHERE text IS NOT NULL) s
         |  WHERE w <> '' AND length(w) <= 12
         |  GROUP BY 1 ORDER BY cnt DESC, word LIMIT 1000),
         |${uniPathCtes()}
         |SELECT word, array_to_string(ids, ',') AS ids_csv,
         |  score AS score_micro, CAST(np AS BIGINT) AS n_pieces
         |FROM ubest ORDER BY word""".stripMargin) { (s, dir) =>
      val types = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ", -1)).as("word"))
        .filter(length(col("word")) >= 1 && length(col("word")) <= 12)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc).limit(1000)
      types.select(col("word"),
          graft.functions.TextHashExprs
            .unigramSegment(col("word"), uniVitModel).as("sg"))
        .select(col("word"),
          concat_ws(",", transform(col("sg.ids"), i => i.cast("string")))
            .as("ids_csv"),
          col("sg.score_micro").as("score_micro"),
          col("sg.n_pieces").cast("long").as("n_pieces"))
        .orderBy("word")
    }

    // METASPACE pre-tokenization (r16 — the published SentencePiece ▁
    // convention of the T5/LLaMA-class releases): the stamp-applied
    // transform prepends ▁ and turns every space into ▁, words are the
    // ▁-initiated runs (runs of spaces → lone-▁ words), and the model's
    // ▁-prefixed piece surfaces match verbatim. The oracle replays the
    // transform ('▁' || replace(text, ' ', '▁')), the run extraction,
    // and the SAME Viterbi path enumeration under a literal ▁-style
    // model; a planted doc with leading/double/triple spaces makes the
    // lone-▁ behavior live. Serving goes END TO END through the stamp
    // (importUnigramModel(metaspace = true) → encodeIdsIndexed).
    val uniMsModel: Seq[(String, Long, Long)] = Seq(
      ("▁", 0L, -2000000L), ("▁the", 1L, -4000000L), ("▁s", 2L, -3000000L),
      ("▁w", 3L, -3100000L), ("▁b", 4L, -3200000L), ("a", 5L, -2400000L),
      ("t", 6L, -2350000L), ("e", 7L, -2300000L), ("n", 8L, -2700000L),
      ("r", 9L, -2600000L), ("o", 10L, -2500000L), ("c", 11L, -2550000L),
      ("an", 12L, -3500000L), ("ort", 13L, -5000000L),
      ("in", 14L, -3400000L), ("d", 15L, -2900000L))
    def ensureUniMsModel(s: org.apache.spark.sql.SparkSession,
                         dir: String): String = {
      val qdir = graft.QHelp.qtmpDir("unims")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_pums_uni")
      if (!fresh) {
        import s.implicits._
        graft.llm.Unigram.importUnigramModel(s,
          uniMsModel.map { case (p, id, lp) => (p, lp.toDouble / 1e6, id) }
            .toDF("piece", "logp", "piece_id"),
          "g_pums", idxPath, metaspace = true)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      idxPath
    }
    r.reg("q_unigram_metaspace",
      s"""WITH RECURSIVE edocs AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id < 60 AND text IS NOT NULL
         |  UNION ALL SELECT CAST(-7 AS BIGINT), ' scan  sort   batch'),
         |dtx AS (SELECT doc_id,
         |  CASE WHEN text = '' THEN ''
         |       ELSE '▁' || replace(text, ' ', '▁') END AS t FROM edocs),
         |ewrd AS (
         |  SELECT doc_id, CAST(i - 1 AS INT) AS word_pos,
         |    toks[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, regexp_extract_all(t, '▁[^▁]*') AS toks,
         |          unnest(range(1,
         |            len(regexp_extract_all(t, '▁[^▁]*'))+1)) AS i
         |        FROM dtx)),
         |wt AS (SELECT DISTINCT w AS word FROM ewrd),
         |${uniPathCtes(modelValues = uniModelValues(uniMsModel))},
         |eid AS (SELECT e.doc_id, e.word_pos, b.ids
         |  FROM ewrd e JOIN ubest b ON e.w = b.word)
         |SELECT doc_id, word_pos, CAST(j - 1 AS INT) AS tok_pos,
         |  ids[CAST(j AS INT)] AS token_id
         |FROM (SELECT doc_id, word_pos, ids,
         |        unnest(range(1, len(ids)+1)) AS j FROM eid)
         |ORDER BY doc_id, word_pos, tok_pos""".stripMargin) { (s, dir) =>
      import s.implicits._
      val idxPath = ensureUniMsModel(s, dir)
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") < 60 && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .unionByName(Seq((-7L, " scan  sort   batch"))
          .toDF("doc_id", "text"))
      graft.llm.Unigram.encodeIdsIndexed(s, "g_pums", idxPath, docs,
          "doc_id", "text")
        .select(col("doc_id"), col("word_pos").cast("int").as("word_pos"),
          col("tok_pos").cast("int").as("tok_pos"), col("token_id"))
        .orderBy("doc_id", "word_pos", "tok_pos")
    }

    // Unigram token-ID training windows: the full chop assembly under
    // the literal Viterbi model — per-word argmax segmentation (path
    // enumeration + the documented tie-break), per-doc id concatenation
    // + one EOD id (23 — outside the 0..22 piece ids), the seed-5
    // Knuth-hash permutation, exclusive-cumsum offsets, and the
    // boundary-straddling membership/tiling formulas, all recomputed in
    // SQL — proving the tokenizer SWITCH lands id windows with the same
    // oracle-pinned chop semantics as the BPE family.
    r.reg("q_unigram_windows", {
      val hv = "((((doc_id % 2147483648) + 2147483648) % 2147483648 + 5)" +
        " % 2147483648) * 2654435761 % 4294967296"
      s"""WITH RECURSIVE edocs AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id < 100 AND text IS NOT NULL),
         |ewrd AS (
         |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM edocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |wt AS (SELECT DISTINCT w AS word FROM ewrd),
         |${uniPathCtes()},
         |eid AS (SELECT e.doc_id, e.word_pos, b.ids
         |  FROM ewrd e JOIN ubest b ON e.w = b.word),
         |edoc AS (
         |  SELECT d.doc_id,
         |    list_append(COALESCE(g.ids0, CAST([] AS BIGINT[])),
         |      CAST(23 AS BIGINT)) AS ids
         |  FROM (SELECT DISTINCT doc_id FROM edocs) d
         |  LEFT JOIN (SELECT doc_id,
         |      flatten(list(ids ORDER BY word_pos)) AS ids0
         |    FROM eid GROUP BY doc_id) g USING (doc_id)),
         |edn AS (SELECT doc_id, ids, CAST(len(ids) AS BIGINT) AS n FROM edoc),
         |ecu AS (SELECT doc_id, ids, n,
         |  CAST(sum(n) OVER (ORDER BY $hv
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start
         |  FROM edn),
         |eww AS (SELECT doc_id, ids, n, start,
         |  CAST(floor(start/60.0) AS BIGINT) AS wf,
         |  CASE WHEN n > 0 THEN CAST(floor((start+n-1)/60.0) AS BIGINT)
         |       ELSE CAST(floor(start/60.0) AS BIGINT) END AS wl
         |  FROM ecu),
         |erg AS (SELECT unnest(range(0,
         |  (SELECT CAST(ceil(sum(n)/60.0) AS BIGINT) + 1 FROM edn))) AS window_id),
         |emem AS (SELECT w.doc_id, r.window_id,
         |  GREATEST(r.window_id*60 - w.start, 0) AS f,
         |  LEAST((r.window_id+1)*60 - w.start, w.n) AS t2,
         |  GREATEST(w.start - r.window_id*60, 0) AS pos, w.ids
         |  FROM eww w JOIN erg r ON r.window_id BETWEEN w.wf AND w.wl),
         |eprt AS (SELECT doc_id, window_id, pos,
         |  ids[CAST(f+1 AS INT):CAST(t2 AS INT)] AS part, t2 - f AS len
         |  FROM emem WHERE t2 > f)
         |SELECT window_id,
         |  array_to_string(list_transform(flatten(list(part ORDER BY pos)),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  string_agg(doc_id || ':' || pos || ':' || len, ' ' ORDER BY pos)
         |    AS spans_text,
         |  CAST(sum(len) AS BIGINT) AS n_tokens
         |FROM eprt GROUP BY window_id
         |ORDER BY window_id""".stripMargin
    }) { (s, dir) =>
      graft.llm.Unigram.assembleWindowsIds(
          t(s, dir, "documents")
            .filter(col("doc_id") < 100 && col("text").isNotNull)
            .select(col("doc_id"), col("text")),
          "doc_id", "text", windowSize = 60L, seed = 5L, uniVitModel,
          eodId = Some(23L), withDocSpans = true)
        .select(col("window_id"),
          concat_ws(" ",
            transform(col("window_ids"), x => x.cast("string")))
            .as("ids_text"),
          concat_ws(" ", transform(col("doc_spans"), sp =>
            concat_ws(":", sp.getField("id").cast("string"),
              sp.getField("pos").cast("string"),
              sp.getField("len").cast("string")))).as("spans_text"),
          col("n_tokens"))
        .orderBy("window_id")
    }

    // Unigram tokenizer fertility / OOV per language — the same
    // metric as q_bpe_fertility under the SECOND tokenizer family:
    // every word's Viterbi segmentation replayed by path enumeration
    // (integer micro-nat scores — zero float tolerance), masses
    // outer-joined against the group universe so a planted ZERO-WORD
    // group ('zz', empty text) is value-checked rather than avoided by
    // fixture luck (the r14 ADVICE lesson), and a planted unseen-script
    // doc ('xx') makes the OOV share non-vacuous.
    r.reg("q_unigram_fertility",
      s"""WITH RECURSIVE fdocs AS (
         |  SELECT doc_id, lang, text FROM documents
         |  WHERE doc_id < 100 AND text IS NOT NULL
         |  UNION ALL SELECT CAST(-8 AS BIGINT), 'xx', 'øøø foo the'
         |  UNION ALL SELECT CAST(-9 AS BIGINT), 'zz', ''),
         |fgrp AS (SELECT DISTINCT lang FROM fdocs),
         |fwrd AS (
         |  SELECT lang, toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT lang, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM fdocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |wt AS (SELECT DISTINCT w AS word FROM fwrd),
         |${uniPathCtes()},
         |fcnt AS (SELECT f.lang, b.np,
         |    len(list_filter(b.ids, x -> x < 0)) AS oov
         |  FROM fwrd f JOIN ubest b ON f.w = b.word),
         |fw AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words
         |       FROM fwrd GROUP BY lang),
         |ft AS (SELECT lang, CAST(sum(np) AS BIGINT) AS n_tokens,
         |        CAST(sum(oov) AS BIGINT) AS n_oov
         |       FROM fcnt GROUP BY lang)
         |SELECT lang,
         |  COALESCE(n_words, 0) AS n_words,
         |  COALESCE(n_tokens, 0) AS n_tokens,
         |  COALESCE(n_oov, 0) AS n_oov,
         |  CASE WHEN COALESCE(n_words, 0) = 0 THEN NULL
         |       ELSE CAST(COALESCE(n_tokens, 0) AS DOUBLE)
         |            / COALESCE(n_words, 0) END AS fertility,
         |  CASE WHEN COALESCE(n_tokens, 0) = 0 THEN NULL
         |       ELSE CAST(COALESCE(n_oov, 0) AS DOUBLE)
         |            / COALESCE(n_tokens, 0) END AS oov_rate
         |FROM fgrp LEFT JOIN fw USING (lang) LEFT JOIN ft USING (lang)
         |ORDER BY lang""".stripMargin) { (s, dir) =>
      val extra = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row("xx", "øøø foo the"),
          org.apache.spark.sql.Row("zz", "")),
        StructType(Seq(StructField("lang", StringType),
          StructField("text", StringType))))
      val fdocs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .select("lang", "text").unionByName(extra)
      graft.llm.Unigram.fertilityReportWith(fdocs, "text", "lang",
          uniVitModel)
        .orderBy("lang")
    }

    // Unigram BYTE FALLBACK (the published SentencePiece byte_fallback
    // — the LLaMA-class tokenizer shape): uncovered code points emit
    // their UTF-8 BYTE ids (100 + byte here) instead of -1, so the id
    // stream is lossless on any script. The lattice is unchanged (one
    // OovMicro edge per uncovered code point; expansion at emission),
    // which the oracle proves by replaying the SAME path enumeration
    // and expanding the OOV edges to byte ids computed from hex() by
    // pure string arithmetic — covered words' ids are bit-identical to
    // q_unigram_encode's. Planted multibyte words ('héé': 2-byte é;
    // '中中': 3-byte CJK; 'z𝄞a': 4-byte non-BMP between two covered-
    // alphabet letters) make the multi-byte expansion non-vacuous.
    r.reg("q_unigram_bytefallback", {
      val ch = "substr(p.word, CAST(p.pos + 1 AS INT), 1)"
      val hexDig = (o: Int) =>
        s"(strpos('0123456789ABCDEF', substr(hex(encode($ch)), CAST(2*j+$o AS INT), 1)) - 1)"
      val byteList =
        s"""list_transform(range(0, length(hex(encode($ch))) // 2),
           |      j -> CAST(100 + ${hexDig(1)} * 16 + ${hexDig(2)} AS BIGINT))""".stripMargin
      s"""WITH RECURSIVE wt AS (
         |  SELECT DISTINCT word FROM (
         |    SELECT w AS word FROM (
         |      SELECT w, count(*) AS cnt FROM (
         |        SELECT unnest(string_split(text, ' ')) AS w
         |        FROM documents WHERE text IS NOT NULL) s
         |      WHERE w <> '' AND length(w) <= 12
         |      GROUP BY 1 ORDER BY cnt DESC, w LIMIT 1000)
         |    UNION ALL SELECT * FROM (VALUES ('héé'), ('中中'), ('z𝄞a')) v(word))),
         |${uniPathCtes(
             s"""CASE WHEN u.pid = -1 THEN list_concat(p.ids, $byteList)
                |         ELSE list_append(p.ids, u.pid) END""".stripMargin)}
         |SELECT word, array_to_string(ids, ',') AS ids_csv,
         |  score AS score_micro, CAST(len(ids) AS BIGINT) AS n_pieces
         |FROM ubest ORDER BY word""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val byteIds: IndexedSeq[Long] = (0 until 256).map(b => 100L + b)
      val types = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ", -1)).as("word"))
        .filter(length(col("word")) >= 1 && length(col("word")) <= 12)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc).limit(1000)
        .select("word")
        .unionByName(Seq("héé", "中中", "z𝄞a").toDF("word"))
        .distinct()
      types.select(col("word"),
          graft.functions.TextHashExprs
            .unigramSegment(col("word"), uniVitModel, Some(byteIds))
            .as("sg"))
        .select(col("word"),
          concat_ws(",", transform(col("sg.ids"), i => i.cast("string")))
            .as("ids_csv"),
          col("sg.score_micro").as("score_micro"),
          col("sg.n_pieces").cast("long").as("n_pieces"))
        .orderBy("word")
    }

    // Pretrained unigram import — the full published path value-checked:
    // a SentencePiece-style vocabulary TSV (piece<TAB>logp, id = line
    // number, '▁'-prefixed surfaces) is WRITTEN as a file, read back by
    // readSentencePieceTsv, imported as the persisted stamped model, and
    // the landed table compared against the literal replay. The logp
    // values are DYADIC so logp and round(logp·1e6) are exact on both
    // engines (prob = exp(logp) is engine-libm and deliberately not
    // compared; serving runs on logp_micro, which is).
    r.reg("q_unigram_import",
      """WITH up(piece, logp, piece_id) AS (SELECT * FROM (VALUES
        |  ('▁the', CAST(-1.0 AS DOUBLE), CAST(0 AS BIGINT)),
        |  ('▁a', -1.5, 1), ('t', -2.25, 2), ('he', -2.5, 3),
        |  ('▁', -3.5, 4), ('▁scan', -4.75, 5)) v)
        |SELECT piece_id, piece, logp,
        |  CAST(round(logp * 1e6) AS BIGINT) AS logp_micro
        |FROM up ORDER BY piece_id""".stripMargin) { (s, dir) =>
      val qdir = graft.QHelp.qtmpDir("uniimp")
      qdir.mkdirs()
      val tsv = new java.io.File(qdir, "vocab.tsv")
      java.nio.file.Files.write(tsv.toPath,
        "▁the\t-1.0\n▁a\t-1.5\nt\t-2.25\nhe\t-2.5\n▁\t-3.5\n▁scan\t-4.75\n"
          .getBytes("UTF-8"))
      if (!s.catalog.tableExists("g_puni_uni"))
        graft.llm.Unigram.importUnigramModel(s,
          graft.llm.Unigram.readSentencePieceTsv(s, tsv.getAbsolutePath),
          "g_puni", qdir.getAbsolutePath)
      s.table("g_puni_uni")
        .select(col("piece_id"), col("piece"), col("logp"),
          col("logp_micro"))
        .orderBy("piece_id")
    }

    // ------------------------------------------------------------------
    // LENGTH-BUCKETED batch assembly (Sft.bucketByLength) — the
    // dynamic-batching layout for loss shapes that cannot pack: bucket
    // capacity = smallest boundary holding the example, a deterministic
    // Knuth-hash shuffle within buckets, dense global batch ids,
    // per-batch positions and pad accounting, all recomputed in SQL
    // (global rank in (cap, hash, key) order, bucket/batch prefix
    // offsets, integer div/mod). batchSize 7 forces partial final
    // batches; the report oracle runs dropIncomplete=true so the
    // full-batch filter is value-checked too.
    val sftBucketSql = """WITH ex AS (
      |  SELECT doc_id AS id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
      |  FROM documents WHERE text IS NOT NULL),
      |cap AS (SELECT id, n,
      |  CASE WHEN n <= 16 THEN CAST(16 AS BIGINT) WHEN n <= 32 THEN 32
      |       WHEN n <= 64 THEN 64 ELSE 128 END AS bucket_cap
      |  FROM ex),
      |h AS (SELECT *, ((((id % 2147483648) + 2147483648) % 2147483648 + 5)
      |        % 2147483648) * 2654435761 % 4294967296 AS hv FROM cap),
      |rk AS (SELECT *, row_number() OVER (ORDER BY bucket_cap, hv, id) - 1 AS grk
      |       FROM h),
      |cnt AS (SELECT bucket_cap, count(*) AS c FROM cap GROUP BY 1),
      |boff AS (SELECT bucket_cap, c,
      |  COALESCE(sum(c) OVER (ORDER BY bucket_cap
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
      |  COALESCE(sum(CAST(ceil(c / 7.0) AS BIGINT)) OVER (ORDER BY bucket_cap
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boffs
      |  FROM cnt),
      |asg AS (SELECT r.id, r.n, r.bucket_cap, b.c, b.boffs,
      |    r.grk - b.off AS rib
      |  FROM rk r JOIN boff b USING (bucket_cap))""".stripMargin

    r.reg("q_sft_buckets",
      s"""$sftBucketSql
         |SELECT id, n, bucket_cap,
         |  CAST(boffs + rib // 7 AS BIGINT) AS batch_id,
         |  CAST(rib % 7 AS BIGINT) AS pos_in_batch,
         |  bucket_cap - n AS pad
         |FROM asg ORDER BY id""".stripMargin) { (s, dir) =>
      val ex = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id").as("id"),
          size(filter(split(col("text"), " ", -1), w => length(w) >= 1))
            .cast("long").as("n"))
      graft.llm.Sft.bucketByLength(ex, "id", "n",
          boundaries = Seq(16L, 32L, 64L, 128L), batchSize = 7, seed = 5L)
        .orderBy("id")
    }

    r.reg("q_sft_bucket_report",
      s"""$sftBucketSql,
         |kept AS (SELECT * FROM asg WHERE rib // 7 < c // 7)
         |SELECT bucket_cap,
         |  CAST(count(*) AS BIGINT) AS n_examples,
         |  CAST(count(DISTINCT rib // 7) AS BIGINT) AS n_batches,
         |  CAST(sum(n) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT rib // 7) * 7 * bucket_cap - sum(n) AS BIGINT) AS n_pad,
         |  CAST(sum(n) AS DOUBLE)
         |    / (count(DISTINCT rib // 7) * 7 * bucket_cap) AS fill_rate
         |FROM kept GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin) { (s, dir) =>
      val ex = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id").as("id"),
          size(filter(split(col("text"), " ", -1), w => length(w) >= 1))
            .cast("long").as("n"))
      graft.llm.Sft.bucketReport(
          graft.llm.Sft.bucketByLength(ex, "id", "n",
            boundaries = Seq(16L, 32L, 64L, 128L), batchSize = 7,
            seed = 5L, dropIncomplete = true),
          "n", 7)
        .orderBy("bucket_cap")
    }

    // ------------------------------------------------------------------
    // WORDPIECE (Devlin et al. 2019 — the THIRD tokenizer family, the
    // BERT-class greedy longest-match-first with ##-continuations and
    // all-or-nothing per-word UNK). The literal vocabulary is designed
    // so the real corpus exercises every branch: multi-char pieces win
    // greedy ties ('sc'+'##an', 'win'+'##dow', 'the' whole), two words
    // STALL mid-word (no '##y': 'key', 'query' → UNK), and
    // maxInputChars=7 forces a LENGTH UNK ('customer'). The replay is
    // pure integer/string SQL: precompute the longest match per (word,
    // cursor, is-continuation), then walk the deterministic greedy
    // chain as a recursive CTE — a word whose walk stalls short of its
    // end, or that exceeds the length bound, is the single unknown id.
    val wpVocabFixture: Seq[(String, Long)] =
      Seq(("[UNK]", 0L), ("s", 1L), ("sc", 2L), ("w", 3L), ("win", 4L),
        ("t", 5L), ("the", 6L), ("j", 7L), ("a", 8L), ("b", 9L),
        ("c", 10L), ("d", 11L), ("f", 12L), ("g", 13L), ("h", 14L),
        ("k", 15L), ("l", 16L), ("m", 17L), ("o", 18L), ("p", 19L),
        ("q", 20L), ("r", 21L), ("v", 22L)) ++
      Seq("a", "b", "c", "d", "e", "g", "h", "i", "j", "k", "l", "m",
        "n", "o", "p", "r", "s", "t", "u", "w").zipWithIndex
        .map { case (ch, i) => (s"##$ch", (23 + i).toLong) } ++
      Seq(("##an", 44L), ("##dow", 45L), ("##ort", 46L), ("##ream", 47L))

    val wpVocabValues = wpVocabFixture
      .map { case (p, id) => s"('$p', CAST($id AS BIGINT))" }
      .mkString(", ")

    // the greedy longest-match machinery over a `wt(word)` CTE — the
    // best-match table and the walk, shared by the encode and windows
    // oracles. Emits: wbest (word, pos, pid, plen) and wseg (word,
    // ids) where a stalled or over-length word is [unkId].
    def wpGreedyCtes(maxChars: Int): String =
      s"""wp(piece, pid) AS (SELECT * FROM (VALUES $wpVocabValues) v),
         |wini AS (SELECT piece AS raw, pid, length(piece) AS plen
         |         FROM wp WHERE NOT starts_with(piece, '##')),
         |wcon AS (SELECT substr(piece, 3) AS raw, pid,
         |           length(piece) - 2 AS plen
         |         FROM wp WHERE starts_with(piece, '##')),
         |wposx AS (SELECT word, unnest(range(0, length(word))) AS pos
         |          FROM wt),
         |wcand AS (
         |  SELECT p.word, p.pos, m.pid, m.plen
         |  FROM wposx p JOIN wini m
         |    ON p.pos = 0 AND substr(p.word, 1, CAST(m.plen AS INTEGER)) = m.raw
         |  UNION ALL
         |  SELECT p.word, p.pos, m.pid, m.plen
         |  FROM wposx p JOIN wcon m
         |    ON p.pos > 0
         |   AND substr(p.word, CAST(p.pos + 1 AS INTEGER), CAST(m.plen AS INTEGER)) = m.raw),
         |wbest AS (SELECT word, pos, pid, plen FROM (
         |  SELECT word, pos, pid, plen, row_number() OVER (
         |    PARTITION BY word, pos ORDER BY plen DESC) AS rn FROM wcand)
         |  WHERE rn = 1),
         |wwalk(word, pos, ids) AS (
         |  SELECT word, CAST(0 AS BIGINT), CAST([] AS BIGINT[]) FROM wt
         |  UNION ALL
         |  SELECT w.word, w.pos + b.plen, list_append(w.ids, b.pid)
         |  FROM wwalk w JOIN wbest b
         |    ON b.word = w.word AND b.pos = w.pos
         |  WHERE w.pos < length(w.word)),
         |wfin AS (SELECT word, max(pos) AS fpos FROM wwalk GROUP BY 1),
         |wseg AS (
         |  SELECT f.word,
         |    CASE WHEN length(f.word) > $maxChars OR f.fpos < length(f.word)
         |         THEN [CAST(0 AS BIGINT)] ELSE x.ids END AS ids
         |  FROM wfin f JOIN wwalk x
         |    ON x.word = f.word AND x.pos = f.fpos)""".stripMargin

    // Build the persisted wordpiece model once per (JVM, sf dir) —
    // the ensurePbpeModel discipline; the oracle path then runs the
    // import + stamp + indexed serve end to end.
    def ensureWpModel(s: org.apache.spark.sql.SparkSession,
                      dir: String): String = {
      val qdir = graft.QHelp.qtmpDir("wpidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_pwp_wp")
      if (!fresh) {
        graft.llm.WordPiece.importWordPieceModel(s,
          s.createDataFrame(
            java.util.Arrays.asList(wpVocabFixture.map(p =>
              org.apache.spark.sql.Row(p._2, p._1)): _*),
            graft.llm.WordPiece.vocabSchema),
          "g_pwp", idxPath, maxInputChars = 7)
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      idxPath
    }

    // the SAME vocabulary imported under the BERT-uncased stamp
    // (normalize = lowercase_strip_accents) — the q_wordpiece_encode_norm
    // fixture: mixed-case/accented text must reproduce the lowercase
    // vocabulary's ids because the stamp re-runs the normalizer at serve
    def ensureWpNormModel(s: org.apache.spark.sql.SparkSession,
                          dir: String): String = {
      val qdir = graft.QHelp.qtmpDir("wpnidx")
      val idxPath = qdir.getAbsolutePath
      val stamp = new java.io.File(qdir, "_graft_fixture_stamp")
      val fresh = stamp.isFile && new String(
        java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8").trim == dir &&
        s.catalog.tableExists("g_pwpn_wp")
      if (!fresh) {
        graft.llm.WordPiece.importWordPieceModel(s,
          s.createDataFrame(
            java.util.Arrays.asList(wpVocabFixture.map(p =>
              org.apache.spark.sql.Row(p._2, p._1)): _*),
            graft.llm.WordPiece.vocabSchema),
          "g_pwpn", idxPath, maxInputChars = 7,
          normalize = "lowercase_strip_accents")
        java.nio.file.Files.write(stamp.toPath,
          (dir + "\n").getBytes("UTF-8"))
      }
      idxPath
    }

    // FILL-IN-THE-MIDDLE (Bavarian et al. 2022 — the code-model
    // pretraining op): a hash-deterministic half of the id sequences
    // rearranges into [pre] prefix [suf] suffix [mid] middle (psm) /
    // [suf] suffix [pre] prefix [mid] middle (spm); the Knuth gate,
    // both seed-folded cut points, the three-way slicing and both
    // sentinel layouts are recomputed in SQL over id arrays derived
    // identically from the corpus (per-word lengths — engine-portable
    // integers). Both modes ride one oracle under a mode tag.
    r.reg("q_fim", {
      // the engine's two-round xorshift-multiply draw (seed 9), the
      // draw index folded in multiplicatively before the avalanche
      def hv(off: Int) = {
        val so = java.lang.Math.floorMod(9L + off * 1779033703L,
          2147483648L)
        val s0 = s"((((id % 2147483648) + 2147483648) % 2147483648 + $so)" +
          " % 2147483648)"
        val r1 = s"((xor($s0, $s0 >> 15)) * 2654435761 % 4294967296)"
        val r2 = s"($r1 % 2147483648)"
        s"((xor($r2, $r2 >> 13)) * 2246822519 % 4294967296)"
      }
      s"""WITH ex AS (
         |  SELECT doc_id AS id,
         |    list_transform(list_filter(string_split(text, ' '),
         |      x -> x <> ''), x -> CAST(length(x) AS BIGINT)) AS ids
         |  FROM documents WHERE text IS NOT NULL),
         |cuts AS (
         |  SELECT id, ids, len(ids) AS n,
         |    ${hv(0)} < 2147483648 AS applied,
         |    LEAST((${hv(1)}) % (len(ids) + 1),
         |          (${hv(2)}) % (len(ids) + 1)) AS c1,
         |    GREATEST((${hv(1)}) % (len(ids) + 1),
         |             (${hv(2)}) % (len(ids) + 1)) AS c2
         |  FROM ex),
         |forms AS (
         |  SELECT id, applied,
         |    CASE WHEN applied THEN
         |      [CAST(1001 AS BIGINT)] || ids[1:CAST(c1 AS INT)]
         |        || [CAST(1002 AS BIGINT)]
         |        || ids[CAST(c2 + 1 AS INT):CAST(n AS INT)]
         |        || [CAST(1003 AS BIGINT)]
         |        || ids[CAST(c1 + 1 AS INT):CAST(c2 AS INT)]
         |      ELSE ids END AS psm,
         |    CASE WHEN applied THEN
         |      [CAST(1002 AS BIGINT)]
         |        || ids[CAST(c2 + 1 AS INT):CAST(n AS INT)]
         |        || [CAST(1001 AS BIGINT)] || ids[1:CAST(c1 AS INT)]
         |        || [CAST(1003 AS BIGINT)]
         |        || ids[CAST(c1 + 1 AS INT):CAST(c2 AS INT)]
         |      ELSE ids END AS spm
         |  FROM cuts)
         |SELECT id, 'psm' AS mode, applied,
         |  array_to_string(psm, ',') AS ids_csv FROM forms
         |UNION ALL
         |SELECT id, 'spm', applied, array_to_string(spm, ',') FROM forms
         |ORDER BY mode, id""".stripMargin
    }) { (s, dir) =>
      val ex = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id").as("id"),
          transform(filter(split(col("text"), " ", -1),
            w => length(w) >= 1), w => length(w).cast("long")).as("ids"))
      def run(mode: String) =
        graft.llm.Bpe.fimTransform(ex, "id", "ids", rate = 0.5,
            seed = 9L, preId = 1001L, sufId = 1002L, midId = 1003L,
            mode = mode)
          .select(col("id"), lit(mode).as("mode"), col("fim_applied").as("applied"),
            concat_ws(",", transform(col("ids"), x => x.cast("string")))
              .as("ids_csv"))
      run("psm").unionByName(run("spm")).orderBy("mode", "id")
    }

    // WordPiece TRAINING (Schuster & Nakajima 2012 — the likelihood-
    // scored merge loop): score(a,b) = count(ab)/(count(a)·count(b)),
    // argmax by EXACT integer cross-multiplication (HUGEINT in the
    // replay — no float ratio anywhere), code-point tie-break, merged
    // symbol = left + stripPrefix(right). The planted words make the
    // signature behavior live: 'zq'×25 + 'zqzq'×12 give rare pairs of
    // RARE symbols whose likelihood beats pairs hundreds of times more
    // frequent (BPE's frequency argmax would choose differently from
    // iteration 1). Six iterations replayed as materialized CTEs; the
    // score INPUTS (pair/left/right counts) ride the rows so the
    // objective itself is value-checked, not just the chosen pair.
    def wpTrainCtes(nMerges: Int): String = {
      val init =
        s"""ww0 AS MATERIALIZED (
           |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
           |    ' ' || array_to_string(list_transform(range(1, length(w)+1),
           |      q -> CASE WHEN q = 1 THEN substr(w, CAST(q AS INTEGER), 1)
           |           ELSE '##' || substr(w, CAST(q AS INTEGER), 1) END),
           |      '  ') || ' ' AS sp
           |  FROM (SELECT unnest(string_split(text, ' ')) AS w
           |        FROM documents WHERE doc_id < 400
           |        UNION ALL SELECT 'zq' FROM range(25)
           |        UNION ALL SELECT 'zqzq' FROM range(12))
           |  WHERE length(w) >= 1 GROUP BY w)""".stripMargin
      val iters = (1 to nMerges).map { r =>
        val p = r - 1
        s"""wtk$r AS MATERIALIZED (
           |  SELECT cnt, string_split(trim(sp), '  ') AS toks FROM ww$p),
           |ws$r AS MATERIALIZED (
           |  SELECT tok, CAST(SUM(cnt) AS BIGINT) AS c
           |  FROM (SELECT cnt, unnest(toks) AS tok FROM wtk$r) GROUP BY 1),
           |wp$r AS MATERIALIZED (
           |  SELECT toks[CAST(i AS INTEGER)] AS l,
           |    toks[CAST(i AS INTEGER)+1] AS rr,
           |    CAST(SUM(cnt) AS BIGINT) AS p
           |  FROM (SELECT cnt, toks, unnest(range(1, len(toks))) AS i
           |        FROM wtk$r)
           |  GROUP BY 1, 2),
           |wsc$r AS MATERIALIZED (
           |  SELECT q.l, q.rr, q.p, sl.c AS lc, sr.c AS rc
           |  FROM wp$r q JOIN ws$r sl ON sl.tok = q.l
           |              JOIN ws$r sr ON sr.tok = q.rr
           |  WHERE q.p >= 2),
           |wb$r AS MATERIALIZED (
           |  SELECT l, rr, l || substr(rr, 3) AS merged, p, lc, rc
           |  FROM wsc$r x
           |  WHERE NOT EXISTS (SELECT 1 FROM wsc$r o
           |    WHERE CAST(o.p AS HUGEINT) * x.lc * x.rc
           |            > CAST(x.p AS HUGEINT) * o.lc * o.rc
           |       OR (CAST(o.p AS HUGEINT) * x.lc * x.rc
           |             = CAST(x.p AS HUGEINT) * o.lc * o.rc
           |           AND (o.l < x.l OR (o.l = x.l AND o.rr < x.rr))))),
           |ww$r AS MATERIALIZED (
           |  SELECT w, cnt,
           |    replace(sp, (SELECT ' '||l||'  '||rr||' ' FROM wb$r),
           |                (SELECT ' '||merged||' ' FROM wb$r)) AS sp
           |  FROM ww$p)""".stripMargin
      }
      (init +: iters).mkString(",\n")
    }

    def wpTrainFixture(s: org.apache.spark.sql.SparkSession,
                       dir: String) = {
      import s.implicits._
      t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"), col("text"))
        .unionByName(Seq(
          (-8L, Array.fill(25)("zq").mkString(" ")),
          (-9L, Array.fill(12)("zqzq").mkString(" ")))
          .toDF("doc_id", "text"))
    }

    r.reg("q_wordpiece_train",
      s"""WITH ${wpTrainCtes(6)}
         |${(1 to 6).map(r =>
             s"""SELECT ${r - 1} AS rank, l AS "left", rr AS "right",
                |  merged, p AS pair_count, lc AS left_count,
                |  rc AS right_count FROM wb$r""".stripMargin)
             .mkString("\nUNION ALL\n")}
         |ORDER BY rank""".stripMargin) { (s, dir) =>
      graft.llm.WordPiece.train(wpTrainFixture(s, dir), "text",
          numMerges = 6, minPairCount = 2L)
        .orderBy("rank")
    }

    // The trained vocabulary contract: [UNK] at 0, the alphabet in
    // code-point order, merged surfaces in rank order, duplicate
    // surfaces keep the earlier id — recomputed in SQL over the same
    // six training iterations.
    r.reg("q_wordpiece_vocab",
      s"""WITH ${wpTrainCtes(6)},
         |al AS (SELECT DISTINCT tok FROM ws1),
         |mg AS (${(1 to 6).map(r =>
             s"SELECT ${r - 1} AS rank, merged FROM wb$r")
             .mkString(" UNION ALL ")}),
         |sq AS (
         |  SELECT 0 AS grp, CAST(0 AS BIGINT) AS ord, '[UNK]' AS piece
         |  UNION ALL
         |  SELECT 1, row_number() OVER (ORDER BY tok), tok FROM al
         |  UNION ALL
         |  SELECT 2, rank, merged FROM mg),
         |dd AS (SELECT piece, grp, ord,
         |  row_number() OVER (PARTITION BY piece ORDER BY grp, ord) AS occ
         |  FROM sq)
         |SELECT row_number() OVER (ORDER BY grp, ord) - 1 AS piece_id,
         |  piece
         |FROM dd WHERE occ = 1 ORDER BY piece_id""".stripMargin) { (s, dir) =>
      val fx = wpTrainFixture(s, dir)
      graft.llm.WordPiece.trainedVocab(fx, "text",
          graft.llm.WordPiece.train(fx, "text", numMerges = 6,
            minPairCount = 2L))
        .orderBy("piece_id")
    }

    r.reg("q_wordpiece_encode",
      s"""WITH RECURSIVE wt AS (
         |  SELECT DISTINCT w AS word FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w
         |    FROM documents WHERE text IS NOT NULL) s
         |  WHERE w <> ''),
         |${wpGreedyCtes(7)}
         |SELECT word, array_to_string(ids, ',') AS ids_csv,
         |  CAST(len(ids) AS BIGINT) AS n_pieces
         |FROM wseg ORDER BY word""".stripMargin) { (s, dir) =>
      val idxPath = ensureWpModel(s, dir)
      val types = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ", -1)).as("word"))
        .filter(length(col("word")) >= 1).distinct()
      graft.llm.WordPiece.encodeIdsIndexed(s, "g_pwp", idxPath,
          types.withColumn("text", col("word")), "word", "text")
        .groupBy(col("word"))
        .agg(sort_array(collect_list(struct(col("tok_pos"),
          col("token_id")))).as("ts"))
        .select(col("word"),
          concat_ws(",", transform(col("ts"), x =>
            x.getField("token_id").cast("string"))).as("ids_csv"),
          size(col("ts")).cast("long").as("n_pieces"))
        .orderBy("word")
    }

    // The STAMPED NORMALIZER (r16): the same vocabulary imported under
    // normalize = lowercase_strip_accents (the BERT-uncased pair) serves
    // mixed-case/accented text onto the lowercase vocabulary's ids. The
    // oracle replays the normalizer as lower(strip_accents(w)) — the
    // DuckDB spelling of the same map (order-insensitive on text where
    // lowering invents no marks; spec-pinned) — then runs the SAME
    // greedy walk keyed by the NORMALIZED word and joins back to the
    // original surface. Planted rows carry the signature behavior the
    // all-lowercase corpus cannot: case folding ('The'→6), accent
    // stripping that completes a tokenization ('SCÄN'→sc+##an), a
    // stall that survives normalization ('QUÉry'→UNK), and the length
    // bound applied to the NORMALIZED surface ('CUSTOMER' len 8 > 7).
    r.reg("q_wordpiece_encode_norm",
      s"""WITH RECURSIVE aw AS (
         |  SELECT DISTINCT w AS orig FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w
         |    FROM documents WHERE text IS NOT NULL
         |    UNION ALL
         |    SELECT * FROM (VALUES ('The'), ('Thé'), ('SCan'), ('SCÄN'),
         |      ('WINdow'), ('QUÉry'), ('CUSTOMER'), ('Naïve')) v(w)
         |  ) s WHERE w <> ''),
         |wt AS (SELECT DISTINCT lower(strip_accents(orig)) AS word FROM aw),
         |${wpGreedyCtes(7)}
         |SELECT a.orig AS word, array_to_string(s.ids, ',') AS ids_csv,
         |  CAST(len(s.ids) AS BIGINT) AS n_pieces
         |FROM aw a JOIN wseg s ON s.word = lower(strip_accents(a.orig))
         |ORDER BY word""".stripMargin) { (s, dir) =>
      import s.implicits._
      val idxPath = ensureWpNormModel(s, dir)
      val planted = Seq("The", "Thé", "SCan", "SCÄN", "WINdow",
        "QUÉry", "CUSTOMER", "Naïve").toDF("word")
      val types = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ", -1)).as("word"))
        .filter(length(col("word")) >= 1)
        .unionByName(planted).distinct()
      graft.llm.WordPiece.encodeIdsIndexed(s, "g_pwpn", idxPath,
          types.withColumn("text", col("word")), "word", "text")
        .groupBy(col("word"))
        .agg(sort_array(collect_list(struct(col("tok_pos"),
          col("token_id")))).as("ts"))
        .select(col("word"),
          concat_ws(",", transform(col("ts"), x =>
            x.getField("token_id").cast("string"))).as("ids_csv"),
          size(col("ts")).cast("long").as("n_pieces"))
        .orderBy("word")
    }

    // WordPiece token-ID training windows: the chop assembly under the
    // greedy unit — per-word greedy segmentation (stall/length words
    // as the single UNK id), per-doc id concatenation + one EOD id
    // (100 — outside the 0..47 vocabulary), the seed-5 Knuth-hash
    // permutation and the boundary-straddling membership formulas, all
    // recomputed in SQL: the THIRD family lands id windows with the
    // same oracle-pinned chop semantics.
    // SFT assembly UNDER THE TOKENIZER SWITCH (r16): the q_sft_examples
    // layout served from the WORDPIECE stamp — the greedy unit's ids on
    // both sides of the loss boundary, structural sep/eod ids 900/901
    // outside the 0..47 vocabulary. The oracle composes the greedy-walk
    // replay (wpGreedyCtes — stall/length words as the single UNK) with
    // the side-tagged assembly arithmetic, so the driver gate
    // value-checks the switch itself, not just its spec.
    r.reg("q_sft_examples_wp",
      s"""WITH RECURSIVE sw0 AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |  FROM documents WHERE doc_id < 100 AND text IS NOT NULL),
         |sw1 AS (SELECT doc_id, ws, CAST(len(ws)//2 AS BIGINT) AS np
         |  FROM sw0 WHERE len(ws) >= 2),
         |sww AS (
         |  SELECT doc_id, np, i,
         |    CASE WHEN i <= np THEN 0 ELSE 1 END AS side,
         |    ws[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, np, ws, unnest(range(1, len(ws)+1)) AS i
         |        FROM sw1)),
         |wt AS (SELECT DISTINCT w AS word FROM sww),
         |${wpGreedyCtes(7)},
         |swi AS (
         |  SELECT t.doc_id, t.i, t.side, s.ids
         |  FROM sww t JOIN wseg s ON s.word = t.w),
         |swa AS (
         |  SELECT doc_id,
         |    flatten(list(ids ORDER BY i) FILTER (WHERE side = 0)) AS pids,
         |    flatten(list(ids ORDER BY i) FILTER (WHERE side = 1)) AS rids
         |  FROM swi GROUP BY doc_id)
         |SELECT doc_id,
         |  array_to_string(list_transform(
         |    list_concat(list_concat(list_concat(
         |      COALESCE(pids, []), [CAST(900 AS BIGINT)]), rids),
         |      [CAST(901 AS BIGINT)]),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  CAST(COALESCE(len(pids), 0) + len(rids) + 2 AS BIGINT)
         |    AS n_tokens,
         |  CAST(COALESCE(len(pids), 0) + 1 AS BIGINT) AS loss_from
         |FROM swa
         |WHERE rids IS NOT NULL AND len(rids) >= 1
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val idxPath = ensureWpModel(s, dir)
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val pairs = t(s, dir, "documents")
        .filter(col("doc_id") < 100 && col("text").isNotNull)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 2)
        .withColumn("__np__", (size(col("__ws__")) / 2).cast("int"))
        .select(col("doc_id"),
          array_join(slice(col("__ws__"), lit(1), col("__np__")), " ")
            .as("prompt"),
          array_join(slice(col("__ws__"), col("__np__") + 1,
            size(col("__ws__")) - col("__np__")), " ").as("response"))
      graft.llm.Sft.assembleExamplesIndexed(s, "g_pwp", idxPath, pairs,
          "doc_id", "prompt", "response",
          sepId = Some(900L), eodId = Some(901L),
          tokenizer = "wordpiece")
        .select(col("doc_id"),
          concat_ws(" ",
            transform(col("input_ids"), x => x.cast("string")))
            .as("ids_text"),
          col("n_tokens"), col("loss_from"))
        .orderBy("doc_id")
    }

    r.reg("q_wordpiece_windows", {
      val hv = "((((doc_id % 2147483648) + 2147483648) % 2147483648 + 5)" +
        " % 2147483648) * 2654435761 % 4294967296"
      s"""WITH RECURSIVE edocs AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id < 100 AND text IS NOT NULL),
         |ewrd AS (
         |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS word_pos,
         |    toks[CAST(i AS INTEGER)] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
         |          unnest(range(1, len(string_split(text, ' '))+1)) AS i
         |        FROM edocs)
         |  WHERE toks[CAST(i AS INTEGER)] <> ''),
         |wt AS (SELECT DISTINCT w AS word FROM ewrd),
         |${wpGreedyCtes(7)},
         |eid AS (SELECT e.doc_id, e.word_pos, b.ids
         |  FROM ewrd e JOIN wseg b ON e.w = b.word),
         |edoc AS (
         |  SELECT d.doc_id,
         |    list_append(COALESCE(g.ids0, CAST([] AS BIGINT[])),
         |      CAST(100 AS BIGINT)) AS ids
         |  FROM (SELECT DISTINCT doc_id FROM edocs) d
         |  LEFT JOIN (SELECT doc_id,
         |      flatten(list(ids ORDER BY word_pos)) AS ids0
         |    FROM eid GROUP BY doc_id) g USING (doc_id)),
         |edn AS (SELECT doc_id, ids, CAST(len(ids) AS BIGINT) AS n FROM edoc),
         |ecu AS (SELECT doc_id, ids, n,
         |  CAST(sum(n) OVER (ORDER BY $hv
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS BIGINT) AS start
         |  FROM edn),
         |eww AS (SELECT doc_id, ids, n, start,
         |  CAST(floor(start/60.0) AS BIGINT) AS wf,
         |  CASE WHEN n > 0 THEN CAST(floor((start+n-1)/60.0) AS BIGINT)
         |       ELSE CAST(floor(start/60.0) AS BIGINT) END AS wl
         |  FROM ecu),
         |erg AS (SELECT unnest(range(0,
         |  (SELECT CAST(ceil(sum(n)/60.0) AS BIGINT) + 1 FROM edn))) AS window_id),
         |emem AS (SELECT w.doc_id, r.window_id,
         |  GREATEST(r.window_id*60 - w.start, 0) AS f,
         |  LEAST((r.window_id+1)*60 - w.start, w.n) AS t2,
         |  GREATEST(w.start - r.window_id*60, 0) AS pos, w.ids
         |  FROM eww w JOIN erg r ON r.window_id BETWEEN w.wf AND w.wl),
         |eprt AS (SELECT doc_id, window_id, pos,
         |  ids[CAST(f+1 AS INT):CAST(t2 AS INT)] AS part, t2 - f AS len
         |  FROM emem WHERE t2 > f)
         |SELECT window_id,
         |  array_to_string(list_transform(flatten(list(part ORDER BY pos)),
         |    x -> CAST(x AS VARCHAR)), ' ') AS ids_text,
         |  string_agg(doc_id || ':' || pos || ':' || len, ' ' ORDER BY pos)
         |    AS spans_text,
         |  CAST(sum(len) AS BIGINT) AS n_tokens
         |FROM eprt GROUP BY window_id
         |ORDER BY window_id""".stripMargin
    }) { (s, dir) =>
      graft.llm.WordPiece.assembleWindowsIds(
          t(s, dir, "documents")
            .filter(col("doc_id") < 100 && col("text").isNotNull)
            .select(col("doc_id"), col("text")),
          "doc_id", "text", windowSize = 60L, seed = 5L,
          wpVocabFixture, unkId = 0L, contPrefix = "##",
          maxInputChars = 7, eodId = Some(100L), withDocSpans = true)
        .select(col("window_id"),
          concat_ws(" ",
            transform(col("window_ids"), x => x.cast("string")))
            .as("ids_text"),
          concat_ws(" ", transform(col("doc_spans"), sp =>
            concat_ws(":", sp.getField("id").cast("string"),
              sp.getField("pos").cast("string"),
              sp.getField("len").cast("string")))).as("spans_text"),
          col("n_tokens"))
        .orderBy("window_id")
    }
  }

  /** The literal BM25 fixture query set: terms spanning the fixture
    * vocabulary's df range, plus a sub-minTermLen token ('a') that the
    * length filter must drop on both engines. */
  private val bm25FixtureQueries: String =
    "(CAST(0 AS BIGINT), 'spark window join'), " +
      "(CAST(1 AS BIGINT), 'customer order batch stream'), " +
      "(CAST(2 AS BIGINT), 'vector a the merge')"

  private[graft] def bm25QueryFrame(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq((0L, "spark window join"), (1L, "customer order batch stream"),
      (2L, "vector a the merge")).toDF("qid", "qtext")
  }

  /** BM25 CTE chain over `documents` for a literal (query_id, qtext)
    * VALUES list — the DuckDB mirror of [[graft.llm.Lexical.bm25TopK]],
    * CTE names prefixed `l` so the chain composes beside the embedding
    * cosine CTEs in the hybrid oracle. Tokenization, the per-term score
    * (via [[graft.llm.Lexical.termScoreSql]] — constants injected from
    * the SAME Scala doubles the engine uses), the ordered fold and the
    * ranking all recompute exactly. */
  private[graft] def bm25Ctes(qvals: String, minTermLen: Int = 2,
                              src: String = "documents"): String = {
    def toks(c: String) = graft.llm.Lexical.tokensSql(c, minTermLen)
    s"""lq(query_id, qtext) AS (VALUES $qvals),
       |lqt AS (
       |  SELECT DISTINCT query_id, unnest(${toks("qtext")}) AS term FROM lq),
       |ldlens AS (
       |  SELECT doc_id, coalesce(len(${toks("text")}), 0) AS dl FROM $src),
       |lstats AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS total_len FROM ldlens),
       |ltoks AS (
       |  SELECT doc_id, len(tt) AS dl, unnest(tt) AS term
       |  FROM (SELECT doc_id, ${toks("text")} AS tt FROM $src)),
       |lpost AS (
       |  SELECT doc_id, term, dl, count(*) AS tf
       |  FROM ltoks GROUP BY doc_id, term, dl),
       |lrestr AS (
       |  SELECT p.* FROM lpost p WHERE p.term IN (SELECT term FROM lqt)),
       |ldfs AS (SELECT term, count(*) AS df FROM lrestr GROUP BY term),
       |lscored AS (
       |  SELECT lqt.query_id, r.doc_id, r.term,
       |    ${graft.llm.Lexical.termScoreSql("r.tf", "ldfs.df", "r.dl",
              "lstats.n_docs",
              "(CAST(lstats.total_len AS DOUBLE) / CAST(lstats.n_docs AS DOUBLE))")} AS s
       |  FROM lrestr r JOIN ldfs USING (term) JOIN lqt USING (term), lstats),
       |lfolded AS (
       |  SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |    list_sum(list(s ORDER BY term)) AS score
       |  FROM lscored GROUP BY query_id, doc_id),
       |lranked AS (
       |  SELECT query_id, doc_id, n_terms, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS "rank"
       |  FROM lfolded)""".stripMargin
  }
}
