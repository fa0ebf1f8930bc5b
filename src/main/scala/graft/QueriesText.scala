package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftFrame
import graft.llm.{Dedup, Multimodal, TextHash, TextStats}
import QHelp._

/** LLM-pipeline text oracle queries: stats, fingerprints, exact + minhash
  * dedup, simhash — the DuckDB oracle recomputes the full pipelines
  * (identical integer hash arithmetic), so signatures, LSH buckets and
  * candidate pairs are value-checked end-to-end, not just counted. */
object QueriesText {

  // DuckDB mirrors of TextHash — kept adjacent to the Scala definitions.
  private def tokIdSql(w: String): String = TextHash.tokIdSql(w)

  /** CTEs: token ids → distinct numeric 3-shingle hashes → 16-hash
    * minhash signature (mirrors TextHash.shingleHashArray exactly). */
  private val sigCtes =
    s"""toks AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ' '), g -> ${tokIdSql("g")}) AS tid
       |  FROM documents
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

  private val pairsCtes =
    s"""$sigCtes,
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

  def register(r: QueryRegistry): Unit = {

    val stop = Seq("the", "a", "of", "and", "to")
    val stopSqlList = stop.map(w => s"'$w'").mkString(", ")

    r.reg("q_text_stats",
      s"""SELECT doc_id,
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
         |    i -> (${tokIdSql("string_split(text, ' ')[i]")}
         |          * ([1,31,961,29791,923521,28629151,887503681,1742810335])[(i-1)%8 + 1])
         |         % 2147483647)) % 2147483647 AS BIGINT) AS fingerprint,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_md5
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(TextStats.qualityFrame(
          t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text", stop))
        .sortValues(Seq("doc_id" -> true)).df
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
        |  repeat(source, 2) AS rep2
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
          col("source").strRepeat(2).as("rep2"))
        .orderBy("doc_id")
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
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
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
          col("ts").dtEpochSeconds.as("ep"))
        .orderBy("event_id")
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
      s"""WITH $sigCtes
         |SELECT doc_id,
         |  CAST(unnest(range(0, 16)) AS INTEGER) AS hash_idx,
         |  unnest(sig) AS sig_val
         |FROM sig WHERE doc_id < 50 ORDER BY doc_id, hash_idx""".stripMargin) { (s, dir) =>
      Dedup.signatures(t(s, dir, "documents"), "doc_id", "text")
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

    r.reg("q_simhash", {
      val terms = (0 until 16).map(j =>
        s"(CASE WHEN 2*len(list_filter(hs16, h -> ((h >> $j) & 1) = 1)) > len(hs16) " +
          s"THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform(list_distinct(string_split(text, ' ')), w -> ${tokIdSql("w")}) AS hs16
         |  FROM documents WHERE doc_id < 100)
         |SELECT doc_id, CAST($terms AS BIGINT) AS simhash
         |FROM h ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      Dedup.simhashGroups(
          t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
        .orderBy("doc_id")
    }

    r.reg("q_multimodal_features",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS format_byte,
        |  CAST(ascii(substr(text, 1, 1)) % 64 + 1 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS height,
        |  CAST(list_sum(list_transform(range(1, length(text)+1),
        |    i -> ascii(substr(text, i, 1)))) % 1000000007 AS BIGINT) AS checksum
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      Multimodal.decodeFeatures(
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
  }
}
