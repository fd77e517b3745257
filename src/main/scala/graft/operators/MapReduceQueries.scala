package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's actual query surface (SURVEY.md §2.1), re-expressed
  * Spark-first over the `documents` test table as the token source.
  *
  * The reference (brunofms/inf2106_map-reduce) processes text files of
  * space-separated `key|value` tokens through
  * map → partition → sort → combine → shuffle → merge → reduce
  * (`mapreduce/idl/mapReduce.idl:34-84`). On Spark that whole pipeline
  * collapses into `explode(split(...))` + `groupBy().agg()` — one scan,
  * one shuffle, partial (combine) + final aggregation planned
  * automatically by Catalyst (HashAggregateExec partial/final). The
  * queries below pin each reference operator to a Spark plan the driver
  * can oracle-check in DuckDB.
  *
  * Scale note: every query here is a single narrow scan + at most one
  * hash shuffle on the grouping key; no collects, no skew-prone keys
  * (word frequencies are zipfian but partial aggregation bounds map
  * output at #distinct-words per partition, so the shuffle is tiny
  * relative to input — the classic combiner argument, which is why the
  * reference made the combiner default to the reducer,
  * `schedule/MasterServant.java:198-201`).
  */
object MapReduceQueries {

  /** O2 tokenizer: split on single-space, drop empty runs, `k|v` parse
    * rule — no `|` ⇒ key literal "none"; extra `|` fields dropped
    * (`user/TokenRecordReader.java:139-189`).
    */
  private def tokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Java `String.split("\\|")` drops trailing empty fields, so a
    * trailing-pipe token like `a|` is a 1-field split and parses as
    * `(none, "a|")` (`user/TokenRecordReader.java:156-165`,
    * [[graft.core.TokenFormat.parse]]). Spark's `split` keeps trailing
    * empties at every limit, so the "≥2 fields after dropping trailing
    * empties" test is expressed by stripping the trailing pipe run
    * before counting; key/value still come from the raw split (interior
    * empties are real fields: `a||b` → `(a, "")`).
    */
  private[graft] def kvTokens(docs: DataFrame): DataFrame = {
    val parts = split(col("tok"), "\\|")
    val isKv  = size(split(regexp_replace(col("tok"), "\\|+$", ""), "\\|")) >= 2
    tokens(docs).select(
      col("doc_id"),
      when(isKv, element_at(parts, 1)).otherwise(lit("none")).as("key"),
      when(isKv, element_at(parts, 2)).otherwise(col("tok")).as("value"),
    )
  }

  /** O1+O2: record scan + tokenize into `(key, value)` records. */
  val mrTokenize = Query(
    "mr_tokenize",
    (s, dir) => {
      kvTokens(Tables(s, dir).documents)
        .groupBy(col("key"), col("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("key"), col("value"))
    },
    // is_kv mirrors Java split-with-trailing-empties-dropped yielding
    // >= 2 fields: some '|' present that is not part of a pure trailing
    // pipe run (e.g. 'a|' and '|' are NOT k|v; 'a|b', '|a', 'a||b' are).
    oracle = Some("""
      WITH parsed AS (
        SELECT tok,
          contains(tok, '|')
            AND NOT regexp_matches(tok, '^[^|]*\|+$') AS is_kv
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE length(tok) > 0
      )
      SELECT
        CASE WHEN is_kv THEN split_part(tok, '|', 1) ELSE 'none' END AS key,
        CASE WHEN is_kv THEN split_part(tok, '|', 2) ELSE tok END AS value,
        count(*) AS n
      FROM parsed
      GROUP BY 1, 2 ORDER BY 1, 2
    """),
  )

  /** O5→O12 full word count — the reference's one shipped job
    * (`user/WordMapperServant.java`, `user/WordReducerServant.java`):
    * map emits (word,1); combine+reduce sum. One shuffle, map-side
    * partial agg ≡ the reference's combiner (O8).
    */
  val mrWordcount = Query(
    "mr_wordcount",
    (s, dir) => {
      tokens(Tables(s, dir).documents)
        .groupBy(col("tok").as("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("word"))
    },
    oracle = Some("""
      SELECT tok AS word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE length(tok) > 0
      GROUP BY 1 ORDER BY 1
    """),
    headline = true,
  )

  /** O10 map-only job (numReducers=0,
    * `servant/DirectOutputCollectorServant.java`): per-record transform,
    * no shuffle — Spark plans no Exchange for this.
    */
  val mrMapOnly = Query(
    "mr_map_only",
    (s, dir) => {
      Tables(s, dir).documents
        .select(
          col("doc_id"),
          upper(col("lang")).as("lang_uc"),
          length(col("text")).as("text_len"),
        )
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      SELECT doc_id, upper(lang) AS lang_uc, length(text) AS text_len
      FROM documents ORDER BY doc_id
    """),
  )

  /** O7/O11 sort: the reference sorts map output per reducer bucket and
    * k-way-merges on the reduce side (`BufferOutputCollectorServant
    * .java:116-138`, `ReduceTaskServant.java:206-261`); Spark's
    * range-partitioned global sort (Exchange rangepartitioning +
    * per-partition sort) is the same algorithm with spill.
    */
  val mrSort = Query(
    "mr_sort",
    (s, dir) => {
      tokens(Tables(s, dir).documents)
        .groupBy(col("tok").as("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
    },
    oracle = Some("""
      SELECT tok AS word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE length(tok) > 0
      GROUP BY 1 ORDER BY cnt DESC, word LIMIT 20
    """),
  )

  /** §2.3 join/concat (declared-but-unimplemented in the reference:
    * `mapred.Join.flag` merges all reducer outputs into one file).
    * Semantically UNION ALL of two job outputs into a single result.
    */
  val mrConcat = Query(
    "mr_concat",
    (s, dir) => {
      val t    = Tables(s, dir)
      val byLang = t.documents.groupBy(col("lang").as("key"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val bySrc  = t.documents.groupBy(col("source").as("key"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      byLang.unionAll(bySrc).orderBy(col("key"))
    },
    oracle = Some("""
      SELECT * FROM (
        SELECT lang AS key, count(*) AS cnt FROM documents GROUP BY 1
        UNION ALL
        SELECT source AS key, count(*) AS cnt FROM documents GROUP BY 1
      ) ORDER BY key
    """),
  )

  /** O6 partition layout: hash-distribute words over n buckets and count
    * per bucket — the observable effect of `PartitionerServant`
    * (`Math.abs(key.hashCode) % n`, `servant/PartitionerServant.java:
    * 20-23`). Exact Java String.hashCode parity, reproduced in the
    * DuckDB oracle via list_reduce over the UTF-16 code units; the
    * reference's `Math.abs(Integer.MIN_VALUE)` crash is NOT replicated
    * (documented reference bug, SURVEY §2.1 O6).
    */
  val mrPartition = Query(
    "mr_partition",
    (s, dir) => {
      import graft.functions.TextFunctions.javaStringHash
      tokens(Tables(s, dir).documents)
        .select(col("tok").as("word"))
        .groupBy(pmod(abs(javaStringHash(col("word"))), lit(8)).as("bucket"))
        .agg(
          count(lit(1)).as("n_tokens"),
          count_distinct(col("word")).as("n_words"),
        )
        .orderBy(col("bucket"))
    },
    // Java String.hashCode = fold(h*31 + c) over UTF-16 units, wrapped to
    // 32-bit two's complement. Tokens here are ASCII so code units =
    // unicode code points.
    oracle = Some("""
      WITH toks AS (
        SELECT tok AS word
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE length(tok) > 0
      ), hashed AS (
        SELECT word,
          list_reduce(
            list_prepend(0::BIGINT, [ord(c)::BIGINT FOR c IN string_split_regex(word, '')]),
            (h, c) -> ((h * 31 + c) % 4294967296 + 4294967296) % 4294967296
          ) AS h_u32
        FROM toks
      ), signed AS (
        SELECT word,
          CASE WHEN h_u32 >= 2147483648 THEN h_u32 - 4294967296 ELSE h_u32 END AS h
        FROM hashed
      )
      SELECT abs(h) % 8 AS bucket, count(*) AS n_tokens,
             count(DISTINCT word) AS n_words
      FROM signed GROUP BY 1 ORDER BY 1
    """),
  )

  /** The reference's token format through the [[graft.sources.v2.TokenDataSource]]
    * DataSource V2 — the format as a first-class Spark table rather
    * than a `spark.read.text` wrapper. The query materializes a
    * `lang|n_chars` token corpus, reads it back through
    * `format("graft-token")`, and counts values for ONE key — the
    * `EqualTo(key, 'es')` predicate is pushed INTO the scan (rows of
    * other languages are dropped before they are ever materialized,
    * TokenSourceV2Spec pins `PushedFilters` on the BatchScan node), and
    * column pruning drops `key` from the produced rows. The byte-range
    * split planner gives the scan parquet-like parallelism at 100 TB
    * (`maxSplitBytes` = the reference's `mapred.Input.split-size`);
    * boundary ownership is proven byte-exact for every split size ≥ 1
    * in TokenSourceV2Spec. Oracle: the same corpus derivation straight
    * from `documents`.
    */
  val mrV2Wordcount = Query(
    "mr_v2_wordcount",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-v2-corpus")
      try {
        Tables(s, dir).documents
          .select(concat_ws("|", col("lang"), col("n_chars")))
          .write.mode("overwrite").text(tmp.toString)
        s.read.format("graft-token")
          .option("maxSplitBytes", (1L << 20).toString)
          .load(tmp.toString)
          .filter(col("key") === "es")
          .groupBy(col("value"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("value"))
          .localCheckpoint(true)
      } finally {
        import java.nio.file.Files
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
    },
    oracle = Some("""
      SELECT CAST(n_chars AS VARCHAR) AS value, count(*) AS n
      FROM documents WHERE lang = 'es'
      GROUP BY 1 ORDER BY 1
    """),
    eagerPlan = Some((s, dir) => {
      // the auditable pipeline: the V2 scan with the pushed filter —
      // the registered run checkpoints eagerly (its temp corpus is
      // deleted on exit), so the lint audits this equivalent shape.
      // Fixed per-sf path, overwritten each audit: no tmp-dir litter.
      val tmp = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft-v2-audit-${new java.io.File(dir).getName}")
      Tables(s, dir).documents
        .select(concat_ws("|", col("lang"), col("n_chars")))
        .write.mode("overwrite").text(tmp.toString)
      s.read.format("graft-token").load(tmp.toString)
        .filter(col("key") === "es")
        .groupBy(col("value")).agg(count(lit(1)).as("n"))
        .orderBy(col("value"))
    }),
  )

  def all: Seq[Query] =
    Seq(mrTokenize, mrWordcount, mrMapOnly, mrSort, mrConcat, mrPartition,
      mrV2Wordcount)
}
