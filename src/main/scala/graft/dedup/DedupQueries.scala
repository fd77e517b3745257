package graft.dedup

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the training-data-
  * pipeline surface: exact, MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup (embedding variant lives with the
  * similarity module's helpers).
  *
  * The synthetic corpus has no duplicates, so each query runs over
  * [[dupCorpus]]: the documents table UNION ALL a copy of the `src0`
  * slice with shifted doc_ids — 25 planted exact duplicates with known
  * ids, giving every detector a non-empty, verifiable answer while
  * natural near-collisions remain possible.
  *
  * Scale design:
  *  - signatures/fingerprints are computed per-row inside array
  *    higher-order functions: narrow, codegen'd, no shuffle, no UDF.
  *  - candidate generation shuffles on the signature/band/shingle key
  *    (never an O(n²) cross join); the only pairwise work happens at
  *    candidate-pair cardinality.
  *  - frequency caps bound worst-case pair blowup from hot shingles
  *    (the classic posting-list cutoff); the cap is part of the
  *    declared semantics and mirrored in the oracle.
  */
object DedupQueries {

  private def toks(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  /** Distinct 3-token shingles of the text. */
  private def shingles(c: Column): Column = {
    val t = toks(c)
    array_distinct(transform(
      sequence(lit(1), greatest(size(t) - 2, lit(0))),
      i => concat_ws(" ",
        element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)),
    ))
  }

  private def dupCorpus(t: Tables): DataFrame =
    t.documents.select(col("doc_id"), col("text"))
      .unionAll(
        t.documents.filter(col("source") === "src0")
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))

  private val dupCorpusSql =
    """SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE source = 'src0'"""

  /** Exact dedup: group by content hash, keep the lowest doc_id as the
    * canonical representative. One shuffle on the hash — at 100 TB this
    * is the cheapest possible dedup (hash is 16 bytes/row on the wire).
    */
  val exact = Query(
    "dd_exact",
    (s, dir) => {
      dupCorpus(Tables(s, dir))
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
        .filter(col("n") > 1)
        .orderBy(col("keeper"))
    },
    oracle = Some(s"""
      SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
      FROM ($dupCorpusSql)
      GROUP BY 1 HAVING count(*) > 1 ORDER BY keeper
    """),
    headline = true,
  )

  /** MinHash + LSH near-dup: 16 md5-derived min-hashes per doc (4 bands
    * × 4 rows), band-bucket join for candidates, exact shingle Jaccard
    * on candidates only. Signature computation is per-row and narrow;
    * the candidate join shuffles on the band hash — the standard
    * at-scale shape (no cross join anywhere).
    */
  val minhashLsh = Query(
    "dd_minhash_lsh",
    (s, dir) => {
      val t  = Tables(s, dir)
      val sh = dupCorpus(t)
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      // band b hash = md5(band || '#' || concat of minhashes 4b..4b+3),
      // minhash j = lexicographic min over md5(j || ':' || shingle)
      val bands = sh.select(
        col("doc_id"),
        explode(transform(sequence(lit(0), lit(3)), b =>
          md5(concat(b.cast("string"), lit("#"),
            aggregate(
              transform(sequence(lit(0), lit(3)), r =>
                array_min(transform(col("sh"), x =>
                  md5(concat((b * 4 + r).cast("string"), lit(":"), x))))),
              lit(""), (acc, m) => concat(acc, m)))))).as("bh"))
      val cands = bands.as("a")
        .join(bands.as("b"), col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      val withSets = cands
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      withSets.select(
        col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b")))), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },
    oracle = Some(s"""
      WITH corpus AS ($dupCorpusSql),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(t) - 1, 1)),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        FROM (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
              FROM corpus)
        WHERE len(t) >= 3
      ),
      bands AS (
        SELECT doc_id, unnest(list_transform(range(0, 4), b ->
          md5(b::VARCHAR || '#' || array_to_string(
            list_transform(range(0, 4), r ->
              list_aggregate(list_transform(sh, x ->
                md5((b * 4 + r)::VARCHAR || ':' || x)), 'min')), '')))) AS bh
        FROM sh
      ),
      cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.bh = b.bh AND a.doc_id < b.doc_id
      )
      SELECT id_a, id_b,
        round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4)
          AS jaccard
      FROM cands
        JOIN sh sa ON sa.doc_id = id_a
        JOIN sh sb ON sb.doc_id = id_b
      ORDER BY id_a, id_b
    """),
    headline = true,
  )

  /** SimHash: 60-bit similarity-preserving fingerprint per document
    * (low 60 bits of md5 per token; majority vote per bit). Entirely
    * per-row array math — embarrassingly parallel; pair search over the
    * fingerprints is a bit_count(xor) self-join or banded buckets
    * (exercised in the spec), both independent of document length.
    * 60 bits (15 hex chars) so the value stays in a signed BIGINT in
    * both engines.
    */
  val simhash = Query(
    "dd_simhash",
    (s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"), toks(col("text")).as("t"))
        .filter(size(col("t")) > 0)
        .withColumn("hs",
          expr("transform(t, x -> cast(conv(substr(md5(x),1,15),16,10) as bigint))"))
        .withColumn("simhash",
          expr("""aggregate(sequence(0,59), cast(0 as bigint), (acc, i) ->
              acc + CASE WHEN 2 * size(filter(hs, h -> shiftright(h, i) % 2 = 1))
                          >= size(hs)
                    THEN shiftleft(cast(1 as bigint), i)
                    ELSE cast(0 as bigint) END)"""))
        .select(col("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (
        SELECT doc_id,
          list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
        FROM documents
      ), h AS (
        SELECT doc_id, len(t) AS n,
          list_transform(t, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        FROM t WHERE len(t) > 0
      )
      SELECT doc_id,
        CAST(list_sum(list_transform(range(0, 60), i ->
          CASE WHEN 2 * len(list_filter(hs, h -> (h >> i) & 1 = 1)) >= n
               THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
      FROM h ORDER BY doc_id
    """),
  )

  /** N-gram Jaccard near-dup without sketching: inverted-index join on
    * shingles (posting-list style), with a doc-frequency cap of 50 on
    * shingles to bound pair blowup from hot n-grams, then Jaccard ≥ 0.5
    * on the co-occurrence counts. The cap is part of the declared
    * semantics (standard at scale) and mirrored in the oracle.
    */
  val ngramJaccard = Query(
    "dd_ngram_jaccard",
    (s, dir) => {
      val t  = Tables(s, dir)
      val sh = dupCorpus(t)
        .select(col("doc_id"), explode(shingles(col("text"))).as("s"))
      val rare = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50)
      val posting = sh.join(rare.select(col("s")), "s")
      val inter = posting.as("a")
        .join(posting.as("b"), col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      inter
        .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
        .withColumn("jaccard",
          round(col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter")), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },
    oracle = Some(s"""
      WITH corpus AS ($dupCorpusSql),
      sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len(t) - 1, 1)),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
        FROM (SELECT doc_id,
                list_filter(string_split(text, ' '), x -> length(x) > 0) AS t
              FROM corpus)
        WHERE len(t) >= 3
      ),
      posting AS (
        SELECT doc_id, s FROM sh
        WHERE s IN (SELECT s FROM sh GROUP BY s HAVING count(*) <= 50)
      ),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1)
      SELECT id_a, id_b,
        round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
      FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.5
      ORDER BY id_a, id_b
    """),
  )

  def all: Seq[Query] = Seq(exact, minhashLsh, simhash, ngramJaccard)
}
