package graft

import org.apache.spark.sql.functions.col

/** The engine's raw-SQL surface: for dialect-neutral queries, the very
  * SQL text shipped as the DuckDB oracle must also run on Spark SQL
  * over temp views of the same tables and produce the DataFrame
  * query's exact results — three implementations (DataFrame plan,
  * Spark SQL, DuckDB) of one declared semantics.
  */
class SqlSurfaceSpec extends SparkSuite {

  /** queries whose oracle text is ANSI enough for both engines
    * (no strftime/list lambdas/DuckDB-only syntax)
    */
  private val ansiPortable = Seq(
    "q1_pricing_summary", "q6_forecast_revenue", "q_distinct",
    "q_having", "q_set_ops", "q_pivot", "q_anti_join",
    "q_scalar_subquery", "q_correlated_min", "q_window_topk",
    "q_window_running", "q_cube", // q_percentiles: quantile_cont is DuckDB-only
    "dd_exact") // md5 + GROUP BY ordinal run identically on both engines

  private lazy val viewsReady: Unit = {
    val t = Tables(spark, sf("sf0.001"))
    Seq("region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }

  ansiPortable.foreach { name =>
    test(s"$name: oracle SQL runs on Spark SQL with identical results") {
      viewsReady
      val sql = SparkEntry.oracleSql(name)
      val viaSql = spark.sql(sql).collect().map(_.toString).sorted.toSeq
      val viaDf = QueryRegistry.byName(name).run(spark, sf("sf0.001"))
        .collect().map(_.toString).sorted.toSeq
      assert(viaSql == viaDf, s"$name: SQL and DataFrame results differ")
    }
  }

  /** Dedup/similarity queries re-expressed VERBATIM in pure Spark SQL
    * through the kernels `GraftExtensions.register` injects — the
    * cluster-config (`spark.sql.extensions`) surface: a SQL-only user
    * gets the same native codegen'd kernels as the Column API.
    */
  private def sqlParity(name: String, sql: String): Unit =
    test(s"$name: expressible in pure Spark SQL via registered kernels") {
      viewsReady
      GraftExtensions.register(spark)
      val viaSql = spark.sql(sql).collect().map(_.toString).sorted.toSeq
      val viaDf = QueryRegistry.byName(name).run(spark, sf("sf0.001"))
        .collect().map(_.toString).sorted.toSeq
      assert(viaSql.nonEmpty && viaSql == viaDf,
        s"$name: SQL-surface and DataFrame results differ")
    }

  sqlParity("dd_dup_passages", """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
      WHERE source = 'src0'
    ), postings AS (
      SELECT doc_id, explode(shingle_hash32(text, 10)) AS s FROM corpus
    ), shared AS (
      SELECT s, count(1) AS df FROM postings GROUP BY s HAVING count(1) > 1
    )
    SELECT doc_id, count(1) AS n_shared_passages, max(df) AS max_spread
    FROM postings JOIN shared USING (s)
    GROUP BY doc_id ORDER BY doc_id""")

  sqlParity("dd_simhash", """
    SELECT doc_id, simhash60(text) AS simhash
    FROM documents
    WHERE size(filter(split(text, ' '), t -> length(t) > 0)) > 0
    ORDER BY doc_id""")

  /** The full MinHash+LSH band pipeline, end-to-end in SQL: the
    * shingle kernel comes from the extension registry; the 16 affine
    * rehashes, band keys, the ≤50-docs-per-band cap, the band
    * self-join, and the candidate Jaccard are all plain Spark SQL —
    * built from the SAME hashParams the DataFrame pipeline uses, so
    * the two cannot drift.
    */
  private val minhashSql: String = {
    val P = dedup.DedupQueries.MinhashP
    val mhList = dedup.DedupQueries.hashParams.map { case (a, b) =>
      s"array_min(transform(sh, h -> (h * $a + $b) % $P))"
    }.mkString("array(", ", ", ")")
    val bandList = (0 until 4).map { bnd =>
      val rows = (0 until 4)
        .map(r => s"CAST(element_at(mh, ${bnd * 4 + r + 1}) AS STRING)")
      s"concat_ws(':', '$bnd', ${rows.mkString(", ")})"
    }.mkString("array(", ", ", ")")
    s"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
      WHERE source = 'src0'
    ), sh AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id, shingle_hash32(text, 3) AS sh FROM corpus)
      WHERE size(sh) > 0
    ), mh AS (SELECT doc_id, sh, $mhList AS mh FROM sh),
    bands0 AS (SELECT doc_id, explode($bandList) AS bh FROM mh),
    bands AS (
      SELECT doc_id, bh FROM (
        SELECT doc_id, bh, count(1) OVER (PARTITION BY bh) AS bc
        FROM bands0)
      WHERE bc <= 50
    ), cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
      round(CAST(size(array_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        (size(sa.sh) + size(sb.sh) - size(array_intersect(sa.sh, sb.sh))), 4)
        AS jaccard
    FROM cands
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
    ORDER BY id_a, id_b"""
  }
  sqlParity("dd_minhash_lsh", minhashSql)

  /** dd_ngram_jaccard's DECLARED semantics (shared-shingle pairs with
    * df ∈ [2,50] and rounded Jaccard ≥ 0.5) in pure Spark SQL. The
    * DataFrame pipeline runs a sorted adjacent-group pair scan with a
    * PPJoin length filter (a pure optimization: pairs it drops cannot
    * reach 0.5); this join formulation is the semantics stated
    * directly — the two must agree row-for-row.
    */
  sqlParity("dd_ngram_jaccard", """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
      WHERE source = 'src0'
    ), sh AS (
      SELECT doc_id, shingle_hash32(text, 3) AS sh FROM corpus
    ), postings AS (
      SELECT doc_id, size(sh) AS sz, explode(sh) AS s FROM sh
    ), capped AS (
      SELECT s FROM postings GROUP BY s HAVING count(1) BETWEEN 2 AND 50
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sz AS sa, b.sz AS sb, count(1) AS inter
      FROM postings a
        JOIN capped USING (s)
        JOIN postings b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
      round(CAST(inter AS DOUBLE) / (sa + sb - inter), 4) AS jaccard
    FROM pairs
    WHERE round(CAST(inter AS DOUBLE) / (sa + sb - inter), 4) >= 0.5
    ORDER BY id_a, id_b""")

  sqlParity("tx_fingerprint", """
    SELECT doc_id,
      md5(concat_ws(' ', array_sort(array_distinct(
        filter(split(text, ' '), x -> length(x) > 0))))) AS fp
    FROM documents ORDER BY doc_id""")

  sqlParity("ss_cosine_topk", """
    WITH queries AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
    ), scored AS (
      SELECT qid, e.vec_id AS nid, cosine_similarity(qv, e.embedding) AS cos
      FROM embeddings e JOIN queries ON e.vec_id <> qid
    ), ranked AS (
      SELECT qid, nid, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
      FROM scored)
    SELECT qid, rk, nid, round(cos, 4) AS cos
    FROM ranked WHERE rk <= 5 ORDER BY qid, rk""")

  sqlParity("ss_vector_stats", """
    SELECT label, count(1) AS n,
      round(min(norm), 4) AS min_norm, round(max(norm), 4) AS max_norm
    FROM (SELECT label, l2_norm(embedding) AS norm FROM embeddings)
    GROUP BY label ORDER BY label""")

  sqlParity("ss_quantize", """
    SELECT label, CAST(count(1) AS BIGINT) AS n,
      round(min(rel_err), 4) AS min_err, round(max(rel_err), 4) AS max_err,
      round(min(scale), 6) AS min_scale, round(max(scale), 6) AS max_scale
    FROM (SELECT label, max_abs(embedding) / 127.0 AS scale,
            quant_rel_err(embedding) AS rel_err FROM embeddings)
    GROUP BY label ORDER BY label""")

  test("subvec_sqdist: SQL function matches the Column API, literals enforced") {
    viewsReady
    GraftExtensions.register(spark)
    val cent = Array(0.5f, -0.25f)
    val viaSql = spark.sql(
      "SELECT vec_id, subvec_sqdist(embedding, 16, CAST(0.5 AS FLOAT), " +
        "CAST(-0.25 AS FLOAT)) AS d FROM embeddings ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaDf = Tables(spark, sf("sf0.001")).embeddings
      .select(col("vec_id"),
        functions.VectorFunctions.subvecSqDist(col("embedding"), 16, cent)
          .as("d"))
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql.nonEmpty && viaSql == viaDf)
    // a non-literal centroid component must be rejected at analysis
    val err = intercept[Exception] {
      spark.sql("SELECT subvec_sqdist(embedding, 0, l2_norm(embedding)) " +
        "FROM embeddings").collect()
    }
    assert(err.getMessage.contains("literal"),
      s"unexpected rejection message: ${err.getMessage}")
  }
}
