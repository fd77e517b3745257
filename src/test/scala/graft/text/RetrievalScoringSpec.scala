package graft.text

import graft.{QueryRegistry, SparkSuite}

/** Semantics of the retrieval/LM scoring operators: BM25 ranking and
  * the bigram-LM quality score, each pinned against an independent
  * driver-side brute-force recomputation from the raw parquet (the
  * DuckDB hash gate checks cross-engine parity; these check the MATH).
  */
class RetrievalScoringSpec extends SparkSuite {

  private def run(name: String) =
    QueryRegistry.byName(name).run(spark, sf("sf0.001"))

  private def tokens(dir: String): Map[Long, Array[String]] =
    spark.read.parquet(dir + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .toMap

  private def r4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tx_bm25: top-25 matches a driver-side brute-force BM25") {
    val qTerms = Seq("join", "vector", "window", "stream")
    val nz = tokens(sf("sf0.001")).filter(_._2.nonEmpty)
    val n = nz.size
    val avgdl = nz.valuesIterator.map(_.length.toLong).sum.toDouble / n
    val df = qTerms.map(t => t -> nz.count(_._2.contains(t))).toMap
    val scored = nz.toSeq.flatMap { case (id, t) =>
      val s = qTerms.map { term =>
        val tf = t.count(_ == term)
        if (tf == 0) 0.0
        else math.log(1 + (n - df(term) + 0.5) / (df(term) + 0.5)) *
          (tf * 2.2) /
          (tf + 1.2 * (1 - 0.75 + 0.75 * t.length / avgdl))
      }.sum
      if (s > 0) Some(id -> r4(s)) else None
    }
    val expect = scored.sortBy { case (id, sc) => (-sc, id) }.take(25)
    val got = run("tx_bm25").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) == expect.map(_._1),
      s"rank order differs: got $got expect $expect")
    got.zip(expect).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) <= 1e-4, s"score $g vs brute $e")
    }
    // rank column well-formed, scores non-increasing, doc_id tiebreak
    val rows = run("tx_bm25").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.sliding(2).foreach {
      case Array(a, b) if a.getDouble(2) == b.getDouble(2) =>
        assert(a.getLong(1) < b.getLong(1))
      case _ =>
    }
  }

  test("tx_lm_score: per-doc mean bigram log-prob matches brute force") {
    val toks = tokens(sf("sf0.001"))
    val docBigrams: Map[Long, Seq[(String, String)]] = toks.collect {
      case (id, t) if t.length >= 2 => id -> t.toSeq.zip(t.tail.toSeq)
    }
    val cb = docBigrams.valuesIterator.flatten.toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cl = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val v = toks.valuesIterator.flatten.toSet.size
    val rows = run("tx_lm_score").collect()
    assert(rows.map(_.getLong(0)).toSet == docBigrams.keySet)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bgs = docBigrams(id)
      assert(r.get(1).toString.toLong == bgs.length)
      val brute = bgs.map { bg =>
        math.log((cb(bg) + 1.0) / (cl(bg._1) + v))
      }.sum / bgs.length
      assert(math.abs(r.getDouble(2) - r4(brute)) <= 1e-4,
        s"doc $id: ${r.getDouble(2)} vs brute ${r4(brute)}")
      // add-one smoothed probabilities are < 1, so the mean log is < 0
      assert(r.getDouble(2) < 0)
    }
  }

  test("tx_lm_score: common-bigram docs outscore a rare-bigram doc") {
    // the doc whose bigrams are most frequent in the corpus must not
    // be the most surprising one — a sanity direction check that the
    // model actually conditions on corpus statistics
    val rows = run("tx_lm_score").collect()
    val scores = rows.map(_.getDouble(2))
    assert(scores.max > scores.min, "scores must discriminate")
  }

  test("tx_bm25_probe: identical rows to tx_bm25, postings scan " +
      "partition-pruned to the query terms' buckets, build idempotent") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val direct = run("tx_bm25").collect().map(_.toString).toSeq
    val probed = graft.QueryRegistry.byName("tx_bm25_probe")
      .run(spark, dir).collect().map(_.toString).toSeq
    assert(probed == direct, "probe diverged from the index-less scorer")
    // the serving property the index exists for: the postings scan
    // carries a static partition filter on the term-hash buckets
    val idx = graft.text.TextQueries.buildTextIndex(spark, dir)
    val qTerms = Seq("join", "vector", "window", "stream")
    import spark.implicits._
    val bkts = qTerms.toDF("term")
      .select(pmod(hash(col("term")),
        lit(graft.text.TextQueries.TextIndexBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val pruned = spark.read.parquet(s"$idx/postings")
      .filter(col("bkt").isin(bkts.toSeq.map(Integer.valueOf): _*))
    val plan = pruned.queryExecution.executedPlan.toString
    // (inputFiles can't verify this — it lists the relation WITHOUT
    // pruning; the plan's PartitionFilters is the planning-time fact)
    assert(plan.contains("PartitionFilters: [bkt"),
      s"postings scan not partition-pruned:\n$plan")
    val read = pruned.select(col("bkt")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(read.subsetOf(bkts), s"rows from unprobed buckets: $read")
    // idempotent: a second build call must short-circuit on the marker
    assert(graft.text.TextQueries.buildTextIndex(spark, dir) == idx)
  }

  test("tx_lm_holdout: matches a first-principles trigram holdout; " +
      "unseen mass is real and never trains the model") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = java.lang.Long.parseLong(
      md.digest(s"split1:$id".getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString, 16) % 100
    def trigrams(t: Seq[String]) =
      t.sliding(3).filter(_.size == 3).map(w =>
        (s"${w(0)} ${w(1)}", s"${w(0)} ${w(1)} ${w(2)}")).toSeq
    val train = docs.filter { case (id, _) => bucket(id) >= 5 }
    val cb = train.values.flatMap(trigrams).groupBy(_._2)
      .map { case (g, xs) => g -> xs.size.toLong }
    val cl = train.values.flatMap(trigrams).groupBy(_._1)
      .map { case (c, xs) => c -> xs.size.toLong }
    val v = train.values.flatten.toSet.size.toLong
    val got = graft.QueryRegistry.byName("tx_lm_holdout").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val testDocs = docs.filter { case (id, t) => bucket(id) < 2 && t.size >= 3 }
    assert(got.keySet == testDocs.keySet,
      "scored set != test-split docs with >= 3 tokens")
    testDocs.foreach { case (id, t) =>
      val tgs = trigrams(t)
      val slp = tgs.map { case (c, g) =>
        math.log((cb.getOrElse(g, 0L) + 1.0) / (cl.getOrElse(c, 0L) + v))
      }.sum
      val r = got(id)
      assert(r.getLong(1) == t.size - 2, s"doc $id n_trigrams")
      assert(r.getLong(2) == tgs.count(x => !cb.contains(x._2)),
        s"doc $id oov_trigrams")
      val want = BigDecimal(slp / (t.size - 2))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - want) < 5e-4,
        s"doc $id avg_logp ${r.getDouble(3)} != $want")
    }
    // the eval's reason to exist: genuinely unseen mass on this corpus
    assert(got.values.exists(_.getLong(2) > 0), "no OOV trigrams — vacuous")
  }
}
