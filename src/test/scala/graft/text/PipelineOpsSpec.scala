package graft.text

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.Row

/** Semantics of the round-2 training-data-pipeline operators: TF-IDF
  * ranking, repetition filters, PII redaction, and benchmark
  * decontamination (value-level parity with DuckDB is the driver's
  * oracle gate; these pin the declared behaviors).
  */
class PipelineOpsSpec extends SparkSuite {

  private def run(name: String) =
    QueryRegistry.byName(name).run(spark, sf("sf0.001"))

  test("tx_vocab: top-25 by count, monotone coverage curve") {
    val rows = run("tx_vocab").collect()
    assert(rows.length == 25)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 25))
    // counts non-increasing in rank; ties broken by term ascending
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    rows.sliding(2).foreach {
      case Array(a, b) if a.getLong(2) == b.getLong(2) =>
        assert(a.getString(1) < b.getString(1))
      case _ =>
    }
    // cumulative share is monotone, consistent with shares, and ≤ 1
    val cums = rows.map(_.getDouble(4))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last <= 1.0)
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(cums.last - shareSum) < 0.01,
      s"cum ${cums.last} vs share-sum $shareSum")
  }

  test("tx_tfidf: exactly 5 terms per document, ranked by (tf, rarity)") {
    val rows = run("tx_tfidf").collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.values.forall(_.length == 5))
    // within a doc no omitted term may strictly dominate a kept one
    // (higher tf would have outranked it) — spot-check tf ordering holds
    perDoc.values.foreach { docRows =>
      val tfs = docRows.map(_.getLong(2))
      assert(tfs.min >= 1)
    }
    // tfidf = tf * ln(N/df) (rounded), spot-checked on one row
    val r = rows.head
    val n = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    val expect = BigDecimal(r.getLong(2) * math.log(n.toDouble / r.getLong(3)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(4) - expect) < 1e-9)
  }

  test("tx_repetition: ratios are in [0,1] and verdict matches thresholds") {
    val rows = run("tx_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dupTok = r.getDouble(2); val dupTri = r.getDouble(3)
      val topBg = r.getDouble(4); val verdict = r.getString(5)
      assert(dupTok >= 0 && dupTok <= 1)
      assert(dupTri >= 0 && dupTri <= 1)
      assert(topBg > 0 && topBg <= 1)
      val drop = topBg > 0.18 || dupTri > 0.95
      assert(verdict == (if (drop) "drop" else "keep"))
    }
  }

  test("tx_pii_redact: exactly the planted slice surfaces, fully counted") {
    val rows = run("tx_pii_redact").collect()
    assert(rows.nonEmpty)
    // the synthetic corpus is PII-free: every surfaced doc is planted
    assert(rows.forall(_.getLong(0) >= 200000))
    // each planted doc carries 2 emails + 1 phone
    rows.foreach { r =>
      assert(r.getInt(1) == 2, s"emails in ${r}")
      assert(r.getInt(2) == 1, s"phones in ${r}")
    }
    // redaction removed every match: md5 of a redacted text never
    // equals the original text's md5 (planted suffix guarantees change)
    assert(rows.map(_.getString(3)).distinct.length == rows.length)
  }

  test("ProfileOverlap kernel == size(array_intersect) composition") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val profiles = Seq(Seq("ab", "bc", "éà"), Seq("cd"), Seq.empty[String])
    val df = Seq("abcd", "xxyy", "", "éàéà").toDF("text")
      .select(graft.functions.HashFunctions.charNgrams(col("text"), 2).as("g"))
    val kernel = df.select(graft.functions.HashFunctions
        .profileOverlap(col("g"), profiles).as("ov"))
      .collect().map(_.getSeq[Int](0)).toSeq
    val composed = df.select(array(profiles.map(p =>
        size(array_intersect(col("g"), typedLit(p.toArray)))): _*).as("ov"))
      .collect().map(_.getSeq[Int](0)).toSeq
    assert(kernel == composed)
  }

  test("tx_pack conserves tokens per shard; tx_chunks covers every token") {
    import org.apache.spark.sql.functions._
    // packing moves every token into exactly one (source, bin) manifest
    // row — totals per shard must match the raw corpus
    val packed = run("tx_pack")
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("packed"))
    val raw = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("source"),
        size(filter(split(col("text"), " "), t => length(t) > 0)).as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("raw"))
    val joined = packed.join(raw, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getAs[Long]("packed") == r.getAs[Long]("raw")))
    // chunk windows advance by 24 over 32-token windows: the chunks of
    // a doc must cover all its tokens, and the last chunk must not be
    // wider than a full window
    val ch = run("tx_chunks").collect()
    assert(ch.exists(_.getAs[Int]("n_chunks") > 1), "no doc ever chunked")
    ch.foreach { r =>
      val (n, k, last) = (r.getAs[Int]("n_tokens"),
        r.getAs[Int]("n_chunks"), r.getAs[Int]("last_chunk_tokens"))
      if (n == 0) assert(k == 0)
      else {
        assert(24 * (k - 1) < n, s"empty trailing chunk: n=$n k=$k")
        assert(24 * (k - 1) + 32 >= n, s"tokens uncovered: n=$n k=$k")
        assert(last == n - 24 * (k - 1) && last <= 32,
          s"bad last chunk: n=$n k=$k last=$last")
      }
    }
  }

  test("tx_split: partitions the corpus exactly, deterministically, ~2/3/95") {
    val rows = run("tx_split").collect()
    val splits = rows.map(_.getString(1)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // every document lands in exactly one split: totals reconcile
    val total = rows.map(_.getLong(2)).sum
    val nDocs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    assert(total == nDocs, s"split manifest lost docs: $total != $nDocs")
    // hash gate, not rand(): a second run is byte-identical
    assert(run("tx_split").collect().toSeq == rows.toSeq)
    // the bucket thresholds hold corpus-wide (2% test / 3% val target;
    // wide tolerance — 500 docs at sf0.001)
    val byS = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(byS.getOrElse("train", 0L) > (nDocs * 8) / 10)
    assert(byS.getOrElse("test", 0L) + byS.getOrElse("val", 0L) < nDocs / 5)
  }

  test("tx_shards: 16 shards, every doc placed, hash actually mixes sources") {
    val rows = run("tx_shards").collect()
    assert(rows.length == 16)
    assert(rows.map(_.getLong(0)).toSet == (0L until 16L).toSet)
    val nDocs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val nSources = r.getLong(3); val topShare = r.getDouble(4)
      // scatter quality: no shard is a single-source run; the top
      // source never dominates a shard outright
      assert(nSources > 1, s"shard ${r.getLong(0)} is single-source")
      assert(topShare < 0.5, s"shard ${r.getLong(0)} dominated: $topShare")
      assert(topShare >= 1.0 / nSources - 1e-9)
    }
  }

  test("tx_mix_rebalance: weights cap at 1 and planned tokens never grow") {
    val rows = run("tx_mix_rebalance").collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 0.01, s"shares sum ${shares.sum}")
    rows.foreach { r =>
      val (tok, w, planned) =
        (r.getLong(1), r.getDouble(3), r.getLong(4))
      assert(w > 0 && w <= 1.0)
      assert(planned <= tok, s"rebalance grew ${r.getString(0)}")
      assert(planned == math.floor(w * tok).toLong)
    }
    // an under-represented source passes through whole (weight 1)
    assert(rows.exists(_.getDouble(3) == 1.0),
      "no source at weight 1 — target mixture unreachable for all?")
  }

  test("tx_mix_temperature: matches an independent recompute; boosts point the right way") {
    import org.apache.spark.sql.functions._
    // independent driver-side recompute from raw token counts
    val counts = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ").count(_.nonEmpty).toLong)
      .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).sum }
    val total = counts.values.sum
    val w = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble / total) * 1000000.0).toLong
    }
    val tw = w.values.sum
    val rows = run("tx_mix_temperature").collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val (src, n) = (r.getString(0), r.getLong(1))
      assert(n == counts(src))
      val share = BigDecimal(n.toDouble / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val tWeight = BigDecimal(w(src).toDouble / tw)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == share, s"$src share")
      assert(r.getDouble(3) == tWeight, s"$src temp_weight")
      assert(r.getLong(4) ==
        math.floor(w(src).toDouble * total / tw).toLong, s"$src planned")
      // temperature PULLS TOWARD uniform: above-average sources damp
      // (boost < 1), below-average sources amplify (boost > 1)
      val boost = r.getDouble(5)
      val natural = n.toDouble / total
      if (natural > 1.0 / counts.size) assert(boost < 1.0, s"$src should damp")
      if (natural < 1.0 / counts.size) assert(boost > 1.0, s"$src should amplify")
    }
    // planned tokens stay within ppm-flooring slack of the budget
    val planned = rows.map(_.getLong(4)).sum
    assert(planned <= total && planned >= (total * 0.999).toLong,
      s"planned $planned vs budget $total")
  }

  test("tx_filter_funnel: one reason per doc, shares sum to 1 per source") {
    val rows = run("tx_filter_funnel").collect()
    val reasons = Set("empty", "too_short", "too_long", "low_stopword",
      "high_stopword", "repetitive", "keep")
    assert(rows.map(_.getString(1)).toSet.subsetOf(reasons))
    // first-failing-gate attribution: every doc charged exactly once
    val nDocs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val pctSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pctSum - 1.0) < 0.005, s"$src pct sum $pctSum")
    }
    // the synthetic corpus is mostly clean prose: keep dominates
    val kept = rows.filter(_.getString(1) == "keep").map(_.getLong(2)).sum
    assert(kept > nDocs / 2, s"keep rate collapsed: $kept/$nDocs")
  }

  test("dd_decontaminate: planted contamination surfaces; bench never flagged") {
    val rows = run("dd_decontaminate").collect()
    // the fixture plants every bench doc back as doc_id + 200000, so
    // the result must be non-empty — a vacuous 0-row pass would hide a
    // broken gram hash / join key / slice predicate
    assert(rows.nonEmpty, "no contamination surfaced: fixture broken")
    rows.foreach { r =>
      assert(r.getLong(0) % 97 != 0, s"benchmark doc flagged: $r")
      assert(r.getLong(1) > 0)
    }
    // every planted copy (id ≥ 200000, source id ≡ 0 mod 97) is flagged
    val flagged = rows.map(_.getLong(0)).toSet
    val planted = flagged.filter(_ >= 200000)
    assert(planted.nonEmpty, "no planted copy flagged")
    assert(planted.forall(id => (id - 200000) % 97 == 0))
  }

  test("tx_dataset_card: card rows agree with the signals they compose") {
    val rows = run("tx_dataset_card").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    import org.apache.spark.sql.functions._
    val srcCounts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == srcCounts.keySet)
    // the planted src0 re-ingest: doubled docs, dup_rate exactly 0.5;
    // every other source is clean
    rows.foreach { case (src, r) =>
      val base = srcCounts(src)
      if (src == "src0") {
        assert(r.getAs[Long]("n_docs") == 2 * base)
        assert(r.getAs[Double]("dup_rate") == 0.5)
      } else {
        assert(r.getAs[Long]("n_docs") == base)
        assert(r.getAs[Double]("dup_rate") == 0.0)
      }
      val kr = r.getAs[Double]("keep_rate")
      assert(kr >= 0.0 && kr <= 1.0)
    }
    // keep_rate composes the EXACT tx_quality verdict: the weighted sum
    // over sources must equal the corpus-wide keep count (src0 keeps
    // count double, matching its doubled docs)
    val quality = run("tx_quality").collect()
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keepBySrc = quality.groupBy(r => srcOf(r.getAs[Long]("doc_id")))
      .view.mapValues(_.count(_.getAs[String]("verdict") == "keep")).toMap
    rows.foreach { case (src, r) =>
      val mult = if (src == "src0") 2 else 1
      val expect = keepBySrc.getOrElse(src, 0) * mult
      val got = math.round(r.getAs[Double]("keep_rate") *
        r.getAs[Long]("n_docs"))
      assert(math.abs(got - expect) <= 1, s"$src keep count $got != $expect")
    }
  }

  test("tx_novelty equals a driver-side recomputation over the same hashes") {
    // independent truth: same declared semantics (distinct 8-gram
    // 32-bit md5-prefix hashes per doc), computed with none of the
    // query's machinery
    def hash32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val gramsByDoc = docs.map { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      id -> t.sliding(8).filter(_.length == 8)
        .map(g => hash32(g.mkString(" "))).toSet
    }.filter(_._2.nonEmpty).toMap
    val df = gramsByDoc.values.flatten
      .groupBy(identity).map { case (h, hs) => h -> hs.size }
    val got = run("tx_novelty").collect()
    assert(got.length == gramsByDoc.size)
    got.foreach { r =>
      val id     = r.getAs[Long]("doc_id")
      val grams  = gramsByDoc(id)
      val shared = grams.count(h => df(h) > 1)
      assert(r.getAs[Long]("n_grams") == grams.size, s"doc $id gram count")
      assert(r.getAs[Long]("n_shared") == shared, s"doc $id shared count")
      val nov = BigDecimal(1.0 - shared.toDouble / grams.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("novelty") - nov) < 5e-4, s"doc $id")
    }
    // the corpus must make the audit non-vacuous in both directions
    assert(got.exists(_.getAs[Long]("n_shared") > 0), "no shared grams")
    assert(got.exists(r =>
      r.getAs[Long]("n_shared") < r.getAs[Long]("n_grams")), "all shared")
  }

  test("tx_pack_eval: matches a driver-side brute force; waste falls as " +
      "context shrinks, truncation exposure rises with it") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val rows = graft.QueryRegistry.byName("tx_pack_eval").run(spark, dir)
      .collect().map(r => r.getAs[Long]("ctx_len") -> r).toMap
    val ns = graft.Tables(spark, dir).documents
      .select(size(graft.text.TextQueries.toks(col("text"))).cast("long"))
      .collect().map(_.getLong(0))
    Seq(64L, 128L, 256L, 512L).foreach { l =>
      val r = rows(l)
      val isoBins = ns.map(n => (n + l - 1) / l).sum
      val total = ns.sum
      assert(r.getAs[Long]("n_docs") == ns.length)
      assert(r.getAs[Long]("total_tokens") == total)
      assert(r.getAs[Long]("n_docs_over") == ns.count(_ > l))
      assert(r.getAs[Long]("iso_bins") == isoBins)
      assert(r.getAs[Long]("pad_tokens") == isoBins * l - total)
      assert(r.getAs[Long]("min_bins") == (total + l - 1) / l)
    }
    // the trade the report exists to show: a shorter context wastes
    // fewer pad tokens per bin but splits more documents
    val over = Seq(64L, 128L, 256L, 512L).map(l => rows(l).getAs[Long]("n_docs_over"))
    assert(over == over.sorted.reverse, s"docs_over not monotone: $over")
    assert(over.head > over.last, "ladder is vacuous on this corpus")
  }

  test("tx_eval_sample: exact quota per stratum, hash-min selection, " +
      "replayable") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val q = graft.QueryRegistry.byName("tx_eval_sample")
    val got = q.run(spark, dir).collect()
    assert(got.nonEmpty)
    // brute-force the strata and the hash order driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = java.lang.Long.parseLong(
      md.digest(s"eval1:$id".getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString, 16)
    val strata = graft.text.TextQueries.qualityScored(spark, dir)
      .select(col("doc_id"), col("verdict"))
      .join(graft.Tables(spark, dir).documents.select(col("doc_id"), col("lang")),
        "doc_id")
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("verdict"),
        r.getAs[Long]("doc_id")))
      .groupBy(t => (t._1, t._2))
    val bySt = got.groupBy(r =>
      (r.getAs[String]("lang"), r.getAs[String]("verdict")))
    assert(bySt.keySet == strata.keySet, "strata coverage differs")
    bySt.foreach { case (st, rows) =>
      val want = strata(st).map(_._3).sortBy(id => (h(id), id))
        .take(5).toVector
      val gotIds = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("doc_id"))
        .toVector
      assert(gotIds == want, s"stratum $st: $gotIds != $want")
      assert(rows.length == math.min(5, strata(st).length))
    }
    // byte-replayable: a second run returns the identical sample
    val again = q.run(spark, dir).collect().map(_.toString).sorted.toSeq
    assert(again == got.map(_.toString).sorted.toSeq)
  }
}
