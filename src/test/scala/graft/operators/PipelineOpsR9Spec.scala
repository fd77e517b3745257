package graft.operators

import graft.{QueryRegistry, SparkSuite}

/** Property pins for the round-9 pipeline operators that aren't
  * covered by a dedicated replay spec: internal-consistency and
  * cross-query agreement checks at sf0.001.
  */
class PipelineOpsR9Spec extends SparkSuite {

  private def run(name: String) =
    QueryRegistry.byName(name).run(spark, sf("sf0.001")).collect()

  test("ev_hll_rollup: guarantee holds and day spans match the data") {
    val got = run("ev_hll_rollup")
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("est_ok"),
        s"${r.getAs[String]("event_type")} estimate out of band")
      assert(r.getAs[Long]("n_days") > 0 && r.getAs[Long]("n_days") <= 30)
    }
  }

  test("ev_active_users: WAU bounds DAU and the union guarantee holds") {
    val got = run("ev_active_users")
    assert(got.length == 30)
    got.foreach { r =>
      // a 7-day union can never be smaller than its last day
      assert(r.getAs[Long]("wau_exact") >= r.getAs[Long]("dau"))
      assert(r.getAs[Boolean]("wau_ok"), s"${r.getAs[String]("day")}")
    }
  }

  test("tx_ppl_buckets: thirds are balanced and score-ordered per lang") {
    val got = run("tx_ppl_buckets")
    got.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val by = rs.map(r => r.getAs[String]("bucket") -> r).toMap
      assert(by.keySet == Set("head", "middle", "tail"), lang)
      val ns = Seq("head", "middle", "tail").map(by(_).getAs[Long]("n_docs"))
      assert(ns.max - ns.min <= 1, s"$lang ntile imbalance: $ns")
      // head holds the HIGHEST LM scores; ranges must be ordered
      assert(by("head").getAs[Double]("min_logp") >=
        by("middle").getAs[Double]("max_logp"), lang)
      assert(by("middle").getAs[Double]("min_logp") >=
        by("tail").getAs[Double]("max_logp"), lang)
      val share = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(share - 1.0) < 0.001, s"$lang shares sum to $share")
    }
  }

  test("dd_minhash_recall: counts are consistent and planted dups are found") {
    val r = run("dd_minhash_recall").head
    def l(c: String) = r.getAs[Long](c)
    // higher threshold → smaller truth; hits never exceed truth
    assert(l("truth_03") >= l("truth_05") && l("truth_05") >= l("truth_07"))
    Seq("03", "05", "07").foreach { t =>
      assert(l(s"hit_$t") <= l(s"truth_$t"))
      assert(l(s"hit_$t") <= l("n_cand"))
    }
    // the corpus plants exact duplicates (jaccard 1.0 ≥ 0.7): truth at
    // 0.7 is non-empty and the LSH front-end finds identical docs
    // (identical signatures share every band)
    assert(l("truth_07") > 0)
    assert(r.getAs[Double]("recall_07") == 1.0)
  }

  test("tx_tokenizer_eval agrees with tx_bpe_encode per language") {
    val enc = run("tx_bpe_encode")
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens")))).toMap
    val langOf = graft.Tables(spark, sf("sf0.001")).documents
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val expect = enc.groupBy { case (id, _) => langOf(id) }.view.mapValues {
      m => (m.size.toLong, m.values.map(_._1).sum, m.values.map(_._2).sum)
    }.toMap
    val got = run("tx_tokenizer_eval")
    assert(got.map(r => r.getAs[String]("lang") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("ws_tokens"),
        r.getAs[Long]("bpe_tokens")))).toMap == expect)
    got.foreach(r => assert(r.getAs[Double]("fertility") >= 1.0,
      "BPE can never produce fewer tokens than words"))
  }

  test("mm_storyboard agrees with mm_scenecut") {
    val cuts = run("mm_scenecut").map(r =>
      r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("n_cuts"), r.getAs[Long]("first_cut")))).toMap
    val sb = run("mm_storyboard").groupBy(_.getAs[Long]("media_id"))
    assert(sb.keySet == cuts.keySet)
    sb.foreach { case (id, frames) =>
      val ordered = frames.sortBy(_.getAs[Int]("slot"))
      // slot 0 is always frame 0; one keyframe per cut follows
      assert(ordered.head.getAs[Int]("frame_idx") == 0)
      assert(ordered.length == cuts(id)._1 + 1, s"media $id")
      if (cuts(id)._1 > 0)
        assert(ordered(1).getAs[Int]("frame_idx") == cuts(id)._2, s"media $id")
      ordered.foreach { f =>
        val lm = f.getAs[Long]("luma_mean")
        assert(lm >= 0 && lm <= 255)
      }
    }
  }

  test("mm_image_quality: verdicts recompute from the emitted sums") {
    val got = run("mm_image_quality")
    assert(got.nonEmpty)
    var lows = 0; var flats = 0; var passes = 0
    got.foreach { r =>
      val n = r.getAs[Long]("n_px")
      val s = r.getAs[Long]("luma_sum")
      val ss = r.getAs[Long]("luma_sumsq")
      val sharp = r.getAs[Long]("sharpness")
      val id = r.getAs[Long]("media_id")
      val w = id % 31 + 1; val h = id % 17 + 1
      assert(n == w * h)
      val low = ss * n - s * s < 400L * n * n
      val flat = sharp < 8L * (w - 1) * h
      assert(r.getAs[Boolean]("low_contrast") == low)
      assert(r.getAs[Boolean]("flat") == flat)
      assert(r.getAs[Boolean]("pass") == !(low || flat))
      if (low) lows += 1; if (flat) flats += 1
      if (r.getAs[Boolean]("pass")) passes += 1
    }
    // the corpus must exercise all three verdicts
    assert(lows > 0 && flats > 0 && passes > 0)
  }
}
