package graft.text

import graft.{QueryRegistry, SparkSuite}

/** tx_bpe_train semantics: the learned merge table must equal an
  * independent driver-side reference trainer (word-frequency table →
  * overlap-counted pair frequencies → lexicographic-tiebroken argmax →
  * greedy left-to-right merge), and the tokens_after column must obey
  * the overlap bounds the query documents.
  */
class BpeTrainSpec extends SparkSuite {

  /** Reference trainer, deliberately written list-at-a-time (no Spark,
    * no SQL) so it shares nothing with either gated implementation.
    */
  private def referenceTrain(dir: String, rounds: Int)
      : (Seq[(Int, String, String, Long, Long)], Long) = {
    val words = spark.read.parquet(dir + "/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    var state: Map[Vector[String], Long] = words.toSeq
      .map { case (w, f) => w.toVector.map(_.toString) -> f }
      .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).sum }
    val tokensBefore = state.map { case (s, f) => s.length * f }.sum
    val out = (1 to rounds).map { round =>
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
        }
      }
      val ((l, r), cnt) = pairCounts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      def merge(syms: Vector[String]): Vector[String] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += x
        }
        out.toVector
      }
      state = state.toSeq.map { case (s, f) => merge(s) -> f }
        .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).sum }
      val tokensAfter = state.map { case (s, f) => s.length * f }.sum
      (round, l, r, cnt, tokensAfter)
    }
    (out, tokensBefore)
  }

  test("tx_bpe_train: merge table matches the reference trainer (sf0.001)") {
    val (expect, tokensBefore) = referenceTrain(sf("sf0.001"), 4)
    val got = QueryRegistry.byName("tx_bpe_train")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // overlap bounds: each round's token-count drop is in [cnt/2, cnt]
    var before = tokensBefore
    got.foreach { case (round, _, _, cnt, after) =>
      val drop = before - after
      assert(drop <= cnt && 2 * drop >= cnt,
        s"round $round: drop $drop outside [${cnt / 2.0}, $cnt]")
      before = after
    }
    // merged pairs are distinct across rounds (a merged pair cannot
    // re-win: all its occurrences were consumed)
    assert(got.map(g => (g._2, g._3)).distinct.size == got.size)
  }

  /** Reference ENCODER: greedy left-to-right application of a merge
    * list in training order — list-at-a-time Scala, sharing nothing
    * with the engine's nested fold expressions or the oracle's CTEs.
    */
  private def referenceEncode(word: String,
      merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.toVector.map(_.toString)
    merges.foreach { case (l, r) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == l && x == r) {
          out.remove(out.length - 1); out += (l + r)
        } else out += x
      }
      syms = out.toVector
    }
    syms
  }

  test("tx_bpe_encode: encode∘train round-trips against the reference encoder (sf0.001)") {
    val (trained, _) = referenceTrain(sf("sf0.001"), 4)
    val merges = trained.map(m => (m._2, m._3))
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val encCache = scala.collection.mutable.HashMap.empty[String, Vector[String]]
    def enc(w: String) = encCache.getOrElseUpdate(w, referenceEncode(w, merges))
    // vocab ids: 1-based rank of the FINAL symbol alphabet in byte
    // order (ASCII corpus — Java compareTo agrees; see bpeTrain's note)
    val vocabIds = docs
      .flatMap(_._2.split(" ").filter(_.nonEmpty)).distinct
      .flatMap(enc).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val expect = docs.flatMap { case (id, text) =>
      val words = text.split(" ").filter(_.nonEmpty)
      if (words.isEmpty) None
      else {
        val nWs = words.length.toLong
        val nBpe = words.map(enc(_).length.toLong).sum
        val idSum = words.map(enc(_).map(vocabIds).sum).sum
        val compression = BigDecimal(nBpe.toDouble / nWs)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some(id -> ((nWs, nBpe, compression, idSum)))
      }
    }.toMap
    val got = QueryRegistry.byName("tx_bpe_encode")
      .run(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, g) =>
      assert(g == expect(id), s"doc $id: got $g expect ${expect(id)}")
    }
    // the trained merges genuinely compress: every doc's BPE count is
    // strictly below its character count and at least its word count
    val chars = docs.toMap
    got.foreach { case (id, (nWs, nBpe, _, _)) =>
      val nChars = chars(id).split(" ").filter(_.nonEmpty).map(_.length.toLong).sum
      assert(nBpe >= nWs && nBpe <= nChars, s"doc $id: $nWs ≤ $nBpe ≤ $nChars violated")
    }
  }

  test("tx_bpe_vocab: the vocab file matches the reference encoder's alphabet and counts (sf0.001)") {
    val (trained, _) = referenceTrain(sf("sf0.001"), 4)
    val merges = trained.map(m => (m._2, m._3))
    val words = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    val occ = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      referenceEncode(w, merges).foreach(s =>
        occ.update(s, occ.getOrElse(s, 0L) + f))
    }
    val total = occ.values.sum
    val expect = occ.keys.toSeq.sorted.zipWithIndex.map { case (s, i) =>
      val share = BigDecimal(occ(s).toDouble / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i + 1L, s, occ(s), share, s.length > 1)
    }
    val got = QueryRegistry.byName("tx_bpe_vocab")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == expect, s"first diff: ${got.zip(expect).find(p => p._1 != p._2)}")
    // every multi-char vocab symbol is the output of some learned
    // merge (an earlier merge's output may be consumed by a later
    // one, but the LAST merge's output always survives)
    val outputs = merges.map { case (l, r) => l + r }.toSet
    assert(got.filter(_._5).forall(v => outputs.contains(v._2)))
    assert(got.exists(_._2 == merges.last._1 + merges.last._2))
  }

  test("tx_pack_bpe: bins match a window formulation over reference-encoded counts (sf0.001)") {
    val (trained, _) = referenceTrain(sf("sf0.001"), 4)
    val merges = trained.map(m => (m._2, m._3))
    val encCache = scala.collection.mutable.HashMap.empty[String, Long]
    def encLen(w: String) =
      encCache.getOrElseUpdate(w, referenceEncode(w, merges).length.toLong)
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (src, arr) =>
      var prior = 0L
      arr.sortBy(_._2).map { case (_, _, text) =>
        val n = text.split(" ").filter(_.nonEmpty).map(encLen).sum
        val bin = prior / 256L
        prior += n
        (src, bin, n)
      }
    }.groupBy { case (src, bin, _) => (src, bin) }
      .map { case ((src, bin), rows) =>
        (src, bin) -> ((rows.size.toLong, rows.map(_._3).sum))
      }
    val got = QueryRegistry.byName("tx_pack_bpe")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("tx_bpe_train: greedy fold handles overlapping runs like the reference") {
    // 'aaaa' with merge (a,a) must become (aa)(aa), not (aa)a a or
    // a cascaded (aaa)a — exercise the engine's fold directly
    import spark.implicits._
    val df = Seq(("aaaa", Seq("a", "a", "a", "a"))).toDF("word", "syms")
    val merged = df.selectExpr(
      """aggregate(syms, cast(array() as array<string>),
          (acc, x) -> CASE
            WHEN size(acc) > 0 AND element_at(acc, -1) = 'a' AND x = 'a'
              THEN concat(slice(acc, 1, size(acc) - 1), array('aa'))
            ELSE concat(acc, array(x)) END) AS m""").head().getSeq[String](0)
    assert(merged == Seq("aa", "aa"))
  }
}
