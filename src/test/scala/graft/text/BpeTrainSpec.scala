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
