package graft.similarity

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.Row

/** Brute-force replays of the round-9 mining/rerank queries: both are
  * small enough at sf0.001 (500 vectors) to recompute exactly in local
  * Scala from the raw embeddings and compare decision-for-decision —
  * the property the DuckDB oracle cannot state (it mirrors the same
  * SQL; this spec derives the answer from first principles).
  */
class MiningRerankSpec extends SparkSuite {

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val vecs: Map[Long, (Array[Float], Int)] =
    graft.Tables(spark, sf("sf0.001")).embeddings.collect().map { r =>
      r.getAs[Long]("vec_id") ->
        ((r.getSeq[Float](r.fieldIndex("embedding")).toArray,
          r.getAs[Int]("label")))
    }.toMap

  test("ss_hard_negatives: triplets match a first-principles replay") {
    val rows = QueryRegistry.byName("ss_hard_negatives")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.length == 30) // 10 anchors × 3 negatives
    val byAnchor = rows.groupBy(_.getAs[Long]("qid"))
    assert(byAnchor.keySet == (0L until 10L).toSet)
    byAnchor.foreach { case (qid, trips) =>
      val (qv, qlabel) = vecs(qid)
      val scored = vecs.toSeq.collect {
        case (nid, (v, lab)) if nid != qid => (nid, lab, cosine(qv, v))
      }
      val expPos = scored.filter(_._2 == qlabel)
        .minBy { case (nid, _, c) => (-c, nid) }
      val expNegs = scored.filter(_._2 != qlabel)
        .sortBy { case (nid, _, c) => (-c, nid) }.take(3)
      val sorted = trips.sortBy(_.getAs[Int]("neg_rank"))
      sorted.zip(expNegs).foreach { case (row, (enid, _, ecos)) =>
        assert(row.getAs[Long]("pos_id") == expPos._1)
        assert(row.getAs[Double]("pos_cos") ==
          BigDecimal(expPos._3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        assert(row.getAs[Long]("neg_id") == enid)
        assert(row.getAs[Double]("neg_cos") ==
          BigDecimal(ecos).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      // hard negatives are rank-ordered by similarity, so margins are
      // non-decreasing in rank
      val margins = sorted.map(_.getAs[Double]("margin"))
      assert(margins.zip(margins.tail).forall { case (a, b) => a <= b })
    }
  }

  test("ss_mmr: greedy trajectory matches a first-principles replay") {
    val rows = QueryRegistry.byName("ss_mmr").run(spark, sf("sf0.001")).collect()
    assert(rows.length == 15) // 3 queries × 5 selections
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, sel) =>
      val (qv, _) = vecs(qid)
      val pool = vecs.toSeq.collect {
        case (nid, (v, _)) if nid != qid => (nid, v, cosine(qv, v))
      }.sortBy { case (nid, _, c) => (-c, nid) }.take(8)
      var selected = Vector(pool.minBy { case (nid, _, c) => (-c, nid) })
      while (selected.size < 5) {
        val rem = pool.filterNot(p => selected.exists(_._1 == p._1))
        val next = rem.minBy { case (nid, v, rel) =>
          val msim = selected.map(s => cosine(v, s._2)).max
          (-(0.5 * rel - 0.5 * msim), nid)
        }
        selected :+= next
      }
      val got = sel.sortBy(_.getAs[Int]("sel_rank")).map(_.getAs[Long]("nid"))
      assert(got.toVector == selected.map(_._1),
        s"qid=$qid got ${got.toList} expected ${selected.map(_._1).toList}")
    }
  }

  test("tx_sft_format: spans tile each conversation exactly") {
    val rows = QueryRegistry.byName("tx_sft_format")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    val convs = rows.groupBy(_.getAs[String]("conv_id"))
    convs.foreach { case (cid, turns) =>
      val ordered = turns.sortBy(_.getAs[Long]("turn_idx"))
      assert(ordered.length <= 6 && ordered.length % 2 == 0, cid)
      // spans tile [0, total) with no gaps or overlaps
      assert(ordered.head.getAs[Long]("seg_start") == 0L)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("seg_end") == b.getAs[Long]("seg_start"), cid)
        case _ => ()
      }
      ordered.foreach { r =>
        assert(r.getAs[Long]("seg_end") - r.getAs[Long]("seg_start") ==
          r.getAs[Long]("n_chars"))
        val isAsst = r.getAs[String]("role") == "assistant"
        assert(r.getAs[Boolean]("loss_masked") == isAsst)
        assert((r.getAs[Long]("turn_idx") % 2 == 1) == isAsst)
      }
    }
    // every doc contributes exactly two turns
    val nDocs = graft.Tables(spark, sf("sf0.001")).documents.count()
    assert(rows.length == 2 * nDocs)
  }
}
