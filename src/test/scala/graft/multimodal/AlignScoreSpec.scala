package graft.multimodal

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Brute-forces mm_align_score from first principles on the driver —
  * the image moments from the synthesis formula, the embedding
  * reduction from the raw vectors — and pins every output column,
  * plus the verdict's two defining properties: it equals the
  * divisionless integer compare exactly, and it agrees with the
  * real-valued cosine threshold it encodes.
  */
class AlignScoreSpec extends SparkSuite {

  private val dir = sf("sf0.001")
  private lazy val out =
    QueryRegistry.byName("mm_align_score").run(spark, dir).cache()

  private lazy val truth: Map[Long, (Long, Long, Long)] = {
    val embs = graft.Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    embs.map { case (id, emb) =>
      val g = id - (id % 3); val v = (id % 3).toInt
      val w = (g % 31 + 1).toInt; val h = (g % 17 + 1).toInt
      val js = new Array[Long](8); val jc = new Array[Long](8)
      var i = 0
      while (i < w * h) {
        js(i % 8) += (g * 7 + i.toLong * 3 + v) % 256
        jc(i % 8) += 1
        i += 1
      }
      val m = Array.tabulate(8)(j => js(j) / math.max(1L, jc(j)))
      val e = Array.tabulate(8) { j =>
        (j until 64 by 8).map(k =>
          math.floor(emb(k).toDouble * 1000.0).toLong).sum
      }
      val dot = (0 until 8).map(j => m(j) * e(j)).sum
      val mm  = m.map(x => x * x).sum
      val ee  = e.map(x => x * x).sum
      id -> ((dot, mm, ee))
    }
  }

  test("dot, align_cos, and aligned match the driver-side brute force") {
    val rows = out.collect()
    assert(rows.length == truth.size) // one row per embedded pair
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (dot, mm, ee) = truth(id)
      assert(r.getAs[Long]("dot") == dot, s"dot mismatch at $id")
      val wantCos =
        if (mm > 0 && ee > 0)
          BigDecimal(dot / (math.sqrt(mm.toDouble) * math.sqrt(ee.toDouble)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0
      assert(math.abs(r.getAs[Double]("align_cos") - wantCos) < 1e-9,
        s"align_cos mismatch at $id")
      val wantAligned = dot > 0 && 100 * dot * dot >= 9 * mm * ee
      assert(r.getAs[Boolean]("aligned") == wantAligned,
        s"aligned mismatch at $id")
    }
  }

  test("the integer gate IS the cosine >= 0.3 threshold") {
    // away from exact equality the divisionless compare and the
    // real-valued threshold must agree; the margin excludes only
    // floating-round ties of the audit itself
    truth.foreach { case (id, (dot, mm, ee)) =>
      if (mm > 0 && ee > 0) {
        val cos = dot / (math.sqrt(mm.toDouble) * math.sqrt(ee.toDouble))
        val gate = dot > 0 && 100 * dot * dot >= 9 * mm * ee
        if (math.abs(cos - 0.3) > 1e-9)
          assert(gate == (cos >= 0.3), s"gate/cosine disagree at $id")
      }
    }
  }

  test("the verdict splits the corpus at this SF") {
    assert(out.select(col("aligned")).distinct().count() == 2)
  }
}
