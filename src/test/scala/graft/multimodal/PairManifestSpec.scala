package graft.multimodal

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins mm_pair_manifest's composition contract: one row per
  * (media, caption) pair covering the whole corpus, keep ≡ the
  * conjunction of the three single-modality gates, drop_reason names
  * the FIRST failed gate in the declared priority order, and each
  * component column agrees with the single-modality query it claims
  * to share a kernel with.
  */
class PairManifestSpec extends SparkSuite {

  private val dir = sf("sf0.001")
  private lazy val manifest =
    QueryRegistry.byName("mm_pair_manifest").run(spark, dir).cache()

  test("covers every document exactly once, pairing media with its caption") {
    val docs = graft.Tables(spark, dir).documents.count()
    assert(manifest.count() == docs)
    assert(manifest.select(col("media_id")).distinct().count() == docs)
    assert(manifest.filter(col("media_id") =!= col("doc_id")).count() == 0)
  }

  test("keep is the conjunction of the four gates; drop_reason is the " +
      "first failure in priority order") {
    val bad = manifest.filter(
      col("keep") =!= (col("img_pass") && col("img_rep") &&
        col("text_keep") && col("aligned")) ||
        col("drop_reason") =!= when(!col("img_pass"), "image_quality")
          .when(!col("img_rep"), "image_dup")
          .when(!col("text_keep"), "text_quality")
          .when(!col("aligned"), "misaligned")
          .otherwise("ok"))
      .count()
    assert(bad == 0)
    // the gates genuinely split this corpus (not vacuously true flags)
    Seq("img_pass", "img_rep", "text_keep", "aligned").foreach { c =>
      assert(manifest.select(col(c)).distinct().count() == 2,
        s"$c does not split the corpus")
    }
  }

  test("pairs with no embedding row fail the alignment gate closed") {
    // only sf0.1 has documents beyond the embeddings table (5000 docs,
    // 2000 vectors) — the manifest must not certify alignment it never
    // measured
    val m01 = QueryRegistry.byName("mm_pair_manifest").run(spark, sf("sf0.1"))
    val emb = graft.Tables(spark, sf("sf0.1")).embeddings
      .select(col("vec_id").as("media_id"))
    val unscored = m01.join(emb, Seq("media_id"), "left_anti")
    assert(unscored.count() > 0, "fixture lost its unscored pairs")
    assert(unscored.filter(col("aligned")).count() == 0,
      "an unscored pair passed the alignment gate")
  }

  test("component columns agree with the single-modality kernels") {
    // image quality: on the doc_id % 3 == 0 slice the manifest's
    // img_pass must equal mm_image_quality's pass (same kernel, v = 0)
    val iq = QueryRegistry.byName("mm_image_quality").run(spark, dir)
      .select(col("media_id"), col("pass"))
    val iqBad = manifest.join(iq, "media_id")
      .filter(col("img_pass") =!= col("pass")).count()
    assert(iqBad == 0, "img_pass drifted from mm_image_quality")
    // dup representatives: non-rep rows are exactly the cluster
    // members whose label differs
    val cl = QueryRegistry.byName("dd_image_clusters").run(spark, dir)
    val repBad = manifest.join(cl, "media_id")
      .filter(col("img_rep") =!= (col("cluster") === col("media_id")))
      .count()
    assert(repBad == 0, "img_rep drifted from dd_image_clusters")
    // caption gate: equals tx_quality's verdict
    val tq = QueryRegistry.byName("tx_quality").run(spark, dir)
      .select(col("doc_id"), (col("verdict") === "keep").as("want"))
    val tqBad = manifest.join(tq, "doc_id")
      .filter(col("text_keep") =!= col("want")).count()
    assert(tqBad == 0, "text_keep drifted from tx_quality")
    // alignment gate: on the scored subset the manifest's aligned must
    // equal mm_align_score's verdict (one Align formula, shared)
    val al = QueryRegistry.byName("mm_align_score").run(spark, dir)
      .select(col("media_id"), col("aligned").as("want_al"))
    val alBad = manifest.join(al, "media_id")
      .filter(col("aligned") =!= col("want_al")).count()
    assert(alBad == 0, "aligned drifted from mm_align_score")
  }
}
