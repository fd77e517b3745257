package graft.similarity

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the IVF cell-BALANCE gate (r15 verdict task 2): the build
  * persists a ≤k-row cell-size profile next to the coherence floor,
  * [[SimilarityQueries.ivfCellSkew]] thresholds max/mean off it with
  * no corpus scan, the balance arc pays a SECOND Lloyd iteration only
  * when a deliberately skewed corpus trips the gate, and the deeper
  * train seam is a real loop (iters = 2 equals one more
  * [[SimilarityQueries.lloydStep]] over the one-step model, and on a
  * boundary-point corpus the second step genuinely moves the model).
  */
class IvfBalanceSpec extends SparkSuite {

  import spark.implicits._

  private val dir = sf("sf0.001")

  private def vec(xs: (Int, Double)*): Seq[Float] = {
    val m = xs.toMap
    Seq.tabulate(64)(i => m.getOrElse(i, 0.0).toFloat)
  }

  /** Deliberately skewed: seeds (vec_id < 4) are one cluster member
    * and three lone vectors, so the one-step model leaves one giant
    * cell (101 vectors) next to three singletons — max/mean ≈ 3.9.
    */
  private def skewed: DataFrame =
    ((0L, vec(0 -> 1.0)) +: (1L to 3L).map(i => (i, vec(i.toInt -> 1.0))) ++:
      (4L to 103L).map(i =>
        (i, vec(0 -> 1.0, 4 -> (0.001 * (i % 7)))))).toDF(
      "vec_id", "embedding")

  /** Balanced: four orthogonal 26-vector clusters, one seed in each. */
  private def balanced: DataFrame =
    (0L to 103L).map(i =>
      (i, vec((i % 4).toInt -> 1.0, 5 -> (0.001 * (i % 5))))).toDF(
      "vec_id", "embedding")

  test("ivfCellSkew reads the persisted profile: skewed ≈ k-capped max/mean, balanced ≈ 1") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-balance-skew").toString
    SimilarityQueries.writeIvfIndex(spark, skewed,
      SimilarityQueries.trainIvfCentroids(skewed, 4), s"$tmp/sk")
    val sk = SimilarityQueries.ivfCellSkew(spark, s"$tmp/sk")
    assert(sk > 3.0 && sk < 4.0, s"skewed corpus skew $sk")
    SimilarityQueries.writeIvfIndex(spark, balanced,
      SimilarityQueries.trainIvfCentroids(balanced, 4), s"$tmp/bal")
    val bal = SimilarityQueries.ivfCellSkew(spark, s"$tmp/bal")
    assert(bal < 1.5, s"balanced corpus skew $bal")
  }

  test("tripped balance gate publishes a second-iteration generation 2") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files
      .createTempDirectory("graft-balance-trip").toString + "/fam_fp1"
    val served = SimilarityQueries.ivfBalanceArc(spark, root, "fam_",
      skewed, k = 4, maxSkew = 3.0)
    assert(served == s"${root}_g2", s"skewed corpus did not trip: $served")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$served/_built")))
    // gen-2 really is the two-iteration model
    val g2 = spark.read.parquet(s"$served/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val want = SimilarityQueries.trainIvfCentroids(skewed, 4, iters = 2)
      .map { case (c, v) => c -> v.toSeq }.toMap
    assert(g2 == want, "generation 2 does not carry the iters=2 model")
    // re-entry serves generation 2 directly
    assert(SimilarityQueries.ivfBalanceArc(spark, root, "fam_",
      skewed, k = 4, maxSkew = 3.0) == served)
  }

  test("declined balance gate keeps generation 1; no generation-2 directory") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files
      .createTempDirectory("graft-balance-decl").toString + "/fam_fp1"
    val served = SimilarityQueries.ivfBalanceArc(spark, root, "fam_",
      balanced, k = 4, maxSkew = 3.0)
    assert(served == s"${root}_g1", s"balanced corpus tripped: $served")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"${root}_g2")),
      "a generation-2 directory exists although the gate declined")
  }

  test("iters=2 is one more Lloyd step, and a boundary point makes it a real move") {
    // boundary corpus: the (0.75, 0.66) point sits in seed 0's cell
    // under the seeds, but the far cluster drags cell 0's step-1 mean
    // away from it, so the second step re-assigns it to cell 1 — the
    // model provably moves between iterations
    val e = ((0L, vec(0 -> 1.0)) +: (1L, vec(1 -> 1.0)) +:
      (2L, vec(0 -> 0.75, 1 -> 0.66)) +:
      (3L to 12L).map(i => (i, vec(0 -> 0.9, 1 -> -0.43)))).toDF(
      "vec_id", "embedding")
    val one = SimilarityQueries.trainIvfCentroids(e, 2)
    val two = SimilarityQueries.trainIvfCentroids(e, 2, iters = 2)
    assert(two.map { case (c, v) => c -> v.toSeq } ==
      SimilarityQueries.lloydStep(e, one)
        .map { case (c, v) => c -> v.toSeq },
      "iters=2 is not one Lloyd step over the one-step model")
    assert(one.map(_._2.toSeq) != two.map(_._2.toSeq),
      "the second iteration did not move the model on a boundary corpus")
  }

  test("ss_ivf_balance row: profile sizes equal a fresh assignment recount") {
    val out = QueryRegistry.byName("ss_ivf_balance").run(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val e = graft.Tables(spark, dir).embeddings
    val cents = SimilarityQueries.trainIvfCentroids(e, 16)
    val want = SimilarityQueries.cellSizesFor(e, cents)
    assert(out == want, s"profile sizes $out != recount $want")
  }
}
