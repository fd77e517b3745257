package graft.similarity

import graft.SparkSuite
import graft.functions.CellKernels
import org.apache.spark.sql.functions._

/** Bit-parity pins for the round-16 loop kernels (model as a codegen
  * reference object) against the literal-tree compositions they
  * replaced: same cosine/sqdist accumulation, same tie direction, same
  * slice semantics — so every ss_/dd_/mm_ oracle hash is unchanged by
  * the swap.
  */
class CellKernelsSpec extends SparkSuite {

  private def emb = graft.Tables(spark, sf("sf0.001")).embeddings

  test("BestCell == greatest(scoreStructs) bit for bit, k=16 and k=23") {
    Seq(16, 23).foreach { k =>
      val cents = SimilarityQueries.trainIvfCentroids(emb, k)
      val diff = emb.select(
        CellKernels.bestCell(col("embedding"), cents).as("n"),
        greatest(SimilarityQueries.scoreStructs(cents): _*).as("c"))
        .filter(col("n.cid") =!= col("c.cid") ||
          col("n.ccos") =!= col("c.ccos"))
      assert(diff.count() == 0, s"k=$k")
    }
  }

  test("BestCell ties go to the HIGHER cid (the greatest-struct rule)") {
    val v = emb.orderBy("vec_id").select("embedding")
      .head().getSeq[Float](0).toArray
    // two identical centroids under different ids: every row's cosine
    // ties exactly, so the winner is decided purely by the tie rule
    val dup = Seq(3 -> v, 7 -> v)
    val got = emb.select(
      CellKernels.bestCell(col("embedding"), dup).getField("cid").as("n"),
      greatest(SimilarityQueries.scoreStructs(dup): _*)
        .getField("cid").as("c"))
    assert(got.filter(col("n") =!= lit(7)).count() == 0)
    assert(got.filter(col("n") =!= col("c")).count() == 0)
  }

  test("TopCells == slice(sort_array(structs) desc).cid for n=1,2,4 and n>k") {
    val cents = SimilarityQueries.trainIvfCentroids(emb, 16)
    Seq(1, 2, 4, 20).foreach { n =>
      val composed = transform(
        slice(sort_array(array(SimilarityQueries.scoreStructs(cents): _*),
          asc = false), 1, n), s => s.getField("cid"))
      val diff = emb.select(
        CellKernels.topCells(col("embedding"), cents, n).as("k"),
        composed.as("c"))
        .filter(col("k") =!= col("c"))
      assert(diff.count() == 0, s"n=$n")
    }
  }

  test("NearestSubCode == least(struct(subvecSqDist, cid)).cid, all 4 subspaces") {
    val cb = SimilarityQueries.trainPqCodebooks(emb)
    (0 until 4).foreach { sub =>
      val composed = least(cb(sub).map { case (cid, cv) =>
        struct(graft.functions.VectorFunctions
          .subvecSqDist(col("embedding"), sub * 16, cv).as("d"),
          lit(cid).as("cid"))
      }: _*).getField("cid")
      val diff = emb.select(
        CellKernels.pqCode(col("embedding"), sub * 16, cb(sub)).as("k"),
        composed.as("c"))
        .filter(col("k") =!= col("c"))
      assert(diff.count() == 0, s"sub=$sub")
    }
  }

  test("NearestSubCode ties go to the LOWER cid (the least-struct rule)") {
    val v = emb.orderBy("vec_id").select("embedding")
      .head().getSeq[Float](0).toArray.slice(0, 16)
    val dup = Seq(2 -> v, 9 -> v)
    val got = emb.select(
      CellKernels.pqCode(col("embedding"), 0, dup).as("n"))
    assert(got.filter(col("n") =!= lit(2)).count() == 0)
  }

  test("topCellsEval (driver eval) == TopCells over the corpus, n=2 and n=4") {
    // the MaxSim probe derives its probe cells on the DRIVER from the
    // collected query batch (r16 job fusion); the helper must route
    // through the same expression eval, so pin it against the
    // Spark-evaluated kernel row by row
    val cents = SimilarityQueries.trainIvfCentroids(emb, 16)
    Seq(2, 4).foreach { n =>
      val viaSpark = emb
        .select(col("vec_id"),
          CellKernels.topCells(col("embedding"), cents, n).as("cells"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      val rows = emb.select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      rows.foreach { case (id, v) =>
        assert(CellKernels.topCellsEval(v, cents, n).toSeq == viaSpark(id),
          s"vec_id=$id n=$n")
      }
    }
  }

  test("kernels match their interpreted eval (codegen off)") {
    val cents = SimilarityQueries.trainIvfCentroids(emb, 16)
    val cb = SimilarityQueries.trainPqCodebooks(emb)
    val cols = Seq(
      CellKernels.bestCell(col("embedding"), cents).as("b"),
      CellKernels.topCells(col("embedding"), cents, 4).as("t"),
      CellKernels.pqCode(col("embedding"), 16, cb(1)).as("p"))
    val on = emb.select(cols: _*).collect().map(_.toString).sorted
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = emb.select(cols: _*).collect().map(_.toString).sorted
      assert(on.sameElements(off))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
