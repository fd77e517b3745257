package graft.dedup

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Each dedup detector must surface the 25 planted duplicates (src0
  * docs re-inserted with doc_id+100000) — detector-specific invariants
  * beyond the DuckDB value oracle.
  */
class DedupSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("dd_exact finds exactly the 25 planted duplicate groups") {
    val got = QueryRegistry.byName("dd_exact").run(spark, dir).collect()
    assert(got.length == 25)
    assert(got.forall(_.getAs[Long]("n") == 2))
  }

  test("dd_dup_stats: src0 reports the planted 2x replica, others run clean") {
    val rows = QueryRegistry.byName("dd_dup_stats").run(spark, dir).collect()
    val src0Docs = spark.read.parquet(dir + "/documents.parquet")
      .filter(col("source") === "src0").count()
    rows.foreach { r =>
      val (src, nDocs, nUniq, rate, clone) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getLong(4))
      if (src == "src0") {
        assert(nDocs == 2 * src0Docs)
        assert(nUniq == src0Docs, "src0 texts not internally unique")
        assert(rate == 0.5 && clone == 2)
      } else {
        // dd_exact proves the raw corpus has no natural exact dups
        assert(nUniq == nDocs && rate == 0.0 && clone == 1,
          s"unexpected duplication in $src")
      }
    }
  }

  test("dd_minhash_cdc: resubmitted docs flagged dup at 1.0, fresh pass new") {
    val rows = QueryRegistry.byName("dd_minhash_cdc").run(spark, dir).collect()
    val bySrc = rows.partition(_.getLong(0) < 600000)
    // the src0 replica half must ALL flag as near-dups of their corpus
    // originals at exact jaccard 1.0
    assert(bySrc._1.nonEmpty)
    bySrc._1.foreach { r =>
      assert(r.getString(1) == "dup" && r.getDouble(2) == 1.0,
        s"replica ${r.getLong(0)} not flagged: ${r.getString(1)} @ ${r.getDouble(2)}")
    }
    // the synthetic fresh half must ALL be admitted
    assert(bySrc._2.nonEmpty)
    bySrc._2.foreach { r =>
      assert(r.getString(1) == "new",
        s"fresh ${r.getLong(0)} wrongly flagged dup @ ${r.getDouble(2)}")
    }
  }

  test("dd_minhash_lsh candidates include all planted pairs at jaccard 1.0") {
    val got = QueryRegistry.byName("dd_minhash_lsh").run(spark, dir).collect()
    val planted = got.filter(r =>
      r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 100000)
    assert(planted.length == 25, s"found ${planted.length} of 25 planted pairs")
    assert(planted.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("dd_ngram_jaccard finds all planted pairs at jaccard 1.0") {
    val got = QueryRegistry.byName("dd_ngram_jaccard").run(spark, dir).collect()
    val planted = got.filter(r =>
      r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 100000)
    assert(planted.length == 25)
    assert(planted.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  /** Forces the ≤50-docs-per-band cap to fire: 60 copies of one
    * boilerplate doc share every band, so an uncapped pipeline would
    * emit C(60,2) = 1770 pairs from those buckets alone — the planted
    * hot band must contribute ZERO pairs while an ordinary small bucket
    * still surfaces its pair, and the cap's window count must keep
    * riding the self-join's band exchange (ReusedExchange), not plan a
    * second shuffle.
    */
  test("hot-band cap: a 60x boilerplate band emits zero pairs, exchange still reused") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-hotband").toString
    val boiler = (0L until 60L).map(i =>
      (i, "buy now the best deal ever offered online today", "en", "boiler", 47L))
    val good = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta", "en", "keep", 45L),
      (101L, "alpha beta gamma delta epsilon zeta eta theta", "en", "keep", 45L))
    (boiler ++ good).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val df  = QueryRegistry.byName("dd_minhash_lsh").run(spark, tmp)
    val got = df.collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((100L, 101L)),
      s"hot band leaked pairs: ${got.take(5).mkString(", ")} (${got.length} rows)")
    assert(got.head.getAs[Double]("jaccard") == 1.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"band-cap window must reuse the self-join's band exchange:\n$plan")
  }

  test("native kernels == composition on generated text incl. unicode and edge shapes") {
    import org.apache.spark.sql.functions.{col, array_sort}
    import org.scalacheck.Gen
    val word = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      Gen.oneOf("héllo", "wörld", "日本語", "données", "a|b", ""))
    val text = Gen.listOfN(8, word).map(_.mkString(" "))
    val samples = new graft.core.GenChecks {}.collectSamples(text, 200)
    import spark.implicits._
    val df = samples.toDF("text")
    val diff = df.select(
      array_sort(graft.functions.HashFunctions.shingleHash32(col("text"))).as("native"),
      array_sort(DedupQueries.shingleHashesComposed(col("text"))).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.count() == 0)
  }

  test("native shingle-hash kernel == built-ins composition") {
    import org.apache.spark.sql.functions.{col, array_sort}
    val docs = graft.Tables(spark, dir).documents.select(col("text"))
    val diff = docs.select(
      array_sort(graft.functions.HashFunctions.shingleHash32(col("text"))).as("native"),
      array_sort(DedupQueries.shingleHashesComposed(col("text"))).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.count() == 0)
  }

  test("incremental dedup admits only unseen content") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val existing = docs.filter(col("doc_id") < 250)
    // incoming: 50 already-known docs (shifted ids) + 50 new ones
    val incoming = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") >= 250 && col("doc_id") < 300))
    val admitted = DedupQueries.incremental(existing, incoming).collect()
    assert(admitted.length == 50)
    assert(admitted.forall(r => r.getAs[Long]("doc_id") >= 250))
  }

  test("dd_clean_corpus drops planted duplicates and keeps originals") {
    val kept = graft.QueryRegistry.byName("dd_clean_corpus").run(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // every planted copy (id >= 100000) must be gone (exact dedup keeps
    // the lower-id original)
    assert(!kept.exists(_ >= 100000))
    assert(kept.nonEmpty)
  }

  test("dd_dup_clusters: planted pairs co-cluster under the min-id label") {
    val rows = QueryRegistry.byName("dd_dup_clusters").run(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(rows.nonEmpty)
    // label is a component MINIMUM: never above the member id, and the
    // representative is itself a clustered member with its own label
    assert(rows.forall { case (id, c) => c <= id })
    assert(rows.values.toSet.forall(c => rows.get(c).contains(c)))
    // every planted duplicate (id + 100000) joins its original's cluster
    val planted = rows.keys.filter(_ >= 100000)
    assert(planted.nonEmpty)
    planted.foreach { p =>
      assert(rows(p) == rows(p - 100000),
        s"planted copy $p not clustered with original ${p - 100000}")
    }
  }

  test("dd_cluster_split: cluster-coherent by construction, naive split leaks") {
    val rows = QueryRegistry.byName("dd_cluster_split").run(spark, dir)
      .collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_clusters"),
          r.getAs[Long]("leaked_naive_clusters"))).toMap
    assert(rows.keySet == Set("train", "holdout"))
    val total = rows.values.map(_._1).sum
    // corpus = documents + planted src0 replica
    val docs = spark.read.parquet(dir + "/documents.parquet")
    val src0 = docs.filter(col("source") === "src0").count()
    assert(total == docs.count() + src0)
    // the train side is the ~90 % (921/1024) side
    val trainFrac = rows("train")._1.toDouble / total
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train frac $trainFrac")
    // the op's reason to exist: the naive doc_id-hash split DOES
    // straddle multi-doc clusters (5 of the 25 planted pairs at this SF)
    val leaked = rows.values.head._3
    assert(rows.values.forall(_._3 == leaked), "leak count not global")
    assert(leaked >= 1, "naive split straddled no cluster — vacuous fixture")
    // and the cluster split never straddles: if any cluster appeared on
    // both sides it would be double-counted, so the per-split cluster
    // counts must sum EXACTLY to the independent total (distinct
    // dd_dup_clusters labels + singleton docs)
    val clustered = QueryRegistry.byName("dd_dup_clusters").run(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
    val totalClusters =
      clustered.map(_._2).distinct.size + (total - clustered.size)
    assert(rows.values.map(_._2).sum == totalClusters)
  }

  test("connectedComponents: union-find and label-propagation paths agree") {
    import spark.implicits._
    // chain 1-2-3-4, star 10-{11,12,13}, pair 20-21, and a cross-link
    // making {10..13, 20, 21} one component
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (10L, 12L), (13L, 10L),
      (20L, 21L), (12L, 21L),
    ).toDF("id_a", "id_b")
    def labelsOf(maxEdges: Long): Map[Long, Long] =
      DedupQueries.connectedComponents(edges, unionFindMaxEdges = maxEdges)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("lbl")).toMap
    val uf = labelsOf(Long.MaxValue) // union-find path
    val lp = labelsOf(0L)            // iterative label propagation path
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 10L, 21L -> 10L)
    assert(uf == expected)
    assert(lp == expected)
  }

  test("connectedComponents: label propagation converges past 16 rounds") {
    import spark.implicits._
    // a 21-node chain (diameter 20) with the min label at one END, so
    // label 0 must walk the full diameter: >16 propagation rounds. The
    // old 16-round cap silently emitted unconverged labels here;
    // unionFindMaxEdges = 0 forces the propagation path.
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = DedupQueries.connectedComponents(chain, unionFindMaxEdges = 0L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("lbl")).toMap
    assert(labels == (0L to 20L).map(_ -> 0L).toMap,
      s"chain did not fully converge: $labels")
  }

  test("dd_simhash: equal texts hash equal; fingerprints fit in 60 bits") {
    val hashes = QueryRegistry.byName("dd_simhash").run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(hashes.values.forall(h => h >= 0 && h < (1L << 60)))
    // identical text must produce identical fingerprints: recompute on a
    // self-union and compare
    val docs = graft.Tables(spark, dir).documents
    val dup  = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.select(col("doc_id") + 100000 as "doc_id", col("text")))
    // hamming distance of a doc with itself through the pipeline is 0 by
    // determinism of the hash — verified via the value oracle; here check
    // distinct fingerprint count is plausible (no catastrophic collapse)
    assert(hashes.values.toSet.size > hashes.size / 2)
  }
}
