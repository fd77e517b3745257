package graft.text

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins tx_corpus_ledger's two contracts: the counts TELESCOPE (each
  * stage's docs_in is the previous stage's docs_out, the split
  * fan-out's outs sum exactly to the survivors, and total drops
  * reconcile corpus → final), and every stage's count equals a
  * brute-force recomputation from the registry queries that OWN the
  * stage rules — so the ledger is a reconciliation of the shipped
  * pipeline, not a parallel reimplementation that could drift.
  */
class CorpusLedgerSpec extends SparkSuite {

  private val dir = sf("sf0.001")
  private lazy val rows =
    QueryRegistry.byName("tx_corpus_ledger").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  private def stage(name: String) = rows.find(_._2 == name).get

  test("stage counts telescope to the corpus total") {
    val corpus = stage("corpus")
    assert(corpus._3 == corpus._4 && corpus._5 == 0)
    val chain = Seq("corpus", "quality", "dedup_purge", "decontaminate")
      .map(stage)
    chain.sliding(2).foreach { case Seq(prev, next) =>
      assert(next._3 == prev._4,
        s"${next._2}.docs_in != ${prev._2}.docs_out")
    }
    chain.foreach { s =>
      assert(s._5 == s._3 - s._4, s"${s._2} dropped != in - out")
    }
    val splits = rows.filter(_._2.startsWith("split:"))
    assert(splits.nonEmpty)
    val survivors = stage("decontaminate")._4
    splits.foreach { s =>
      assert(s._3 == survivors, s"${s._2}.docs_in != survivors")
      assert(s._5 == 0)
    }
    assert(splits.map(_._4).sum == survivors,
      "split fan-out does not sum to the survivors")
    // global reconciliation: corpus = final + every stage's drops
    assert(corpus._3 ==
      survivors + chain.map(_._5).sum,
      "drops do not reconcile corpus to final")
  }

  test("every stage count equals a brute force over the owning queries") {
    val n = graft.Tables(spark, dir).documents.count()
    assert(stage("corpus")._3 == n)
    // quality: the shared qualityScored verdict (tx_quality's kernel)
    val keepQ = TextQueries.qualityScored(spark, dir)
      .filter(col("verdict") === "keep")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(stage("quality")._4 == keepQ.size)
    // dedup purge: dd_dup_clusters' keep-the-representative rule
    val nonRep = QueryRegistry.byName("dd_dup_clusters").run(spark, dir)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val afterPurge = keepQ -- nonRep
    assert(stage("dedup_purge")._4 == afterPurge.size)
    // decontamination: dd_decontaminate's hit set plus the eval slice
    val hits = QueryRegistry.byName("dd_decontaminate").run(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ < 200000).toSet // the ledger corpus has no planted ids
    val survivors = afterPurge.filterNot(id => id % 97 == 0 || hits(id))
    assert(stage("decontaminate")._4 == survivors.size)
    // split: tx_split's salted-md5 bucket, recomputed independently
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): String = {
      val hex = md.digest(s"split1:$id".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val b = java.lang.Long.parseLong(hex, 16) % 100
      if (b < 2) "test" else if (b < 5) "val" else "train"
    }
    val want = survivors.groupBy(bucket).map { case (k, v) => k -> v.size }
    rows.filter(_._2.startsWith("split:")).foreach { s =>
      assert(s._4 == want.getOrElse(s._2.stripPrefix("split:"), 0).toLong,
        s"${s._2} count diverges from the recomputed assignment")
    }
  }
}
