package graft.sources

import graft.SparkSuite
import graft.core.TokenFormat
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** graft-token DataSource V2: record parity with the reference token
  * semantics under arbitrary byte-range splits, exact split-boundary
  * ownership, filter pushdown, and column pruning.
  */
class TokenSourceV2Spec extends SparkSuite {

  /** Ground truth: the whole file tokenized in one pass on the driver
    * with the SAME TokenFormat kernel every other reader uses.
    */
  private def truth(content: String): Seq[(String, String)] =
    TokenFormat.tokenize(content).map(TokenFormat.parse).toSeq

  private def writeTemp(content: String): String = {
    val dir = Files.createTempDirectory("graft-token-v2")
    Files.write(dir.resolve("part-0.txt"),
      content.getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  private val content: String = {
    val longRun = "x" * 2500 // splits into 1000+1000+500 pieces
    // '|' edge shapes from TokenRecordReader.next: 'a|' and '|' are NOT
    // k|v (split-with-trailing-empties yields 1 field); '|a', 'a||b' are
    "alpha|1 beta|2   alpha|1\nnone_token c||d e| | |f " +
      longRun + "  tail|9 "
  }

  test("whole-file read == driver-side TokenFormat ground truth") {
    val dir = writeTemp(content)
    val got = spark.read.format("graft-token").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.sorted == truth(content).sorted)
  }

  test("byte-range splits: many partitions, identical records, no dup/loss at boundaries") {
    val dir = writeTemp(content)
    val df = spark.read.format("graft-token")
      .option("maxSplitBytes", "64").load(dir)
    assert(df.rdd.getNumPartitions > 10,
      s"expected fine-grained splits, got ${df.rdd.getNumPartitions}")
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.sorted == truth(content).sorted)
  }

  test("every split size from 1 byte up yields the same multiset") {
    val small = "aa|1 bb|2 ccc dd|4 " + ("y" * 1500) + " ee|5"
    val dir = writeTemp(small)
    val want = truth(small).sorted
    Seq(1, 2, 3, 5, 7, 16, 33, 1000).foreach { sz =>
      val got = spark.read.format("graft-token")
        .option("maxSplitBytes", sz.toString).load(dir)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(got.sorted == want, s"maxSplitBytes=$sz diverged")
    }
  }

  test("key equality is pushed into the scan and the plan shows it") {
    val dir = writeTemp(content)
    val df = spark.read.format("graft-token").load(dir)
      .filter(col("key") === "alpha")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [EqualTo(key,alpha)"),
      s"filter not pushed:\n$plan")
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
      .sorted == truth(content).filter(_._1 == "alpha").sorted)
  }

  test("column pruning reaches the reader") {
    val dir = writeTemp(content)
    val df = spark.read.format("graft-token").load(dir).select("value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<value:string>"),
      s"value-only projection should prune key:\n$plan")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      truth(content).map(_._2).sorted)
  }

  test("reported statistics let Catalyst auto-broadcast a small token table") {
    import spark.implicits._
    val dir = writeTemp(content)
    val small = spark.read.format("graft-token").load(dir)
    val big = spark.range(0, 5000)
      .select(when(col("id") % 2 === 0, "alpha").otherwise("beta").as("key"),
        col("id"))
    val joined = big.join(small, Seq("key"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a KB-scale token table should broadcast without a hint:\n$plan")
  }

  test("write path: V2 round-trip, one file per partition, temp dir cleaned") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-token-v2-w").toString + "/out"
    val pairs = (1 to 300).map(i => (s"k${i % 7}", s"v$i"))
    pairs.toDF("key", "value").repartition(3)
      .write.format("graft-token").mode("append").save(out)
    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.count(_.startsWith("part-")) == 3, files.mkString(","))
    assert(!files.exists(_.startsWith("_")), "temp dir must be cleaned up")
    val back = spark.read.format("graft-token").load(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(back.sorted == pairs.sorted)
  }

  test("write path: golden byte format (space-terminated tokens, no newline)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-token-v2-g").toString + "/out"
    Seq(("sao", "2881"), ("rio", "17")).toDF("key", "value")
      .coalesce(1).sortWithinPartitions("key")
      .write.format("graft-token").mode("append").save(out)
    val f = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val bytes = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    assert(bytes == "rio|17 sao|2881 ", s"golden bytes mismatch: '$bytes'")
  }

  test("property: random corpora × random split sizes parse identically") {
    val rnd = new scala.util.Random(42)
    // separators, pipes, multibyte UTF-8, and long runs all in play
    val alphabet = "ab|é ||\n x".toCharArray
    (1 to 8).foreach { trial =>
      val content = (0 until rnd.nextInt(3000))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString +
        ("z" * (if (trial % 3 == 0) 1500 else 0)) // >1000-char run piece-split
      val dir = writeTemp(content)
      val want = truth(content).sorted
      val sz = 1 + rnd.nextInt(999)
      val got = spark.read.format("graft-token")
        .option("maxSplitBytes", sz.toString).load(dir)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(got.sorted == want, s"trial=$trial maxSplitBytes=$sz diverged")
    }
  }

  test("write path: overwrite truncates the previous contents") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-token-v2-o").toString + "/out"
    Seq(("a", "1"), ("b", "2")).toDF("key", "value")
      .write.format("graft-token").mode("append").save(out)
    Seq(("c", "3")).toDF("key", "value")
      .write.format("graft-token").mode("overwrite").save(out)
    val back = spark.read.format("graft-token").load(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(back == Seq(("c", "3")))
  }
}
