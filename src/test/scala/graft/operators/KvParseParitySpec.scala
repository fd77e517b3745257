package graft.operators

import graft.SparkSuite
import graft.core.TokenFormat

/** The two in-repo implementations of the reference `k|v` parse —
  * [[TokenFormat.parse]] (Java split, used by the MapReduce pipeline)
  * and the SQL expression in [[MapReduceQueries.kvTokens]] — must agree
  * on every edge the reference defines, including trailing-pipe tokens
  * (`user/TokenRecordReader.java:156-165`).
  */
class KvParseParitySpec extends SparkSuite {

  test("SQL kvTokens agrees with TokenFormat.parse on edge tokens") {
    import spark.implicits._
    val toks = Seq("word", "k|v", "a|b|c", "k|", "|v", "a||b", "x|y|")
    val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val got = MapReduceQueries.kvTokens(docs)
      .select("key", "value").as[(String, String)].collect().toSeq
    val want = toks.map(TokenFormat.parse)
    assert(got == want)
  }
}
