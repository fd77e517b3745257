package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSuite {

  test("native expressions callable from SQL after registration") {
    GraftExtensions.register(spark)
    Tables(spark, sf("sf0.001")).documents.createOrReplaceTempView("docs_sql")
    val row = spark.sql("""
      SELECT simhash60(text) AS sh,
             size(shingle_hash32(text)) AS n3,
             size(shingle_hash32(text, 5)) AS n5,
             java_string_hash(lang) AS jh,
             byte_mean(encode(text, 'UTF-8')) AS bm
      FROM docs_sql WHERE doc_id = 0
    """).collect().head
    assert(row.getAs[Long]("sh") > 0)
    assert(row.getAs[Int]("n3") > 0 && row.getAs[Int]("n5") > 0)
    assert(row.getAs[Double]("bm") > 0)
  }

  test("SQL cosine_similarity matches the Column API") {
    GraftExtensions.register(spark)
    Tables(spark, sf("sf0.001")).embeddings.createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql("""
      SELECT a.vec_id, cosine_similarity(a.embedding, b.embedding) AS c
      FROM emb_sql a JOIN emb_sql b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 10 ORDER BY a.vec_id
    """).collect().map(_.getDouble(1))
    val e = Tables(spark, sf("sf0.001")).embeddings
    val viaCol = e.as("a").join(e.as("b"),
        col("b.vec_id") === col("a.vec_id") + 1)
      .filter(col("a.vec_id") < 10)
      .orderBy(col("a.vec_id"))
      .select(graft.functions.VectorFunctions
        .cosineSim(col("a.embedding"), col("b.embedding")))
      .collect().map(_.getDouble(0))
    assert(viaSql.sameElements(viaCol))
  }

  test("shingle_hash32 rejects a non-literal width with a clear error") {
    GraftExtensions.register(spark)
    Tables(spark, sf("sf0.001")).documents.createOrReplaceTempView("docs_sql")
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hash32(text, doc_id) FROM docs_sql").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }
}
