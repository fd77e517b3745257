package graft.multimodal

import graft.{SparkSuite, Tables}
import graft.multimodal.Multimodal._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private def media = mediaTable(Tables(spark, sf("sf0.001")))

  test("media table schema: opaque binary content + typed metadata") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(Seq("width", "height", "sample_rate", "n_frames")
      .forall(schema(_).dataType.typeName == "integer"))
  }

  test("typed mapPartitions decode pipeline == columnar mm_features twin") {
    import spark.implicits._
    val typed = extractFeatures(media.as[MediaRecord])
      .select(col("media_id"), col("n_bytes"), col("checksum"),
        round(col("mean_level"), 4).as("mean_level"))
    val columnar = graft.QueryRegistry.byName("mm_features")
      .run(spark, sf("sf0.001"))
      .select(col("media_id"), col("n_bytes"), col("checksum"), col("mean_level"))
    assert(typed.exceptAll(columnar).count() == 0)
    assert(columnar.exceptAll(typed).count() == 0)
  }

  test("resize clamps width to max and preserves aspect ratio direction") {
    val out = resize(media.filter(col("width") > 100), maxW = 100)
    assert(out.filter(col("width") > 100).count() == 0)
    assert(out.filter(col("height") < 0).count() == 0)
  }

  test("frame sampling emits every 7th frame, ids only (no byte blowup)") {
    val out = frameSample(media, step = 7)
    assert(!out.columns.contains("content"))
    val bad = out.filter(col("frame_no") % 7 =!= 0)
    assert(bad.count() == 0)
  }
}
