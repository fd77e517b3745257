package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema-drift canary over ALL live testdata tables.
  *
  * The driver regenerates /root/testdata between rounds, and a layout
  * change surfaces as a diffuse pile of per-query failures unless
  * something names the drift directly: round 6 lost 9 queries and 72
  * tests to an `events.ts` physical-layout change before the loader
  * became schema-adaptive (EventsSchemaSpec pins that history). This
  * spec extends the tripwire to every table: one named assertion per
  * column each query family assumes, so the NEXT regeneration fails
  * here first with a message that says exactly which table and column
  * moved.
  *
  * Deliberately type-CLASS based (integral / fractional / string /
  * timestamp / float-array), not exact-width: queries read these
  * columns through Spark expressions that are width-agnostic (an
  * int32→int64 key regeneration changes nothing a query computes, and
  * hard-pinning widths would turn a harmless regeneration into a
  * false alarm). A class change — or a rename — is what breaks
  * queries, and that is what fails loudly here.
  */
class TestdataSchemaSpec extends SparkSuite {

  private sealed trait Kind { def ok(dt: DataType): Boolean }
  private case object Integral extends Kind {
    def ok(dt: DataType): Boolean = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
  }
  private case object Fractional extends Kind {
    def ok(dt: DataType): Boolean = dt match {
      case _: FloatType | _: DoubleType | _: DecimalType => true
      case _ => false
    }
  }
  private case object Str extends Kind {
    def ok(dt: DataType): Boolean = dt.isInstanceOf[StringType]
  }
  private case object Tstamp extends Kind {
    // Instant (TimestampType) or wall-clock (TimestampNTZType) both
    // satisfy the queries: every entrypoint pins the UTC session
    // timezone, under which the two interpret identically. The live
    // data currently ships o_orderdate/l_shipdate as NTZ and the
    // normalized events.ts as instant; EventsSchemaSpec pins the
    // latter exactly.
    def ok(dt: DataType): Boolean =
      dt.isInstanceOf[TimestampType] || dt.isInstanceOf[TimestampNTZType]
  }
  private case object FloatArray extends Kind {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
  }

  private def expected(t: Tables): Seq[(String, DataFrame, Seq[(String, Kind)])] = Seq(
    ("region", t.region, Seq(
      "r_regionkey" -> Integral, "r_name" -> Str)),
    ("nation", t.nation, Seq(
      "n_nationkey" -> Integral, "n_name" -> Str, "n_regionkey" -> Integral)),
    ("customer", t.customer, Seq(
      "c_custkey" -> Integral, "c_name" -> Str, "c_nationkey" -> Integral,
      "c_acctbal" -> Fractional, "c_mktsegment" -> Str)),
    ("supplier", t.supplier, Seq(
      "s_suppkey" -> Integral, "s_name" -> Str, "s_nationkey" -> Integral,
      "s_acctbal" -> Fractional)),
    ("part", t.part, Seq(
      "p_partkey" -> Integral, "p_name" -> Str, "p_brand" -> Str,
      "p_type" -> Str, "p_size" -> Integral, "p_retailprice" -> Fractional)),
    ("orders", t.orders, Seq(
      "o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Str, "o_totalprice" -> Fractional,
      "o_orderdate" -> Tstamp, "o_orderpriority" -> Str)),
    ("lineitem", t.lineitem, Seq(
      "l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Str, "l_linestatus" -> Str,
      "l_shipdate" -> Tstamp)),
    ("events", t.events, Seq(
      "event_id" -> Integral, "ts" -> Tstamp, "user_id" -> Integral,
      "event_type" -> Str, "value" -> Fractional, "props" -> Str)),
    ("documents", t.documents, Seq(
      "doc_id" -> Integral, "text" -> Str, "lang" -> Str,
      "source" -> Str, "n_chars" -> Integral)),
    ("embeddings", t.embeddings, Seq(
      "vec_id" -> Integral, "embedding" -> FloatArray, "label" -> Integral)),
  )

  test("every live testdata table still carries the columns the queries assume") {
    val problems = Seq.newBuilder[String]
    for ((name, df, cols) <- expected(Tables(spark, sf("sf0.001")))) {
      val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
      for ((cname, kind) <- cols) fields.get(cname) match {
        case None =>
          problems += s"$name.$cname: column MISSING (live columns: ${fields.keys.toSeq.sorted.mkString(", ")})"
        case Some(dt) if !kind.ok(dt) =>
          problems += s"$name.$cname: live type $dt no longer satisfies $kind"
        case _ => ()
      }
    }
    val report = problems.result()
    assert(report.isEmpty,
      s"\nTESTDATA REGENERATION DRIFT — fix the loaders/queries for:\n  ${report.mkString("\n  ")}")
  }

  test("embeddings dimensionality matches the ANN tier's pinned Dim = 64") {
    // SimilarityQueries hard-codes 64 (oracle range(1,65), subspace
    // math 4x16); a regenerated embedding width must fail HERE by name
    val dim = Tables(spark, sf("sf0.001")).embeddings
      .selectExpr("min(size(embedding))", "max(size(embedding))")
      .collect().head
    assert(dim.getInt(0) == 64 && dim.getInt(1) == 64,
      s"embeddings.embedding size drifted to [${dim.getInt(0)}, ${dim.getInt(1)}] — " +
        "SimilarityQueries' Dim/PqSubDim assume exactly 64")
  }
}
