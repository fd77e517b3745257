package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters summary (Metwally et al., 2005) as a
  * native Catalyst [[TypedImperativeAggregate]] — the mergeable-sketch
  * aggregation topology: each task folds its partition's tokens into a
  * bounded `capacity`-entry summary, partial summaries (≤ capacity
  * rows each, never the token stream) shuffle to one tiny merge, and
  * the result carries per-entry error bounds. At 100 TB this is THE
  * shape for "top terms over the corpus": the exact group-by must
  * shuffle every distinct token; this shuffles `capacity × tasks`
  * summary entries total, with the classic guarantee that any term
  * with true count > N/capacity is retained and every reported count
  * overestimates by at most its `err` field (≤ N/capacity).
  *
  * Determinism contract (so the summary is oracle-checkable when
  * exact): eviction picks the (cnt ASC, term DESC)-minimal entry —
  * i.e. among minimal counts the lexicographically LARGEST term is
  * recycled — and [[eval]] emits entries sorted (cnt DESC, term ASC).
  * While no buffer ever reaches `capacity`, no eviction happens, the
  * merge is a pointwise sum, and every (cnt, err=0) is EXACT — the
  * regime the DuckDB oracle pins; the eviction regime's bounds are
  * asserted separately in SketchSpec.
  *
  * Merge rule (mergeable-summaries form, Agarwal et al., 2012): a term
  * absent from a summary is estimated at that summary's minimum count
  * if the summary is saturated (it could have been evicted after up to
  * that many arrivals), else 0; estimates fold into `err`.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingTopK.Summary]
    with UnaryLike[Expression]
    with ExpectsInputTypes {

  require(capacity > 0, "space_saving_topk capacity must be positive")

  // a non-string child must fail at ANALYSIS (the standard aggregate
  // contract), not as an opaque ClassCastException inside update()
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): SpaceSavingTopK.Summary =
    new SpaceSavingTopK.Summary(capacity)

  override def update(buf: SpaceSavingTopK.Summary,
      input: InternalRow): SpaceSavingTopK.Summary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: SpaceSavingTopK.Summary,
      other: SpaceSavingTopK.Summary): SpaceSavingTopK.Summary = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: SpaceSavingTopK.Summary): Any =
    new GenericArrayData(buf.sortedEntries.map { case (term, cnt, err) =>
      InternalRow(UTF8String.fromString(term), cnt, err)
    })

  override def serialize(buf: SpaceSavingTopK.Summary): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    val entries = buf.sortedEntries
    out.writeInt(entries.length)
    entries.foreach { case (term, cnt, err) =>
      out.writeUTF(term); out.writeLong(cnt); out.writeLong(err)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingTopK.Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingTopK.Summary(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.put(in.readUTF(), in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = SpaceSavingTopK.resultType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SpaceSavingTopK =
    copy(child = c)
  override def prettyName: String = "space_saving_topk"
}

object SpaceSavingTopK {

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  /** Counter cell — mutable so the hot update path allocates nothing
    * beyond first sight of a term.
    */
  private final class Cell(var cnt: Long, var err: Long)

  /** The bounded summary. `saturated` sticks once the map has ever hit
    * capacity: from then on absent terms may have been evicted, so the
    * merge rule must charge this summary's minimum count for them.
    */
  final class Summary(capacity: Int) {
    private val m = mutable.HashMap.empty[String, Cell]
    private var saturated = false

    /** Raw insert for deserialize — no eviction bookkeeping. */
    private[SpaceSavingTopK] def put(term: String, cnt: Long, err: Long): Unit = {
      m.put(term, new Cell(cnt, err))
      if (m.size >= capacity) saturated = true
    }

    def add(term: String, cnt: Long, err: Long): Unit = m.get(term) match {
      case Some(c) => c.cnt += cnt; c.err += err
      case None if m.size < capacity => m.put(term, new Cell(cnt, err))
      case None =>
        saturated = true
        // evict the (cnt ASC, term DESC)-minimal entry; its count
        // becomes the newcomer's overestimate floor
        var minTerm: String = null
        var minCell: Cell = null
        m.foreach { case (t, c) =>
          if (minCell == null || c.cnt < minCell.cnt ||
            (c.cnt == minCell.cnt && t > minTerm)) { minTerm = t; minCell = c }
        }
        m.remove(minTerm)
        m.put(term, new Cell(minCell.cnt + cnt, minCell.cnt + err))
    }

    private def minCnt: Long =
      if (m.isEmpty) 0L else m.valuesIterator.map(_.cnt).min

    /** What an absent term may have counted here before eviction. */
    private def absentFloor: Long = if (saturated) minCnt else 0L

    def mergeIn(other: Summary): Unit = {
      val floorSelf = absentFloor
      val floorOther = other.absentFloor
      val merged = mutable.HashMap.empty[String, Cell]
      (m.keysIterator ++ other.m.keysIterator).foreach { t =>
        if (!merged.contains(t)) {
          val a = m.get(t); val b = other.m.get(t)
          merged.put(t, new Cell(
            a.map(_.cnt).getOrElse(floorSelf) + b.map(_.cnt).getOrElse(floorOther),
            a.map(_.err).getOrElse(floorSelf) + b.map(_.err).getOrElse(floorOther)))
        }
      }
      if (other.saturated) saturated = true
      m.clear()
      if (merged.size <= capacity) merged.foreach { case (t, c) => m.put(t, c) }
      else {
        saturated = true
        merged.toSeq
          .sortBy { case (t, c) => (-c.cnt, t) }
          .take(capacity)
          .foreach { case (t, c) => m.put(t, c) }
      }
    }

    /** (cnt DESC, term ASC) — the pinned output and truncation order. */
    def sortedEntries: Array[(String, Long, Long)] =
      m.iterator.map { case (t, c) => (t, c.cnt, c.err) }.toArray
        .sortBy { case (t, cnt, _) => (-cnt, t) }
  }
}

/** Count-Min sketch (Cormode & Muthukrishnan, 2005) as a native
  * Catalyst [[TypedImperativeAggregate]] — the POINT-QUERY sketch
  * family next to [[SpaceSavingTopK]]'s top-k family: d×w counters
  * answer "how often did THIS term occur" for any term, in O(d·w)
  * memory regardless of vocabulary. The sketch is LINEAR (standard
  * update, deliberately NOT conservative update: CU tightens a single
  * stream but breaks the lower-bound guarantee under partial-aggregate
  * merge, and mergeability is the whole point on Spark), so partial
  * sketches cell-wise-add across tasks — the combiner seam ships
  * d·w longs per task, never the stream.
  *
  * Guarantees (deterministic, per sketch instance): est(t) ≥ true(t)
  * always (every row counts every occurrence plus non-negative
  * collisions); est(t) ≤ true(t) + εN with probability 1−e^(−d) over
  * hash choice, ε = e/w — the hashes here are FIXED seeded Murmur3,
  * so for a given corpus the bound either holds or not,
  * deterministically and reproducibly. Query terms are fixed at
  * construction so [[eval]] emits a bounded (term, est) array.
  */
case class CountMinEstimates(
    child: Expression,
    queryTerms: Seq[String],
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinEstimates.Cms]
    with UnaryLike[Expression]
    with ExpectsInputTypes {

  require(depth > 0 && width > 0, "count_min needs positive depth/width")
  require(queryTerms.nonEmpty && queryTerms.forall(_.trim.nonEmpty),
    "count_min needs non-blank query terms")

  // a non-string child must fail at ANALYSIS (the standard aggregate
  // contract), not as an opaque ClassCastException inside update()
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): CountMinEstimates.Cms =
    new CountMinEstimates.Cms(depth, width)

  override def update(buf: CountMinEstimates.Cms,
      input: InternalRow): CountMinEstimates.Cms = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: CountMinEstimates.Cms,
      other: CountMinEstimates.Cms): CountMinEstimates.Cms = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: CountMinEstimates.Cms): Any =
    new GenericArrayData(queryTerms.sorted.map { t =>
      InternalRow(UTF8String.fromString(t), buf.estimate(t))
    })

  override def serialize(buf: CountMinEstimates.Cms): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(depth); out.writeInt(width)
    var i = 0
    while (i < buf.counts.length) { out.writeLong(buf.counts(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinEstimates.Cms = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt(); val w = in.readInt()
    val buf = new CountMinEstimates.Cms(d, w)
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = CountMinEstimates.resultType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): CountMinEstimates =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinEstimates =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinEstimates =
    copy(child = c)
  override def prettyName: String = "count_min_estimates"
}

object CountMinEstimates {

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  /** Row-i hash of a term — seeded Murmur3, identical on every JVM so
    * partial sketches built on different executors agree cell-for-cell.
    */
  private[functions] def cell(term: String, row: Int, width: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(term, row * 0x9E3779B9 + 1),
      width)

  final class Cms(val depth: Int, val width: Int) {
    val counts = new Array[Long](depth * width)

    def add(term: String): Unit = {
      var i = 0
      while (i < depth) {
        counts(i * width + cell(term, i, width)) += 1L
        i += 1
      }
    }

    def mergeIn(other: Cms): Unit = {
      require(other.depth == depth && other.width == width,
        "cannot merge differently-shaped CMS")
      var i = 0
      while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    }

    def estimate(term: String): Long = {
      var est = Long.MaxValue
      var i = 0
      while (i < depth) {
        val c = counts(i * width + cell(term, i, width))
        if (c < est) est = c
        i += 1
      }
      est
    }
  }
}

object SketchFunctions {
  /** Column-API entry: `space_saving_topk(term, capacity)`. */
  def spaceSavingTopK(c: Column, capacity: Int): Column =
    Exprs.toColumn(
      SpaceSavingTopK(Exprs.toExpr(c), capacity).toAggregateExpression())

  /** Column-API entry: `count_min_estimates(term, queries, d, w)`. */
  def countMinEstimates(c: Column, queryTerms: Seq[String],
      depth: Int, width: Int): Column =
    Exprs.toColumn(
      CountMinEstimates(Exprs.toExpr(c), queryTerms, depth, width)
        .toAggregateExpression())
}
