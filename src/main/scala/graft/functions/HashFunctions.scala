package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Native tokenize→shingle→hash kernels. The composed form
  * (split + transform(sequence…) + md5 + conv) is evaluated
  * interpreted — Spark's higher-order functions have no codegen — and
  * measured ~18 µs per shingle; these expressions run the same
  * computation as one fused JVM loop (~1 µs/shingle), called from
  * generated code as a static method.
  *
  * Hash parity contract (mirrored by the DuckDB oracles):
  *  - shingle32: value = first 4 md5 bytes of the shingle string as an
  *    unsigned 32-bit int == `('0x'||substr(md5(s),1,8))::BIGINT`.
  *  - simhash60: per-token 60-bit value = first 8 md5 bytes as unsigned
  *    64-bit >>> 4 == `('0x'||substr(md5(t),1,15))::BIGINT`; bit i of
  *    the fingerprint is 1 iff 2*ones(i) >= n_tokens.
  * Tokenization = split on single space, empties dropped (TokenFormat
  * semantics, `user/TokenRecordReader.java:32`).
  */
object HashKernels {
  private val md5Local = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private def tokenize(text: String): Array[String] =
    text.split(' ').filter(_.nonEmpty)

  private def md5Prefix8(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** Distinct 32-bit hashes of the n-token shingles of `text`. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val md   = md5Local.get()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb   = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      seen.add(md5Prefix8(md, sb.toString) >>> 32)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it  = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Codegen entry point for [[CharNgrams]]. */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    if (s.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= s.length) { seen.add(s.substring(i, i + n)); i += 1 }
    val out = new Array[Any](seen.size)
    val it  = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Codegen entry point for [[ProfileOverlap]]: overlap counts of the
    * (distinct) `grams` against each profile set, in profile order.
    */
  def profileOverlap(grams: ArrayData,
      sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val out = new Array[Int](sets.length)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i)
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(g)) out(j) += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash of `text` (majority vote over per-token hashes;
    * duplicates count). 0 for token-less text.
    */
  def simhash60(text: UTF8String): Long = {
    val toks = tokenize(text.toString)
    if (toks.isEmpty) return 0L
    val md   = md5Local.get()
    val ones = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = md5Prefix8(md, toks(i)) >>> 4
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) ones(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (2 * ones(b) >= toks.length) out |= 1L << b
      b += 1
    }
    out
  }

  /** Codegen entry point for [[MinHashes]]: the j-th output is
    * min over the input hashes x of (x·a_j + b_j) mod p — one pass
    * over the hash array for all j. Empty input → all-null minima,
    * matching `array_min(transform(…))` per rehash.
    */
  def minHashes(sh: ArrayData, as: Array[Long], bs: Array[Long],
      p: Long): ArrayData = {
    val n = sh.numElements()
    if (n == 0)
      return new GenericArrayData(Array.fill[Any](as.length)(null))
    val mins = Array.fill(as.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = sh.getLong(i)
      var j = 0
      while (j < as.length) {
        val v = (x * as(j) + bs(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Codegen entry point for [[IntersectSize]]:
    * |distinct(a) ∩ distinct(b)| over long arrays — the count
    * `size(array_intersect(a, b))` produces, without materializing the
    * intersection array or re-hashing per call site.
    */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[java.lang.Long](
      math.max(8, small.numElements() * 2))
    var i = 0
    while (i < small.numElements()) { set.add(small.getLong(i)); i += 1 }
    var cnt = 0
    i = 0
    while (i < large.numElements()) {
      if (set.remove(large.getLong(i))) cnt += 1
      i += 1
    }
    cnt
  }
}

/** Distinct character n-grams of a text column (fused kernel twin of
  * `transform(sequence(1, length-n+1), i -> substring(text, i, n))` +
  * `array_distinct`, which runs interpreted). First-occurrence order,
  * matching the composed form and DuckDB's list_distinct.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    HashKernels.charNgrams(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.charNgrams($c, $n)")

  override protected def withNewChildInternal(c: Expression): CharNgrams =
    copy(child = c)

  override def prettyName: String = "char_ngrams"
}

/** `array<long>` of distinct 32-bit shingle hashes of a text column. */
case class ShingleHash32(child: Expression, n: Int) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    HashKernels.shingleHashes(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.shingleHashes($c, $n)")

  override protected def withNewChildInternal(c: Expression): ShingleHash32 =
    copy(child = c)

  override def prettyName: String = "shingle_hash32"
}

/** Overlap counts of a distinct-gram array column against a bounded
  * set of literal profiles (one count per profile, in the given
  * order) — the fused, codegen'd twin of one `size(array_intersect)`
  * per profile, which runs interpreted and re-hashes the gram array
  * once per profile. One pass over the grams, one hash probe per
  * (gram, profile).
  */
case class ProfileOverlap(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { p =>
      val s = new java.util.HashSet[UTF8String]()
      p.foreach(x => s.add(UTF8String.fromString(x)))
      s
    }.toArray

  override def nullSafeEval(v: Any): Any =
    HashKernels.profileOverlap(v.asInstanceOf[ArrayData], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("profileSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.profileOverlap($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): ProfileOverlap =
    copy(child = c)

  override def prettyName: String = "profile_overlap"
}

/** All 16 (or however many) affine min-hashes of a distinct-hash array
  * in ONE pass — the fused, codegen'd twin of one
  * `array_min(transform(sh, h -> (h*a_j + b_j) % p))` per rehash,
  * which runs interpreted: 16 lambda passes and 17 array allocations
  * per row. The (a_j, b_j) parameters ride as reference objects.
  * Empty input → all-null minima (the array_min-of-empty rule).
  */
case class MinHashes(child: Expression, as: Array[Long], bs: Array[Long],
    p: Long) extends UnaryExpression with ExpectsInputTypes {
  require(as.length == bs.length && as.nonEmpty, "minhash param mismatch")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(v: Any): Any =
    HashKernels.minHashes(v.asInstanceOf[ArrayData], as, bs, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("mhAs", as, "long[]")
    val rb = ctx.addReferenceObj("mhBs", bs, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.minHashes($c, $ra, $rb, ${p}L)")
  }

  override def equals(other: Any): Boolean = other match {
    case o: MinHashes => child == o.child && p == o.p &&
      java.util.Arrays.equals(as, o.as) && java.util.Arrays.equals(bs, o.bs)
    case _ => false
  }
  override def hashCode(): Int =
    (child, java.util.Arrays.hashCode(as), java.util.Arrays.hashCode(bs), p)
      .hashCode()

  override protected def withNewChildInternal(c: Expression): MinHashes =
    copy(child = c)

  override def prettyName: String = "min_hashes"
}

/** |distinct(a) ∩ distinct(b)| of two long-array columns — the fused,
  * codegen'd twin of `size(array_intersect(a, b))`, which interprets
  * and materializes the intersection array only to count it.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.intersectSize(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashKernels.intersectSize($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectSize =
    copy(left = l, right = r)

  override def prettyName: String = "intersect_size"
}

/** 60-bit SimHash of a text column. */
case class SimHash60(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    HashKernels.simhash60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash60($c)")

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)

  override def prettyName: String = "simhash60"
}

object HashFunctions {
  /** Distinct 32-bit 3-token-shingle hashes (native kernel). */
  def shingleHash32(c: Column, n: Int = 3): Column =
    Exprs.toColumn(ShingleHash32(Exprs.toExpr(c), n))

  /** 60-bit SimHash fingerprint (native kernel). */
  def simhash60(c: Column): Column =
    Exprs.toColumn(SimHash60(Exprs.toExpr(c)))

  /** Distinct character n-grams (native kernel). */
  def charNgrams(c: Column, n: Int): Column =
    Exprs.toColumn(CharNgrams(Exprs.toExpr(c), n))

  /** Per-profile overlap counts of a gram array (native kernel). */
  def profileOverlap(c: Column, profiles: Seq[Seq[String]]): Column =
    Exprs.toColumn(ProfileOverlap(Exprs.toExpr(c), profiles))

  /** All affine min-hashes of a distinct-hash array in one pass
    * (native kernel).
    */
  def minHashes(c: Column, params: Seq[(Long, Long)], p: Long): Column =
    Exprs.toColumn(MinHashes(Exprs.toExpr(c),
      params.map(_._1).toArray, params.map(_._2).toArray, p))

  /** |distinct(a) ∩ distinct(b)| of two long arrays (native kernel). */
  def intersectSize(a: Column, b: Column): Column =
    Exprs.toColumn(IntersectSize(Exprs.toExpr(a), Exprs.toExpr(b)))
}
