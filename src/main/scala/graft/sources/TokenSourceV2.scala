package graft.sources.v2

import graft.core.TokenFormat

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 implementation of the reference's token text format
  * (`key|value ` tokens separated by spaces — semantics in
  * [[graft.core.TokenFormat]], anchored at
  * `user/TokenRecordReader.java:31-38,58-107,156-165`).
  *
  * Where [[graft.sources.KVFormat]] wraps `spark.read.text`, this is
  * the format as a first-class Spark table: the scan PLANS byte-range
  * splits itself (the reference's `mapred.Input.split-size` becomes the
  * `maxSplitBytes` read option), aligns records at split boundaries
  * with the same extend-to-next-separator ownership rule the
  * reference's `getSplit` uses (`servant/IOFormatServant.java:147-154`),
  * and participates in Catalyst pushdown: key/value predicates
  * (`EqualTo`/`In`/`StringStartsWith`) evaluate INSIDE the scan before
  * a row is ever materialized, and column pruning drops unused fields
  * at the reader (`.explain` shows the pushed filters and read schema
  * on the BatchScan node).
  *
  * Scale: one InputPartition per `maxSplitBytes` byte range per file —
  * the 100 TB scan parallelizes like parquet does, without a
  * line-oriented re-read. Boundary rule (exact ownership partition of
  * the byte stream): a reader owns every token RUN whose first byte is
  * in `[start, end)`; a run that begins before `end` is consumed past
  * `end` to its terminating separator, and a reader whose range starts
  * mid-run skips forward to the next separator first. UTF-8 multi-byte
  * sequences never contain the separator bytes (0x20/0x0A/0x0D), so
  * byte scanning cannot split a character.
  *
  * Registered as `graft-token` via DataSourceRegister
  * (META-INF/services), so `spark.read.format("graft-token").load(dir)`
  * works with zero imports.
  */
class TokenDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-token"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TokenTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TokenTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object TokenTable {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))
  val DefaultMaxSplitBytes: Long = 128L * 1024 * 1024
}

final class TokenTable(properties: Map[String, String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  private val path = properties.getOrElse("path",
    throw new IllegalArgumentException("graft-token: missing path"))
  override def name(): String = s"graft-token:$path"
  override def schema(): StructType = TokenTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TokenScanBuilder(path,
      Option(options.get("maxSplitBytes")).map(_.toLong)
        .getOrElse(TokenTable.DefaultMaxSplitBytes))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new TokenWriteBuilder(path, info)
}

final class TokenScanBuilder(path: String, maxSplitBytes: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TokenTable.schema

  /** Accept key/value predicates the reader can decide exactly from
    * the parsed record; everything else stays a Spark-side filter.
    * Accepted filters are fully evaluated in the scan, so they are NOT
    * returned as residuals.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition {
      case EqualTo(a, _: String)          => a == "key" || a == "value"
      case In(a, vs)                      => (a == "key" || a == "value") &&
        vs.forall(_.isInstanceOf[String])
      case StringStartsWith(a, _)         => a == "key" || a == "value"
      case IsNotNull(a)                   => a == "key" || a == "value"
      case _                              => false
    }
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new TokenScan(path, maxSplitBytes, pushed, required)
}

final class TokenScan(path: String, maxSplitBytes: Long,
    pushed: Array[Filter], required: StructType) extends Scan with Batch
    with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-token $path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  /** Report the on-disk byte size so Catalyst's join planning sees a
    * small token table as broadcastable WITHOUT a hint — the same
    * statistics seam the file sources use. (Conservative: raw file
    * bytes, not filtered selectivity.)
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes: Long = {
      val conf = org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(_.isFile)
        else Array(fs.getFileStatus(p))
      files.map(_.getLen).sum
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName
          .startsWith("_") && !s.getPath.getName.startsWith("."))
      else Array(fs.getFileStatus(p))
    files.flatMap { st =>
      val len = st.getLen
      if (len == 0) Nil
      else (0L until len by maxSplitBytes).map { start =>
        TokenInputPartition(st.getPath.toString, start,
          math.min(start + maxSplitBytes, len)): InputPartition
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TokenReaderFactory(TokenScan.confToMap(
      org.apache.spark.sql.SparkSession.active.sparkContext
        .hadoopConfiguration),
      pushed.map(TokenScan.compile), required.fieldNames)
}

object TokenScan {
  /** Hadoop Configuration is not Serializable — ship its entries. */
  def confToMap(conf: Configuration): Map[String, String] =
    conf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap

  /** Pushed filters compiled to a serializable predicate over the
    * parsed (key, value) record.
    */
  def compile(f: Filter): (String, String) => Boolean = f match {
    case EqualTo(a, v: String)  =>
      if (a == "key") (k, _) => k == v else (_, vv) => vv == v
    case In(a, vs) =>
      val set = vs.collect { case s: String => s }.toSet
      if (a == "key") (k, _) => set(k) else (_, vv) => set(vv)
    case StringStartsWith(a, p) =>
      if (a == "key") (k, _) => k.startsWith(p) else (_, vv) => vv.startsWith(p)
    case IsNotNull(_)           => (_, _) => true // fields never null
    case other => throw new IllegalStateException(s"unpushable: $other")
  }
}

final case class TokenInputPartition(file: String, start: Long, end: Long)
    extends InputPartition

final case class TokenReaderFactory(confMap: Map[String, String],
    preds: Array[(String, String) => Boolean], columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val tp = p.asInstanceOf[TokenInputPartition]
    new TokenPartitionReader(tp, confMap, preds, columns)
  }
}

/** Reads one byte range of a token file. Owns exactly the runs whose
  * first byte is in [start, end) — see the ownership rule on
  * [[TokenDataSource]].
  */
final class TokenPartitionReader(part: TokenInputPartition,
    confMap: Map[String, String],
    preds: Array[(String, String) => Boolean], columns: Array[String])
    extends PartitionReader[InternalRow] {

  private def isSep(b: Int): Boolean = b == ' ' || b == '\n' || b == '\r'

  private val raw = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(part.file)
    val stream = p.getFileSystem(conf).open(p)
    if (part.start > 0) stream.seek(part.start - 1)
    stream
  }
  private val in = new java.io.BufferedInputStream(raw, 64 * 1024)
  /** offset of the NEXT byte `in.read()` returns */
  private var pos: Long = if (part.start > 0) part.start - 1 else 0L

  private def readByte(): Int = { val b = in.read(); if (b != -1) pos += 1; b }

  // Ownership probe: if the byte before `start` is NOT a separator,
  // the run covering `start` began in the previous range — skip to the
  // end of that run (its final separator) before emitting anything.
  if (part.start > 0 && !isSep(readByte())) {
    var b = readByte()
    while (b != -1 && !isSep(b)) b = readByte()
  }

  // current run → 1000-char pieces → parsed records → filters
  private var pieces: Iterator[(String, String)] = Iterator.empty
  private var current: (String, String) = _

  private def nextRun(): Option[String] = {
    // skip separators; the run must START (first byte offset) < end
    var b = readByte()
    while (b != -1 && isSep(b)) b = readByte()
    if (b == -1 || pos - 1 >= part.end) return None
    val buf = new java.io.ByteArrayOutputStream(64)
    while (b != -1 && !isSep(b)) { buf.write(b); b = readByte() }
    Some(buf.toString(java.nio.charset.StandardCharsets.UTF_8))
  }

  override def next(): Boolean = {
    while (true) {
      while (pieces.hasNext) {
        val rec = pieces.next()
        if (preds.forall(p => p(rec._1, rec._2))) { current = rec; return true }
      }
      nextRun() match {
        case Some(run) =>
          pieces = run.grouped(TokenFormat.MaxTokenLen).map(TokenFormat.parse)
        case None => return false
      }
    }
    false
  }

  private val wantKey = columns.map(_ == "key")

  override def get(): InternalRow = {
    val vals = new Array[Any](columns.length)
    var i = 0
    while (i < vals.length) {
      vals(i) = UTF8String.fromString(if (wantKey(i)) current._1 else current._2)
      i += 1
    }
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
  }

  override def close(): Unit = in.close()
}

// ───────────────────────── write path ─────────────────────────

/** Golden-format write side of the V2 table: each input partition
  * becomes one `key|value ` token file (the reference's per-reducer
  * `reduced<index>` artifacts, byte format
  * `user/TokenRecordWriter.java:85` — space-terminated tokens, one
  * line, no trailing newline).
  *
  * Commit protocol = the reference's R6 fix done the Spark way: the
  * reference recreates a failed task "with a new id and new output
  * files" so two attempts never write one file
  * (`schedule/WorkerInitializer.java:434-469`). Here every task
  * attempt writes to an attempt-unique temp file
  * (`_temporary/part-<partition>-<taskId>`); only the DRIVER's
  * `BatchWrite.commit` — which Spark calls with exactly one commit
  * message per partition — renames the winners into place. A
  * speculative duplicate or zombie attempt leaves only an orphan temp
  * file, removed with the temp dir; `abort` deletes everything.
  * TokenSourceV2Spec drives commit and duplicate-attempt cleanup.
  */
final class TokenWriteBuilder(path: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  require(info.schema().fieldNames.sameElements(Array("key", "value")),
    s"graft-token write expects (key, value), got ${info.schema().catalogString}")
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new TokenBatchWrite(path, doTruncate,
          TokenScan.confToMap(org.apache.spark.sql.SparkSession.active
            .sparkContext.hadoopConfiguration))
    }
}

final class TokenBatchWrite(path: String, truncate: Boolean,
    confMap: Map[String, String])
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  private def fs() = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(path)
    (p.getFileSystem(conf), p)
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val (f, p) = fs()
    if (truncate && f.exists(p)) f.delete(p, true)
    f.mkdirs(new Path(p, "_temporary"))
    TokenWriterFactory(path, confMap)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (f, p) = fs()
    messages.foreach { case TokenCommit(temp, fin) =>
      f.rename(new Path(temp), new Path(p, fin))
    }
    f.delete(new Path(p, "_temporary"), true) // drops orphan attempts
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (f, p) = fs()
    f.delete(new Path(p, "_temporary"), true)
  }
}

final case class TokenCommit(tempFile: String, finalName: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final case class TokenWriterFactory(path: String, confMap: Map[String, String])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new TokenDataWriter(path, confMap, partitionId, taskId)
}

final class TokenDataWriter(path: String, confMap: Map[String, String],
    partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val conf = {
    val c = new Configuration(false)
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val temp = new Path(path,
    f"_temporary/part-$partitionId%05d-$taskId")
  private val out = temp.getFileSystem(conf).create(temp, true)
  private var any = false

  override def write(row: InternalRow): Unit = {
    val tok = TokenFormat.format(row.getUTF8String(0).toString,
      row.getUTF8String(1).toString) + " "
    out.write(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    any = true
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    TokenCommit(temp.toString, f"part-$partitionId%05d.txt")
  }

  override def abort(): Unit = {
    out.close()
    temp.getFileSystem(conf).delete(temp, false)
  }

  override def close(): Unit = ()
}
