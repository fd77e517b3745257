package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, lit, max, min}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** The ONE partitioned-index merge kernel (r14 verdict tasks 1+4).
  *
  * Every persisted index in this repo is a hive-partitioned parquet
  * directory (`root/part=N/`) maintained by key-based MERGE/DELETE:
  * IVF cells, IVF-PQ code cells, media band/sig buckets, text postings
  * buckets, key-bucketed lakes. Through round 14 each of them carried
  * its own copy of the same per-partition loop — locate touched
  * partitions, then ONE Spark job + ONE crash-safe directory swap PER
  * touched partition, serially. Correct, and cheap while `touched` is
  * bounded by a 16-cell demo index — but at a production partition
  * count (√N cells for 10⁹+ vectors) that loop is O(thousands) of
  * driver-orchestrated jobs per nightly batch, and the multi-swap
  * sequence opens the partial-commit crash window all the presence-
  * check repair branches existed to paper over.
  *
  * This kernel replaces the loop with ONE dynamic-partition-overwrite
  * job and ONE commit point:
  *
  *  1. ONE narrow locating pass over (key, partition) columns —
  *     parquet column pruning reads a few percent of index bytes —
  *     computes, per partition holding a batch key, the total row
  *     count and the batch-key row count (the batch keys ride in as a
  *     broadcast). Touched = those partitions ∪ the batch's own
  *     target partitions; bounded collects. The pass is BOUNDED BY
  *     THE BATCH, not the index, whenever the `_meta/part_stats`
  *     sidecar (below) is live: per-partition key min/max prunes the
  *     scan to partitions whose key range can intersect a batch key,
  *     so a nightly batch touching 0.1 % of a production index reads
  *     0.1 % of its (key, part) columns instead of all of them.
  *  2. Partitions whose EVERY stored row carries a batch key and that
  *     gain no batch rows end up empty after the merge; Spark's
  *     dynamic overwrite replaces only partitions present in the
  *     written data, so these are cleared explicitly first. The only
  *     rows that deletion can lose are rows the batch is replacing
  *     (or the purge is deleting) — a crash here re-applies cleanly.
  *  3. ONE job: the touched partitions' stored rows (read via
  *     `basePath`, so the output root is never an input root path),
  *     anti-joined on the batch keys, unioned with the batch, written
  *     `mode=overwrite` with `partitionOverwriteMode=dynamic` and
  *     `partitionBy(part)`. Spark stages the files under the root and
  *     swaps exactly the written partitions at JOB COMMIT — the single
  *     commit point. Untouched partition directories keep their files
  *     byte-identical (the reads all complete before the commit's
  *     deletes, so reading the partitions being replaced is safe).
  *
  * The merge itself is idempotent (anti-join on key + union), so a
  * crash BEFORE the filesystem commit converges on re-application.
  * The commit itself is NOT atomic (the r15 advice): Spark's dynamic
  * overwrite commitJob is a per-partition delete+rename loop over a
  * `.spark-staging-<job>` directory, so a driver crash mid-commit can
  * leave a touched partition DELETED while its full replacement sits
  * only under the hidden staging directory — and that partition's
  * non-batch stored rows are NOT recoverable by re-applying the merge
  * (the anti-join would see an empty partition). Every kernel entry
  * point therefore runs [[recoverStaging]] first: a leftover staged
  * partition whose live directory is missing is renamed into place
  * (restoring the full post-merge content, batch effect included),
  * one whose live directory survived is discarded (the live copy is
  * the pre-swap content and the idempotent re-apply regenerates the
  * batch's effect), and the staging litter is dropped. Single-writer
  * per index root is the callers' existing contract (`synchronized`
  * demo builds; one maintenance job per index in production) — the
  * recovery pass must never run concurrently with a live commit.
  *
  * == The `_meta/part_stats` sidecar ==
  *
  * Alongside the data, every commit maintains `root/_meta/part_stats`
  * (hidden from parquet reads by the underscore): one row per
  * partition — (part, kmin, kmax, n), the key range and row count.
  * The locating pass consults it to scan ONLY partitions whose range
  * can hold a batch key; partitions on disk but absent from the
  * sidecar are always scanned (so a partial or missing sidecar is a
  * performance fallback, never a correctness input). Crash safety is
  * a `_meta/pending` marker written BEFORE the data commit and
  * cleared AFTER the sidecar rewrite: while it exists the sidecar is
  * untrusted and the locating pass reads the whole index (and the
  * next completed commit rewrites both). The sidecar itself swaps in
  * via write-to-sibling + rename, so a torn write is never readable.
  * First merge against a pre-sidecar index pays one full locating
  * scan and bootstraps the sidecar from the same pass — no extra I/O.
  *
  * == Exact hints ==
  *
  * Range pruning is geometry: it only bites when keys range-cluster
  * with partitions. On hash-bucketed tables and cell-partitioned ANN
  * tables it degenerates to a full scan. Callers that KNOW where a
  * key's rows live pass a [[LocateHint]] — [[PartOf]] (partition is a
  * pure function of the key: the doc/sig buckets, the bucketed lake)
  * or [[StoredAt]] (a routing-table lookup: the ANN cell tables via
  * [[KeyRouting]]) — and the locating pass reads exactly the hinted
  * partitions plus the batch's own targets: O(batch) whatever the
  * key distribution, sidecar or no sidecar. The sidecar remains the
  * unhinted fallback and the audit surface.
  *
  * Compaction: `repartition(partCol)` routes each partition value to
  * one task, so each touched directory rewrites to one file — the
  * per-partition compaction the old loops bought with per-cell
  * coalesce. At a scale where one partition outgrows one output file,
  * set `spark.sql.files.maxRecordsPerFile` or repartition by
  * (part, key-range); the commit semantics are unchanged.
  */
/** How the locating pass bounds its scan WITHOUT consulting the
  * `_meta/part_stats` ranges — the r16 scale step past the sidecar:
  * range pruning degenerates to a full scan on hash-bucketed tables
  * (every bucket's key range spans the whole key domain) and on
  * cell-partitioned ANN tables (ids scatter across cells), which
  * between them are most of this repo's indexes. When the caller
  * KNOWS where a key's stored rows can live, the locating pass reads
  * exactly those partitions — O(batch), not O(index), with or
  * without a sidecar.
  */
sealed trait LocateHint

/** The table is hash-bucketed: a key's partition is the pure function
  * `f(key)`, so stored rows with a batch key can live nowhere else
  * (and the batch's own partition column must equal `f(key)` — the
  * writer and the hint must share one derivation helper).
  */
final case class PartOf(f: org.apache.spark.sql.Column =>
  org.apache.spark.sql.Column) extends LocateHint

/** A (keyCol, partCol) lookup — a routing table ([[KeyRouting]]) or a
  * caller's already-pruned pre-scan — that covers EVERY partition
  * storing a batch key, except partitions that are also the batch's
  * own targets (the merge path always scans those). Over-reporting is
  * safe (extra partitions scan as no-ops); under-reporting leaks
  * stale rows, so maintainers must only ever let a lookup go stale in
  * the over-reporting direction (commit data BEFORE trimming the
  * lookup; add lookup rows BEFORE the data they describe).
  */
final case class StoredAt(lookup: DataFrame) extends LocateHint

object IndexMerge {

  private def hPath(p: String) = new org.apache.hadoop.fs.Path(p)
  private def statsPath(root: String)   = s"$root/_meta/part_stats"
  private def pendingPath(root: String) = s"$root/_meta/pending"

  private def fsOf(s: SparkSession, root: String) =
    hPath(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Key-based MERGE of `batch` into the partitioned directory `root`:
    * stored rows carrying a batch key are replaced by the batch's rows
    * for that key (wherever they currently live — an update whose
    * partition assignment moved must not survive in its old
    * partition), new keys append. `batch` must carry `partCol` (each
    * row's target partition), `keyCol` (non-null), and the payload
    * columns; the KEY is the replacement unit — several rows per key
    * (postings, band entries) are fine, but two conflicting VERSIONS
    * of a key in one batch are the caller's loud-duplicate check to
    * make (MERGE semantics). Returns touched partition ids (sorted).
    *
    * `mergeFn` overrides the default anti-join+union combine (e.g.
    * keep-newest CDC merges). Custom merges must never empty a
    * partition that holds non-batch keys — asserted via the stats
    * pass (the default combine can't, by construction).
    */
  def merge(s: SparkSession, root: String, partCol: String, keyCol: String,
      batch0: DataFrame, readSchema: Option[String] = None,
      mergeFn: Option[(DataFrame, DataFrame) => DataFrame] = None,
      hint: Option[LocateHint] = None): Seq[Int] = {
    val fs = fsOf(s, root)
    require(fs.exists(hPath(root)), s"no partitioned index at $root")
    recoverStaging(fs, root, partCol)
    // the batch feeds the locating pass, the partition probe, and the
    // commit job — cache it once (bounded: the nightly batch)
    val batch = batch0.persist()
    try mergeCached(s, root, partCol, keyCol, batch, readSchema, mergeFn,
      hint)
    finally batch.unpersist()
  }

  private def mergeCached(s: SparkSession, root: String, partCol: String,
      keyCol: String, batch: DataFrame, readSchema: Option[String],
      mergeFn: Option[(DataFrame, DataFrame) => DataFrame],
      hint: Option[LocateHint]): Seq[Int] = {
    val fs = fsOf(s, root)
    val keys = batch.select(col(keyCol))
    // r16 (guide §1.1): a PartOf hint pins batch.partCol == f(key), so
    // the hint's candidate set IS the batch's own target-partition set
    // — one bounded collect serves both instead of two near-identical
    // jobs per merge (every hinted maintenance row and ingest batch
    // paid the duplicate).
    val preHinted: Option[Seq[Int]] = hint.collect {
      case h @ PartOf(_) => hintParts(s, h, keys, keyCol, partCol)
    }
    val loc = locate(s, root, partCol, keyCol, keys, readSchema, hint,
      preHinted)
    val newParts = preHinted.map(_.toSet).getOrElse(
      batch.select(col(partCol)).distinct()
        .collect().map(_.getInt(0)).toSet) // bounded: batch partitions
    val touched = (newParts ++ loc.stats.map(_._1)).toSeq.sorted
    if (touched.isEmpty) return Nil
    // partitions left EMPTY by the merge: all stored rows replaced,
    // no batch rows land (the moved-key old home)
    val empties = loc.stats.collect {
      case (p, total, nb) if total == nb && !newParts(p) => p
    }
    require(empties.isEmpty || mergeFn.isEmpty,
      s"custom mergeFn with fully-replaced partitions ${empties.sorted} — " +
        "the kernel cannot clear partitions whose final content it " +
        "cannot derive from the batch alone")
    markPending(fs, root, touched)
    empties.foreach(p => fs.delete(hPath(s"$root/$partCol=$p"), true))
    val readable = touched.filterNot(empties.toSet)
      .filter(p => fs.exists(hPath(s"$root/$partCol=$p")))
    val stored = readParts(s, root, partCol, readable, readSchema)
      .getOrElse(batch.limit(0))
    val merged = mergeFn match {
      case Some(f) => f(stored, batch)
      case None =>
        stored.join(broadcast(keys), Seq(keyCol), "left_anti")
          .unionByName(batch)
    }
    overwriteParts(s, root, partCol, merged)
    writeStats(s, root, partCol, keyCol, loc.preMeta, touched, readSchema)
    clearPending(fs, root)
    s.catalog.refreshByPath(root)
    touched
  }

  /** Key-based DELETE from the partitioned directory `root`: every row
    * carrying a purge key leaves the index, in ONE dynamic-overwrite
    * commit over exactly the partitions that hold purged keys (located
    * by the same pruned stats pass). Partitions purged to zero rows
    * are cleared. Idempotent: a re-applied list touches nothing.
    * Returns touched partition ids (sorted).
    */
  def delete(s: SparkSession, root: String, partCol: String, keyCol: String,
      purge0: DataFrame, readSchema: Option[String] = None,
      hint: Option[LocateHint] = None): Seq[Int] = {
    val fs = fsOf(s, root)
    require(fs.exists(hPath(root)), s"no partitioned index at $root")
    recoverStaging(fs, root, partCol)
    val purge = purge0.select(col(keyCol)).distinct().persist()
    try {
      val loc = locate(s, root, partCol, keyCol, purge, readSchema, hint)
      val touched = loc.stats.map(_._1).sorted
      if (touched.isEmpty) return Nil
      val empties = loc.stats.collect { case (p, total, nb) if total == nb => p }
      markPending(fs, root, touched)
      empties.foreach(p => fs.delete(hPath(s"$root/$partCol=$p"), true))
      val readable = touched.filterNot(empties.toSet)
      readParts(s, root, partCol, readable, readSchema).foreach { stored =>
        val survivors = stored.join(broadcast(purge), Seq(keyCol), "left_anti")
        overwriteParts(s, root, partCol, survivors)
      }
      writeStats(s, root, partCol, keyCol, loc.preMeta, touched, readSchema)
      clearPending(fs, root)
      s.catalog.refreshByPath(root)
      touched
    } finally purge.unpersist()
  }

  /** The custom-merge escape hatch (band index: hot-band suppression
    * derives a partition's final rows from a window over stored ∪
    * batch, so emptiness is not computable from key counts): `merged`
    * — carrying `partCol` and covering exactly the final content of
    * the `touched` partitions — is STAGED to a sibling directory in
    * one job, partitions absent from the staged output are cleared,
    * and the staged rows commit to `root` in one dynamic-overwrite
    * job that reads only the staging copy. Two jobs, still one commit
    * point; a crash anywhere leaves stored rows at most missing the
    * batch's effect (or recoverable staging litter), which the
    * caller's idempotent re-apply (plus [[recoverStaging]]) restores.
    */
  private[graft] def publishStaged(s: SparkSession, root: String,
      partCol: String, keyCol: String, touched: Seq[Int],
      merged: DataFrame): Unit =
    commitStaged(s, root, partCol, keyCol, touched,
      stageParts(s, root, partCol, merged))

  /** Stage `merged` to the `root`__staging sibling in one job and
    * return the staging path — the MATERIALIZATION half of
    * [[publishStaged]], split out so a caller can durably publish an
    * ordering-constrained side artifact (the band index's hot
    * tombstones, which must land before any bands change is durable)
    * between the staging write and [[commitStaged]]. Nothing under
    * `root` changes.
    */
  private[graft] def stageParts(s: SparkSession, root: String,
      partCol: String, merged: DataFrame): String = {
    val fs = fsOf(s, root)
    val staging = root + "__staging"
    fs.delete(hPath(staging), true) // crash leftovers
    merged.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(staging)
    staging
  }

  /** The COMMIT half of [[publishStaged]]: clear the `touched`
    * partitions absent from the staged output (vacated), then commit
    * the staged rows to `root` in one dynamic-overwrite job that reads
    * only the staging copy, drop the staging directory, and rewrite
    * the `_meta/part_stats` sidecar for the touched partitions (r15
    * verdict task 5 — without this the band family's sidecar goes
    * stale after one hot-band suppression pass).
    */
  private[graft] def commitStaged(s: SparkSession, root: String,
      partCol: String, keyCol: String, touched: Seq[Int],
      staging: String): Unit = {
    val fs = fsOf(s, root)
    recoverStaging(fs, root, partCol)
    val stagedParts = fs.listStatus(hPath(staging)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(s"$partCol=") =>
        n.stripPrefix(s"$partCol=").toInt }
      .toSet
    // pre-commit sidecar rows: the live sidecar if trusted, else an
    // empty frame typed off the staged data — partitions absent from
    // the sidecar are always scanned, so a staged commit may create a
    // PARTIAL sidecar safely
    val preMetaOpt = readStatsIfLive(s, root, keyCol)
      .orElse(if (stagedParts.nonEmpty) Some(emptyStats(s, staging, keyCol))
              else None)
    markPending(fs, root, (touched ++ stagedParts).distinct)
    touched.filterNot(stagedParts)
      .foreach(p => fs.delete(hPath(s"$root/$partCol=$p"), true))
    if (stagedParts.nonEmpty) {
      // no repartition: the staging job already compacted per partition
      s.read.parquet(staging)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(root)
    }
    fs.delete(hPath(staging), true)
    preMetaOpt match {
      case Some(preMeta) =>
        writeStats(s, root, partCol, keyCol, preMeta,
          (touched ++ stagedParts).distinct, None)
      case None =>
        // nothing staged AND no trusted sidecar to carry forward: drop
        // any stale sidecar outright (absent = full-scan fallback) —
        // clearing pending over stale rows would re-trust them
        fs.delete(hPath(statsPath(root)), true)
    }
    clearPending(fs, root)
    s.catalog.refreshByPath(root)
  }

  /** Rebuild the `_meta/part_stats` sidecar from one full (key, part)
    * scan if it is missing or untrusted (a `pending` marker from a
    * crashed commit) — the explicit repair/bootstrap seam. A no-op
    * when the sidecar is live. Safe to call on any partitioned index
    * this kernel maintains.
    */
  def ensureStats(s: SparkSession, root: String, partCol: String,
      keyCol: String, readSchema: Option[String] = None): Unit = {
    val fs = fsOf(s, root)
    require(fs.exists(hPath(root)), s"no partitioned index at $root")
    recoverStaging(fs, root, partCol)
    if (readStatsIfLive(s, root, keyCol).isDefined) return
    if (partsOnDisk(fs, root, partCol).isEmpty) return
    val base = readSchema.fold(s.read)(s.read.schema).parquet(root)
    swapStats(s, fs, root, statsAgg(base, partCol, keyCol))
    clearPending(fs, root)
  }

  /** Drop the `_meta/part_stats` sidecar (and any pending marker) of
    * `root` — REQUIRED after any write to the table that bypasses this
    * kernel when the writer cannot name the partitions it touched: a
    * raw write can put keys outside the sidecar's recorded ranges, and
    * a later pruned locating pass would miss them. An absent sidecar
    * is the full-scan fallback — always correct; the next kernel
    * commit re-bootstraps it from that scan. A writer that CAN name
    * its touched partitions should call [[refreshStats]] instead and
    * keep the sidecar live.
    */
  def invalidateStats(s: SparkSession, root: String): Unit = {
    val fs = fsOf(s, root)
    fs.delete(hPath(statsPath(root)), true)
    fs.delete(hPath(pendingPath(root)), false)
  }

  /** Mark the sidecar untrusted BEFORE an out-of-kernel write to the
    * named partitions, recording them in the pending marker — so a
    * crash between the write's commit and the [[refreshStats]] that
    * must follow degrades to the full-scan fallback (and the next
    * refresh/commit repairs exactly the recorded partitions) instead
    * of serving ranges the write just outgrew. A no-op when no
    * sidecar exists (nothing can go stale).
    */
  def distrustStats(s: SparkSession, root: String,
      touched: Seq[Int]): Unit = {
    val fs = fsOf(s, root)
    if (fs.exists(hPath(s"${statsPath(root)}/_SUCCESS")))
      markPending(fs, root, touched)
  }

  /** Recompute the sidecar rows of exactly `touched` after an
    * out-of-kernel write to those partitions (the band family's
    * append-only sigs admission names its ≤16 id-buckets) — the
    * cheap alternative to [[invalidateStats]] that keeps the next
    * purge's locating pass bounded instead of degrading it to a full
    * scan. Also repairs any partitions a pending marker recorded (a
    * crashed earlier commit or out-of-kernel write): the sidecar
    * invariant is "rows reflect what is on disk", and the read-back
    * recomputes exactly that for every recorded-or-touched partition,
    * so the rewrite may re-trust the remaining rows. A marker with NO
    * recorded set (unknown crash) is left in place — full-scan
    * fallback until the next kernel commit. No-op without a sidecar.
    */
  def refreshStats(s: SparkSession, root: String, partCol: String,
      keyCol: String, touched: Seq[Int],
      readSchema: Option[String] = None): Unit = {
    val fs = fsOf(s, root)
    recoverStaging(fs, root, partCol)
    if (!fs.exists(hPath(s"${statsPath(root)}/_SUCCESS"))) return
    val recorded = pendingParts(fs, root)
    if (fs.exists(hPath(pendingPath(root))) && recorded.isEmpty) return
    val pre = s.read.parquet(statsPath(root))
    // a sidecar written under another key (or pre-key_col) cannot be
    // partially refreshed — leave it untrusted for the next full
    // commit to rewrite under a single key
    if (!pre.columns.contains("key_col") ||
        !pre.select(col("key_col")).distinct()
          .collect().map(_.getString(0)).toSet.subsetOf(Set(keyCol)))
      return
    writeStats(s, root, partCol, keyCol, pre,
      (touched ++ recorded.getOrElse(Nil)).distinct, readSchema)
    clearPending(fs, root)
  }

  /** Crash-leftover recovery for Spark's dynamic-overwrite commit
    * (the r15 advice): a `.spark-staging-<job>` directory under the
    * root means a commit died mid-loop. A staged partition whose live
    * directory is MISSING was deleted-but-not-renamed — the staged
    * copy is its full post-merge content, so it renames into place
    * (this is the only copy of the partition's non-batch rows). A
    * staged partition whose live directory survived never swapped —
    * the live (pre-merge) copy stays and the caller's idempotent
    * re-apply regenerates the batch's effect. Requires the callers'
    * single-writer-per-root contract.
    */
  private[graft] def recoverStaging(fs: org.apache.hadoop.fs.FileSystem,
      root: String, partCol: String): Unit =
    fs.listStatus(hPath(root))
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(".spark-staging"))
      .foreach { stg =>
        fs.listStatus(stg.getPath).foreach { sub =>
          val n = sub.getPath.getName
          if (sub.isDirectory && n.startsWith(s"$partCol=") &&
              !fs.exists(hPath(s"$root/$n")))
            fs.rename(sub.getPath, hPath(s"$root/$n"))
        }
        fs.delete(stg.getPath, true)
      }

  // ---- locating pass --------------------------------------------------

  /** (part, total stored rows, stored rows with a batch key) for every
    * partition holding a batch key, plus the PRE-commit sidecar rows
    * for every partition the pass did not invalidate — the input to
    * the post-commit sidecar rewrite.
    */
  private case class Located(stats: Seq[(Int, Long, Long)],
      preMeta: DataFrame)

  private def locate(s: SparkSession, root: String, partCol: String,
      keyCol: String, keys: DataFrame, readSchema: Option[String],
      hint: Option[LocateHint] = None,
      preHinted: Option[Seq[Int]] = None): Located = {
    val fs = fsOf(s, root)
    // a freshly-initialized table may hold no partition directory at
    // all (only a _SUCCESS marker) — nothing stored, nothing touched
    val onDisk = partsOnDisk(fs, root, partCol)
    if (onDisk.isEmpty)
      return Located(Nil, emptyStatsFromKeys(s, keys, keyCol))
    // an exact hint outranks the sidecar ranges; without one, the
    // sidecar prunes (None = no trusted sidecar → full scan).
    // `preHinted` is the caller's already-collected hint set (the
    // merge path shares one collect between hint and target
    // partitions) — same values [[hintParts]] would produce.
    val cands: Option[Seq[Int]] = hint match {
      case Some(h) =>
        val onDiskSet = onDisk.toSet
        Some(preHinted.getOrElse(hintParts(s, h, keys, keyCol, partCol))
          .filter(onDiskSet).distinct.sorted)
      case None => candidateParts(s, root, partCol, keyCol, keys)
    }
    cands match {
      case None =>
        // no trusted sidecar: ONE full (key, part) scan locates the
        // batch AND bootstraps the sidecar (same I/O the pre-sidecar
        // kernel paid every merge)
        val base = readSchema.fold(s.read)(s.read.schema).parquet(root)
        val rows = scanStats(s, base, partCol, keyCol, keys)
        Located(statsOf(rows), statsDf(s, rows, keys, keyCol))
      case Some(cands) =>
        val rows =
          if (cands.isEmpty) Nil
          else scanStats(s,
            readParts(s, root, partCol, cands, readSchema).get,
            partCol, keyCol, keys)
        readStatsIfLive(s, root, keyCol) match {
          case Some(meta) =>
            val metaParts = meta.select(col("part"))
              .collect().map(_.getInt(0)).toSet // bounded: sidecar rows
            val extra = rows.filter(r => !metaParts(r.getInt(0)))
            Located(statsOf(rows),
              meta.unionByName(statsDf(s, extra, keys, keyCol)))
          case None =>
            // hinted pass with no trusted sidecar: the scanned
            // partitions seed a PARTIAL sidecar (uncovered partitions
            // always scan on an unhinted pass, so partial is safe —
            // the staged-commit precedent); stale untrusted rows are
            // overwritten wholesale, never re-trusted
            Located(statsOf(rows), statsDf(s, rows, keys, keyCol))
        }
    }
  }

  /** The hint's candidate partitions for `keys` — exact by the hint's
    * contract, bounded collects (≤ batch partitions for [[PartOf]];
    * ≤ lookup-matched partitions for [[StoredAt]]). Package-visible so
    * IndexMergeSpec can pin the pruning.
    */
  private[graft] def hintParts(s: SparkSession, hint: LocateHint,
      keys: DataFrame, keyCol: String, partCol: String): Seq[Int] =
    hint match {
      case PartOf(f) =>
        keys.select(f(col(keyCol)).cast("int").as("part")).distinct()
          .collect().map(_.getInt(0)).toSeq // bounded: batch partitions
      case StoredAt(lookup) =>
        lookup
          .join(broadcast(keys.distinct()), Seq(keyCol), "left_semi")
          .select(col(partCol).cast("int")).distinct()
          .collect().map(_.getInt(0)).toSeq // bounded: ≤ |partitions|
    }

  /** The partitions the locating pass must scan for `keys` — pruned by
    * the `_meta/part_stats` key ranges when the sidecar is live, plus
    * every on-disk partition the sidecar does not cover. None = no
    * trusted sidecar (missing, torn, or a `pending` marker from a
    * crashed commit): scan the whole index. Package-visible so
    * IndexMergeSpec can pin the pruning.
    */
  private[graft] def candidateParts(s: SparkSession, root: String,
      partCol: String, keyCol: String, keys: DataFrame): Option[Seq[Int]] = {
    val fs = fsOf(s, root)
    val metaOpt = readStatsIfLive(s, root, keyCol)
    if (metaOpt.isEmpty) return None
    val meta = metaOpt.get
    val metaParts = meta.select(col("part"))
      .collect().map(_.getInt(0)).toSet // bounded: sidecar rows
    val ranged = keys.distinct()
      .join(broadcast(meta),
        col(keyCol) >= col("kmin") && col(keyCol) <= col("kmax"))
      .select(col("part")).distinct()
      .collect().map(_.getInt(0)).toSeq // bounded: ≤ |partitions|
    val onDisk = partsOnDisk(fs, root, partCol)
    val onDiskSet = onDisk.toSet
    Some((ranged.filter(onDiskSet) ++ onDisk.filterNot(metaParts))
      .distinct.sorted)
  }

  /** One narrow (key, part) pass over `df`: per partition, Row(part,
    * total, n_batch, kmin, kmax). Column-pruned; the keys broadcast;
    * bounded output (≤ |scanned partitions| rows).
    */
  private def scanStats(s: SparkSession, df: DataFrame, partCol: String,
      keyCol: String, keys: DataFrame): Seq[Row] =
    df.select(col(keyCol), col(partCol))
      .join(broadcast(keys.distinct().withColumn("__inb", lit(1))),
        Seq(keyCol), "left")
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("__total"), count(col("__inb")).as("__nb"),
        min(col(keyCol)).as("kmin"), max(col(keyCol)).as("kmax"))
      .collect().toSeq

  private def statsOf(rows: Seq[Row]): Seq[(Int, Long, Long)] =
    rows.collect {
      case r if r.getLong(2) > 0 => (r.getInt(0), r.getLong(1), r.getLong(2))
    }

  // ---- sidecar maintenance ---------------------------------------------

  private def statsLive(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Boolean =
    !fs.exists(hPath(pendingPath(root))) &&
      fs.exists(hPath(s"${statsPath(root)}/_SUCCESS"))

  /** The live sidecar, provided it is trusted AND describes `keyCol`'s
    * ranges — a sidecar written under a different key (the mixed-key
    * MaxSim tables) or by a pre-key_col build reads as absent, so the
    * caller full-scans and rewrites it under its own key.
    */
  private def readStatsIfLive(s: SparkSession, root: String,
      keyCol: String): Option[DataFrame] =
    if (!statsLive(fsOf(s, root), root)) None
    else {
      val meta = s.read.parquet(statsPath(root))
      if (!meta.columns.contains("key_col")) None
      else {
        val ks = meta.select(col("key_col")).distinct()
          .collect().map(_.getString(0)).toSet // bounded: sidecar rows
        if (ks.subsetOf(Set(keyCol))) Some(meta) else None
      }
    }

  /** Write the pending marker, recording the partitions whose sidecar
    * rows the in-flight write will invalidate: while it exists the
    * sidecar is untrusted wholesale (full-scan locate), and a
    * [[refreshStats]] repair can re-trust the rest after recomputing
    * exactly the recorded set.
    */
  private def markPending(fs: org.apache.hadoop.fs.FileSystem,
      root: String, touched: Seq[Int]): Unit = {
    val out = fs.create(hPath(pendingPath(root)), true)
    out.write(touched.sorted.mkString(",")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** The partition set a pending marker recorded — None when there is
    * no marker OR its content is unreadable/empty (an unknown-crash
    * marker must never be "repaired" into re-trusting the sidecar).
    */
  private def pendingParts(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Option[Seq[Int]] =
    if (!fs.exists(hPath(pendingPath(root)))) None
    else scala.util.Try {
      val in = fs.open(hPath(pendingPath(root)))
      val txt = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
      txt.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    }.toOption.filter(_.nonEmpty)

  private def clearPending(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Unit =
    fs.delete(hPath(pendingPath(root)), false)

  private def statsSchema(keyType: org.apache.spark.sql.types.DataType) =
    StructType(Seq(StructField("part", IntegerType, nullable = false),
      StructField("kmin", keyType), StructField("kmax", keyType),
      StructField("n", LongType, nullable = false),
      StructField("key_col", org.apache.spark.sql.types.StringType,
        nullable = false)))

  /** (part, kmin, kmax, n, key_col) rows as a DataFrame, from the
    * locating pass's collected Row(part, total, nb, kmin, kmax) shape.
    * `key_col` records WHICH column the ranges describe: a table
    * maintained under more than one key (the MaxSim copies merge on
    * vec_id but purge on did) must never have one key's values pruned
    * against the other key's ranges — a mismatched sidecar reads as
    * untrusted and the commit rewrites it under its own key.
    */
  private def statsDf(s: SparkSession, rows: Seq[Row], keys: DataFrame,
      keyCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val out = rows.map(r =>
      Row(r.getInt(0), r.get(3), r.get(4), r.getLong(1), keyCol))
    s.createDataFrame(out.asJava,
      statsSchema(keys.schema(keyCol).dataType))
  }

  private def emptyStatsFromKeys(s: SparkSession, keys: DataFrame,
      keyCol: String): DataFrame =
    statsDf(s, Nil, keys, keyCol)

  private def emptyStats(s: SparkSession, anyTable: String,
      keyCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    s.createDataFrame(Seq.empty[Row].asJava,
      statsSchema(s.read.parquet(anyTable).schema(keyCol).dataType))
  }

  /** Per-partition (part, kmin, kmax, n, key_col) of `df` — the
    * read-back aggregation that recomputes exact sidecar rows for
    * just-committed partitions.
    */
  private def statsAgg(df: DataFrame, partCol: String,
      keyCol: String): DataFrame =
    df.groupBy(col(partCol).cast("int").as("part"))
      .agg(min(col(keyCol)).as("kmin"), max(col(keyCol)).as("kmax"),
        count(lit(1)).as("n"))
      .withColumn("key_col", lit(keyCol))

  /** Post-commit sidecar rewrite: pre-commit rows for untouched
    * partitions ∪ exact read-back rows for the touched partitions
    * still on disk, swapped in via write-to-sibling + rename (a torn
    * sidecar write is never readable; the `pending` marker covers the
    * delete→rename gap).
    */
  private def writeStats(s: SparkSession, root: String, partCol: String,
      keyCol: String, preMeta: DataFrame, touched: Seq[Int],
      readSchema: Option[String]): Unit = {
    val fs = fsOf(s, root)
    val survivors = touched
      .filter(p => fs.exists(hPath(s"$root/$partCol=$p")))
    val touchedSet = touched.toSet
    val kept = preMeta.filter(!col("part")
      .isin(touchedSet.toSeq.map(Integer.valueOf): _*))
    val fresh = readParts(s, root, partCol, survivors, readSchema)
      .map(df => statsAgg(df, partCol, keyCol))
    swapStats(s, fs, root, fresh.fold(kept)(kept.unionByName(_)))
  }

  private def swapStats(s: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, root: String,
      stats: DataFrame): Unit = {
    val live = statsPath(root)
    val next = live + "__new"
    stats.coalesce(1).write.mode("overwrite").parquet(next)
    fs.delete(hPath(live), true)
    fs.rename(hPath(next), hPath(live))
  }

  // ---- shared reads / the single commit ---------------------------------

  private def partsOnDisk(fs: org.apache.hadoop.fs.FileSystem,
      root: String, partCol: String): Seq[Int] =
    fs.listStatus(hPath(root)).toSeq.collect {
      case st if st.isDirectory &&
          st.getPath.getName.startsWith(s"$partCol=") =>
        st.getPath.getName.stripPrefix(s"$partCol=").toInt
    }

  /** The stored rows of `parts` under `root`, read via `basePath` so
    * the partition column is recovered but the OUTPUT root is never an
    * input root path (Spark refuses to overwrite a path it reads
    * from; the per-directory roots sidestep the check, and the actual
    * file reads all complete before the dynamic commit's deletes).
    */
  private def readParts(s: SparkSession, root: String, partCol: String,
      parts: Seq[Int], readSchema: Option[String]): Option[DataFrame] =
    if (parts.isEmpty) None
    else {
      val reader = readSchema.fold(s.read)(s.read.schema)
        .option("basePath", root)
      Some(reader.parquet(parts.map(p => s"$root/$partCol=$p"): _*))
    }

  /** The single commit: dynamic partition overwrite of exactly the
    * partitions present in `df`, compacted one-task-per-partition.
    */
  private def overwriteParts(s: SparkSession, root: String,
      partCol: String, df: DataFrame): Unit =
    df.repartition(col(partCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(root)
}
