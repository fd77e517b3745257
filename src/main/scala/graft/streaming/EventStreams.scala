package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over event streams — the incremental
  * twin of graft.operators.Events (same logic, same schemas, but
  * running on an unbounded source with watermarks and state).
  *
  * The reference has no streaming (SURVEY §2.4); this is north-star
  * surface. Scale notes: all state is keyed by `user_id` or by
  * (window, event_type) — high-cardinality, skew-free keys; state per
  * key is O(1) (session accumulator / windowed partial agg), and the
  * watermark bounds total state, so a 1000-executor deployment holds
  * state shards in the state store with no driver involvement.
  */
object EventStreams extends Serializable {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Internal accumulator persisted in the state store (public: the
    * state encoder's generated code must reach the constructor).
    * Times are epoch MICROS — `Timestamp.getTime` is millisecond
    * resolution and events carry microsecond timestamps; a state
    * accumulator that truncates to ms emits session bounds that no
    * longer match the batch twin (caught by the ev_stream_sessions
    * oracle).
    */
  case class SessionState(startUs: Long, lastUs: Long, n: Int, total: Double)

  private def micros(t: java.sql.Timestamp): Long = {
    val msFraction = t.getNanos / 1000000L
    (t.getTime - msFraction) * 1000L + t.getNanos / 1000L
  }

  private def toTimestamp(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Tumbling 1-hour windows per event type; watermark tolerates
    * 10 minutes of disorder, after which windows finalize and state is
    * dropped.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("total_value"))

  /** The reference's one job — word count — as an incremental stream:
    * token text files arriving in a directory are tokenized with the
    * exact TokenFormat semantics and folded into running counts
    * (update mode; partial aggregation per micro-batch = the combiner,
    * state = one long per word). The 1 MB corpus the reference ran as
    * its biggest batch job becomes a trickle this handles per-file.
    */
  def streamingWordCount(spark: org.apache.spark.sql.SparkSession,
      inputDir: String): DataFrame = {
    import spark.implicits._
    wordCount(spark.readStream
      .option("lineSep", " ")
      .text(inputDir)
      .as[String])
  }

  /** The tokenize→parse→count core of [[streamingWordCount]], factored
    * over any text source (streaming or batch) so the file-source
    * pipeline above and the oracle-gated `mr_stream_wordcount` entry
    * share one definition of the reference job's semantics.
    */
  def wordCount(text: Dataset[String]): DataFrame = {
    import text.sparkSession.implicits._
    text
      .flatMap(rec => graft.core.TokenFormat.tokenize(rec)
        .map(graft.core.TokenFormat.parse))
      .toDF("key", "word")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Stream–static enrichment: join the event stream against a static
    * dimension frame (broadcast per micro-batch, no stream state at
    * all) — the third join class next to stream-stream and batch
    * joins. The dimension is re-resolvable per batch, so slowly-
    * changing dims pick up updates without restarting the query.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), key)

  /** Streaming deduplication on event id: at-least-once sources
    * (Kafka replays, retried producers) become effectively-once
    * downstream. State holds one entry per id only within the
    * watermark horizon, so it is bounded — the streaming twin of
    * `dd_exact`.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream join: purchases joined to same-user views within
    * ±5 minutes — the incremental twin of the batch `ev_range_join`.
    * Both sides carry watermarks and the join condition is time-bounded
    * in both directions, which is what lets Spark expire join state:
    * a buffered view can be dropped once the purchase-side watermark
    * passes view_ts + 5 min, so state is bounded by rate × window, not
    * by stream length.
    */
  def viewPurchaseJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 5 MINUTES") &&
        col("v_ts") <= col("p_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("p_id"), col("v_id"), col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** LEFT OUTER stream-stream interval join: every view, matched to
    * same-user purchases within ±5 minutes — or emitted null-extended
    * once the engine can PROVE no future purchase can match. That
    * proof is the watermark: a view's join window closes when the
    * event-time watermark (max ts − 10 min on a finite backlog)
    * passes view_ts + 5 min; only then does the unmatched row emit
    * (earlier emission could be falsified by a late purchase —
    * outer-join results on streams are watermark-gated by
    * correctness, not by choice). Views whose window is still open at
    * end-of-backlog stay in state unemitted — exactly the live
    * deployment's pending set. State stays rate × window bounded,
    * same as [[viewPurchaseJoin]].
    */
  def viewPurchaseLeftJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") - expr("INTERVAL 5 MINUTES") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 5 MINUTES"),
      "left_outer")
      .select(col("v_id"), col("p_id"), col("v_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** Gap-based sessionization (30-minute idle gap), the stateful
    * counterpart of the batch `ev_sessionize` query: a session closes
    * when a later event of the same user arrives past the gap, or when
    * the event-time watermark passes last+gap (timeout), so sessions of
    * idle users still close.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    def toSession(uid: Long, st: SessionState): Session =
      Session(uid, toTimestamp(st.startUs), toTimestamp(st.lastUs),
        st.n, st.total)

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession(uid, _))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = Seq.newBuilder[Session]
            var cur    = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(st) if t - st.lastUs <= gapUs =>
                  cur = Some(st.copy(lastUs = math.max(st.lastUs, t),
                    n = st.n + 1, total = st.total + e.value))
                case Some(st) =>
                  closed += toSession(uid, st)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // timeout registration is ms-resolution (GroupState API);
              // rounding UP keeps "timeout strictly after last+gap"
              state.setTimeoutTimestamp(
                Math.floorDiv(st.lastUs + gapUs + 999L, 1000L))
            }
            closed.result().iterator
          }
      }
  }

  /** One CLOSED version row of the SCD type-2 history stream —
    * `valid_to` is always set (it is the next run's first event time);
    * the OPEN version per user is the state, not the stream.
    */
  case class Version(user_id: Long, ver: Long, event_type: String,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp,
      n_events: Long)

  /** The open run per user, persisted in the state store. */
  case class RunState(curType: String, ver: Long, fromUs: Long, n: Long)

  /** SCD type-2 history build running INCREMENTALLY — the streaming
    * twin of the batch `ev_scd2` gaps-and-islands query. Honest CDC
    * semantics: the emitted stream is the closed HISTORY (a version
    * closes the instant a different `event_type` arrives for the user,
    * with `valid_to` = the new run's first event time), while the
    * CURRENT version of every user is exactly the state-store content
    * — so there is no timeout rule to encode and no disagreement with
    * the batch fixpoint: batch `ev_scd2` rows with `is_current = false`
    * equal this stream's complete output over the same backlog (the
    * `ev_stream_scd2` oracle states precisely that).
    *
    * State per user is ONE open-run accumulator (type, version counter,
    * run start, count) — O(users) total, the same bound as any per-user
    * aggregate; no watermark is needed because nothing time-based ever
    * emits. Cross-batch correctness: a run spanning micro-batches
    * continues from the persisted accumulator, so batch boundaries are
    * invisible in the output.
    */
  def scd2(events: Dataset[Event]): Dataset[Version] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RunState, Version](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[RunState]) =>
          val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val closed = Seq.newBuilder[Version]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = micros(e.ts)
            cur match {
              case Some(st) if st.curType == e.event_type =>
                cur = Some(st.copy(n = st.n + 1))
              case Some(st) =>
                closed += Version(uid, st.ver, st.curType,
                  toTimestamp(st.fromUs), toTimestamp(t), st.n)
                cur = Some(RunState(e.event_type, st.ver + 1, t, 1))
              case None =>
                cur = Some(RunState(e.event_type, 1, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** One enriched purchase of the streaming as-of join: the same
    * user's most recent strictly-earlier view, attached once the
    * watermark proves the match final.
    */
  case class Enriched(event_id: Long, user_id: Long,
      purchase_ts: java.sql.Timestamp, view_ts: java.sql.Timestamp,
      gap_us: Long)

  /** A purchase awaiting its watermark-final as-of match. */
  case class PendingBuy(id: Long, us: Long)

  /** As-of state per user: view event times (pruned to
    * min(watermark, earliest pending purchase) plus the single latest
    * below that — lossless for every admissible future purchase AND
    * every already-pending one) and the pending purchases.
    */
  case class AsofState(views: Seq[Long], pending: Seq[PendingBuy])

  /** Streaming as-of join — the feature-store enrichment op run as a
    * stream: each purchase joins the same user's most recent STRICTLY
    * EARLIER view (the batch `ev_asof_join` semantics). The emission
    * rule is the [[funnel]] finality argument applied per purchase:
    * the match for purchase p is final exactly when the watermark
    * passes p's event time — no admissible arrival can be an earlier
    * view after that — so each purchase registers the group timeout at
    * its own ceil-to-ms time (the earliest pending one drives the
    * registration) and emits on firing; purchases already behind the
    * watermark (replay/catch-up) emit in-batch. Purchases with no
    * earlier view emit nothing, like the batch query.
    *
    * State is bounded on both sides: pending purchases are
    * rate×horizon (each leaves state when the watermark passes it),
    * and views prune to those at or above min(watermark, earliest
    * still-pending purchase) PLUS the single latest older one —
    * lossless, because a future purchase has event time ≥ watermark
    * and a pending one has event time ≥ that minimum, so every
    * purchase's as-of match is either a kept view or exactly that
    * single older one. (Pruning at the watermark alone is NOT
    * lossless: ceilMs keeps a purchase up to 999 µs below it pending,
    * and a later view in that same millisecond could evict its true
    * match.)
    */
  def asofEnrich(events: Dataset[Event]): Dataset[Enriched] = {
    import events.sparkSession.implicits._

    def ceilMs(us: Long): Long = Math.floorDiv(us + 999L, 1000L)

    def emitReady(uid: Long, st: AsofState, wmMs: Long)
        : (Seq[Enriched], AsofState) = {
      val (ready, rest) = st.pending.partition(p => ceilMs(p.us) < wmMs)
      val out = ready.sortBy(_.id).flatMap { p =>
        val earlier = st.views.filter(_ < p.us)
        if (earlier.isEmpty) None
        else {
          val v = earlier.max
          Some(Enriched(p.id, uid, toTimestamp(p.us), toTimestamp(v),
            p.us - v))
        }
      }
      // Prune threshold = min(watermark, earliest STILL-PENDING
      // purchase): a pending purchase can sit up to 999 µs BELOW wmUs
      // (ceilMs keeps it pending), and pruning at wmUs alone could
      // discard its true match when a later same-millisecond view is
      // the max below-watermark view. Every pending p has p.us ≥ this
      // threshold, so its match is either a kept ≥-threshold view or
      // exactly the single latest older one — lossless again.
      val wmUs    = wmMs * 1000L
      val pruneUs =
        if (rest.isEmpty) wmUs else Math.min(wmUs, rest.map(_.us).min)
      val older = st.views.filter(_ < pruneUs)
      val kept  = st.views.filter(_ >= pruneUs) ++
        (if (older.isEmpty) Nil else Seq(older.max))
      (out, AsofState(kept, rest))
    }

    events
      .filter(e => e.event_type == "view" || e.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[AsofState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(AsofState(Nil, Nil))
          if (!state.hasTimedOut) {
            // batch-local buffers, ONE concat into state: a per-event
            // `views :+ t` on the immutable Seq is O(views) each —
            // quadratic in a user's batch arrivals
            val vs = scala.collection.mutable.ArrayBuffer.empty[Long]
            val ps = scala.collection.mutable.ArrayBuffer.empty[PendingBuy]
            batch.foreach { e =>
              val t = micros(e.ts)
              if (e.event_type == "view") vs += t
              else ps += PendingBuy(e.event_id, t)
            }
            st = AsofState(st.views ++ vs, st.pending ++ ps)
          }
          // catch-up + timeout emission share one path: everything the
          // watermark has finalized leaves state now
          val (out, st2) = emitReady(uid, st, wm)
          state.update(st2)
          if (st2.pending.nonEmpty) {
            // all remaining tmos are ≥ the current watermark (the
            // ready ones just left), so registration is always legal
            state.setTimeoutTimestamp(st2.pending.map(p => ceilMs(p.us)).min)
          }
          out.iterator
      }
  }

  /** One confirmed view→purchase conversion; emitted exactly once per
    * user, and only once the watermark PROVES the verdict final.
    */
  case class Conversion(user_id: Long, first_view: java.sql.Timestamp,
      first_buy: java.sql.Timestamp, gap_us: Long)

  /** Funnel state: running minima of the user's view/purchase event
    * times (epoch µs; MaxValue = unseen) plus the emitted/settled flag.
    */
  case class FunnelState(viewUs: Long, buyUs: Long, done: Boolean)

  private val NoTs = Long.MaxValue

  /** Streaming funnel — the incremental twin of the batch `ev_funnel`
    * (first view strictly before first purchase). The subtlety a
    * streaming funnel must get right is EMISSION TIME: both firsts are
    * running MINIMA, so out-of-order arrivals can lower either side
    * and flip the verdict after a naive early emission. The verdict
    * becomes immutable exactly when the watermark passes first_buy:
    * from then on every admissible arrival has ts ≥ watermark ≥
    * first_buy, which can lower neither minimum below first_buy —
    * converted stays converted, not-converted stays not-converted.
    * So the group registers its event-time timeout at first_buy
    * (ceil'd to ms — the GroupState API is ms-resolution, the
    * sessionize rule) and emits on timeout; a buy already behind the
    * watermark (replay/catch-up) emits immediately in-batch, the same
    * finality argument. Settled groups keep a `done` tombstone so a
    * late trickle can never re-emit; users with views but no purchase
    * are the live pending set (the ev_stream_left_join contract).
    * State per user is two longs + a flag — rate×horizon bounded.
    */
  def funnel(events: Dataset[Event]): Dataset[Conversion] = {
    import events.sparkSession.implicits._

    def conversion(uid: Long, st: FunnelState): Iterator[Conversion] =
      if (!st.done && st.viewUs < st.buyUs)
        Iterator.single(Conversion(uid, toTimestamp(st.viewUs),
          toTimestamp(st.buyUs), st.buyUs - st.viewUs))
      else Iterator.empty

    events
      .filter(e => e.event_type == "view" || e.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val st  = state.get
            val out = conversion(uid, st)
            state.update(st.copy(done = true))
            out
          } else {
            var st = state.getOption.getOrElse(FunnelState(NoTs, NoTs, false))
            batch.foreach { e =>
              val t = micros(e.ts)
              if (e.event_type == "view") {
                if (t < st.viewUs) st = st.copy(viewUs = t)
              } else if (t < st.buyUs) st = st.copy(buyUs = t)
            }
            var out: Iterator[Conversion] = Iterator.empty
            if (!st.done && st.buyUs != NoTs) {
              // ceil to ms: the engine fires strictly when
              // watermark > timeout (the ev_stream_sessions boundary)
              val tmoMs = Math.floorDiv(st.buyUs + 999L, 1000L)
              if (tmoMs < state.getCurrentWatermarkMs()) {
                // watermark already past first_buy: final now
                out = conversion(uid, st)
                st = st.copy(done = true)
              } else {
                state.setTimeoutTimestamp(tmoMs)
              }
            }
            state.update(st)
            out
          }
      }
  }
}
