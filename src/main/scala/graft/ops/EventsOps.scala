package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window and event-stream operators over the `events` fixture
  * (north-star streaming extension, SURVEY.md §7.3 M4). Batch forms here
  * are oracle-checkable; graft.streaming.StreamOps applies the same
  * aggregations under Structured Streaming with watermarks.
  *
  * Window starts are emitted as epoch seconds (BIGINT) rather than
  * timestamps: identical in both engines regardless of timestamp-type /
  * timezone representation.
  */
object EventsOps {

  /** Daily event-count drift/anomaly detection: per (event_type, day)
    * count, z-scored against the type's own daily distribution — the
    * monitoring query a pipeline runs over its ingest telemetry to
    * catch a broken producer or a traffic spike before it skews the
    * corpus mixture.
    *
    * Moments come from exact decimal power sums ([[Agg.exactMoments]]'s
    * argument applies: double accumulation is shuffle-order-dependent,
    * decimal sums are not), evaluated once in double; z is floored at
    * 4 dp and the anomaly flag tests the FLOORED z, so the flag is
    * bit-portable too. Two keyed aggregations (day grain, then type
    * grain — both fully partial-aggregated) and one broadcast join of
    * the per-type stats (|types| rows) back onto the daily frame. Types
    * observed on fewer than 2 days carry no distribution — dropped.
    *
    * Output: (event_type, day, n, z, is_anomaly).
    */
  def dailyAnomalies(events: DataFrame, zThresh: Double = 3.0)
      : DataFrame = {
    val daily = events.groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds both the stats agg and the join back
    val nd = col("n").cast("decimal(18,2)")
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      sum(nd).as("sn"), sum(nd * nd).as("snn"))
    val sn = col("sn").cast("double")
    val snn = col("snn").cast("double")
    val mean = sn / col("n_days")
    val variance =
      (snn - sn * sn / col("n_days")) / (col("n_days") - 1)
    // n_days > 1 and positive variance: both degenerate distributions
    // (single day, constant counts) would put NaN in z — drop them in
    // the stats frame so the guard is one filter on |types| rows
    daily.join(broadcast(stats.where(col("n_days") > 1 &&
        snn - sn * sn / col("n_days") > 0)), Seq("event_type"))
      .select(col("event_type"), col("day"), col("n"),
        Num.floorAt((col("n").cast("double") - mean) / sqrt(variance), 4)
          .as("z"))
      .withColumn("is_anomaly", abs(col("z")) >= zThresh)
  }

  /** Single-changepoint scan over the daily mean of `value` — the
    * when-did-the-pipeline-change detector behind [[dailyAnomalies]]
    * (which flags single weird days but is blind to a sustained LEVEL
    * SHIFT that moves the mean and then persists — a scraper config
    * change, a schema migration mis-scaling a field). For every
    * candidate split between adjacent days, the statistic is the
    * mean-gap scaled by the balanced-sample factor,
    * |mean_L − mean_R| · sqrt(n_L·n_R / n) — the CUSUM-equivalent
    * max-of-partial-sums form (Page 1954) written as a closed scan so
    * it needs no recursion: both engines replay it with one window.
    *
    * Scale shape: the raw scan reduces to |days| rows via one hash agg
    * (exact decimal value sums, order-free), the cumulative pass runs
    * on that tiny frame, and the argmax picks the best split with a
    * deterministic tie-break on the earlier day. Cost at 100 TB is the
    * one scan; everything after is |days|-sized.
    *
    * Output: one row — (split_day, n_left, n_right, shift_stat), the
    * split AFTER `split_day` with the largest scaled mean gap.
    */
  def changepointScan(events: DataFrame, valueCol: String = "value")
      : DataFrame = {
    val daily = events.groupBy(
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .agg(count(lit(1)).as("c"),
        sum(Num.floorAt(col(valueCol), 6).cast("decimal(28,6)")).as("s"))
    val byDay = Window.orderBy(col("day"))
    val run = byDay.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val tot = daily.agg(sum(col("c")).as("n_total"),
      sum(col("s")).as("s_total"), count(lit(1)).as("n_days"))
    val nr = col("n_total") - col("nl")
    daily
      .withColumn("nl", sum(col("c")).over(run))
      .withColumn("sl", sum(col("s")).over(run))
      .withColumn("rd", row_number().over(byDay))
      .crossJoin(broadcast(tot))
      .where(col("rd") < col("n_days")) // right side must be non-empty
      .select(col("day").as("split_day"), col("nl").as("n_left"),
        nr.as("n_right"),
        Num.floorAt(
          abs(col("sl").cast("double") / col("nl") -
            (col("s_total") - col("sl")).cast("double") / nr) *
            sqrt((col("nl") * nr).cast("double") / col("n_total")), 6)
          .as("shift_stat"))
      .orderBy(col("shift_stat").desc, col("split_day").asc)
      .limit(1)
  }

  /** Theil–Sen robust trend of daily event volume per type — the
    * median of all pairwise day-to-day slopes (Theil 1950, Sen 1968):
    * the volume-trend estimate one anomalous day cannot bend (an OLS
    * slope chases a single spike; the pairwise-slope MEDIAN has a 29%
    * breakdown point). The is-this-source-growing-or-dying input to
    * mixture planning, robust the way [[dailyAnomalies]]'s z-scores
    * are not.
    *
    * Scale shape: the corpus reduces to |types|×|days| daily counts in
    * one keyed agg; the pairwise self-join is per-type day-PAIRS —
    * bounded by (years·365)² per type, millions of tiny rows at worst,
    * never corpus-sized. The median runs through
    * [[Agg.medianByRank]]'s rank selection (one spillable sort per
    * type, no value buffer). Slope ties need no tie-break (equal
    * values, same selected multiset).
    *
    * Output: (event_type, n_pairs, slope) — events/day per day,
    * floored 6 dp.
    */
  def theilSenTrend(events: DataFrame): DataFrame = {
    val daily = events.groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds both sides of the pair join
    val a = daily.select(col("event_type"), col("day").as("da"),
      col("n").as("ca"))
    val b = daily.select(col("event_type"), col("day").as("db"),
      col("n").as("cb"))
    val slopes = a.join(b, Seq("event_type"))
      .where(col("db") > col("da"))
      .select(col("event_type"),
        ((col("cb") - col("ca")).cast("double") /
          (col("db") - col("da"))).as("slope"))
    Agg.medianByRank(slopes, "event_type", "slope")
      .select(col("event_type"), col("n").as("n_pairs"),
        Num.floorAt(col("median"), 6).as("slope"))
  }

  /** Exponentially time-decayed per-type event mass — the recency
    * weighting a freshness-aware mixture planner uses instead of raw
    * counts (a source that produced its token mass three years ago and
    * one producing it now should not weigh the same; half-life decay is
    * the standard knob). w = 2^(−age_days / halfLife), ANCHORED at the
    * corpus max timestamp — never wall-clock now(), so reruns and
    * engines agree bit-for-bit.
    *
    * One scalar max broadcast back onto one keyed agg; per-row decay
    * terms floor at 9 dp and sum through decimal, so the per-type
    * decayed masses are shuffle-order exact (the q160 contract).
    *
    * Output: (event_type, n_events, decayed_count, decayed_value),
    * decayed sums floored 6 dp.
    */
  def timeDecayedStats(events: DataFrame, halfLifeDays: Double = 30.0)
      : DataFrame = {
    require(halfLifeDays > 0, s"need halfLifeDays > 0, got $halfLifeDays")
    val anchor = events.agg(max(unix_timestamp(col("ts"))).as("tmax"))
    val age = (col("tmax") - unix_timestamp(col("ts"))).cast("double") /
      lit(86400.0)
    val w = pow(lit(2.0), -(age / lit(halfLifeDays)))
    def dec(c: Column) =
      sum(Num.floorAt(c, 9).cast("decimal(28,9)")).cast("double")
    events.crossJoin(broadcast(anchor))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        Num.floorAt(dec(w), 6).as("decayed_count"),
        Num.floorAt(dec(w * col("value")), 6).as("decayed_value"))
  }

  /** Interval-overlap join via range binning — the shape for joining
    * two INTERVAL sets when neither side is broadcastable (q28's band
    * join handles the small-side case). A plain overlap predicate
    * (`a.s < b.e AND b.s < a.e`) has no equi-key, so Spark would fall
    * back to a broadcast-nested-loop or cartesian plan; binning
    * manufactures the equi-key: each half-open interval [s, e) explodes
    * to the `cell`-sized time cells it touches, the join runs keyed on
    * the cell, and the overlap predicate closes exactly. A pair sharing
    * k cells appears k times — caller dedups on its id columns (k is
    * bounded by interval span / cell, the knob: cells ~ the typical
    * span give ~2 cells per interval).
    *
    * Per-cell join work is bounded by the number of intervals ALIVE in
    * that cell (the interval-join literature's partition bound), never
    * by either table's total size. Inputs: `a(s, e, …)`, `b(bs, be, …)`
    * with long half-open bounds; output: matched rows, all columns,
    * still containing the bin duplicates.
    *
    * CONTRACT: only non-empty intervals (s < e, bs < be) participate —
    * degenerate and malformed rows are dropped before binning. A
    * zero-length [s, s) strictly inside a b-interval WOULD satisfy the
    * plain overlap predicate, so this is a deliberate contract
    * narrowing, not an optimization; any oracle replaying this
    * operator must mirror both filters (q149's does).
    */
  def overlapJoinBinned(a: DataFrame, b: DataFrame, cell: Long)
      : DataFrame = {
    require(cell > 0, s"cell must be positive, got $cell")
    // drop malformed intervals (e <= s) BEFORE exploding: sequence() with
    // end < start runs DESCENDING, so one corrupt row with a huge s would
    // fan out |s-e|/cell spurious cell rows that the overlap predicate
    // only discards after the join input has already blown up
    val ac = a.where(col("s") < col("e")).withColumn("__cell",
      explode(expr(s"sequence(s div $cell, (e - 1) div $cell)")))
    val bc = b.where(col("bs") < col("be")).withColumn("__cell",
      explode(expr(s"sequence(bs div $cell, (be - 1) div $cell)")))
    ac.join(bc, Seq("__cell"))
      .where(col("s") < col("be") && col("bs") < col("e"))
      .drop("__cell")
  }

  /** Tumbling-window counts: one shuffle keyed on (window, type). */
  def tumblingCounts(events: DataFrame, slideSeconds: Long): DataFrame =
    events.groupBy(
        (floor(unix_timestamp(col("ts")) / slideSeconds) * slideSeconds)
          .cast("long").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        // sum in decimal (exact, order-insensitive), surface as double so
        // the schema matches DuckDB's CAST(SUM(...) AS DOUBLE) bit-for-bit
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))

  /** Sliding-window counts (width = `size`, step = `slide`): each event is
    * assigned to size/slide windows via an inline explode — map-side fanout
    * then a single shuffle, same as Spark's built-in `window()` but with a
    * flat BIGINT window key for oracle parity.
    */
  def slidingCounts(events: DataFrame, sizeSeconds: Long,
                    slideSeconds: Long): DataFrame = {
    val k = (sizeSeconds / slideSeconds).toInt
    events
      .select(col("event_type"), unix_timestamp(col("ts")).as("es"))
      .select(col("event_type"), explode(
        transform(sequence(lit(0), lit(k - 1)), i =>
          (floor((col("es") - i * slideSeconds) / slideSeconds)
            * slideSeconds).cast("long"))).as("window_start"))
      .where(col("window_start") >= 0)
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Session windows per user (gap-based): classic gaps-and-islands with a
    * lag + running-sum window — one shuffle on user_id, no state explosion.
    */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("es", "event_id")
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"))
      .withColumn("new_session",
        when(col("es") - lag(col("es"), 1).over(byUser) > gapSeconds, 1)
          .when(lag(col("es"), 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("es")).as("session_start"),
        max(col("es")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Per-user ordered event stream with lag + moving-window aggregates
    * (one shuffle on user_id, all window functions share the frame sort).
    * The moving sum runs in DECIMAL(18,2) — exact, so the 3-row frame sum
    * is bit-identical cross-engine regardless of accumulation order —
    * surfaced as DOUBLE.
    */
  def movingStats(events: DataFrame, frameRows: Int = 3): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("es").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("mv_sum", sum(col("value").cast("decimal(18,2)"))
        .over(w.rowsBetween(-(frameRows - 1), 0)).cast("double"))
      .withColumn("rn", row_number().over(w))
  }

  /** Gap-based sessions via Spark's built-in `session_window` (the same
    * operator Structured Streaming uses for streaming sessionization).
    * Semantically identical to [[sessionize]] including the boundary: an
    * event exactly `gap` after its predecessor MERGES (Spark treats the
    * touching intervals [t, t+gap) and [t+gap, ...) as one session —
    * verified empirically in Round2OpsSpec); only a strictly larger gap
    * splits. Timestamps are floored to whole seconds first so the gap
    * comparisons are second-granular in both engines.
    */
  def sessionWindows(events: DataFrame, gapSeconds: Long): DataFrame =
    events
      .select(col("user_id"),
        timestamp_seconds(unix_timestamp(col("ts"))).as("tss"))
      .groupBy(col("user_id"), session_window(col("tss"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events"))

  /** Time-RANGE moving aggregate: per user, sum/count of events within the
    * trailing `windowSeconds` of each event (frame bounded by the ORDER BY
    * VALUE, not row offsets — Spark's RANGE BETWEEN over an epoch-seconds
    * long). Peer rows (equal es) share one frame, so the result is
    * deterministic without an event_id tie-break in the frame sort. One
    * shuffle on user_id; the sum runs in DECIMAL(18,2) for cross-engine
    * exactness.
    */
  def rangeMovingSum(events: DataFrame, windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("es"))
      .rangeBetween(-windowSeconds, 0)
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      .withColumn("mv_sum",
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
      .withColumn("n_frame", count(lit(1)).over(w))
      .select("user_id", "event_id", "es", "mv_sum", "n_frame")
  }

  /** Inter-event gap per user: `es - lag(es)` over (es, event_id) order —
    * the dwell-time / inactivity feature. Null gap on each user's first
    * event.
    */
  def eventGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("es").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"))
      .withColumn("gap_s", col("es") - lag(col("es"), 1).over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
  }

  /** Per-user first/last event summary via first_value/last_value over an
    * unbounded frame (ordered by es with event_id tie-break), collapsed to
    * one row per user.
    */
  def firstLast(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy("user_id")
      .orderBy(col("es").asc, col("event_id").asc)
    val full = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"))
      .withColumn("first_type", first(col("event_type")).over(full))
      .withColumn("last_type", last(col("event_type")).over(full))
      .withColumn("n_events", count(lit(1)).over(full))
      .withColumn("rn", row_number().over(ord))
      .where(col("rn") === 1)
      .select("user_id", "first_type", "last_type", "n_events")
  }

  /** SCD type-2 interval build: collapse each user's event stream into
    * runs of consecutive equal `event_type` (gaps-and-islands), emitting
    * one versioned row per run with [valid_from, valid_to) epoch-second
    * bounds — valid_to is the next run's start, null on the open run.
    * This is the slowly-changing-dimension history a warehouse keeps for
    * late-arriving joins; one shuffle on user_id, all windows share the
    * (es, event_id) sort.
    */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("es").asc, col("event_id").asc)
    val runs = events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"))
      .withColumn("new_run",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("run_id", sum(col("new_run"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("run_id"))
      // all rows in a run share event_type; min() is order-insensitive
      // where first() under shuffle would not be
      .agg(min(col("event_type")).as("event_type"),
        min(col("es")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy("user_id").orderBy(col("run_id"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .select("user_id", "run_id", "event_type", "valid_from", "valid_to",
        "n_events")
  }

  /** Time-series gap fill + forward fill: bucket each user's events into
    * `stepSeconds` windows, GENERATE the missing buckets between each
    * user's first and last (explode of a sequence — no driver loop), and
    * carry the last observed aggregate forward across empty buckets
    * (last-ignore-nulls window). The feature-engineering shape that turns
    * sparse event streams into dense, regularly-sampled training series.
    * Scale: the generated frame is |users| x |buckets-in-range| rows of
    * three longs — bounded by the time horizon, not the event count; one
    * shuffle for the bucket agg, one for the join+window (both on
    * user_id).
    */
  def gapFillForwardFill(events: DataFrame, stepSeconds: Long): DataFrame = {
    val bucketed = events
      .select(col("user_id"),
        (floor(unix_timestamp(col("ts")) / stepSeconds) * stepSeconds)
          .cast("long").as("bucket"),
        col("value"))
      .groupBy("user_id", "bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
    val frame = bucketed.groupBy("user_id")
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("user_id"),
        explode(sequence(col("b0"), col("b1"), lit(stepSeconds)))
          .as("bucket"))
    val w = Window.partitionBy("user_id").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    frame.join(bucketed, Seq("user_id", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("ffill_total",
        last(col("total"), ignoreNulls = true).over(w))
      .select("user_id", "bucket", "n", "ffill_total")
  }

  /** Funnel conversion: per user, the FIRST `fromType` event and the
    * first `toType` event at-or-after it; a user converts if the gap is
    * within `windowSeconds`. Returns the one-row summary (starts,
    * conversions, pct) — the product-analytics primitive. Two keyed aggs
    * and one join, all hashed on user_id, so the exchanges line up; the
    * percentage follows the q19 rule (floor over exact integer counts —
    * cross-engine-stable).
    */
  def funnelConversion(events: DataFrame, fromType: String, toType: String,
                       windowSeconds: Long): DataFrame = {
    val es = events.select(col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"))
    val starts = es.where(col("event_type") === fromType)
      .groupBy("user_id").agg(min(col("es")).as("s_es"))
    val targets = es.where(col("event_type") === toType)
      .select(col("user_id"), col("es"))
    val converted = (col("p_es") - col("s_es") <= windowSeconds)
      .cast("long")
    starts.join(targets, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("s_es"))
      .agg(min(when(col("es") >= col("s_es"), col("es"))).as("p_es"))
      .agg(count(lit(1)).as("n_start"),
        sum(coalesce(converted, lit(0L))).as("n_converted"),
        (floor(lit(10000.0) * sum(coalesce(converted, lit(0L)))
          / count(lit(1))) / 100).as("pct_converted"))
  }

  /** Per-OCCURRENCE time-bounded funnel (multi-touch): EVERY `fromType`
    * event converts iff the same user's next `toType` event lands
    * within `windowSeconds` — vs [[funnelConversion]]'s first-touch
    * per-user form. Daily conversion rates out.
    *
    * One user-keyed ordered window (the rank-family exemption: the
    * "next B after this A" semantics ARE the order; state is bounded
    * per user, spillable sort) computes each event's next-B timestamp
    * via min-over-following; one day-keyed agg closes. Two shuffles
    * total, both partial-aggregated or sort-based — no self-join of
    * the event stream against itself.
    *
    * Output: (day, n_from, n_converted, pct_converted).
    */
  def multiTouchFunnel(events: DataFrame, fromType: String, toType: String,
                       windowSeconds: Long): DataFrame = {
    val es = events.select(col("user_id"), col("event_type"),
      col("event_id"), unix_timestamp(col("ts")).as("es"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("es").asc, col("event_id").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val conv = (col("next_b") - col("es") <= windowSeconds).cast("long")
    es.withColumn("next_b",
        min(when(col("event_type") === toType, col("es"))).over(w))
      .where(col("event_type") === fromType)
      .groupBy(floor(col("es") / 86400).cast("long").as("day"))
      .agg(count(lit(1)).as("n_from"),
        sum(coalesce(conv, lit(0L))).as("n_converted"),
        (floor(lit(10000.0) * sum(coalesce(conv, lit(0L)))
          / count(lit(1))) / 100).as("pct_converted"))
  }

  /** Population Stability Index between the first and second half of
    * the event stream's time range — the standard distribution-shift
    * metric (PSI = Σ (p−q)·ln(p/q) over categories; > 0.2 is the
    * conventional "significant drift" line). [[dailyAnomalies]] alarms
    * on per-type VOLUME; PSI alarms on the MIX — a producer that
    * swaps click traffic for error traffic at constant volume only
    * shows up here.
    *
    * Laplace-smoothed shares ((c+1)/(n+|types|)) so a category absent
    * from one era contributes a finite, large term instead of ±∞ —
    * smoothing constants are exact integers, deterministic in both
    * engines. One keyed agg per era off one (type, era) count frame,
    * broadcast era totals, one join on type. The era split is the
    * integer midpoint of the observed day range — a pure function of
    * the data.
    *
    * Output: (event_type, share_a, share_b, psi_term, total_psi,
    * drifted) — one row per type, total repeated for the read-off.
    */
  def psiDrift(events: DataFrame, driftAt: Double = 0.2): DataFrame = {
    val daily = events.select(col("event_type"),
      floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
    val bounds = daily.agg(min(col("day")).as("d0"),
      max(col("day")).as("d1"))
    // one conditional agg per type gives both era counts in one pass —
    // a type absent from an era gets an explicit 0 (so smoothing always
    // applies; no missing-row ±∞ path exists)
    val counts = daily.crossJoin(broadcast(bounds))
      .groupBy("event_type").agg(
        sum(when(col("day") <= (col("d0") + col("d1")) / 2, 1L)
          .otherwise(0L)).as("ca"),
        sum(when(col("day") > (col("d0") + col("d1")) / 2, 1L)
          .otherwise(0L)).as("cb"))
      .localCheckpoint() // feeds the normalizer agg and the final terms
    val norm = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("k"))
    val shareA = (col("ca") + 1).cast("double") / (col("na") + col("k"))
    val shareB = (col("cb") + 1).cast("double") / (col("nb") + col("k"))
    val terms = counts.crossJoin(broadcast(norm))
      .select(col("event_type"), shareA.as("share_a"),
        shareB.as("share_b"),
        ((shareA - shareB) * log(shareA / shareB)).as("psi_term"))
    val total = terms.agg(sum(col("psi_term")).as("tp"))
    terms.crossJoin(broadcast(total))
      .select(col("event_type"),
        Num.floorAt(col("share_a"), 6).as("share_a"),
        Num.floorAt(col("share_b"), 6).as("share_b"),
        Num.floorAt(col("psi_term"), 6).as("psi_term"),
        Num.floorAt(col("tp"), 6).as("total_psi"),
        (Num.floorAt(col("tp"), 6) >= driftAt).as("drifted"))
  }

  /** Per-user behavioral bot profile — the automated-traffic filter a
    * user-generated corpus runs before its text ever reaches the
    * quality gates (bot/scraper content poisons dedup statistics and
    * mixture weights upstream of any text signal). Three orthogonal
    * signals per user: burstiness (max events in any minute), sustained
    * rate (events per active day), and behavioral diversity (Shannon
    * entropy over event types, the [[Text.vocabEntropy]] integer-count
    * identity — scripted clients repeat one action; humans mix).
    * `is_bot` trips when burst AND rate exceed their thresholds
    * (thresholds here are fixture-scaled; production values are
    * per-product).
    *
    * Three independent keyed aggregation chains — (user, minute),
    * (user, day-distinct), (user, type) — all fully partial-aggregated,
    * then two user-keyed joins. No windows: the minute grain is an agg
    * key, not an ordering, so a hot user's events combine map-side.
    *
    * Output: (user_id, n_events, active_days, events_per_day,
    * max_per_minute, type_entropy, is_bot).
    */
  def botProfile(events: DataFrame, burstPerMinute: Long = 2L,
                 ratePerDay: Double = 2.8): DataFrame = {
    val es = events.select(col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"))
    val burst = es.groupBy(col("user_id"),
        (col("es") / 60).cast("long").as("m"))
      .agg(count(lit(1)).as("c"))
      .groupBy("user_id").agg(max(col("c")).as("max_per_minute"))
    val base = es.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      count_distinct((col("es") / 86400).cast("long")).as("active_days"))
    val ent = es.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
      .groupBy("user_id").agg(
        sum(col("c")).as("nt"),
        sum(col("c").cast("double") * log2(col("c").cast("double")))
          .as("sclgc"))
      .select(col("user_id"),
        Num.floorAt(log2(col("nt").cast("double")) -
          col("sclgc") / col("nt"), 6).as("type_entropy"))
    val epd = col("n_events").cast("double") / col("active_days")
    base.join(burst, Seq("user_id")).join(ent, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("active_days"),
        Num.floorAt(epd, 4).as("events_per_day"),
        col("max_per_minute"), col("type_entropy"),
        (col("max_per_minute") >= burstPerMinute &&
          Num.floorAt(epd, 4) >= ratePerDay).as("is_bot"))
  }

  /** Event-transition counts (first-order Markov): per user, pair each
    * event with its predecessor's type via one lag window, then count
    * (prev_type, event_type) transitions globally. Two shuffles: user_id
    * for the lag sort, then the transition-pair agg (which reduces
    * map-side). The behavioral-model / anomaly-baseline primitive.
    */
  def transitionCounts(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("es").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Cohort retention: users grouped by their FIRST-seen week (cohort),
    * counted as retained in week offset k if they have any event k weeks
    * after their first. Weeks are epoch-day/7 buckets (engine-neutral
    * integers). Two aggs on user_id + one distinct on (cohort, offset,
    * user) — the offset matrix rows are bounded by |users| × horizon,
    * never raw events.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    // dedupe to (user, week) BEFORE the join: the downstream join and
    // offset math then consume |users| x horizon rows, not raw events
    val weeks = events.select(col("user_id"),
      (floor(unix_timestamp(col("ts")) / (7 * 86400)).cast("long"))
        .as("week"))
      .distinct()
    val firstWeek = weeks.groupBy("user_id")
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(firstWeek, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** JSON property extraction — regex-based so the oracle needs no JSON
    * extension; `props` is flat `{"k": <int>}` in the fixture.
    */
  def jsonProp(props: Column, key: String): Column =
    // nullif guards the no-match case: regexp_extract yields '' and ANSI
    // mode (Spark 4 default) makes ''::BIGINT throw rather than null;
    // the key is quoted so regex metacharacters can't distort the match
    nullif(regexp_extract(props,
        "\"" + java.util.regex.Pattern.quote(key) + "\":\\s*(-?\\d+)", 1),
      lit("")).cast("long")

  /** As-of join: for each left event, the most recent right event of the
    * same user at-or-before its timestamp. Implemented as the scalable
    * union + last_value-ignore-nulls window (ONE shuffle on user_id) —
    * not a non-equi join, which would be a broadcast-nested-loop disaster
    * at scale.
    *
    * Inputs are (user_id, event_id, ts)-shaped; returns left rows with
    * `matched_event_id` (nullable long) of the as-of right row.
    */
  def asOfJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("es"), lit(1).as("is_left"),
      lit(null).cast("long").as("r_id"))
    val r = right.select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("es"), lit(0).as("is_left"),
      col("event_id").as("r_id"))
    // Right rows sort before left rows at equal timestamps (is_left asc) so
    // an exactly-simultaneous right row is visible to the left row.
    val w = Window.partitionBy("user_id")
      .orderBy(col("es").asc, col("is_left").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("matched_event_id",
        last(col("r_id"), ignoreNulls = true).over(w))
      .where(col("is_left") === 1)
      .select(col("user_id"), col("event_id"), col("es"),
        col("matched_event_id"))
  }

  /** As-of join with a staleness tolerance: like [[asOfJoin]] but a match
    * only counts if the right event is at most `tolSeconds` old at the
    * left event's time — the feature-join-with-max-lookback shape a
    * training pipeline needs (a feature older than the bound is treated
    * as missing, not silently used). Same single user_id shuffle; the
    * window carries (es, id) of the last right row so the tolerance check
    * is a post-window projection.
    */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame,
                        tolSeconds: Long): DataFrame = {
    val l = left.select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("es"), lit(1).as("is_left"))
    val r = right.select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("es"), lit(0).as("is_left"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("es").asc, col("is_left").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("m", last(
        when(col("is_left") === 0,
          struct(col("es").as("r_es"), col("event_id").as("r_id"))),
        ignoreNulls = true).over(w))
      .where(col("is_left") === 1)
      .select(col("user_id"), col("event_id"), col("es"),
        when(col("es") - col("m.r_es") <= tolSeconds, col("m.r_id"))
          .as("matched_event_id"))
  }

  /** Temporal train/test split with leakage audit: hold out the LAST
    * `testPct`% of the event-time RANGE (the production-realistic
    * split for behavioral models — a random row split leaks future
    * context into training; time-range splitting is the standard
    * backtesting protocol). The cutoff is exact integer arithmetic on
    * the epoch-second bounds (one broadcast 1-row aggregate), the
    * split flag is scan-local, and the audit counts the users that
    * appear on BOTH sides — "leaky" users whose test events a
    * user-level feature store would contaminate. One output row:
    * sizes, distinct users per side, leaky users, leak rate.
    */
  def temporalSplit(events: DataFrame, testPct: Int = 20): DataFrame = {
    require(testPct >= 1 && testPct <= 99, s"bad testPct $testPct")
    val base = events.select(col("user_id"),
      unix_timestamp(col("ts")).as("es"))
    val bounds = base.agg(min("es").as("mn"), max("es").as("mx"))
    val flagged = base.crossJoin(broadcast(bounds))
      .withColumn("cutoff",
        expr(s"mn + ((mx - mn) * ${100 - testPct}) div 100"))
      .withColumn("is_test", col("es") >= col("cutoff"))
    val sides = flagged.agg(
      max(col("cutoff")).as("cutoff_es"),
      sum(when(!col("is_test"), 1L).otherwise(0L)).as("n_train"),
      sum(when(col("is_test"), 1L).otherwise(0L)).as("n_test"),
      countDistinct(when(!col("is_test"), col("user_id")))
        .as("n_users_train"),
      countDistinct(when(col("is_test"), col("user_id")))
        .as("n_users_test"))
    val leaky = flagged.groupBy("user_id")
      .agg(max(when(col("is_test"), 1).otherwise(0)).as("ht"),
        max(when(!col("is_test"), 1).otherwise(0)).as("hr"))
      .agg(sum(when(col("ht") === 1 && col("hr") === 1, 1L)
        .otherwise(0L)).as("n_leaky_users"))
    sides.crossJoin(broadcast(leaky))
      .select(col("cutoff_es"), col("n_train"), col("n_test"),
        col("n_users_train"), col("n_users_test"),
        col("n_leaky_users"),
        Num.floorAt(col("n_leaky_users").cast("double") /
          col("n_users_test"), 6).as("leak_rate"))
  }

  /** Bounded exponentially-weighted moving average per key: for each
    * event, EWMA over its last `depth` values (inclusive) with
    * alpha = 1/2 — the streaming-feature smoother every behavioral
    * feature store computes. The window is BOUNDED so the result is a
    * pure function of `depth` rows (an unbounded recursive EWMA is
    * order-fragile and unreplayable in SQL); alpha = 1/2 makes every
    * weight 2^-j, an EXACT binary scale, so the weighted sum is the
    * same IEEE doubles in any engine that folds the window in row
    * order — the DuckDB oracle replays it bit-for-bit via an indexed
    * list transform. One user_id shuffle, O(depth) state per row, no
    * driver involvement; ordering key (ts, event_id) is total, so the
    * collected window is deterministic.
    *
    * Output: (user_id, event_id, value, ewma), ewma floored at 6dp.
    */
  def ewmaBounded(events: DataFrame, depth: Int = 16): DataFrame = {
    require(depth >= 1 && depth <= 64, s"bad depth $depth")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(depth - 1), 0)
    val arr = collect_list(col("value")).over(w)
    val len = size(col("arr"))
    // weight for 0-based index i in a length-L window: 2^-(L-1-i) —
    // newest row weight 1; normalizer Σ 2^-j = 2 - 2^-(L-1)
    val dot = aggregate(
      transform(col("arr"),
        (x, i) => x * pow(lit(0.5), len - 1 - i)),
      lit(0.0), (acc, x) => acc + x)
    events
      .select(col("user_id"), col("event_id"), col("value"),
        arr.as("arr"))
      .select(col("user_id"), col("event_id"), col("value"),
        Num.floorAt(dot / (lit(2.0) - pow(lit(0.5), len - 1)), 6)
          .as("ewma"))
  }
}
