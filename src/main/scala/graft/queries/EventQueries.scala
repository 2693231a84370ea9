package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Lifecycle-analytics surface (SURVEY §2.6/§2.7/§2.13 — the reference's
  * `docs/analytics.md` reporting suite re-expressed over the `events`
  * stream table): time-bucketed throughput, conditional error rates,
  * JSON metadata extraction, per-user activity spans, and gap-based
  * sessionization (the batch equivalent of the reference's
  * 300 s chunk-staging TTL / session semantics).
  *
  * Time arithmetic uses integer microseconds (`unix_micros` ↔ DuckDB
  * `epoch_us`) so parity is exact, never float epoch seconds.
  */
object EventQueries {

  /** Pivot: day × event-type count matrix (the DataFrame `pivot`
    * relational op; oracle = the equivalent conditional aggregation). */
  def q60EventPivot(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  /** Value-RANGE window frame: events by the same user within ±60 s
    * of each event (rangeBetween over integer microseconds — the
    * frame spec family rowsBetween can't express). */
  def q61NearbyActivity(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-60000000L, 60000000L)
    events(s, d)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("nearby_events"))
      .orderBy(col("event_id"))
  }

  /** A1: throughput by day × event_type (`analytics.md:27-48`). */
  def q16DailyThroughput(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("day"), col("event_type"))

  /** A4: hourly error rate via conditional aggregation
    * (`analytics.md:102-113`). */
  def q17HourlyErrorRate(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"),
        (sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("error_rate"))
      .orderBy(col("hour"))

  /** A2: value distribution stats per event type, incl. exact median
    * (`analytics.md:56-68`). */
  def q18ValueStats(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        davg(col("value")).as("avg_value"),
        median(col("value")).as("median_value"))
      .orderBy(col("event_type"))

  /** Gap-based sessionization (30-min inactivity starts a new session):
    * the batch analog of the reference's keyed-state session semantics
    * (`chat_session_service.py:13-62`, SURVEY §2.13). */
  def q19UserSessions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull
          || unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("new_session")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  /** Native `session_window` sessionization (§2.13): the streaming
    * session operator run in batch mode — Spark merges events into
    * [first, last+gap) windows per user in ONE aggregate, no window
    * function pass. The oracle replays the semantics as classic
    * gap-and-islands SQL, pinning that the native operator and the
    * lag/cumsum formulation (q19's shape) agree event for event. */
  def q110SessionWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** JSON metadata extraction (reference metadata-blob pattern,
    * `schema.sql:36` + `from_json`/`get_json_object` mapping). */
  def q20JsonProps(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_bucket", col("k") % 10)
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("k_bucket"))

  /** A8-style per-user activity snapshot: counts, distinct types,
    * first/last timestamps, active span in integer seconds. */
  def q21UserActivity(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        max(unix_micros(col("ts"))).as("max_us"),
        min(unix_micros(col("ts"))).as("min_us"))
      .withColumn("span_sec", expr("(max_us - min_us) div 1000000"))
      .drop("max_us", "min_us")
      .orderBy(col("user_id"))

  /** A6-style share-of-total per event type (window over the grouped
    * result — 1 row per type, so the single-partition window is tiny). */
  def q22EventTypeShare(s: SparkSession, d: String): DataFrame = {
    val byType = events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    byType
      .withColumn("share",
        col("n").cast("double") / sum(col("n")).over(Window.partitionBy(lit(1))))
      .orderBy(col("event_type"))
  }

  /** Latest-state view over the event log (the reference's lifecycle
    * table becomes arg-max-per-entity, SURVEY §1.1). */
  def q41LatestEventPerUser(s: SparkSession, d: String): DataFrame =
    graft.operators.Lifecycle.statusView(
      events(s, d), "user_id", "event_type", "ts", "event_id")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"))
      .orderBy(col("user_id"))

  /** Phase-transition latency stats over consecutive events per user
    * (A2/A3 analog, `analytics.md:56-94`). */
  def q42PhaseTransitions(s: SparkSession, d: String): DataFrame =
    graft.operators.Lifecycle.phaseLatencies(
      events(s, d), "user_id", "event_type", "ts", "event_id")
      .orderBy(col("from_status"), col("to_status"))

  /** Sliding-window counts (1 h window, 30 min slide — the Structured
    * Streaming `window()` primitive evaluated in batch; each event
    * lands in exactly two windows). Oracle mirrors the assignment by
    * unnesting the two half-hour-grid starts per event. */
  def q46SlidingWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** As-of join ([[graft.operators.AsOfJoin]]): every purchase gets
    * the user's latest view at-or-before it (attribution lookup).
    * One shuffle on user_id, no range-join pair blowup; ties at equal
    * timestamps resolve to the greatest view event_id, so the result
    * is deterministic and the oracle can state the same total order
    * (`ORDER BY ts DESC, event_id DESC LIMIT 1`). */
  def q64AsOfJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.operators.AsOfJoin.asOf(purchases, views,
      keys = Seq("user_id"), timeCol = "ts", tieCol = "event_id",
      payloadCols = Seq("ts", "value"))
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("asof_ts").as("last_view_ts"),
        col("asof_value").as("last_view_value"))
      .orderBy(col("event_id"))
  }

  /** q64's as-of contract planned through the CUSTOM PHYSICAL
    * OPERATOR ([[graft.plans.AsOfJoinExec]]: logical node + strategy
    * + sort-merge exec — SURVEY §2.14 option c) instead of the
    * union+window emulation. Same oracle as q64: the two
    * formulations must be value-identical. */
  def q104AsofMerge(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.operators.AsOfJoin.asOfMerge(purchases, views,
      keys = Seq("user_id"), timeCol = "ts", tieCol = "event_id",
      payloadCols = Seq("ts", "value"))
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("asof_ts").as("last_view_ts"),
        col("asof_value").as("last_view_value"))
      .orderBy(col("event_id"))
  }

  /** Range join ([[graft.operators.RangeJoin]]): views in the hour
    * strictly before each purchase, per user — bucketed equi-join on
    * (user_id, time bucket), never a nested-loop inequality scan
    * (PlanSpec2 pins it). Inner semantics: purchases with no view in
    * the window don't appear. */
  def q65RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("value"))
    graft.operators.RangeJoin.rangeJoin(purchases, views,
      keys = Seq("user_id"), probeUs = "t_us", buildUs = "t_us",
      lowerUs = -3600000000L, upperUs = -1L,
      payloadCols = Seq("value"))
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(lit(1)).as("views_1h"),
        dsum(col("r_value"), 4).as("view_value_1h"))
      .orderBy(col("event_id"))
  }

  /** Salted-join equivalence ([[graft.operators.Skew.saltedJoin]]):
    * the skew-mitigation join must be value-identical to the plain
    * equi-join — the salt only changes ROUTING (a hot key spreads
    * over `salts` reducers), never the result. Oracle = the plain
    * SQL join, so this is the correctness proof for the skew
    * tooling. */
  /** Cohort retention: users grouped by first-seen week, distinct
    * active users per (cohort, weeks-since) cell — the standard
    * retention-triangle analytics shape (self-aggregation join +
    * integer-µs week bucketing per the file's parity rule). */
  def q81CohortRetention(s: SparkSession, d: String): DataFrame = {
    val weeks = events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"))
      .withColumn("week",
        col("t_us") - pmod(col("t_us"), lit(604800000000L)))
      .select(col("user_id"), col("week")).distinct()
    val cohort = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(cohort, "user_id")
      .withColumn("weeks_since",
        ((col("week") - col("cohort_week")) / 604800000000L).cast("int"))
      .groupBy(timestamp_micros(col("cohort_week")).as("cohort_week"),
        col("weeks_since"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_week"), col("weeks_since"))
  }

  /** Time-bounded funnel sequencing (match_recognize-lite): how far
    * each user advances through signup → click → purchase IN ORDER
    * within 24 hours of their first signup — a sequential-pattern
    * state machine expressed as a pure `aggregate` fold over the
    * user's time-ordered events. The accumulator is a 2-field struct
    * (stage, funnel-start µs) shaped identically to the event
    * elements (code, t) so the oracle can run the very same fold as
    * a `list_reduce` with the init state prepended (DuckDB's reduce
    * has no separate init type). No UDF; one groupBy shuffle. */
  def q82FunnelSequence(s: SparkSession, d: String): DataFrame = {
    val W = 24L * 3600 * 1000000 // 24 h in µs
    val ev = struct(unix_micros(col("ts")).as("t"),
      col("event_id").as("id"),
      when(col("event_type") === "signup", 1L)
        .when(col("event_type") === "click", 2L)
        .when(col("event_type") === "purchase", 3L)
        .otherwise(0L).as("code"))
    def st(a: org.apache.spark.sql.Column) = a.getField("a")
    def t0(a: org.apache.spark.sql.Column) = a.getField("b")
    events(s, d)
      .select(col("user_id"), ev.as("ev"))
      .groupBy(col("user_id"))
      .agg(transform(array_sort(collect_list(col("ev"))),
        x => struct(x.getField("code").as("a"),
          x.getField("t").as("b"))).as("evs"))
      .withColumn("stage_reached",
        aggregate(col("evs"),
          struct(lit(0L).as("a"), lit(0L).as("b")),
          (acc, e) =>
            when(st(acc) === 0L && st(e) === 1L,
              struct(lit(1L).as("a"), t0(e).as("b")))
            .when(st(acc) === 1L && st(e) === 2L &&
              t0(e) - t0(acc) <= W,
              struct(lit(2L).as("a"), t0(acc).as("b")))
            .when(st(acc) === 2L && st(e) === 3L &&
              t0(e) - t0(acc) <= W,
              struct(lit(3L).as("a"), t0(acc).as("b")))
            .otherwise(acc)).getField("a"))
      .groupBy(col("stage_reached"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage_reached"))
  }

  def q67SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val dim = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_events"))
    graft.operators.Skew.saltedJoin(
      ev.select(col("event_id"), col("user_id")), dim,
      key = "user_id", salts = 8)
      .select(col("event_id"), col("user_id"), col("user_events"))
      .orderBy(col("event_id"))
  }

  /** Per-user 2σ outliers via the exact two-pass moments: μ and
    * E[v²] come from decimal-exact sums (order-independent), σ² =
    * E[v²] − μ², and the flag compares (v−μ)² > 4σ² — no sqrt, no
    * shuffle-order doubles anywhere, so the outlier SET is
    * deterministic and oracle-checkable. Shape: one agg shuffle on
    * user + one hash join back (dim side is one row per user). */
  def q95ValueOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val stats = ev.groupBy(col("user_id").as("uid"))
      .agg(davg(col("value"), 6).as("mu"),
        davg(col("value") * col("value"), 6).as("m2"))
      .withColumn("sigma2", col("m2") - col("mu") * col("mu"))
    ev.join(stats, col("user_id") === col("uid"))
      .filter((col("value") - col("mu")) * (col("value") - col("mu"))
        > lit(4.0) * col("sigma2"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("mu"), col("sigma2"))
      .orderBy(col("event_id"))
  }

  /** q168: peak interval concurrency per event type — every event
    * opens a half-open 5-minute interval [ts, ts+300 s); the classic
    * sweep-line turns overlap counting into a +1/−1 boundary stream
    * with a per-type running sum (ends sort before starts at the same
    * instant, so touching intervals never overlap). Reports each
    * type's maximum simultaneous load and the first instant it is
    * reached — the capacity-planning number a transcription/OCR/embed
    * service boundary is sized by.
    *
    * Scale: the cumsum window partitions by event_type — exact and
    * oracle-checkable, but a single dominant type at 100 TB makes
    * that partition the straggler; the swap is the q75 sharded
    * prefix-sum device (per-shard partial sums + broadcast shard
    * offsets), same answer, no per-type total order. */
  def q168IntervalLoad(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("t"),
        col("event_id"))
    val bounds = ev.select(col("event_type"), col("t"),
        lit(1).as("delta"), col("event_id"))
      .unionByName(ev.select(col("event_type"),
        (col("t") + lit(300000000L)).as("t"),
        lit(-1).as("delta"), col("event_id")))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = bounds.withColumn("load", sum(col("delta")).over(w))
    val peak = run.groupBy(col("event_type").as("pt"))
      .agg(max(col("load")).as("peak"))
    run.join(peak, col("event_type") === col("pt") &&
        col("load") === col("peak"))
      .groupBy(col("event_type"), col("peak"))
      .agg(min(col("t")).as("first_peak_us"))
      .orderBy(col("event_type"))
  }

  /** q265: join-key skew diagnostics
    * ([[graft.operators.Skew.keyDiagnostics]]) — the pre-flight a
    * 100 TB shuffle runs on its key before committing to a
    * partitioning: top-20 hot user_ids with corpus share and hot
    * factor (count ÷ uniform expectation), the number
    * [[graft.operators.Skew.saltedJoin]]'s `salts` is sized from. */
  def q265KeySkew(s: SparkSession, d: String): DataFrame =
    graft.operators.Skew.keyDiagnostics(
      events(s, d).select(col("user_id")), "user_id", topK = 20)
      .withColumnRenamed("key", "user_id")
      .orderBy(col("rnk"))

  /** q295: interval union / coverage
    * ([[graft.operators.Intervals.mergedCoverage]]) — the multimodal
    * segment bookkeeping: per media item, merged covered length,
    * island count, and span over synthetic `[start, end)` segments
    * derived arithmetically from events (overlaps and touching
    * segments everywhere). Two media-partitioned windows + two hash
    * aggregates; all integer. */
  def q295IntervalCoverage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val start = (col("event_id") * 37) % 5000
    // Fixture media 9000295: the boundary classes the derived
    // segments cannot be GUARANTEED to hit — exact touch (merge, not
    // a new island), full containment, an exact duplicate, and a
    // gap-of-1 island break (r11 oracle-fidelity sweep).
    val planted = Seq(
      (9000295L, 0L, 10L), (9000295L, 10L, 20L),  // touching
      (9000295L, 2L, 5L),                         // contained
      (9000295L, 0L, 10L),                        // duplicate
      (9000295L, 21L, 30L))                       // gap of exactly 1
      .toDF("media_id", "seg_start", "seg_end")
    val seg = events(s, d).select(
      (col("user_id") % 20).as("media_id"),
      start.cast("long").as("seg_start"),
      (start + 1 + col("event_id") % 300).cast("long").as("seg_end"))
      .unionByName(planted)
    graft.operators.Intervals.mergedCoverage(seg, "media_id",
        "seg_start", "seg_end")
      .orderBy(col("media_id"))
  }

  private val q295Oracle: String =
    """WITH segi AS (
      |  SELECT user_id % 20 AS m, (event_id * 37) % 5000 AS s,
      |    (event_id * 37) % 5000 + 1 + event_id % 300 AS e
      |  FROM events
      |  UNION ALL
      |  SELECT * FROM (VALUES (9000295, 0, 10), (9000295, 10, 20),
      |    (9000295, 2, 5), (9000295, 0, 10), (9000295, 21, 30))
      |    v(m, s, e)),
      |mk AS (
      |  SELECT m, s, e,
      |    MAX(e) OVER (PARTITION BY m ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM segi),
      |nw AS (
      |  SELECT m, s, e,
      |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw
      |  FROM mk),
      |isl AS (
      |  SELECT m, s, e,
      |    SUM(nw) OVER (PARTITION BY m ORDER BY s, e) AS isl
      |  FROM nw),
      |gi AS (
      |  SELECT m, isl, MIN(s) AS i_s, MAX(e) AS i_e, COUNT(*) AS n
      |  FROM isl GROUP BY m, isl)
      |SELECT m AS media_id,
      |  CAST(SUM(n) AS BIGINT) AS n_segments,
      |  CAST(COUNT(*) AS BIGINT) AS n_islands,
      |  CAST(SUM(i_e - i_s) AS BIGINT) AS covered_len,
      |  CAST(MAX(i_e) - MIN(i_s) AS BIGINT) AS span_len
      |FROM gi GROUP BY m ORDER BY m""".stripMargin

  /** q296: ordered event-sequence matching (the ClickHouse
    * `sequenceMatch` shape) — per user, the ts-ordered type-initial
    * string (rebuilt with the q212 sorted-struct device, md5-gated)
    * plus two in-order pattern flags: signup→view→purchase and
    * view→click→purchase. The regex runs ONCE per user on the
    * user-bounded sequence string — never a per-pattern event scan. */
  def q296SequenceMatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Fixture user 9000296: exact-timestamp ties whose event_id
    // order OPPOSES the type-initial order ('v' has the lower id at
    // t=1000, 's' the lower id at t=2000) — a sort that fell back to
    // the type char instead of event_id would flip the sequence
    // string; plus the pattern chars arriving out of order (p before
    // v) so both rlike flags are exercised false-then-true on ties
    // (r11 oracle-fidelity sweep).
    val planted = Seq(
      (9000296L, 1L, 1000L, "view"), (9000296L, 2L, 1000L, "signup"),
      (9000296L, 3L, 2000L, "signup"), (9000296L, 4L, 2000L, "click"),
      (9000296L, 5L, 3000L, "purchase"), (9000296L, 6L, 3000L, "view"))
      .toDF("user_id", "event_id", "t_us", "event_type")
    val ev = events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("t_us"), col("event_id"),
        col("event_type"))
      .unionByName(planted.select(col("user_id"), col("t_us"),
        col("event_id"), col("event_type")))
      .select(col("user_id"),
        struct(col("t_us").as("t"),
          col("event_id").as("i"),
          substring(col("event_type"), 1, 1).as("c")).as("st"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(array_sort(collect_list(col("st"))),
          x => x.getField("c")), "").as("__seq"))
      .select(col("user_id"), col("n_events"),
        md5(col("__seq")).as("seq_md5"),
        col("__seq").rlike("s.*v.*p").as("has_signup_view_purchase"),
        col("__seq").rlike("v.*c.*p").as("has_view_click_purchase"))
      .orderBy(col("user_id"))
  }

  private val q296Oracle: String =
    """WITH evu AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type
      |  FROM events
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    (9000296, 1000, 1, 'view'), (9000296, 1000, 2, 'signup'),
      |    (9000296, 2000, 3, 'signup'), (9000296, 2000, 4, 'click'),
      |    (9000296, 3000, 5, 'purchase'), (9000296, 3000, 6, 'view'))
      |    v(user_id, t_us, event_id, event_type)),
      |sq AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    string_agg(substr(event_type, 1, 1), ''
      |      ORDER BY t_us, event_id) AS seq
      |  FROM evu GROUP BY user_id)
      |SELECT user_id, n_events, md5(seq) AS seq_md5,
      |  regexp_matches(seq, 's.*v.*p') AS has_signup_view_purchase,
      |  regexp_matches(seq, 'v.*c.*p') AS has_view_click_purchase
      |FROM sq ORDER BY user_id""".stripMargin

  /** q297: CUSUM drift detection over the daily error-count series —
    * the upper-CUSUM recursion S_t = max(0, S_{t−1} + x_t − k) made
    * WINDOW-EXPRESSIBLE via the prefix identity
    * S_t = C_t − min(0, min_{j≤t} C_j) with C the running sum of
    * (x − k): two windows over the day-bounded series, all integer;
    * alarm when S exceeds h. k=70, h=25. */
  def q297CusumDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Fixture prefix (1970, sorts before every real day): drives S
    // through the boundaries the organic series cannot be counted
    // on to hit — S landing EXACTLY on h (alarm strict >, so false),
    // h+1 (true), an x−k = 0 zero-increment day, and the max(0,·)
    // floor reset; the prefix ends at S = 0 so every real day's
    // cusum is unchanged (r11 oracle-fidelity sweep).
    val planted = Seq(
      ("1970-01-01", 95L),   // S = 25 = h  → alarm false
      ("1970-01-02", 71L),   // S = 26     → alarm true
      ("1970-01-03", 70L),   // x−k = 0, S stays 26 → true
      ("1970-01-04", 0L),    // S = max(0, −44) = 0 → false
      ("1970-01-05", 0L))    // S = 0 → false; prefix exits at 0
      .toDF("day_s", "x")
      .select(to_date(col("day_s")).as("day"), col("x"))
    val daily = events(s, d)
      .where(col("event_type") === "error")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .unionByName(planted)
    graft.operators.Cusum.upperCusum(daily, Seq.empty, "day", "x",
        k = 70L, h = 25L)
      .select(col("day"), col("x"), col("cusum"), col("alarm"))
      .orderBy(col("day"))
  }

  private val q297Oracle: String =
    """WITH dly AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
      |  FROM events WHERE event_type = 'error' GROUP BY 1
      |  UNION ALL
      |  SELECT CAST(d AS DATE), x FROM (VALUES
      |    ('1970-01-01', 95), ('1970-01-02', 71), ('1970-01-03', 70),
      |    ('1970-01-04', 0), ('1970-01-05', 0)) v(d, x)),
      |cm AS (
      |  SELECT day, x,
      |    SUM(x - 70) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      |  FROM dly),
      |sm AS (
      |  SELECT day, x,
      |    c - LEAST(0, MIN(c) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
      |  FROM cm)
      |SELECT day, CAST(x AS BIGINT) AS x, CAST(s AS BIGINT) AS cusum,
      |  s > 25 AS alarm
      |FROM sm ORDER BY day""".stripMargin

  /** Benford first-digit probabilities log10(1+1/d), computed ONCE
    * on the driver and interpolated as literals into BOTH plans (the
    * q124 gains device) — no libm log evaluated inside either
    * engine. */
  private val BenfordP: Seq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** q298: Benford first-significant-digit audit over order totals —
    * the classic fabricated-numbers screen (Benford 1938; Nigrini's
    * forensic-accounting use): per-digit observed vs expected
    * counts and the χ² statistic. First digits extracted via
    * floor(v·100) → string (no log10 in-plan); χ² terms summed
    * decimal-exact. */
  def q298BenfordAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pExpr = BenfordP.zipWithIndex
      .foldLeft(lit(Double.NaN)) { case (e, (p, i)) =>
        when(col("digit") === (i + 1).toString, lit(p)).otherwise(e) }
    // Fixture totals exercising the NON-significant digit classes:
    // a sub-cent value (first extracted char '0') and a negative
    // total (first char '-'). Both must be EXCLUDED by the explicit
    // 1–9 filter below — without that filter the engine emitted NaN
    // benford_frac where the oracle's ELSE-less CASE gives NULL, a
    // divergence the organic TPC-H totals (all ≥ 850ish) never
    // exposed (r11 oracle-fidelity sweep).
    val planted = Seq(0.005, -500.0).toDF("o_totalprice")
    val digits = orders(s, d).select(col("o_totalprice"))
      .unionByName(planted)
      .select(substring(floor(col("o_totalprice") * 100)
        .cast("long").cast("string"), 1, 1).as("digit"))
      .where(col("digit").between("1", "9"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("n"))
    val terms = digits.crossJoin(broadcast(tot))
      .withColumn("benford_frac", pExpr)
      .withColumn("expected", col("n").cast("double") *
        col("benford_frac"))
      .withColumn("term",
        (col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) /
          col("expected"))
    val chi2 = terms.agg(graft.queries.Tables.dsum(col("term"), 9)
      .as("chi2"))
    terms.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n_obs"), col("benford_frac"),
        col("term"), col("chi2"))
      .orderBy(col("digit"))
  }

  private val q298Oracle: String = {
    // `e0` forces a DOUBLE literal — a bare decimal literal parses
    // as DECIMAL in DuckDB and its decimal→double conversion can
    // land one ulp off the string→double parse Spark's lit() uses
    val pCase = BenfordP.zipWithIndex.map { case (p, i) =>
      s"WHEN digit = '${i + 1}' THEN ${p}e0" }.mkString(" ")
    s"""WITH dg AS (
      |  SELECT substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS digit
      |  FROM (SELECT o_totalprice FROM orders
      |        UNION ALL SELECT * FROM (VALUES (0.005e0), (-500.0e0))
      |          v(o_totalprice))),
      |cnt AS (SELECT digit, COUNT(*) AS n_obs FROM dg
      |  WHERE digit BETWEEN '1' AND '9' GROUP BY 1),
      |tt AS (SELECT SUM(n_obs) AS n FROM cnt),
      |tm AS (
      |  SELECT digit, n_obs,
      |    CASE $pCase END AS benford_frac,
      |    (CAST(n_obs AS DOUBLE) -
      |      CAST(n AS DOUBLE) * (CASE $pCase END)) *
      |    (CAST(n_obs AS DOUBLE) -
      |      CAST(n AS DOUBLE) * (CASE $pCase END)) /
      |    (CAST(n AS DOUBLE) * (CASE $pCase END)) AS term
      |  FROM cnt, tt),
      |c2 AS (SELECT CAST(SUM(CAST(term AS DECIMAL(18,9)))
      |    AS DOUBLE) AS chi2 FROM tm)
      |SELECT tm.digit, CAST(tm.n_obs AS BIGINT) AS n_obs,
      |  tm.benford_frac, tm.term, c2.chi2
      |FROM tm, c2 ORDER BY tm.digit""".stripMargin
  }

  /** q303: LAST-TOUCH revenue attribution — the marketing-classic
    * the events table exists for: each purchase's value is credited
    * to the most recent preceding view/click by the same user within
    * a 24 h lookback ('direct' when none). One user-partitioned
    * window carrying the last touch (two IGNORE-NULLS last_values
    * over the strictly-preceding frame), then a 3-row aggregate with
    * the dsum decimal device on the revenue. */
  def q303Attribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Fixture users 9000303/9000304: the lookback boundaries the
    // organic stream cannot be counted on to hit — a purchase
    // EXACTLY 24 h after its touch (≤ keeps it credited), 24 h + 1 µs
    // (direct), a same-timestamp click→purchase tie resolved by
    // event_id in the strictly-preceding frame (Δ = 0), and a
    // purchase with no preceding event at all (r11 sweep).
    val planted = Seq(
      (900000001L, 9000303L, "view", 0.0, 0L),
      (900000002L, 9000303L, "purchase", 10.0, 86400000000L),
      (900000003L, 9000303L, "purchase", 20.0, 86400000001L),
      (900000004L, 9000303L, "click", 0.0, 200000000000L),
      (900000005L, 9000303L, "purchase", 30.0, 200000000000L),
      (900000006L, 9000304L, "purchase", 40.0, 0L))
      .toDF("event_id", "user_id", "event_type", "value", "t_us")
    val ev = events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("value"),
        unix_micros(col("ts")).as("t_us"))
      .unionByName(planted)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val isTouch = col("event_type") === "view" ||
      col("event_type") === "click"
    val carried = ev
      .withColumn("touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true)
          .over(w))
      .withColumn("touch_t",
        last(when(isTouch, col("t_us")), ignoreNulls = true).over(w))
    carried.where(col("event_type") === "purchase")
      .withColumn("credited",
        when(col("touch_type").isNotNull &&
          col("t_us") - col("touch_t") <= 86400000000L,
          col("touch_type")).otherwise(lit("direct")))
      .groupBy(col("credited"))
      .agg(count(lit(1)).as("n_conversions"),
        dsum(col("value"), 2).as("total_value"))
      .orderBy(col("credited"))
  }

  private val q303Oracle: String =
    """WITH evx AS (
      |  SELECT event_id, user_id, event_type, value,
      |    epoch_us(ts) AS t_us
      |  FROM events
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    (900000001, 9000303, 'view', 0.0e0, 0),
      |    (900000002, 9000303, 'purchase', 10.0e0, 86400000000),
      |    (900000003, 9000303, 'purchase', 20.0e0, 86400000001),
      |    (900000004, 9000303, 'click', 0.0e0, 200000000000),
      |    (900000005, 9000303, 'purchase', 30.0e0, 200000000000),
      |    (900000006, 9000304, 'purchase', 40.0e0, 0))
      |    v(event_id, user_id, event_type, value, t_us)),
      |cx AS (
      |  SELECT event_id, user_id, event_type, value, t_us,
      |    last_value(CASE WHEN event_type IN ('view', 'click')
      |      THEN event_type END IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY t_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS touch_type,
      |    last_value(CASE WHEN event_type IN ('view', 'click')
      |      THEN t_us END IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY t_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS touch_t
      |  FROM evx),
      |pp AS (
      |  SELECT CASE WHEN touch_type IS NOT NULL
      |      AND t_us - touch_t <= 86400000000 THEN touch_type
      |      ELSE 'direct' END AS credited, value
      |  FROM cx WHERE event_type = 'purchase')
      |SELECT credited, COUNT(*) AS n_conversions,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_value
      |FROM pp GROUP BY credited ORDER BY credited""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q295_interval_coverage" -> (q295IntervalCoverage _),
    "q298_benford_audit" -> (q298BenfordAudit _),
    "q303_attribution" -> (q303Attribution _),
    "q296_sequence_match" -> (q296SequenceMatch _),
    "q297_cusum_drift" -> (q297CusumDrift _),
    "q265_key_skew" -> (q265KeySkew _),
    "q168_interval_load" -> (q168IntervalLoad _),
    "q95_value_outliers" -> (q95ValueOutliers _),
    "q81_cohort_retention" -> (q81CohortRetention _),
    "q82_funnel_sequence" -> (q82FunnelSequence _),
    "q67_salted_join" -> (q67SaltedJoin _),
    "q65_range_join" -> (q65RangeJoin _),
    "q64_asof_join" -> (q64AsOfJoin _),
    "q104_asof_merge" -> (q104AsofMerge _),
    "q110_session_windows" -> (q110SessionWindows _),
    "q41_latest_event_per_user" -> (q41LatestEventPerUser _),
    "q42_phase_transitions" -> (q42PhaseTransitions _),
    "q46_sliding_windows" -> (q46SlidingWindows _),
    "q16_daily_throughput" -> (q16DailyThroughput _),
    "q17_hourly_error_rate" -> (q17HourlyErrorRate _),
    "q18_value_stats" -> (q18ValueStats _),
    "q19_user_sessions" -> (q19UserSessions _),
    "q20_json_props" -> (q20JsonProps _),
    "q21_user_activity" -> (q21UserActivity _),
    "q22_event_type_share" -> (q22EventTypeShare _),
    "q60_event_pivot" -> (q60EventPivot _),
    "q61_nearby_activity" -> (q61NearbyActivity _),
  )

  val oracle: Map[String, String] = Map(
    "q295_interval_coverage" -> q295Oracle,
    "q296_sequence_match" -> q296Oracle,
    "q297_cusum_drift" -> q297Oracle,
    "q298_benford_audit" -> q298Oracle,
    "q303_attribution" -> q303Oracle,
    "q265_key_skew" ->
      """WITH c AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events
        |  GROUP BY user_id),
        |g AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS nr, COUNT(*) AS nk
        |  FROM c),
        |t AS (
        |  SELECT user_id, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, user_id) AS rnk
        |  FROM c)
        |SELECT CAST(t.rnk AS BIGINT) AS rnk, t.user_id, t.cnt,
        |  CAST(t.cnt AS DOUBLE) / CAST(g.nr AS DOUBLE) AS share,
        |  CAST(t.cnt AS DOUBLE) * g.nk / g.nr AS hot_factor,
        |  g.nr AS n_rows, g.nk AS n_keys
        |FROM t CROSS JOIN g WHERE t.rnk <= 20
        |ORDER BY rnk""".stripMargin,
    "q168_interval_load" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) AS t, 1 AS delta, event_id
        |  FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts) + 300000000, -1, event_id
        |  FROM events),
        |r AS (
        |  SELECT event_type, t,
        |    SUM(delta) OVER (PARTITION BY event_type
        |      ORDER BY t, delta, event_id
        |      ROWS UNBOUNDED PRECEDING) AS load
        |  FROM b),
        |p AS (SELECT event_type AS pt, CAST(MAX(load) AS BIGINT) AS peak
        |      FROM r GROUP BY 1)
        |SELECT r.event_type, p.peak, MIN(r.t) AS first_peak_us
        |FROM r JOIN p ON r.event_type = p.pt AND r.load = p.peak
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q95_value_outliers" ->
      """WITH s AS (
        |  SELECT user_id AS uid,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |      / COUNT(value) AS mu,
        |    CAST(SUM(CAST(value*value AS DECIMAL(18,6))) AS DOUBLE)
        |      / COUNT(value) AS m2
        |  FROM events GROUP BY 1)
        |SELECT event_id, user_id, value, mu,
        |  m2 - mu*mu AS sigma2
        |FROM events JOIN s ON user_id = uid
        |WHERE (value - mu)*(value - mu) > 4.0*(m2 - mu*mu)
        |ORDER BY event_id""".stripMargin,
    "q82_funnel_sequence" ->
      """WITH coded AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id,
        |    CAST(CASE event_type WHEN 'signup' THEN 1
        |      WHEN 'click' THEN 2 WHEN 'purchase' THEN 3
        |      ELSE 0 END AS BIGINT) AS code
        |  FROM events),
        |folded AS (
        |  SELECT user_id,
        |    list_reduce(
        |      list_concat([struct_pack(a := 0::BIGINT, b := 0::BIGINT)],
        |        list(struct_pack(a := code, b := t)
        |             ORDER BY t, event_id)),
        |      (acc, e) -> CASE
        |        WHEN acc.a = 0 AND e.a = 1
        |          THEN struct_pack(a := 1::BIGINT, b := e.b)
        |        WHEN acc.a = 1 AND e.a = 2 AND e.b - acc.b <= 86400000000
        |          THEN struct_pack(a := 2::BIGINT, b := acc.b)
        |        WHEN acc.a = 2 AND e.a = 3 AND e.b - acc.b <= 86400000000
        |          THEN struct_pack(a := 3::BIGINT, b := acc.b)
        |        ELSE acc END).a AS stage_reached
        |  FROM coded GROUP BY user_id)
        |SELECT stage_reached, COUNT(*) AS n_users
        |FROM folded GROUP BY 1 ORDER BY 1""".stripMargin,
    "q81_cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS t_us FROM events),
        |wk AS (
        |  SELECT DISTINCT user_id,
        |    t_us - (t_us % 604800000000) AS week FROM ev),
        |ch AS (
        |  SELECT user_id, MIN(week) AS cohort_week FROM wk
        |  GROUP BY 1)
        |SELECT make_timestamp(ch.cohort_week) AS cohort_week,
        |  CAST((wk.week - ch.cohort_week) // 604800000000 AS INT)
        |    AS weeks_since,
        |  COUNT(DISTINCT wk.user_id) AS active_users
        |FROM wk JOIN ch USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q67_salted_join" ->
      """WITH dim AS (SELECT user_id, COUNT(*) AS user_events
        |             FROM events GROUP BY 1)
        |SELECT e.event_id, e.user_id, d.user_events
        |FROM events e JOIN dim d USING (user_id)
        |ORDER BY e.event_id""".stripMargin,
    "q65_range_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, epoch_us(ts) AS t_us, value
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id,
        | COUNT(*) AS views_1h,
        | CAST(SUM(CAST(v.value AS DECIMAL(18,4))) AS DOUBLE)
        |   AS view_value_1h
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND v.t_us BETWEEN p.t_us - 3600000000 AND p.t_us - 1
        |GROUP BY p.event_id, p.user_id
        |ORDER BY p.event_id""".stripMargin,
    "q64_asof_join" ->
      """WITH v AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
        | (SELECT v.ts FROM v WHERE v.user_id = p.user_id
        |    AND v.ts <= p.ts
        |  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_ts,
        | (SELECT v.value FROM v WHERE v.user_id = p.user_id
        |    AND v.ts <= p.ts
        |  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1)
        |   AS last_view_value
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q110_session_windows" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts,
        |    SUM(CASE WHEN prev IS NULL
        |      OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // Same contract as q64, planned through the custom physical
    // as-of operator — the oracle is deliberately identical.
    "q104_asof_merge" ->
      """WITH v AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
        | (SELECT v.ts FROM v WHERE v.user_id = p.user_id
        |    AND v.ts <= p.ts
        |  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_ts,
        | (SELECT v.value FROM v WHERE v.user_id = p.user_id
        |    AND v.ts <= p.ts
        |  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1)
        |   AS last_view_value
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q60_event_pivot" ->
      """SELECT date_trunc('day', ts) AS day,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS click,
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS error,
        | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS purchase,
        | CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS signup,
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q61_nearby_activity" ->
      """SELECT event_id, user_id, COUNT(*) OVER (
        |  PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 60000000 PRECEDING AND 60000000 FOLLOWING)
        |  AS nearby_events
        |FROM events ORDER BY event_id""".stripMargin,
    "q46_sliding_windows" ->
      """WITH assigned AS (
        | SELECT event_type, value, unnest([
        |   time_bucket(INTERVAL '30 minutes', ts),
        |   time_bucket(INTERVAL '30 minutes', ts)
        |     - INTERVAL '30 minutes']) AS window_start
        | FROM events)
        |SELECT window_start, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |   AS total_value
        |FROM assigned GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q41_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, ts FROM (
        | SELECT user_id, event_id, event_type, ts, value, props,
        |  ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q42_phase_transitions" ->
      """WITH seq AS (
        | SELECT user_id, event_type, ts, event_id,
        |  lag(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev_status,
        |  lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev_us
        | FROM events)
        |SELECT prev_status AS from_status, event_type AS to_status,
        | COUNT(*) AS n,
        | MIN(CAST(epoch_us(ts) - prev_us AS DOUBLE) / 1000000.0)
        |   AS min_sec,
        | MAX(CAST(epoch_us(ts) - prev_us AS DOUBLE) / 1000000.0)
        |   AS max_sec
        |FROM seq WHERE prev_status IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_status, to_status""".stripMargin,
    "q16_daily_throughput" ->
      """SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q17_hourly_error_rate" ->
      """SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n,
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
        |   / COUNT(*) AS error_rate
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    "q18_value_stats" ->
      """SELECT event_type, COUNT(*) AS n,
        | MIN(value) AS min_value, MAX(value) AS max_value,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)/COUNT(value) AS avg_value,
        | median(value) AS median_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q19_user_sessions" ->
      """WITH g AS (
        | SELECT user_id,
        |  CASE WHEN lag(epoch_us(ts), 1) OVER (
        |     PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |   OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |     PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |   THEN 1 ELSE 0 END AS new_session
        | FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(new_session) AS BIGINT) AS n_sessions
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q20_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,
    "q21_user_activity" ->
      """SELECT user_id, COUNT(*) AS n_events,
        | COUNT(DISTINCT event_type) AS n_types,
        | MIN(ts) AS first_ts, MAX(ts) AS last_ts,
        | (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS span_sec
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q22_event_type_share" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM events) AS share
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
