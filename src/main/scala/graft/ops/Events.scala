package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table
  * (event_id, ts, user_id, event_type, value, props): tumbling-window
  * aggregation and gap-based sessionization. Batch forms here (both
  * DuckDB-oracle-checkable); [[graft.streaming.StreamingIngest]] runs the
  * same tumbling aggregation through Structured Streaming with a watermark
  * and is gated batch==stream in StreamingSpec.
  */
object Events {

  def load(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** Tumbling 1-hour windows per event_type: count + sum(value).
    * `window()` is the native Spark form; output flattened to epoch
    * seconds so the oracle compare is timezone-proof.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("ws", "event_type")

  /** Gap-based sessionization (30-min inactivity): classic lag + cumulative
    * flag window pattern; one shuffle on user_id, then per-user ordered
    * scan — the distributed shape that survives arbitrary user counts.
    */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val flagged = events
      // NTZ -> TIMESTAMP (session tz pinned UTC) so fractional-epoch casts resolve
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          // full-precision fractional seconds: micros/1e6 in double is the
          // same IEEE value DuckDB's epoch() computes
          col("ts").cast("double") - col("prev_ts").cast("double") > gapMinutes * 60.0)
          .cast("int"))
      .withColumn("session_seq",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy("user_id", "session_seq")
      .agg(unix_timestamp(min("ts")).as("session_start"),
        unix_timestamp(max("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_seq")
  }

  /** Semi-structured extraction + rollup: parse the `props` JSON column
    * (`get_json_object` is codegen'd, no UDF), bucket the extracted key,
    * aggregate per (event_type, bucket) — the classic web-scale
    * "JSON-blob column you only ever need two fields of" shape; the JSON
    * path evaluates inside the scan projection, so column pruning still
    * reads only (event_type, value, props).
    */
  def propsRollup(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        (get_json_object(col("props"), "$.k").cast("int") / 10).cast("int")
          .as("k_bucket"),
        col("value"))
      .groupBy("event_type", "k_bucket")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("event_type", "k_bucket")

  /** AS-OF JOIN — Spark has no native asof operator; the scalable form is
    * the union-marker trick: tag both sides, union on (key, ts), and take
    * `last(right-payload, ignoreNulls)` over a per-key ordered window.
    * ONE shuffle on the key and a per-key ordered scan — crucially NOT a
    * range join (`l.ts >= r.ts` as a join condition explodes to
    * O(|L|·|R|) per key before the argmax; the window form is
    * O(|L|+|R| log) per key and survives any per-user event count).
    *
    * Semantics match DuckDB `ASOF LEFT JOIN ... ON l.user_id = r.user_id
    * AND l.ts >= r.ts`: each left event of `leftType` gets the payload of
    * the latest `rightType` event with r.ts <= l.ts (ties included — the
    * right marker sorts before the left marker at equal ts). The right
    * side is pre-aggregated to one row per (user_id, ts) so the result is
    * deterministic even if two right events share a timestamp.
    */
  def asOfAttribution(events: DataFrame, leftType: String = "purchase",
                      rightType: String = "click"): DataFrame = {
    val left = events.filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("value"))
    val right = events.filter(col("event_type") === rightType)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .groupBy("user_id", "ts")
      .agg(round(max("value"), 4).as("r_value"))
    val tagged = right
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
        col("ts").as("r_ts0"), col("r_value").as("r_value0"))
      .union(left.select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id"), col("value"),
        lit(null).cast("timestamp").as("r_ts0"),
        lit(null).cast("double").as("r_value0")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("r_ts", last("r_ts0", ignoreNulls = true).over(w))
      .withColumn("r_value", last("r_value0", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("ets"),
        round(col("value"), 4).as("value"), unix_timestamp(col("r_ts")).as("click_ts"),
        col("r_value").as("click_value"))
      .orderBy("event_id")
  }

  /** RETENTION COHORTS at day granularity: each user's cohort is the epoch
    * day of their first event; `users` counts the distinct users of cohort
    * `cohort_day` active again `days_since` days later — the standard
    * product-analytics retention triangle. Two shuffles total (the per-user
    * first-event min, then the (cohort_day, days_since) rollup over
    * DISTINCT per-user-per-day activity — the distinct folds into the
    * rollup's partial aggregation). Day indices are pure integer epoch
    * math (`floor(epoch/86400)`), so the gate is timezone- and
    * DST-proof — no calendar truncation semantics to align between
    * engines.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val eday = floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
      .cast("long")
    val byUser = events.select(col("user_id"), eday.as("eday"))
    val cohort = byUser.groupBy("user_id").agg(min("eday").as("cohort_day"))
    byUser.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_day"),
        (col("eday") - col("cohort_day")).as("days_since"))
      .distinct()
      .groupBy("cohort_day", "days_since")
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_day", "days_since")
  }

  /** ORDERED FUNNEL conversion: of the users who performed step 1, how
    * many went on to step 2 STRICTLY AFTER their first step-1 event, and
    * then step 3 strictly after that — the product-analytics funnel in
    * its min-time-chain form (first qualifying time per step, each step's
    * clock starting at the previous step's time). One shuffle total: all
    * three chained `min(CASE...)` windows share the user_id partitioning,
    * so Catalyst reuses a single exchange; the final rollup is a scalar
    * aggregate. Returns one row per step:
    * (step, event_type, users, conv_pct) with conv_pct = users/step-1
    * users rounded to 6 dp.
    */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("signup", "click", "purchase")): DataFrame = {
    require(steps.length == 3, "funnel expects exactly 3 steps")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val e1 = events.withColumn("t1",
      min(when(col("event_type") === steps(0), col("ts"))).over(w))
    val e2 = e1.withColumn("t2",
      min(when(col("event_type") === steps(1) && col("ts") > col("t1"),
        col("ts"))).over(w))
    val e3 = e2.withColumn("t3",
      min(when(col("event_type") === steps(2) && col("ts") > col("t2"),
        col("ts"))).over(w))
    val per = e3.groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
    val tot = per.agg(
      count(col("t1")).as("u1"), count(col("t2")).as("u2"),
      count(col("t3")).as("u3"))
    val rows = tot.select(explode(array(
      struct(lit(1).as("step"), lit(steps(0)).as("event_type"),
        col("u1").as("users"), col("u1").as("base")),
      struct(lit(2).as("step"), lit(steps(1)).as("event_type"),
        col("u2").as("users"), col("u1").as("base")),
      struct(lit(3).as("step"), lit(steps(2)).as("event_type"),
        col("u3").as("users"), col("u1").as("base")))).as("r"))
    rows.select(col("r.step").as("step"), col("r.event_type").as("event_type"),
        col("r.users").as("users"),
        round(col("r.users").cast("double") / col("r.base"), 6).as("conv_pct"))
      .orderBy("step")
  }

  /** DuckDB twin of [[funnel]]: the same chained min-CASE windows over the
    * user partition, counted and unpivoted to one row per step.
    */
  def funnelSql(steps: Seq[String] = Seq("signup", "click", "purchase")): String =
    s"""WITH s1 AS (SELECT user_id, ts, event_type,
  min(CASE WHEN event_type = '${steps(0)}' THEN ts END)
    OVER (PARTITION BY user_id) AS t1 FROM events),
s2 AS (SELECT user_id, ts, event_type, t1,
  min(CASE WHEN event_type = '${steps(1)}' AND ts > t1 THEN ts END)
    OVER (PARTITION BY user_id) AS t2 FROM s1),
s3 AS (SELECT user_id, t1, t2,
  min(CASE WHEN event_type = '${steps(2)}' AND ts > t2 THEN ts END)
    OVER (PARTITION BY user_id) AS t3 FROM s2),
per AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
  FROM s3 GROUP BY user_id),
tot AS (SELECT count(t1) AS u1, count(t2) AS u2, count(t3) AS u3 FROM per)
SELECT step, event_type, users, round(CAST(users AS DOUBLE) / base, 6) AS conv_pct
FROM (
  SELECT 1 AS step, '${steps(0)}' AS event_type, u1 AS users, u1 AS base FROM tot
  UNION ALL
  SELECT 2, '${steps(1)}', u2, u1 FROM tot
  UNION ALL
  SELECT 3, '${steps(2)}', u3, u1 FROM tot)
ORDER BY step"""

  /** ROLLING ACTIVE USERS — the DAU/WAU stickiness table every product
    * dashboard carries: for each calendar day with activity, the count of
    * distinct users active THAT day (dau), the count of distinct users
    * active in the 7-day window ENDING that day (wau), and the
    * dau/wau stickiness ratio at 6 dp. Day indices are the same pure
    * integer epoch-day math as [[retentionCohorts]] (timezone/DST-proof).
    *
    * Plan shape at 100 TB: the event stream collapses to distinct
    * (user, day) ONCE (the first shuffle — partial-agg combines dominate,
    * since a user's events cluster within days); wau then explodes each
    * (user, day) to the `window` day-ends it supports (a fixed ×7 map-side
    * fan-out of 16-byte rows, never event-scale) into a distinct count per
    * window end. No self-join over day offsets, no per-day re-scan of the
    * events table; a rolling DISTINCT cannot fold into a window-function
    * sum (daily distincts are not additive), so the explode-to-window-end
    * form IS the exact linear plan.
    */
  def activeUsers(events: DataFrame, window: Int = 7): DataFrame = {
    val eday = floor(unix_timestamp(col("ts").cast("timestamp")) / 86400L)
      .cast("long")
    val ud = events.select(col("user_id"), eday.as("day")).distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(window - 1))).as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 6)
          .as("stickiness"))
      .orderBy("day")
  }

  /** DuckDB twin of [[activeUsers]]: same epoch-day math, same distinct
    * (user, day) base, same explode-to-window-end distinct count.
    */
  def activeUsersSql(window: Int = 7): String =
    s"""WITH ud AS (SELECT DISTINCT user_id,
  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM (
  SELECT user_id, day + o AS day
  FROM ud CROSS JOIN (SELECT unnest(range(${window})) AS o)) GROUP BY day)
SELECT day, dau, wau,
  round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness
FROM dau JOIN wau USING (day) ORDER BY day"""

  /** DuckDB twin of [[retentionCohorts]]. */
  val retentionSql: String =
    """WITH e AS (SELECT user_id,
  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS eday FROM events),
c AS (SELECT user_id, min(eday) AS cohort_day FROM e GROUP BY user_id),
d AS (SELECT DISTINCT e.user_id, c.cohort_day,
             e.eday - c.cohort_day AS days_since
      FROM e JOIN c USING (user_id))
SELECT cohort_day, days_since, count(*) AS users
FROM d GROUP BY 1, 2 ORDER BY 1, 2"""

  def asOfAttributionSql(leftType: String = "purchase",
                         rightType: String = "click"): String =
    s"""WITH l AS (SELECT event_id, user_id, ts, round(value, 4) AS value
           FROM events WHERE event_type = '$leftType'),
     r AS (SELECT user_id, ts, round(max(value), 4) AS r_value
           FROM events WHERE event_type = '$rightType' GROUP BY 1, 2)
SELECT l.event_id, l.user_id,
       CAST(floor(epoch(l.ts)) AS BIGINT) AS ets, l.value,
       CAST(floor(epoch(r.ts)) AS BIGINT) AS click_ts, r.r_value AS click_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id"""

  /** DuckDB twins. */
  val propsRollupSql: String =
    """SELECT event_type,
       CAST(CAST(props->>'$.k' AS INTEGER) // 10 AS INTEGER) AS k_bucket,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY event_type, k_bucket"""

  /** SLIDING 1-hour windows on a 15-minute slide, per event_type — the
    * hopping-window form the tumbling query doesn't cover (dashboards
    * plot the 1 h trailing rate every 15 min; each event belongs to
    * exactly 4 overlapping windows). Value sums go through integer
    * 10^-4 units so the 4x fan-out cannot surface float addend-order
    * noise across engines.
    *
    * Plan shape at 100 TB: Spark's native `window(ts, 1h, 15m)` plans as
    * a 4-row Expand (each event fans to its 4 windows MAP-SIDE) into the
    * one (window, type) partial+final count — exactly the tumbling plan
    * with a bounded constant fan-out, one shuffle total.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000, 0).cast("long")).as("sum_mval"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
        col("n"), col("sum_mval"))

  /** DuckDB twin of [[slidingCounts]]: the 4 aligned window starts
    * containing an event at epoch second es are ((es // 900) - k) * 900
    * for k in 0..3 (slide 900 s, width 3600 s, epoch-aligned — Spark's
    * `window()` alignment).
    */
  val slidingSql: String =
    """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es,
  CAST(round(value * 10000, 0) AS BIGINT) AS mv FROM events),
w AS (SELECT event_type, mv, ((es // 900) - k) * 900 AS ws
  FROM e, (SELECT unnest(range(0, 4)) AS k))
SELECT ws, event_type, count(*) AS n, CAST(sum(mv) AS BIGINT) AS sum_mval
FROM w GROUP BY 1, 2 ORDER BY ws, event_type"""

  val tumblingSql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY ws, event_type"""

  def sessionsSql(gapMinutes: Int = 30): String =
    s"""WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > ${gapMinutes * 60}.0
              THEN 1 ELSE 0 END AS new_session
  FROM events),
numbered AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged)
SELECT user_id, session_seq,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_seq ORDER BY user_id, session_seq"""

  /** Deterministic synthetic maintenance/campaign windows over the event
    * table's own time span (the synthetic-robots-rules precedent — no
    * external data): k slots of integer `step` seconds; window i covers
    * [smin + i·step + step/4, smin + i·step + 3·step/4] — gaps between
    * slots — and every 4th window instead runs 2·step past its start:
    * deliberate OVERLAPS so the interval join's latest-start-wins rule
    * is exercised. Integer epoch math end-to-end (timezone/DST-proof,
    * the retention-cohorts device).
    */
  def syntheticWindows(events: DataFrame, k: Int = 24): DataFrame =
    events.agg(
        min(unix_timestamp(col("ts").cast("timestamp"))).as("smin"),
        max(unix_timestamp(col("ts").cast("timestamp"))).as("smax"))
      .select(col("smin"),
        greatest(expr(s"(smax - smin) div $k"), lit(1L)).as("step"))
      .select(col("smin"), col("step"),
        explode(sequence(lit(0), lit(k - 1))).as("wid"))
      .select(col("wid"),
        (col("smin") + col("wid") * col("step") + expr("step div 4"))
          .as("ws"),
        when(pmod(col("wid"), lit(4)) === 0,
          col("smin") + col("wid") * col("step") + expr("step div 4") +
            lit(2L) * col("step"))
          .otherwise(col("smin") + col("wid") * col("step") +
            expr("(3 * step) div 4")).as("we"))

  /** INTERVAL (range-containment) JOIN — each event matched to its
    * containing window, latest-start-wins on overlap (ties → higher id),
    * null when uncovered. Spark has no native interval join, and the
    * naive `ON es BETWEEN ws AND we` condition plans as a nested-loop
    * range join that explodes per overlapping pair. The scalable form is
    * SLAB PARTITIONING (the standard production interval-join layout):
    * time is cut into `slabs` fixed-width slabs over the window table's
    * span, each window replicates to the slabs it overlaps (replication
    * bounded by length/slabWidth), each event buckets to exactly ONE
    * slab, and the match is an EQUI-join on slab + a row-local
    * containment filter + a per-event max(struct(ws, wid)) argmax.
    * One event-side shuffle, no range explosion. (At this corpus scale
    * Catalyst broadcasts the replicated window side outright; at 10⁸
    * ranges the same plan shuffles both sides on slab — the layout is
    * scale-ready either way.)
    */
  def intervalJoin(events: DataFrame, windows: DataFrame,
                   slabs: Int = 256): DataFrame = {
    val span = windows.agg(min("ws").as("lo"),
        greatest(max("we") - min("ws"), lit(1L)).as("len"))
      .select(col("lo"), greatest(expr(s"len div $slabs"), lit(1L)).as("sw"))
    val wSlab = windows.crossJoin(broadcast(span))
      .select(col("wid"), col("ws"), col("we"),
        explode(sequence(expr("(ws - lo) div sw"), expr("(we - lo) div sw")))
          .as("slab"))
    val base = events.select(col("event_id"),
      unix_timestamp(col("ts").cast("timestamp")).as("es"))
    val matched = base.crossJoin(broadcast(span))
      .select(col("event_id"), col("es"), expr("(es - lo) div sw").as("slab"))
      .join(wSlab, Seq("slab"))
      .where(col("es") >= col("ws") && col("es") <= col("we"))
      .groupBy("event_id")
      .agg(max(struct(col("ws"), col("wid"))).as("m"))
      .select(col("event_id"), col("m.ws").as("window_start"),
        col("m.wid").as("wid"))
    base.join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("es"), col("wid"), col("window_start"))
  }

  /** Event-type TRANSITION MATRIX — the Markov view of user behaviour
    * (what follows what, and with what probability) that funnels and
    * sessions don't give: per-user ts-ordered `lead` pairs rolled up to
    * global (from_type, to_type) counts with row-normalized transition
    * probabilities. ONE user-keyed shuffle + per-user ordered scan (the
    * sessionization shape), then a types²-scale rollup; the tiny pair
    * table is localCheckpointed because it feeds both the row totals
    * and the final join (Catalyst shares no subtrees — without it the
    * corpus-scale window pass runs twice). Ordering ties broken by
    * event_id, so the pair stream is deterministic in both engines.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = pairs.groupBy(col("from_type").as("ft"))
      .agg(sum("n").as("t"))
    pairs.join(tot, col("from_type") === col("ft"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("t").cast("double"), 6).as("p"))
  }

  /** DuckDB twin of [[eventTransitions]]. */
  def eventTransitionsSql: String =
    """WITH s AS (SELECT event_type,
  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS next_type
  FROM events),
p AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t FROM p
  GROUP BY from_type)
SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
  round(CAST(p.n AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS p
FROM p JOIN t USING (from_type) ORDER BY from_type, to_type"""

  /** DuckDB twin of [[intervalJoin]] over [[syntheticWindows]] — the
    * direct BETWEEN-join form the slab layout must reproduce exactly,
    * same integer window synthesis, same latest-start/highest-id pick.
    */
  def intervalJoinSql(k: Int = 24): String =
    s"""WITH b AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS smin,
  CAST(floor(epoch(max(ts))) AS BIGINT) AS smax FROM events),
st AS (SELECT smin, greatest((smax - smin) // $k, 1) AS step FROM b),
w AS (SELECT wid,
  smin + wid * step + step // 4 AS ws,
  CASE WHEN wid % 4 = 0 THEN smin + wid * step + step // 4 + 2 * step
       ELSE smin + wid * step + (3 * step) // 4 END AS we
  FROM st, (SELECT unnest(range(0, $k)) AS wid)),
e AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
j AS (SELECT e.event_id, w.wid, w.ws,
  row_number() OVER (PARTITION BY e.event_id
    ORDER BY w.ws DESC, w.wid DESC) AS rn
  FROM e JOIN w ON e.es >= w.ws AND e.es <= w.we)
SELECT e.event_id, e.es, CAST(j.wid AS INTEGER) AS wid,
  j.ws AS window_start
FROM e LEFT JOIN (SELECT event_id, wid, ws FROM j WHERE rn = 1) j
  USING (event_id)
ORDER BY event_id"""

  /** Daily volume ANOMALY flags per event type — the monitoring query
    * every event pipeline runs against itself ("did checkout volume fall
    * off a cliff on Tuesday?"): for each (event_type, day), the day's
    * event count, its z-score against the type's own daily history, and
    * an `is_anomaly` flag at |z| > 2.
    *
    * Exactness device: mean/stddev from floating accumulation
    * (`stddev_samp`) is summation-order-sensitive and would flicker a
    * cross-engine hash gate. Instead the per-type moments are EXACT
    * INTEGERS — n days, sum(c), sum(c*c) over integer daily counts — and
    * the population z-score is computed from them in closed form:
    * `z = (n*c - S1) / sqrt(n*S2 - S1^2)`, one deterministic sqrt and one
    * division per row, identical IEEE in both engines, 6-dp rounded. A
    * constant-volume type (zero variance) gets z = null, never a 0/0.
    *
    * Plan shape at 100 TB: ONE corpus-scale shuffle — the (event_type,
    * day) partial+final count; everything after runs on the tiny
    * (types x days) table (calendar-bounded, not data-bounded): a
    * type-keyed moment aggregate and a broadcast-sized join back.
    * Day keys are epoch-seconds BIGINTs (the [[tumblingCounts]]
    * convention) so the gate never hashes engine-specific date types.
    */
  def dailyAnomalies(events: DataFrame, zCut: Double = 2.0): DataFrame = {
    val daily = events
      .select(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"))
      .groupBy("event_type", "day_s").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val mom = daily.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"), sum("c").as("s1"),
        sum(col("c") * col("c")).as("s2"))
    daily.join(mom, col("event_type") === col("et"))
      .select(col("event_type"), col("day_s"), col("c"),
        // moments in decimal(38,0): s1 > ~3.04e9 events of one type makes
        // s1*s1 wrap a BIGINT (silently under non-ANSI Spark, loudly in
        // DuckDB) — decimal keeps the closed form exact to 10^38
        (col("n").cast("decimal(38,0)") * col("s2") -
          col("s1").cast("decimal(38,0)") * col("s1")).as("varnum"),
        (col("n") * col("c") - col("s1")).as("znum"))
      .select(col("event_type"), col("day_s"), col("c"),
        when(col("varnum") > 0L,
          round(col("znum").cast("double") /
            sqrt(col("varnum").cast("double")), 6)).as("z"))
      .withColumn("is_anomaly",
        when(col("z").isNotNull && abs(col("z")) > zCut, lit(1))
          .otherwise(lit(0)))
  }

  /** DuckDB twin of [[dailyAnomalies]] — same integer-moment closed form. */
  def dailyAnomaliesSql(zCut: Double = 2.0): String =
    s"""WITH d AS (SELECT event_type,
  CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s, count(*) AS c
  FROM events GROUP BY 1, 2),
m AS (SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s1,
  CAST(sum(c * c) AS BIGINT) AS s2 FROM d GROUP BY event_type),
-- varnum in HUGEINT (s1*s1 outgrows BIGINT past ~3e9 events/type; the
-- engine twin uses decimal(38,0)); z defined ONCE so the flag can never
-- drift from the emitted value
zz AS (SELECT d.event_type, d.day_s, d.c,
  CAST(m.n AS HUGEINT) * m.s2 - CAST(m.s1 AS HUGEINT) * m.s1 AS varnum,
  m.n * d.c - m.s1 AS znum FROM d JOIN m USING (event_type)),
z AS (SELECT event_type, day_s, c,
  CASE WHEN varnum > 0 THEN
    round(CAST(znum AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE)), 6) END AS z
  FROM zz)
SELECT event_type, day_s, CAST(c AS BIGINT) AS c, z,
  CASE WHEN z IS NOT NULL AND abs(z) > $zCut THEN 1 ELSE 0 END AS is_anomaly
FROM z ORDER BY event_type, day_s"""

  // --- out-of-orderness / late-data profile --------------------------------

  /** Per-type OUT-OF-ORDERNESS profile — the table read before choosing a
    * Structured Streaming `withWatermark` delay: for each event, lateness
    * = how far its event time lags the high-watermark (running max event
    * time) of everything that ARRIVED before it; the per-type p95/p99/max
    * quantiles are exactly the candidate watermark delays (an event later
    * than the chosen delay is dropped by the engine, so p99 bounds the
    * loss rate at 1%).
    *
    * The testdata stream is perfectly ordered (ts monotone in event_id),
    * so ARRIVAL ORDER is synthesized deterministically — the
    * [[Urls.syntheticUrl]]-family device, mirrored in the twin: each
    * event's arrival slot is its id displaced by a sha256-derived jitter
    * of 0-7 slots scaled by 2 (`arr = id*1 + jitter*2` creates genuine
    * bounded inversions between neighbors, the reordering profile of a
    * sharded producer fleet).
    *
    * Exactness: event time in integer EPOCH MICROS; the high-watermark is
    * an integer running max; lateness an integer difference. Only the
    * quantiles interpolate — both engines share the linear-interpolation
    * definition (the a9_length_dist device) and divide by 1e6 in the same
    * written order.
    *
    * Plan at 100 TB: ONE event_type-keyed shuffle feeding a per-type
    * ordered scan whose state is one long (the running max) — the
    * sessionization plan family — then a type-cardinality rollup. No
    * global sort, no driver state.
    */
  def latenessProfile(events: DataFrame): DataFrame = {
    val jitter = pmod(
      conv(substring(sha2(concat(lit("a"), col("event_id").cast("string")),
        256), 1, 8), 16, 10).cast("long"), lit(8L))
    val arr = (col("event_id") + jitter * 2).as("arr")
    val w = Window.partitionBy("event_type")
      .orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_type"), col("event_id"), arr,
        // the parquet column is TIMESTAMP_NTZ; the session is pinned UTC,
        // so the cast is the same wall-clock DuckDB's naive epoch_us reads
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .withColumn("late_us",
        greatest(lit(0L), coalesce(max(col("ts_us")).over(w) - col("ts_us"),
          lit(0L))))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        round(expr("percentile(late_us, 0.5D)") / 1e6, 6).as("p50_late_s"),
        round(expr("percentile(late_us, 0.95D)") / 1e6, 6).as("p95_late_s"),
        round(expr("percentile(late_us, 0.99D)") / 1e6, 6).as("p99_late_s"),
        round(max(col("late_us")) / 1e6, 6).as("max_late_s"))
      .orderBy("event_type")
  }

  /** DuckDB twin of the `w12_lateness` gate. */
  def latenessProfileSql: String =
    """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
    event_id + (CAST('0x' || substr(sha256('a' || event_id), 1, 8) AS UBIGINT) % 8) * 2
      AS arr
  FROM events),
l AS (SELECT event_type,
    greatest(0, coalesce(max(ts_us) OVER (PARTITION BY event_type
      ORDER BY arr, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts_us, 0))
      AS late_us
  FROM e)
SELECT event_type, count(*) AS n_events,
  CAST(count(*) FILTER (WHERE late_us > 0) AS BIGINT) AS n_late,
  round(quantile_cont(late_us, 0.5) / 1e6, 6) AS p50_late_s,
  round(quantile_cont(late_us, 0.95) / 1e6, 6) AS p95_late_s,
  round(quantile_cont(late_us, 0.99) / 1e6, 6) AS p99_late_s,
  round(max(late_us) / 1e6, 6) AS max_late_s
FROM l GROUP BY event_type ORDER BY event_type"""
}
