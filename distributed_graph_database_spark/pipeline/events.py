"""Event-stream analytics over `events` — batch contract versions.

- `events_tumbling`: 1-hour tumbling-window counts/sums per event
  type. Batch uses `window(ts, '1 hour')` (identical bucketing to
  `date_trunc('hour')` for aligned windows, which is what the oracle
  uses); the streaming twin in streaming/events_stream.py adds
  `withWatermark` and is smoke-checked against this batch output.
- `events_sessionize`: 30-minute-gap sessionization per user: a lag
  diff marks session starts, a running sum numbers sessions, then one
  aggregate per session. Pure window algebra — the classic batch
  sessionize; the streaming twin uses `session_window`.

Value columns use the integer-cents encoding (see relational.py) so
sums hash identically across engines.

Scale: both queries shuffle once by their natural key (window/user) —
at 100 TB the sessionize window partitions by user_id, which is
high-cardinality and unskewed; AQE handles any hot user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table

SESSION_GAP_MIN = 30


def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling rollup → (hour, event_type, n_events,
    sum_value_cents, n_users)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").cast("string").alias("hour"),
            "event_type",
            "n_events",
            "sum_value_cents",
            "n_users",
        )
    )


ORACLE_EVENTS_TUMBLING = """
SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (gap > SESSION_GAP_MIN minutes ⇒
    new session) → (user_id, session_start, session_end, n_events,
    sum_value_cents)."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(order)
    with_flag = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    numbered = with_flag.withColumn(
        "session_no",
        F.sum("new_session").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").cast("string").alias("session_start"),
            F.max("ts").cast("string").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_value_cents"),
        )
        .select(
            "user_id", "session_no", "session_start", "session_end",
            "n_events", "sum_value_cents",
        )
    )


ORACLE_EVENTS_SESSIONIZE = f"""
WITH o AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN EPOCH(ts) - LAG(EPOCH(ts)) OVER w IS NULL
                OR EPOCH(ts) - LAG(EPOCH(ts)) OVER w > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
n AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       CAST(MIN(ts) AS VARCHAR) AS session_start,
       CAST(MAX(ts) AS VARCHAR) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM n GROUP BY user_id, session_no
"""


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every 'click' event, the most recent 'view' by
    the same user at-or-before the click (funnel attribution) →
    (click_id, user_id, click_ts, view_id, view_ts, lag_seconds).

    Implemented as the LINEAR merge-scan, not a range join: tag both
    sides, single shuffle on user_id, sort within partition by
    (ts, views-before-clicks, event_id), then `last(view, ignorenulls)`
    over the running window carries the newest view forward to each
    click. Cost is one shuffle + one sort — O(n log n) per user — where
    a pairwise `v.ts <= c.ts` range join is quadratic per user and is
    exactly the plan shape that dies at 100 TB. Tie rule (pinned in
    both engines): a view at the same timestamp as the click counts;
    among ties, max event_id wins. Clicks with no prior view keep
    sentinel values (-1 / '') so the output is null-free.
    """
    ev = table(spark, sf_dir, "events")
    return asof_join_frame(ev)


def asof_join_frame(ev: DataFrame) -> DataFrame:
    """The merge-scan core of events_asof_join over any frame with
    (event_id, ts, user_id, event_type) — split out so property tests
    can drive it with random event sets."""
    ev = ev.filter(F.col("event_type").isin("click", "view"))
    # views sort before clicks at equal ts => `<=` as-of semantics
    order = Window.partitionBy("user_id").orderBy(
        "ts", (F.col("event_type") == "click").cast("int"), "event_id"
    )
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_view = F.col("event_type") == "view"
    carried = ev.withColumn(
        "view_id",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True).over(running),
    ).withColumn(
        "view_ts",
        F.last(F.when(is_view, F.col("ts")), ignorenulls=True).over(running),
    )
    return (
        carried.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").cast("string").alias("click_ts"),
            F.coalesce("view_id", F.lit(-1)).alias("view_id"),
            F.coalesce(F.col("view_ts").cast("string"), F.lit("")).alias("view_ts"),
            F.coalesce(
                F.col("ts").cast("long") - F.col("view_ts").cast("long"), F.lit(-1)
            ).alias("lag_seconds"),
        )
    )


def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional as-of join: for every 'click', the NEAREST 'view'
    by the same user in either time direction → (click_id, user_id,
    click_ts, view_id, view_ts, lag_seconds, direction). The
    attribution variant used when instrumentation can log the view
    after the click (clock skew, batched beacons).

    Same linear merge-scan as events_asof_join — one shuffle on
    user_id, one sort — but BOTH carries over the sorted run: `last`
    over the preceding frame (newest view at-or-before) and `first`
    over the following frame (oldest view strictly after), then an
    arithmetic argmin picks the nearer side per click. Still O(n log n)
    per user; a |Δt| range join would be quadratic. Tie rules, pinned
    identically in the oracle: equal |lag| → backward wins; equal-ts
    backward views → max event_id; equal-ts forward views → min
    event_id. lag_seconds is SIGNED (click − view; ≥0 backward,
    <0 forward); clicks whose user has no views keep sentinels
    (-1 / '' / 0 / '')."""
    return asof_nearest_frame(table(spark, sf_dir, "events"))


def asof_nearest_frame(ev: DataFrame) -> DataFrame:
    """The dual-carry merge-scan core of events_asof_nearest — split
    out so property tests can drive it with random event sets."""
    ev = ev.filter(F.col("event_type").isin("click", "view"))
    order = Window.partitionBy("user_id").orderBy(
        "ts", (F.col("event_type") == "click").cast("int"), "event_id"
    )
    back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    is_view = F.col("event_type") == "view"
    carried = (
        ev.withColumn(
            "b_id", F.last(F.when(is_view, F.col("event_id")), ignorenulls=True).over(back)
        )
        .withColumn("b_ts", F.last(F.when(is_view, F.col("ts")), ignorenulls=True).over(back))
        .withColumn(
            "f_id", F.first(F.when(is_view, F.col("event_id")), ignorenulls=True).over(fwd)
        )
        .withColumn("f_ts", F.first(F.when(is_view, F.col("ts")), ignorenulls=True).over(fwd))
    )
    clicks = carried.filter(F.col("event_type") == "click")
    # distance argmin runs at FULL microsecond precision (event ts are
    # sub-second); only the reported lag flooring is per-second
    b_lag = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    f_lag = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    # backward wins when present and not strictly farther than forward
    use_back = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (b_lag <= f_lag)
    )
    view_id = F.when(use_back, F.col("b_id")).otherwise(F.col("f_id"))
    view_ts = F.when(use_back, F.col("b_ts")).otherwise(F.col("f_ts"))
    return clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").cast("string").alias("click_ts"),
        F.coalesce(view_id, F.lit(-1)).alias("view_id"),
        F.coalesce(view_ts.cast("string"), F.lit("")).alias("view_ts"),
        F.coalesce(
            F.col("ts").cast("long") - view_ts.cast("long"), F.lit(0)
        ).alias("lag_seconds"),
        F.when(view_id.isNull(), F.lit(""))
        .when(use_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
    )


# Nearest-view oracle: a LATERAL top-1 ordered by |Δt| with the exact
# tie cascade the merge-scan implements — backward beats forward at
# equal distance, backward ties take the max event_id, forward ties
# the min. A different algorithm on purpose: parity checks semantics.
ORACLE_EVENTS_ASOF_NEAREST = """
SELECT c.event_id AS click_id,
       c.user_id,
       CAST(c.ts AS VARCHAR) AS click_ts,
       COALESCE(v.event_id, -1) AS view_id,
       COALESCE(CAST(v.ts AS VARCHAR), '') AS view_ts,
       COALESCE(CAST(FLOOR(EPOCH(c.ts)) AS BIGINT)
                  - CAST(FLOOR(EPOCH(v.ts)) AS BIGINT), 0) AS lag_seconds,
       COALESCE(CASE WHEN v.ts <= c.ts THEN 'back' ELSE 'fwd' END, '') AS direction
FROM events c
LEFT JOIN LATERAL (
  SELECT e.event_id, e.ts
  FROM events e
  WHERE e.user_id = c.user_id AND e.event_type = 'view'
  ORDER BY ABS(epoch_us(c.ts) - epoch_us(e.ts)) ASC,
           (e.ts > c.ts) ASC,
           CASE WHEN e.ts <= c.ts THEN -e.event_id ELSE e.event_id END ASC
  LIMIT 1
) v ON TRUE
WHERE c.event_type = 'click'
"""


# The oracle states the *semantics* (latest view at-or-before, max
# event_id tiebreak) as a LATERAL top-1 — deliberately a different
# algorithm than Spark's merge-scan, so parity actually checks the
# as-of logic rather than mirroring it.
ORACLE_EVENTS_ASOF_JOIN = """
SELECT c.event_id AS click_id,
       c.user_id,
       CAST(c.ts AS VARCHAR) AS click_ts,
       COALESCE(v.event_id, -1) AS view_id,
       COALESCE(CAST(v.ts AS VARCHAR), '') AS view_ts,
       COALESCE(CAST(FLOOR(EPOCH(c.ts)) AS BIGINT)
                  - CAST(FLOOR(EPOCH(v.ts)) AS BIGINT), -1) AS lag_seconds
FROM events c
LEFT JOIN LATERAL (
  SELECT e.event_id, e.ts
  FROM events e
  WHERE e.user_id = c.user_id AND e.event_type = 'view' AND e.ts <= c.ts
  ORDER BY e.ts DESC, e.event_id DESC
  LIMIT 1
) v ON TRUE
WHERE c.event_type = 'click'
"""


WINDOW_TOPK = 3  # leaderboard depth per hour


def events_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window leaderboard: the top-WINDOW_TOPK spenders of every
    hour → (hour, rank, user_id, spend_cents) — the windowed top-k
    every ops dashboard runs (hot keys per interval, top talkers, top
    sellers).

    Two-level aggregation then rank: events collapse to (hour, user)
    spend FIRST (map-side combined — the shuffle carries one row per
    user-hour, not per event), then rank partitions by hour. Ties
    break by user_id so the leaderboard is deterministic. At 100 TB
    the rank window's partition is |users active in one hour| — never
    global; a skewed hour is one partition, handled by AQE."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
        "user_id",
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("spend_cents")
    )
    return rank_topk(per_user)


def rank_topk(per_user: DataFrame) -> DataFrame:
    """The leaderboard cut over a (hour, user_id, spend_cents) frame —
    ONE definition of the rank semantics (spend DESC, user_id
    tiebreak, top WINDOW_TOPK) shared by the batch key and its
    streaming twin's post-drain reduction, so the two can never
    diverge on tiebreak or k."""
    w = Window.partitionBy("hour").orderBy(
        F.col("spend_cents").desc(), F.col("user_id")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= WINDOW_TOPK)
        .select("hour", "rank", "user_id", "spend_cents")
    )


ORACLE_EVENTS_TOPK_WINDOW = f"""
WITH per_user AS (
  SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS hour, user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS spend_cents
  FROM events GROUP BY 1, 2
)
SELECT hour, rank, user_id, spend_cents FROM (
  SELECT hour, user_id, spend_cents,
         ROW_NUMBER() OVER (PARTITION BY hour
                            ORDER BY spend_cents DESC, user_id) AS rank
  FROM per_user) t
WHERE rank <= {WINDOW_TOPK}
"""


AB_Z = 2            # two-proportion significance threshold (z > 2 ≈ p < 0.046)
AB_CONV_MIN = 14    # "converted" = ≥ this many purchase events (≈ the median,
                    # so both outcomes are populated — an always-true flag
                    # would make the test vacuous on this testdata)


def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout, integer-exact: users split into two
    deterministic hash arms (the corpus_sample md5 idiom — never
    rand(), so re-runs and both engines assign identical arms),
    conversion = "user made ≥ AB_CONV_MIN purchases", compared with the
    two-proportion z-test → one row (n_a, conv_a, n_b, conv_b,
    significant).

    Cross-engine exactness: the z² threshold is evaluated with ZERO
    divisions — (ca·nb − cb·na)²·(na+nb) > Z²·c·(n−c)·na·nb over
    decimal(38,0) (c = ca+cb, n = na+nb) — the events_anomaly
    factoring applied to two proportions, so the verdict bit cannot
    ulp-flip. Both sides are degree-5 in the counts, so decimal(38,0)
    is exact only to ~4·10⁷ total users (38/5 ≈ 7.6 digits per
    factor, ADVICE r6). The decimal products are built with
    try_multiply/try_subtract, which yield NULL on overflow under
    BOTH ANSI and legacy mode (plain `*` would THROW under ANSI —
    Spark 4's default, so a plain-arithmetic "fallback" would be dead
    code and the query would crash in exactly the large-N regime it
    exists for); the verdict then COALESCEs to the same comparison in
    double — beyond the exact bound the bit is float-accurate
    (~15 significant digits on z², flippable only when z ≈ Z to 1
    ulp), never NULL and never an exception.

    Scale: one scan → per-user any-purchase flag (map-side combined),
    one 2-row arm aggregate; the experiment readout is O(users) work
    and O(1) output regardless of event volume."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 2
    )
    users = (
        ev.groupBy("user_id")
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int"))
                >= AB_CONV_MIN
            ).cast("int").alias("conv")
        )
        .select(arm.alias("arm"), "conv")
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("conv").cast("decimal(38,0)").alias("c"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("na"), F.col("c").alias("ca")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("nb"), F.col("c").alias("cb")
    )
    j = a.crossJoin(F.broadcast(b))  # 1×1
    return ab_verdict_frame(j)


def ab_verdict_frame(j: DataFrame) -> DataFrame:
    """The z²-comparison readout over a (na, ca, nb, cb) decimal(38,0)
    frame — exposed so the overflow arm is unit-testable on synthetic
    counts too large to stage as real events rows. Degree-≥3 products
    use try_multiply (NULL on overflow under ANSI and legacy alike;
    degree-2 products of int64-bounded counts always fit 38 digits),
    and the verdict COALESCEs to the double-precision shadow.

    The `exact` column (ADVICE r7) tells consumers which regime
    produced the bit: TRUE = the pure-integer decimal comparison
    (AB_Z is an integer, so z² is too — no float anywhere), FALSE =
    an intermediate overflowed 38 digits and the verdict came from
    the double shadow, where a z within ~1 ulp of AB_Z could flip.
    The oracle pins TRUE: decimal(38,0)'s degree-5 headroom (~4e7
    users) cannot overflow at any test sf, and the FALSE arm is
    pinned by test_ab_verdict_survives_decimal_overflow."""
    n = F.col("na") + F.col("nb")
    c = F.col("ca") + F.col("cb")
    diff = F.try_subtract(
        F.try_multiply(F.col("ca"), F.col("nb")),
        F.try_multiply(F.col("cb"), F.col("na")),
    )
    lhs = F.try_multiply(F.try_multiply(diff, diff), n)
    rhs = F.try_multiply(
        F.try_multiply(
            F.try_multiply(F.lit(AB_Z * AB_Z) * c, n - c), F.col("na")
        ),
        F.col("nb"),
    )
    # Double-precision shadow of the same division-free comparison:
    # the COALESCE target when any decimal product overflows to NULL.
    nd, cd = n.cast("double"), c.cast("double")
    diff_d = (
        F.col("ca").cast("double") * F.col("nb").cast("double")
        - F.col("cb").cast("double") * F.col("na").cast("double")
    )
    lhs_d = diff_d * diff_d * nd
    rhs_d = (
        F.lit(float(AB_Z * AB_Z)) * cd * (nd - cd)
        * F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return j.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("ca").cast("bigint").alias("conv_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("cb").cast("bigint").alias("conv_b"),
        F.coalesce(lhs > rhs, lhs_d > rhs_d).alias("significant"),
        (lhs.isNotNull() & rhs.isNotNull()).alias("exact"),
    )


ORACLE_EVENTS_AB_TEST = f"""
WITH u AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2 AS arm,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= {AB_CONV_MIN} THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(conv) AS HUGEINT) AS c
  FROM u GROUP BY arm
),
j AS (
  SELECT a.n AS na, a.c AS ca, b.n AS nb, b.c AS cb
  FROM (SELECT n, c FROM arms WHERE arm = 0) a,
       (SELECT n, c FROM arms WHERE arm = 1) b
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
       CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
       ((ca * nb - cb * na) * (ca * nb - cb * na) * (na + nb))
         > ({AB_Z * AB_Z} * (ca + cb) * (na + nb - ca - cb) * na * nb)
         AS significant,
       TRUE AS exact
FROM j
"""


FUNNEL_WINDOW_S = 30 * 60  # view→click attribution window


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel per user, composed on the as-of join: every
    click attributed to its latest prior view, counted as converted
    when the view→click lag is within FUNNEL_WINDOW_S →
    (user_id, n_clicks, n_attributed, n_converted).

    One more aggregate over the merge-scan — the funnel costs nothing
    beyond the as-of join's single shuffle (the groupBy re-uses the
    user_id partitioning)."""
    asof = events_asof_join(spark, sf_dir)
    return asof.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum((F.col("view_id") >= 0).cast("bigint")).alias("n_attributed"),
        F.sum(
            (
                (F.col("view_id") >= 0)
                & (F.col("lag_seconds") <= FUNNEL_WINDOW_S)
            ).cast("bigint")
        ).alias("n_converted"),
    )


ORACLE_EVENTS_FUNNEL = f"""
WITH attributed AS ({ORACLE_EVENTS_ASOF_JOIN})
SELECT user_id,
       COUNT(*) AS n_clicks,
       CAST(SUM(CASE WHEN view_id >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       CAST(SUM(CASE WHEN view_id >= 0 AND lag_seconds <= {FUNNEL_WINDOW_S}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM attributed GROUP BY user_id
"""


HOP_WINDOW = "1 hour"
HOP_SLIDE = "30 minutes"


def events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window rollup (1-hour windows sliding every 30 min —
    each event lands in exactly 2 windows) → (hop_start, event_type,
    n_events, sum_value_cents, n_users). Completes the window family
    next to `events_tumbling` (aligned) and `events_sessionize`
    (data-driven); the streaming twin is the same expression under
    `withWatermark`.

    Spark's `window(ts, size, slide)` expands each row to its
    size/slide windows JVM-side before the one shuffle on (window,
    type) — at 100 TB the 2× row expansion is the cost, paid before
    map-side partial aggregation so the shuffle still carries only
    partials."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", HOP_WINDOW, HOP_SLIDE).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_value_cents"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").cast("string").alias("hop_start"),
            "event_type",
            "n_events",
            "sum_value_cents",
            "n_users",
        )
    )


# Each event's two hop starts: its 30-min bucket and the one before
# (time_bucket's 2000-01-01 origin is 30-min aligned with Spark's
# epoch-aligned windows, so boundaries agree).
ORACLE_EVENTS_HOPPING = """
WITH hops AS (
  SELECT event_type, value, user_id,
         UNNEST([time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
                 time_bucket(INTERVAL '30 minutes', ts)]) AS wstart
  FROM events
)
SELECT CAST(wstart AS VARCHAR) AS hop_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM hops GROUP BY 1, 2
"""


RANGE_JOIN_BAND_S = 5 * 60  # view → any-user click window

# Skew guard: a viral burst puts millions of clicks into ONE 5-minute
# band — one reducer's partition under a bare bucket key. Each click is
# deterministically hash-salted into one of RANGE_JOIN_SALTS sub-keys
# and every view probes all salts of its two buckets, so a hot band
# splits across RANGE_JOIN_SALTS tasks at the price of a bounded
# (2×SALTS-row) probe expansion per view. Output-invariant by
# construction (each click holds exactly one (bucket, salt); a view
# probes each combination once) — pinned against brute force in
# tests/test_new_pipeline_ops.py and on boundary fixtures in
# tests/test_catalog_schema.py (VERDICT r4 item 7).
RANGE_JOIN_SALTS = 4


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global time-range join: for every view, count clicks by ANY
    user within the next RANGE_JOIN_BAND_S seconds → (view_id,
    n_clicks_5min). The shape `events_asof_join` cannot express —
    there is no user equi-key, so a naive formulation is a
    BroadcastNestedLoopJoin (banned by plan hygiene).

    Scale shape: band-bucketing manufactures the equi-key. Clicks are
    assigned to their epoch//band bucket; each view probes its own
    bucket and the next (a [ts, ts+band) interval spans at most 2) via
    a 2-element explode, then the exact range predicate filters
    residuals inside the hash join. Cost: 2× view rows through one
    equi-shuffle, never |views|×|clicks|. This is the standard
    interval-join recipe (Flink executes its interval joins the same
    way); the bucket key is additionally hash-salted (RANGE_JOIN_SALTS)
    so a hot band never concentrates on one reducer."""
    return range_join_frame(table(spark, sf_dir, "events"))


def range_join_frame(ev: DataFrame) -> DataFrame:
    """The band-bucketed core of events_range_join over any frame with
    (event_id, ts, event_type) — split out so property tests can drive
    it with random event sets (same pattern as asof_join_frame)."""
    band = F.lit(RANGE_JOIN_BAND_S)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"),
        (F.unix_timestamp("ts") / band).cast("bigint").alias("bucket"),
        F.pmod(F.hash("event_id"), F.lit(RANGE_JOIN_SALTS)).alias("salt"),
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
            (F.unix_timestamp("ts") / band).cast("bigint").alias("b0"),
        )
        .select(
            "view_id",
            "v_ts",
            F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket"),
        )
        .select(
            "view_id",
            "v_ts",
            "bucket",
            F.explode(
                F.array(*[F.lit(s) for s in range(RANGE_JOIN_SALTS)])
            ).alias("salt"),
        )
    )
    in_range = (
        F.col("c_ts").isNotNull()
        & (F.col("c_ts") >= F.col("v_ts"))
        & (
            F.col("c_ts")
            < F.col("v_ts") + F.expr(f"INTERVAL {RANGE_JOIN_BAND_S} SECONDS")
        )
    )
    # The range predicate lives in the aggregate, not a filter: a view
    # whose buckets hold only out-of-range clicks must still emit its
    # zero row (a filter would drop it and diverge from the oracle's
    # LEFT JOIN). A click matches via exactly one of the probe rows
    # (it has one (bucket, salt)), so no double counting.
    return (
        views.join(clicks, ["bucket", "salt"], "left")
        .groupBy("view_id")
        .agg(F.sum(in_range.cast("bigint")).alias("n_clicks_5min"))
    )


ORACLE_EVENTS_RANGE_JOIN = f"""
SELECT v.event_id AS view_id,
       CAST(SUM(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clicks_5min
FROM events v
LEFT JOIN events c
  ON c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL {RANGE_JOIN_BAND_S} SECOND
WHERE v.event_type = 'view'
GROUP BY v.event_id
"""


RETENTION_MAX_OFFSET = 7


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the other classic events rollup: users
    cohorted by first-activity day, counted on each later activity day
    → (cohort_day, day_offset, n_users) for offsets 0..7.

    Two shuffles total, both on user_id (first-activity groupBy-min and
    the activity⋈cohort join reuse the same partitioning; AQE collapses
    the exchange), then one partial-aggregated groupBy on the tiny
    (cohort, offset) key space. No window, no skew surface — cohort
    retention at 100 TB is exactly this shape, with the distinct
    (user, day) activity set as the materialized intermediate."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    act = ev.distinct()
    return (
        act.join(first, "user_id")
        .select(
            "cohort",
            F.datediff("d", "cohort").cast("bigint").alias("day_offset"),
            "user_id",
        )
        .filter(F.col("day_offset") <= RETENTION_MAX_OFFSET)
        .groupBy("cohort", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("cohort").cast("string").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
    )


ORACLE_EVENTS_RETENTION = f"""
WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
f AS (SELECT user_id, MIN(d) AS cohort FROM d GROUP BY user_id),
a AS (SELECT DISTINCT user_id, d FROM d)
SELECT CAST(f.cohort AS VARCHAR) AS cohort_day,
       CAST(date_diff('day', f.cohort, a.d) AS BIGINT) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM a JOIN f ON a.user_id = f.user_id
WHERE date_diff('day', f.cohort, a.d) <= {RETENTION_MAX_OFFSET}
GROUP BY 1, 2
"""


ANOMALY_K = 3  # flag |value - mean| > K·σ (population σ per user)


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user outlier detection, integer-exact: flag events whose
    value deviates from the user's mean by more than ANOMALY_K
    population standard deviations → (event_id, user_id, value_cents,
    n_user_events). The per-user fraud/telemetry screen every events
    pipeline runs.

    Cross-engine exactness: the z-test is evaluated WITHOUT division
    or sqrt — |v - s/n| > K·σ ⟺ (n·v - s)² > K²·(n·ss - s²) over
    integer cents (v value, s sum, ss sum of squares, n count), so
    both engines compare exact bigints and the oracle is hash-exact
    (floating-point z-scores would ulp-jitter at the threshold).
    Magnitudes: cents ≤ ~5·10⁴, so even at 10⁹ events/user the
    intermediates stay under the 9.2·10¹⁸ bigint ceiling via the
    n·ss - s² factoring.

    Scale shape: one map-side-combined groupBy builds the per-user
    (n, s, ss) sketch — users ≪ events, so the stats side broadcasts
    back onto the event stream; the corpus itself never shuffles."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    lhs = F.col("n") * F.col("v") - F.col("s")
    rhs = F.lit(ANOMALY_K * ANOMALY_K) * (
        F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    )
    return (
        ev.join(F.broadcast(stats), "user_id")
        .filter((F.col("n") >= 2) & (lhs * lhs > rhs))
        .select(
            "event_id",
            "user_id",
            F.col("v").alias("value_cents"),
            F.col("n").alias("n_user_events"),
        )
    )


ORACLE_EVENTS_ANOMALY = f"""
WITH c AS (
  SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
),
s AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS ss
  FROM c GROUP BY user_id
)
SELECT event_id, user_id, v AS value_cents, n AS n_user_events
FROM c JOIN s USING (user_id)
WHERE n >= 2
  AND (n*v - s) * (n*v - s) > {ANOMALY_K * ANOMALY_K} * (n*ss - s*s)
"""


def events_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry scrubbing: mask every digit run inside the raw
    `props` JSON payload (the PII-redaction shape — structure kept,
    values tokenized) → (event_id, props_masked, n_masked).

    Pure regexp built-ins, whole-stage codegen'd, zero shuffle —
    a narrow map over the event stream, which is exactly what a
    scrubber must be at 100 TB (it runs before anything else and
    must not cost a pass of state)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "#").alias("props_masked"),
        F.size(F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), 0)).alias(
            "n_masked"
        ),
    )


ORACLE_EVENTS_SCRUB = """
SELECT event_id,
       REGEXP_REPLACE(props, '[0-9]+', '#', 'g') AS props_masked,
       LEN(regexp_extract_all(props, '[0-9]+')) AS n_masked
FROM events
"""


def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix → (prev_type, event_type,
    n, p): Markov counts of consecutive event pairs within each user's
    timeline, with the row-normalized transition probability — the
    behavioral-sequence profile behind next-event prediction and
    funnel design.

    One shuffle on user_id for the lag window ((user_id, ts) is
    unique, ties broken by event_id anyway for determinism), then a
    tiny (type × type) aggregate that reuses map-side combine. The
    probability denominator is a window over prev_type — a second
    shuffle on a ≤|types| key space, negligible at any scale."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )


ORACLE_EVENTS_TRANSITIONS = """
WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type
  FROM events
),
counts AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       ROUND(CAST(n AS DOUBLE)
               / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM counts
"""


DEDUP_UNIT = "hour"  # burst-collapse window


def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming dropDuplicatesWithinWatermark shape:
    collapse burst/retransmission duplicates — same user, same event
    type, same clock hour — to the earliest occurrence, reported as a
    per-type reduction summary → (event_type, n_raw, n_kept). The
    at-least-once-delivery resolution every event pipeline runs before
    aggregation (~1% of the testdata collapses at the hour grain, so
    the key is non-vacuous).

    Scale shape: one shuffle on the dedup key for the row_number
    window, then a tiny per-type aggregate. The dedup key
    (user, type, hour) is high-cardinality and unskewed by
    construction — the hour component bounds any single partition's
    window to one user-type-hour cell."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc(DEDUP_UNIT, "ts")
    ).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum((F.col("rn") == 1).cast("bigint")).alias("n_kept"),
        )
    )


ORACLE_EVENTS_DEDUP = f"""
WITH r AS (
  SELECT event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type, DATE_TRUNC('{DEDUP_UNIT}', ts)
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_type, COUNT(*) AS n_raw,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM r GROUP BY event_type
"""


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type — every hour between the
    stream's global min and max hours present for every type, absent
    cells zero-filled → (hour, event_type, n_events, sum_value_cents).
    The resampling/gap-fill step every time-series consumer
    (dashboards, anomaly baselines, forecast featurizers) needs before
    it can difference or window anything: a missing hour must be an
    explicit zero row, not a silent hole.

    Scale shape: the fact aggregate is the usual map-side-combined
    (hour, type) rollup; the dense grid is hours × types where both
    sides are TINY derived tables (one sequence() from a 1-row bounds
    aggregate, one distinct over ~5 types), so the grid is a broadcast
    nested loop of trivial size and the zero-fill is one broadcast
    left join onto the rollup — the fact table is scanned once and
    never re-shuffled."""
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "event_type", "value"
    )
    agg = ev.groupBy("h", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
            "sum_value_cents"
        ),
    )
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h")
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(F.broadcast(types))
    return grid.join(agg, ["h", "event_type"], "left").select(
        F.col("h").cast("string").alias("hour"),
        "event_type",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("sum_value_cents", F.lit(0))
        .cast("bigint")
        .alias("sum_value_cents"),
    )


ORACLE_EVENTS_GAP_FILL = """
WITH ev AS (
  SELECT DATE_TRUNC('hour', ts) AS h, event_type, value FROM events
),
agg AS (
  SELECT h, event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
  FROM ev GROUP BY 1, 2
),
b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
hours AS (
  SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b
),
grid AS (
  SELECT hours.h, t.event_type
  FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
)
SELECT CAST(g.h AS VARCHAR) AS hour, g.event_type,
       CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(a.sum_value_cents, 0) AS BIGINT) AS sum_value_cents
FROM grid g
LEFT JOIN agg a ON g.h = a.h AND g.event_type = a.event_type
"""


# CEP pattern over each user's ordered timeline: view, then any run of
# clicks/errors, then purchase — counted left-to-right without overlap
# (both Java regex and DuckDB's RE2 scan leftmost and resume after the
# match end; the greedy character class has no alternation ambiguity,
# so the two engines' match sets are identical).
PATTERN_FUNNEL_RE = "v[ce]*p"


def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (the batch MATCH_RECOGNIZE / CEP
    analogue): encode each user's time-ordered events as a string of
    type initials and count non-overlapping PATTERN_FUNNEL_RE matches
    → (user_id, seq_len, n_matches). The free-form complement of
    events_funnel's fixed-stage windows: the pattern admits arbitrary
    intermediate noise, which no per-stage min(ts) cascade can express.

    Determinism: collect_list is order-free, so the struct array is
    array_sort-ed on the unique (ts, event_id) key before the initials
    are joined — both engines build the identical string, and
    regexp_count/regexp_extract_all count the identical leftmost,
    non-overlapping match set.

    Scale: one shuffle on user_id (the groupBy); per-user state is one
    string bounded by the user's event count. At 100 TB the timeline
    would be segmented per (user, session) — events_sessionize's keys —
    before encoding, capping string length at the session bound; the
    regex scan itself is a JVM-side linear pass, never Python."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.substring("event_type", 1, 1).alias("ini"),
    )
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ini"))),
                lambda x: x["ini"],
            ),
            "",
        ).alias("seq")
    )
    return seq.select(
        "user_id",
        F.length("seq").alias("seq_len"),
        F.regexp_count("seq", F.lit(PATTERN_FUNNEL_RE)).alias("n_matches"),
    )


ORACLE_EVENTS_PATTERN_MATCH = f"""
WITH s AS (
  SELECT user_id,
         STRING_AGG(SUBSTRING(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(LENGTH(seq) AS INT) AS seq_len,
       CAST(LEN(REGEXP_EXTRACT_ALL(seq, '{PATTERN_FUNNEL_RE}')) AS INT) AS n_matches
FROM s
"""


# --- Count-Min sketch heavy hitters ---------------------------------
# Completes the classic sketch triad the engine already carries
# (HyperLogLog++ distinct = ql_approx_distinct, Bloom membership =
# store_bloom_prune, Count-Min frequency = this key). Constants are
# part of the declared contract — the oracle interpolates them.
CMS_DEPTH = 4       # independent hash rows
CMS_WIDTH = 64      # counters per row (small on purpose: collisions
                    # at 150+ keys make the estimate non-trivial)
CMS_TOPK = 10       # heavy hitters reported
CMS_SALT = "cms"    # hash-domain separator


def _cms_bucket(user_id: F.Column, seed: F.Column) -> F.Column:
    """h_d(u) = u32(md5('cms<d>:<u>')) mod CMS_WIDTH — the engine's
    standard engine-portable md5 draw (pipeline/clean.py:_md5_u32),
    salted per sketch row so the CMS_DEPTH hash functions are
    independent in the md5 domain."""
    key = F.concat(
        F.lit(CMS_SALT), seed.cast("string"), F.lit(":"), user_id.cast("string")
    )
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        % CMS_WIDTH
    )


def events_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation over event user_ids →
    the CMS_TOPK true heavy hitters as (user_id, true_count, cms_est).
    Deterministic md5 row hashes make even the sketch side hash-exact
    across engines; `cms_est >= true_count` (CMS never undercounts) is
    pinned as a law test, and collisions at CMS_WIDTH=64 ensure the
    estimate is genuinely approximate, not a disguised exact count.

    Scale shape (the reason CMS exists at 100 TB): the sketch is NEVER
    built from raw events — the per-key contraction (one map-side-
    combined groupBy, the same aggregate any frequency query pays)
    feeds it, because CMS is additive: sum of per-key counts into
    (seed, bucket) cells equals streaming increments row-by-row. The
    counter table is CMS_DEPTH x CMS_WIDTH = 256 rows regardless of
    data size — broadcast to the estimate join, so the whole key costs
    one shuffle plus two broadcast-side passes over the contracted key
    table. The top-k leg and the counter leg both hang off the same
    per-key contraction; its exchange is canonically identical in both
    branches and the executed plan carries a ReusedExchange for it
    (verified in PLANS.md) — ONE corpus shuffle at runtime, not two.
    In a true streaming deployment the same cells would be the
    applyInPandasWithState accumulator (see the declared
    stream_count_min twin, which maintains them as streaming state);
    the batch form here is the merge-of-partials identity."""
    counts = cms_true_counts(spark, sf_dir)
    seeds = F.explode(
        F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    ).alias("seed")
    hashed = counts.select("user_id", "true_count", seeds).withColumn(
        "bucket", _cms_bucket(F.col("user_id"), F.col("seed"))
    )
    counters = hashed.groupBy("seed", "bucket").agg(
        F.sum("true_count").alias("counter")
    )
    return cms_report(counts, counters)


def cms_true_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key contraction (user_id, true_count) — the exact-truth leg
    both the batch key and the streaming twin report against."""
    return (
        table(spark, sf_dir, "events")
        .select(F.col("user_id").cast("bigint").alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )


def cms_report(counts: DataFrame, counters: DataFrame) -> DataFrame:
    """Heavy-hitter report from any CMS counter table (batch-built or
    streaming-state-drained): top-CMS_TOPK true keys, each estimated
    as min over its CMS_DEPTH cells."""
    seeds = F.explode(
        F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    ).alias("seed")
    # TakeOrdered (orderBy+limit), not a global row_number window: the
    # per-partition top-CMS_TOPK partials merge on the driver without a
    # single-partition sort of the whole key domain.
    top = counts.orderBy(F.col("true_count").desc(), F.col("user_id")).limit(
        CMS_TOPK
    )
    top_hashed = top.select("user_id", "true_count", seeds).withColumn(
        "bucket", _cms_bucket(F.col("user_id"), F.col("seed"))
    )
    est = (
        top_hashed.join(F.broadcast(counters), ["seed", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("counter").cast("bigint").alias("cms_est"))
    )
    return est.select("user_id", "true_count", "cms_est")


ORACLE_EVENTS_COUNT_MIN = f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS true_count FROM events GROUP BY user_id
),
seeds AS (SELECT UNNEST(range({CMS_DEPTH})) AS seed),
hashed AS (
  SELECT c.user_id, c.true_count, s.seed,
         CAST(('0x' || substr(md5('{CMS_SALT}' || CAST(s.seed AS VARCHAR)
               || ':' || CAST(c.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {CMS_WIDTH} AS bucket
  FROM counts c CROSS JOIN seeds s
),
counters AS (
  SELECT seed, bucket, SUM(true_count) AS counter
  FROM hashed GROUP BY seed, bucket
),
top AS (
  SELECT user_id, true_count FROM counts
  QUALIFY ROW_NUMBER() OVER (ORDER BY true_count DESC, user_id) <= {CMS_TOPK}
)
SELECT t.user_id, t.true_count,
       CAST(MIN(ct.counter) AS BIGINT) AS cms_est
FROM top t
JOIN hashed h ON h.user_id = t.user_id
JOIN counters ct ON ct.seed = h.seed AND ct.bucket = h.bucket
GROUP BY t.user_id, t.true_count
"""


# Heavy-change detection (Cormode & Muthukrishnan's "what's new" /
# heavy-changers question): which keys' frequencies moved most between
# the two halves of the stream's time range. Exact form here; the
# sketched form at 100 TB diffs two events_count_min cell tables
# (CMS is linear, so cell-wise subtraction sketches the delta stream).
CHANGE_TOPK = 10


def events_top_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-CHANGE_TOPK heavy changers between the first and second
    half of the events time range -> (user_id, n_first, n_second,
    delta), ranked by |delta| desc (user_id tiebreak). The ops/abuse
    question every monitoring stack asks ("who changed?"), answered
    exactly; the midpoint is integer-microsecond arithmetic replayed
    identically by both engines.

    Scale: the half-assignment is computed INSIDE the corpus scan
    against a broadcast 1-row bounds frame (min/max ts — one
    map-side-combinable aggregate), then ONE contraction shuffle on
    user_id produces both half-counts as conditional sums; top-k is
    TakeOrdered over the contracted key domain. No self-join of the
    two halves (the naive two-scan + full-outer-join shape), no
    second corpus pass."""
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros(F.col("ts")).alias("us"),
    )
    # integer DIV, never float /: Spark truncates double->bigint casts
    # while DuckDB rounds them, so an odd lo+hi would shift the
    # midpoint by 1us between engines and flip any event AT the mid.
    bounds = ev.agg(
        F.min("us").alias("lo"), F.max("us").alias("hi")
    ).select(F.expr("(lo + hi) DIV 2").alias("mid"))
    halves = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("us") < F.col("mid")).cast("bigint")).alias("n_first"),
            F.sum((F.col("us") >= F.col("mid")).cast("bigint")).alias("n_second"),
        )
        .withColumn("delta", F.col("n_second") - F.col("n_first"))
    )
    return halves.orderBy(
        F.abs(F.col("delta")).desc(), F.col("user_id")
    ).limit(CHANGE_TOPK)


ORACLE_EVENTS_TOP_CHANGE = f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS us FROM events
),
b AS (
  SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev
),
halves AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN us < mid THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
         CAST(SUM(CASE WHEN us >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_second
  FROM ev CROSS JOIN b
  GROUP BY user_id
)
SELECT user_id, n_first, n_second, n_second - n_first AS delta
FROM halves
QUALIFY ROW_NUMBER() OVER (ORDER BY ABS(n_second - n_first) DESC, user_id)
        <= {CHANGE_TOPK}
"""


def events_windowed_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(hour, event_type) exact value percentiles -> (hour,
    event_type, n_events, p50_cents, p95_cents) — the latency/spend
    dashboard staple: tumbling-window medians and tail quantiles, the
    windowed sibling of ql_approx_quantiles' global form.

    Exactness: quantiles interpolate on integer CENTS (the engine-wide
    trick — raw-double quantiles would hash-diverge across engines) at
    the shared fraction p*(n-1), and the result is 6dp-rounded; the
    ql_approx_quantiles footnote's fallback (explicit shared
    numerator/denominator interpolation) applies here too if an SF
    ever 1-ulp-flips.

    Scale: ONE shuffle on the (window, type) composite key — exact
    per-group percentiles need the group's values co-located, which is
    what the groupBy provides; group state is bounded by the window
    bound (an hour of one type), so no group outgrows its executor. At
    100 TB with pathological hot windows the approx sketch
    (percentile_approx, mergeable partials) is the escape hatch —
    that trade is exactly what ql_approx_quantiles' audit form
    measures."""
    ev = table(spark, sf_dir, "events").select(
        F.window("ts", "1 hour").alias("w"),
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return (
        ev.groupBy(F.col("w.start").cast("string").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("percentile(cents, array(0.5D, 0.95D))").alias("pp"),
        )
        .select(
            "hour",
            "event_type",
            "n_events",
            F.round(F.col("pp")[0], 6).alias("p50_cents"),
            F.round(F.col("pp")[1], 6).alias("p95_cents"),
        )
    )


ORACLE_EVENTS_WINDOWED_QUANTILES = """
SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS hour,
       event_type,
       COUNT(*) AS n_events,
       ROUND(quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5), 6) AS p50_cents,
       ROUND(quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.95), 6) AS p95_cents
FROM events
GROUP BY 1, 2
"""


RATE_WINDOW_SEC = 86_400  # sliding rate-limit lookback (1 day)
RATE_LIMIT_MAX = 5        # events allowed per user per window


def events_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rate limiting per user → (user_id, n_events,
    n_throttled, peak_rate): for every event, the count of that
    user's events in the trailing RATE_WINDOW_SEC (inclusive); an
    event is throttled when its window count exceeds RATE_LIMIT_MAX —
    the API-quota / abuse-control primitive every event platform
    runs, reported as the per-user enforcement summary.

    Exactness: the window count is a RANGE frame over exact integer
    MICROSECONDS (unix_micros / epoch_us — identical bigints on both
    engines; equal-timestamp peers enter the frame together under
    RANGE semantics in both), so every output is an exact integer.

    Scale shape: ONE shuffle on user_id, then a per-user time-ordered
    scan with O(1) frame state — the count frame is maintained
    incrementally by both engines, never re-scanned per row. user_id
    is high-cardinality and unskewed at 100 TB (AQE skew-split
    handles hot users); the per-user groupBy rides the same
    partitioning, so the summary adds no second shuffle. The
    streaming enforcement twin of this shape is stream_user_totals's
    keyed-state pattern; this is the batch audit."""
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-RATE_WINDOW_SEC * 1_000_000, 0)
    )
    per_event = table(spark, sf_dir, "events").select(
        "user_id",
        F.count(F.lit(1)).over(w).alias("in_window"),
    )
    return per_event.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (F.col("in_window") > RATE_LIMIT_MAX).cast("bigint")
        ).alias("n_throttled"),
        F.max("in_window").alias("peak_rate"),
    )


ORACLE_EVENTS_RATE_LIMIT = f"""
WITH per_event AS (
  SELECT user_id,
         COUNT(*) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN {RATE_WINDOW_SEC * 1_000_000} PRECEDING
                     AND CURRENT ROW) AS in_window
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN in_window > {RATE_LIMIT_MAX} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_throttled,
       MAX(in_window) AS peak_rate
FROM per_event GROUP BY user_id
"""


QUERIES = {
    "events_tumbling": events_tumbling,
    "events_hopping": events_hopping,
    "events_sessionize": events_sessionize,
    "events_asof_join": events_asof_join,
    "events_asof_nearest": events_asof_nearest,
    "events_funnel": events_funnel,
    "events_range_join": events_range_join,
    "events_retention": events_retention,
    "events_anomaly": events_anomaly,
    "events_ab_test": events_ab_test,
    "events_topk_window": events_topk_window,
    "events_scrub": events_scrub,
    "events_transitions": events_transitions,
    "events_dedup": events_dedup,
    "events_gap_fill": events_gap_fill,
    "events_pattern_match": events_pattern_match,
    "events_count_min": events_count_min,
    "events_top_change": events_top_change,
    "events_windowed_quantiles": events_windowed_quantiles,
    "events_rate_limit": events_rate_limit,
}

ORACLE_SQL = {
    "events_tumbling": ORACLE_EVENTS_TUMBLING,
    "events_hopping": ORACLE_EVENTS_HOPPING,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "events_asof_join": ORACLE_EVENTS_ASOF_JOIN,
    "events_asof_nearest": ORACLE_EVENTS_ASOF_NEAREST,
    "events_funnel": ORACLE_EVENTS_FUNNEL,
    "events_range_join": ORACLE_EVENTS_RANGE_JOIN,
    "events_retention": ORACLE_EVENTS_RETENTION,
    "events_anomaly": ORACLE_EVENTS_ANOMALY,
    "events_ab_test": ORACLE_EVENTS_AB_TEST,
    "events_topk_window": ORACLE_EVENTS_TOPK_WINDOW,
    "events_scrub": ORACLE_EVENTS_SCRUB,
    "events_transitions": ORACLE_EVENTS_TRANSITIONS,
    "events_dedup": ORACLE_EVENTS_DEDUP,
    "events_gap_fill": ORACLE_EVENTS_GAP_FILL,
    "events_pattern_match": ORACLE_EVENTS_PATTERN_MATCH,
    "events_count_min": ORACLE_EVENTS_COUNT_MIN,
    "events_top_change": ORACLE_EVENTS_TOP_CHANGE,
    "events_windowed_quantiles": ORACLE_EVENTS_WINDOWED_QUANTILES,
    "events_rate_limit": ORACLE_EVENTS_RATE_LIMIT,
}
