"""Temporal join operators Spark has no native form of: as-of join and
event-time range join.

The reference's job engine lines work up against each other by timestamp
(`/root/reference/WHATDO.md` job ordering; `gdalos_trans.py` batch runs
keyed by file mtime), and every training-data pipeline needs
click->purchase attribution joins. DuckDB grew a native ASOF JOIN for
exactly this; Spark did not — but both semantics decompose into shapes
Catalyst executes well:

* **as-of join** = union the state (click) and probe (purchase) streams,
  sort within the key partition, carry the latest state forward with
  ``last(..., ignorenulls=True)`` over a running row frame. ONE shuffle on
  the join key, a within-partition sort, zero row fan-out — the merge-join
  shape an as-of join wants at 100 TB. No range predicate ever reaches a
  nested-loop join.
* **range join** = coarse-bucket equi-join: the probe explodes to the
  (ceil(range/bucket)+1 = 2) hour buckets its window can touch, the build
  side keeps its own bucket, the join is a plain equi-join on
  (key, bucket) refined by the exact bound afterwards. Candidate fan-out
  is bounded by construction (2x probe rows), so the plan stays
  BNLJ-free however large either side grows.

Both operators keep event-time as exact epoch-microsecond BIGINTs
(`unix_micros` / `epoch_us`) so no float ever orders or bounds a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gdalos_spark.datamodel import load

# Attribution window for the range join: views within the hour before a
# purchase. Bucket width equals the range so each probe touches 2 buckets.
RANGE_US = 3_600_000_000


def asof_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, attach the most recent at-or-before click by the
    same user (classic as-of / point-in-time-correct enrichment).

    Plan: union state+probe rows -> one shuffle on user_id -> sorted
    window carries (click event_id, ts, value) forward via three
    last-ignore-nulls over the same running frame (null-gated together,
    so all three come from the same latest click row). Probes with no
    prior click keep NULLs — the LEFT semantics of an as-of join.
    """
    ev = load(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("event_type") == "purchase").cast("int").alias("is_probe"),
        "value",
    )
    # state rows sort before probe rows at equal ts => "at or before" is
    # inclusive; event_id makes the order total.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click = lambda c: F.when(F.col("is_probe") == 0, F.col(c))  # noqa: E731
    carried = base.select(
        "event_id",
        "user_id",
        "ts_us",
        "is_probe",
        F.last(click("event_id"), ignorenulls=True).over(w).alias("click_event_id"),
        F.last(click("ts_us"), ignorenulls=True).over(w).alias("click_ts_us"),
        F.last(click("value"), ignorenulls=True).over(w).alias("click_value"),
    )
    # no-prior-click probes keep LEFT semantics; NULLs surface as the
    # documented -1 sentinels so every terminal column stays typed and
    # order-comparable in downstream tooling
    return carried.filter(F.col("is_probe") == 1).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.coalesce("click_event_id", F.lit(-1)).alias("click_event_id"),
        F.coalesce("click_ts_us", F.lit(-1)).alias("click_ts_us"),
        F.coalesce(F.col("ts_us") - F.col("click_ts_us"), F.lit(-1)).alias("gap_us"),
        F.coalesce("click_value", F.lit(-1.0)).alias("click_value"),
    )


ASOF_JOIN_ENRICH_SQL = """
WITH e AS (
  SELECT event_id, user_id, value, epoch_us(ts) AS ts_us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_probe
  FROM events
  WHERE event_type IN ('click', 'purchase')
), w AS (
  SELECT event_id, user_id, ts_us, is_probe,
    last_value(CASE WHEN is_probe = 0 THEN event_id END IGNORE NULLS)
      OVER win AS click_event_id,
    last_value(CASE WHEN is_probe = 0 THEN ts_us END IGNORE NULLS)
      OVER win AS click_ts_us,
    last_value(CASE WHEN is_probe = 0 THEN value END IGNORE NULLS)
      OVER win AS click_value
  FROM e
  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, is_probe, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_event_id, user_id, ts_us AS purchase_ts_us,
       COALESCE(click_event_id, -1) AS click_event_id,
       COALESCE(click_ts_us, -1) AS click_ts_us,
       COALESCE(ts_us - click_ts_us, -1) AS gap_us,
       COALESCE(click_value, -1.0) AS click_value
FROM w
WHERE is_probe = 1
"""


def interval_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views by the same user within the hour before each purchase
    (event-time range join, the attribution-window shape).

    Plan: probe side explodes to the 2 hour-buckets its window spans;
    equi-join on (user_id, bucket); exact bound refined post-join; one
    aggregation back to the probe grain. Left semantics (purchases with
    zero views kept) survive because the exploded probe side drives a
    LEFT join and COUNT counts only matched rows.
    """
    ev = load(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.unix_micros("ts").alias("p_ts_us"),
    )
    exploded = probes.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"(p_ts_us - {RANGE_US}) div {RANGE_US}"),
                F.expr(f"p_ts_us div {RANGE_US}"),
            )
        ),
    ).dropDuplicates(["purchase_event_id", "bucket"])
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.unix_micros("ts").alias("v_ts_us"),
        F.col("value").cast("decimal(18,2)").alias("v_value"),
        F.unix_micros("ts").alias("_vt"),
    ).withColumn("v_bucket", F.expr(f"_vt div {RANGE_US}")).drop("_vt")
    joined = exploded.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("bucket") == F.col("v_bucket"))
        & (F.col("v_ts_us") >= F.col("p_ts_us") - RANGE_US)
        & (F.col("v_ts_us") < F.col("p_ts_us")),
        "left",
    )
    return joined.groupBy("purchase_event_id", "user_id", "p_ts_us").agg(
        F.count("v_ts_us").alias("n_views_1h"),
        F.coalesce(F.sum("v_value"), F.lit(0).cast("decimal(18,2)"))
        .cast("double")
        .alias("views_value_1h"),
    ).select(
        "purchase_event_id",
        "user_id",
        F.col("p_ts_us").alias("purchase_ts_us"),
        "n_views_1h",
        "views_value_1h",
    )


INTERVAL_RANGE_JOIN_SQL = f"""
WITH p AS (
  SELECT event_id AS purchase_event_id, user_id, epoch_us(ts) AS p_ts_us
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id AS v_user, epoch_us(ts) AS v_ts_us,
         CAST(value AS DECIMAL(18,2)) AS v_value
  FROM events WHERE event_type = 'view'
)
SELECT p.purchase_event_id, p.user_id, p.p_ts_us AS purchase_ts_us,
       COUNT(v.v_ts_us) AS n_views_1h,
       CAST(COALESCE(SUM(v.v_value), 0) AS DOUBLE) AS views_value_1h
FROM p LEFT JOIN v
  ON v.v_user = p.user_id
 AND v.v_ts_us >= p.p_ts_us - {RANGE_US}
 AND v.v_ts_us < p.p_ts_us
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# scd2_apply — slowly-changing-dimension type-2 history build
# ---------------------------------------------------------------------------

SCD2_OPEN_END = -1  # sentinel for the open (current) interval


def scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history from a change stream: each user's event stream
    becomes validity intervals (valid_from, valid_to) per VALUE RUN —
    consecutive events carrying the same value collapse into one
    version (true SCD2 writes a row only on change). Two window passes
    over ONE user_id partitioning (lag to flag changes, lead to close
    intervals) — no self-join, no second exchange; the lakehouse MERGE
    that applies this is merge_upsert_plan's shape. Epoch-seconds
    terminals; the open interval carries the -1 sentinel + is_current."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("ts_s"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    changed = ev.withColumn(
        "is_change",
        F.when(
            F.lag("value").over(w).isNull()
            | (F.col("value") != F.lag("value").over(w)),
            1,
        ).otherwise(0),
    ).filter(F.col("is_change") == 1)
    w2 = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    out = changed.withColumn("valid_to_raw", F.lead("ts_s").over(w2))
    return out.select(
        "user_id",
        "value",
        F.col("ts_s").alias("valid_from"),
        F.coalesce("valid_to_raw", F.lit(SCD2_OPEN_END)).alias("valid_to"),
        F.col("valid_to_raw").isNull().cast("int").alias("is_current"),
    ).orderBy("user_id", "valid_from")


SCD2_APPLY_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s, value
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN LAG(value) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) IS NULL
                   OR value <> LAG(value) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
                 THEN 1 ELSE 0 END AS is_change
  FROM ev
),
changed AS (SELECT * FROM flagged WHERE is_change = 1),
closed AS (
  SELECT user_id, value, ts_s AS valid_from,
         LEAD(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS valid_to_raw
  FROM changed
)
SELECT user_id, value, valid_from,
       COALESCE(valid_to_raw, {SCD2_OPEN_END}) AS valid_to,
       CAST(CASE WHEN valid_to_raw IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM closed
ORDER BY user_id, valid_from
"""


# ---------------------------------------------------------------------------
# events_time_weighted_avg — TWAP per user (interval-weighted mean)
# ---------------------------------------------------------------------------


def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value stream (the TWAP every
    metering/pricing pipeline computes): each observation holds until
    the next one, so its weight is the gap to the successor (the final
    open-ended observation is excluded — no arbitrary horizon). One
    lead() window over the (user, time) partitioning, then an exact
    integer agg: weights are whole seconds (BIGINT), values are cents,
    and the weighted sum cents·seconds stays far under 2^63 (500*100
    cents x ~1e5 s x 1e4 events/user at 100 TB ≈ 5e13/user). The
    terminal divide of two exact integers is engine-identical."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.round(F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v_c"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    seg = ev.withColumn("next_s", F.lead("ts_s").over(w)).filter(
        F.col("next_s").isNotNull()
    ).withColumn("dt", F.col("next_s") - F.col("ts_s"))
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dt").alias("span_s"),
            F.sum(F.col("v_c") * F.col("dt")).alias("wsum"),
        )
        .filter(F.col("span_s") > 0)
        .select(
            "user_id",
            "n_segments",
            F.col("span_s").cast("bigint").alias("span_s"),
            (
                F.col("wsum").cast("double")
                / (F.col("span_s") * F.lit(100)).cast("double")
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


EVENTS_TIME_WEIGHTED_AVG_SQL = """
WITH ev AS (
  SELECT user_id, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(ROUND(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS v_c
  FROM events
),
seg AS (
  SELECT user_id, v_c,
         LEAD(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) - ts_s AS dt
  FROM ev
  QUALIFY LEAD(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) IS NOT NULL
),
agg AS (
  SELECT user_id, COUNT(*) AS n_segments,
         CAST(SUM(dt) AS BIGINT) AS span_s,
         CAST(SUM(v_c * dt) AS BIGINT) AS wsum
  FROM seg GROUP BY 1
)
SELECT user_id, n_segments, span_s,
       CAST(wsum AS DOUBLE) / CAST(span_s * 100 AS DOUBLE) AS twap
FROM agg
WHERE span_s > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# events_cusum_alarm — CUSUM drift detection as two windows
# ---------------------------------------------------------------------------

CUSUM_H_CENTS = 10_000  # alarm when the cumulative positive drift > $100


def events_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per user: S_t = max(0, S_{t-1} +
    (x_t - mean)) with an alarm when S_t exceeds H. The recurrence looks
    sequential, but the classic prefix identity S_t = P_t - min(0,
    min_{j<=t} P_j) (P = running sum of deviations) turns it into TWO
    stacked windows over ONE (user, time) partitioning — no UDF, no
    iteration, no state. Deviations are scaled by the user's event
    count (d_t = n*x_t - total) so everything stays exact BIGINT: the
    per-user mean never materializes as a float, exactly the Q22
    cross-multiplication trick applied to a time-series recurrence.
    Output per user: alarms, peak CUSUM in cents, first alarm event."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.round(F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v_c"),
    )
    per_user = ev.groupBy(F.col("user_id").alias("uk")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v_c").alias("total_c")
    )
    j = ev.join(per_user, ev.user_id == F.col("uk")).withColumn(
        "d", F.col("n") * F.col("v_c") - F.col("total_c")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = j.withColumn("p", F.sum("d").over(w))
    j = j.withColumn("pmin", F.least(F.lit(0).cast("bigint"), F.min("p").over(w)))
    j = j.withColumn("s", F.col("p") - F.col("pmin"))
    alarm = F.col("s") > F.col("n") * CUSUM_H_CENTS
    return (
        j.groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            F.sum(alarm.cast("int")).cast("bigint").alias("n_alarms"),
            (F.max("s").cast("double") / (F.max("n") * 100).cast("double")).alias("peak_cusum"),
            F.coalesce(
                F.min(F.when(alarm, F.col("event_id"))), F.lit(-1)
            ).alias("first_alarm_event"),
        )
        .orderBy("user_id")
    )


EVENTS_CUSUM_ALARM_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(ROUND(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS v_c
  FROM events
),
per_user AS (
  SELECT user_id AS uk, COUNT(*) AS n, CAST(SUM(v_c) AS BIGINT) AS total_c
  FROM ev GROUP BY 1
),
j AS (
  SELECT ev.*, p.n, p.total_c, p.n * ev.v_c - p.total_c AS d
  FROM ev JOIN per_user p ON ev.user_id = p.uk
),
w1 AS (
  SELECT *, CAST(SUM(d) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
  FROM j
),
w2 AS (
  SELECT *, p - LEAST(CAST(0 AS BIGINT),
                      CAST(MIN(p) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) AS s
  FROM w1
)
SELECT user_id,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN s > n * {CUSUM_H_CENTS} THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       CAST(MAX(s) AS DOUBLE) / CAST(MAX(n) * 100 AS DOUBLE) AS peak_cusum,
       COALESCE(MIN(CASE WHEN s > n * {CUSUM_H_CENTS} THEN event_id END), -1) AS first_alarm_event
FROM w2
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# events_ohlc_bars — hypertable-style OHLC downsampling rollup
# ---------------------------------------------------------------------------


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling into OHLC bars (the hypertable /
    continuous-aggregate rollup every TSDB ships): per (event_type,
    hour) — open = value at the earliest (ts, event_id), close at the
    latest, high/low/volume/count as plain aggregates. Open/close ride
    the SAME single shuffle as the min/max aggregates via the struct
    min/max trick: min(struct(us, event_id, cents)) picks the earliest
    row's value without a window or a second exchange, and the
    (us, event_id) prefix makes the pick total-order deterministic.
    Values are exact integer cents."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("cents"),
    ).withColumn("hour_us", F.expr("us div 3600000000 * 3600000000"))
    agg = base.groupBy("event_type", "hour_us").agg(
        F.min(F.struct("us", "event_id", "cents")).alias("o"),
        F.max(F.struct("us", "event_id", "cents")).alias("c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.sum("cents").alias("vol_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return agg.select(
        "event_type",
        (F.col("hour_us") / 1_000_000).cast("bigint").alias("bar_start_s"),
        (F.col("o.cents").cast("double") / 100.0).alias("open"),
        (F.col("high_c").cast("double") / 100.0).alias("high"),
        (F.col("low_c").cast("double") / 100.0).alias("low"),
        (F.col("c.cents").cast("double") / 100.0).alias("close"),
        (F.col("vol_c").cast("double") / 100.0).alias("volume"),
        "n_events",
    )


EVENTS_OHLC_BARS_SQL = """
WITH base AS (
  SELECT event_type, epoch_us(ts) AS us, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         epoch_us(ts) // 3600000000 * 3600000000 AS hour_us
  FROM events
),
agg AS (
  SELECT event_type, hour_us,
         MIN(ROW(us, event_id, cents)) AS o,
         MAX(ROW(us, event_id, cents)) AS c,
         MAX(cents) AS high_c, MIN(cents) AS low_c,
         SUM(cents) AS vol_c, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM base GROUP BY 1, 2
)
SELECT event_type,
       CAST(hour_us // 1000000 AS BIGINT) AS bar_start_s,
       CAST(o[3] AS DOUBLE) / 100.0 AS open,
       CAST(high_c AS DOUBLE) / 100.0 AS high,
       CAST(low_c AS DOUBLE) / 100.0 AS low,
       CAST(c[3] AS DOUBLE) / 100.0 AS close,
       CAST(vol_c AS DOUBLE) / 100.0 AS volume,
       n_events
FROM agg
"""


# ---------------------------------------------------------------------------
# attribution_last_touch — marketing attribution within a lookback window
# ---------------------------------------------------------------------------

ATTR_LOOKBACK_US = 7 * 86_400_000_000  # 7-day lookback
ATTR_CHANNELS = ("view", "click", "signup")


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding channel event (view/click/signup) within a 7-day
    lookback, else 'direct'. One window per user over the interleaved
    event stream — `last_value(..., ignorenulls)` over rows preceding
    the purchase — so attribution costs ONE user-keyed sort, never a
    per-purchase range join. Output: per-channel attributed purchase
    count and revenue (exact cents), the report every campaign dashboard
    is built on."""
    ev = load(spark, sf_dir, "events")
    ch = ", ".join(f"'{c}'" for c in ATTR_CHANNELS)
    base = ev.where(
        F.expr(f"event_type IN ({ch}, 'purchase')")
    ).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = base.select(
        "user_id",
        "event_type",
        "us",
        "cents",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_ch"),
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("us")),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_ch_us"),
    )
    purchases = touched.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("last_ch").isNotNull()
            & (F.col("us") - F.col("last_ch_us") <= ATTR_LOOKBACK_US),
            F.col("last_ch"),
        )
        .otherwise("direct")
        .alias("channel"),
        "cents",
    )
    return purchases.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


def _attribution_sql() -> str:
    ch = ", ".join(f"'{c}'" for c in ATTR_CHANNELS)
    return f"""
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
  WHERE event_type IN ({ch}, 'purchase')
),
touched AS (
  SELECT user_id, event_type, us, cents,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_ch,
         last_value(CASE WHEN event_type <> 'purchase' THEN us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_ch_us
  FROM base
)
SELECT CASE WHEN last_ch IS NOT NULL AND us - last_ch_us <= {ATTR_LOOKBACK_US}
            THEN last_ch ELSE 'direct' END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
"""


ATTRIBUTION_LAST_TOUCH_SQL = _attribution_sql()


# ---------------------------------------------------------------------------
# events_alert_debounce — alert runs over z-flagged days (monitoring)
# ---------------------------------------------------------------------------

DEBOUNCE_MIN_RUN = 2  # consecutive flagged days before an alert fires


def events_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert debouncing, the monitoring pattern that stops pager noise:
    a day is FLAGGED when its event volume deviates from the type's
    mean by more than 1σ — decided by the exact integer inequality
    (n·x − Σx)² > (n·Σx² − (Σx)²), no float mean/std ever exists — and
    an episode FIRES only when it spans ≥ DEBOUNCE_MIN_RUN consecutive
    flagged days (gaps-and-islands on the flagged-day sequence);
    suppressed single-day blips stay in the report with fired=false,
    the noise the debounce exists to absorb. Plan =
    one day-grain agg, one broadcast of per-type moments, one island
    groupBy — all on the event_type key."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("q"),
    )
    d = F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("s")
    rhs = (
        F.col("n").cast("decimal(38,0)") * F.col("q")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    flagged = (
        daily.join(F.broadcast(st), "event_type")
        .where(d * d > rhs)
        .select("event_type", "day", "x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    runs = flagged.select(
        "event_type",
        "day",
        "x",
        (F.col("day") - F.row_number().over(w)).alias("grp"),
    )
    return (
        runs.groupBy("event_type", "grp")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).cast("bigint").alias("run_len"),
            F.max("x").alias("peak_volume"),
        )
        .select(
            "event_type",
            "start_day",
            "end_day",
            "run_len",
            "peak_volume",
            (F.col("run_len") >= DEBOUNCE_MIN_RUN).alias("fired"),
        )
    )


EVENTS_ALERT_DEBOUNCE_SQL = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS q
  FROM daily GROUP BY 1
),
flagged AS (
  SELECT d.event_type, d.day, d.x
  FROM daily d JOIN st ON d.event_type = st.event_type
  WHERE (CAST(n AS DECIMAL(38,0)) * x - s) * (CAST(n AS DECIMAL(38,0)) * x - s)
        > CAST(n AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s
),
runs AS (
  SELECT event_type, day, x,
         day - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS grp
  FROM flagged
)
SELECT event_type, MIN(day) AS start_day, MAX(day) AS end_day,
       CAST(COUNT(*) AS BIGINT) AS run_len, MAX(x) AS peak_volume,
       COUNT(*) >= {DEBOUNCE_MIN_RUN} AS fired
FROM runs
GROUP BY event_type, grp
"""


# ---------------------------------------------------------------------------
# events_resample_interpolate — regular-grid resampling with linear
# interpolation (gap fill)
# ---------------------------------------------------------------------------
#
# The time-series primitive every metering/feature pipeline needs: turn an
# irregular event stream into a fixed-step series. The reference's nearest
# analogue is raster resampling (gdalos_trans.py warp/overview paths
# resample a regular 2-D grid); this is the 1-D event-time version.

GRID_STEP_S = 21_600  # 6-hour grid


def events_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user regular time grid (6-hour step, clipped to the user's own
    [min, max] span) with linear interpolation between the bracketing
    events.

    Plan shape: grid points come from a per-user min/max agg + sequence()
    explode (no driver loop, fan-out bounded by span/step); events and
    grid points then UNION into one stream so ONE shuffle on user_id and
    ONE within-partition sort serve both the carry-forward (prev event)
    and carry-backward (next event) windows — the same merge shape as
    asof_join_enrich, never a range join. Interpolation arithmetic is
    exact-integer cents/seconds with one terminal double divide, so the
    value is engine-identical by construction (no ROUND needed).

    At 100 TB the stream shuffles once on user_id and the grid fan-out is
    output-sized; state never exceeds the partition sort buffer.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id"),
        F.col("ts").cast("long").alias("t"),
        F.round(F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("v_c"),
    )
    step = F.lit(GRID_STEP_S)
    g0 = (F.floor((F.col("t0") + step - 1) / step) * step).cast("long")
    g1 = (F.floor(F.col("t1") / step) * step).cast("long")
    # a user whose whole span sits between two grid lines has g0 > g1;
    # sequence() rejects that (unlike generate_series, which is empty),
    # so gate it — the empty array explodes to no rows, matching the
    # oracle
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
        .select(
            "user_id",
            F.explode(
                F.when(g0 <= g1, F.sequence(g0, g1, step.cast("long"))).otherwise(
                    F.array().cast("array<long>")
                )
            ).alias("t"),
        )
    )
    stream = ev.select(
        "user_id", "t", F.lit(1).alias("kind"), "event_id", "v_c"
    ).unionByName(
        grid.select(
            "user_id", "t", F.lit(0).alias("kind"),
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(None).cast("bigint").alias("v_c"),
        )
    )
    order = [F.col("t"), F.desc("kind"), F.col("event_id")]
    wp = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Round-12 optimization (guide §2.5 "one task runs 50x longer"):
    # the carry-backward values used first(...) over a [currentRow,
    # unboundedFollowing] frame, which Spark's
    # UnboundedFollowingWindowFunctionFrame recomputes FROM SCRATCH for
    # every row — O(rows^2) per user partition. Harmless at the driver
    # dims (~100 rows/user) but the sf10 upscale densifies each user
    # 100-fold (user_ids are kept by design) and the key ran 201.6 s.
    # "first non-null after me in ascending order" IS "last non-null up
    # to me in the exact REVERSED total order" — (t, kind desc,
    # event_id) is a total order, so the reversal is value-identical row
    # for row — and the reversed [unboundedPreceding, currentRow] frame
    # accumulates incrementally (O(rows)). Same single user_id exchange;
    # the second Window adds one in-partition sort, which the O(n^2)
    # rescan dwarfed. Measured at sf10: 201.6 -> 5.5 s (37x, see
    # OPTIMIZATION_r12.md); VALUES-EXACT unchanged.
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t"), F.col("kind"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = stream.select(
        "user_id", "t", "kind",
        F.last("v_c", ignorenulls=True).over(wp).alias("pv"),
        F.last(F.when(F.col("kind") == 1, F.col("t")), ignorenulls=True).over(wp).alias("pt"),
        F.last("v_c", ignorenulls=True).over(wn).alias("nv"),
        F.last(F.when(F.col("kind") == 1, F.col("t")), ignorenulls=True).over(wn).alias("nt"),
    )
    # grid start/end are clipped to the event span, so pt always exists and
    # nt is only null when the grid point coincides with the last event —
    # covered by the exact-hit branch
    interp = F.when(F.col("pt") == F.col("t"), F.col("pv").cast("double")).otherwise(
        F.col("pv").cast("double")
        + ((F.col("nv") - F.col("pv")) * (F.col("t") - F.col("pt"))).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    return (
        marked.filter(F.col("kind") == 0)
        .select(
            "user_id",
            F.col("t").alias("grid_ts"),
            (interp / F.lit(100.0)).alias("v_interp"),
            (F.col("pt") == F.col("t")).cast("int").alias("is_exact"),
        )
        .orderBy("user_id", "grid_ts")
    )


EVENTS_RESAMPLE_INTERPOLATE_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
         CAST(ROUND(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS v_c
  FROM events
),
span AS (
  SELECT user_id,
         CAST(FLOOR((MIN(t) + {GRID_STEP_S} - 1) / {GRID_STEP_S}) * {GRID_STEP_S} AS BIGINT) AS g0,
         CAST(FLOOR(MAX(t) / {GRID_STEP_S}) * {GRID_STEP_S} AS BIGINT) AS g1
  FROM ev GROUP BY 1
),
grid AS (
  SELECT user_id, CAST(g.t AS BIGINT) AS t
  FROM span, UNNEST(generate_series(g0, g1, {GRID_STEP_S})) AS g(t)
),
stream AS (
  SELECT user_id, t, 1 AS kind, event_id, v_c FROM ev
  UNION ALL
  SELECT user_id, t, 0 AS kind, CAST(-1 AS BIGINT) AS event_id, CAST(NULL AS BIGINT) AS v_c
  FROM grid
),
marked AS (
  SELECT user_id, t, kind,
         LAST_VALUE(v_c IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         LAST_VALUE(CASE WHEN kind = 1 THEN t END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         FIRST_VALUE(v_c IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind DESC, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(CASE WHEN kind = 1 THEN t END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind DESC, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM stream
)
SELECT user_id, t AS grid_ts,
       (CASE WHEN pt = t THEN CAST(pv AS DOUBLE)
             ELSE CAST(pv AS DOUBLE)
                  + CAST((nv - pv) * (t - pt) AS DOUBLE) / CAST(nt - pt AS DOUBLE)
        END) / 100.0 AS v_interp,
       CAST(pt = t AS INTEGER) AS is_exact
FROM marked
WHERE kind = 0
ORDER BY user_id, grid_ts
"""


# ---------------------------------------------------------------------------
# events_seasonal_decompose — trend + weekday seasonality split
# ---------------------------------------------------------------------------
#
# Classical decomposition of the daily event volume per type: trend =
# centered 7-day moving average (full windows only), seasonal index =
# per-weekday mean deviation from trend, residual = value - trend -
# seasonal. Everything is exact integers (counts, micro-scaled means as
# integer division) until the terminal double casts, so the three
# components are engine-identical and the entry is fully oracle-gated.

SEASON_SCALE = 1_000_000  # micro-units for trend/seasonal means


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day): volume, 7-day centered trend, weekday
    seasonal index, residual. One (type, day) agg, one 7-row window
    frame, one weekday re-agg joined back — three shuffles total on tiny
    keyed data however large the event stream (the daily rollup is the
    only pass over the facts, partial-aggregated map-side)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(FLOOR(CAST(ts AS LONG) / 86400) AS BIGINT)").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("x"))
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    # trend only where the 7-day frame is full AND days are contiguous
    # (first/last day of each type have partial frames; the synthetic
    # stream has no day gaps, but the span check makes that explicit)
    trended = daily.select(
        "event_type",
        "day",
        "x",
        F.count(F.lit(1)).over(w7).alias("w_n"),
        (F.max("day").over(w7) - F.min("day").over(w7)).alias("w_span"),
        F.sum("x").over(w7).alias("w_sum"),
    ).withColumn(
        "trend_u",
        F.when(
            (F.col("w_n") == 7) & (F.col("w_span") == 6),
            F.expr(f"(w_sum * {SEASON_SCALE}) div 7"),
        ),
    )
    dev = trended.filter(F.col("trend_u").isNotNull()).select(
        "event_type",
        (F.col("day") % 7).alias("dow"),
        (F.col("x") * SEASON_SCALE - F.col("trend_u")).alias("dev_u"),
    )
    seasonal = dev.groupBy("event_type", "dow").agg(
        F.expr("CAST(sum(dev_u) AS BIGINT) div count(*)").alias("seasonal_u")
    )
    return (
        trended.withColumn("dow", F.col("day") % 7)
        .join(seasonal, ["event_type", "dow"], "left")
        .select(
            "event_type",
            "day",
            F.col("x").cast("bigint").alias("volume"),
            (F.col("trend_u").cast("double") / SEASON_SCALE).alias("trend"),
            (F.col("seasonal_u").cast("double") / SEASON_SCALE).alias("seasonal"),
            F.when(
                F.col("trend_u").isNotNull() & F.col("seasonal_u").isNotNull(),
                (F.col("x") * SEASON_SCALE - F.col("trend_u") - F.col("seasonal_u"))
                .cast("double") / SEASON_SCALE,
            ).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


EVENTS_SEASONAL_DECOMPOSE_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(FLOOR(FLOOR(epoch(ts)) / 86400) AS BIGINT) AS day
  FROM events
),
daily AS (
  SELECT event_type, day, COUNT(*) AS x FROM ev GROUP BY 1, 2
),
trended AS (
  SELECT event_type, day, x,
         COUNT(*) OVER w AS w_n,
         MAX(day) OVER w - MIN(day) OVER w AS w_span,
         SUM(x) OVER w AS w_sum
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
tr AS (
  SELECT event_type, day, x,
         CASE WHEN w_n = 7 AND w_span = 6
              THEN (w_sum * {SEASON_SCALE}) // 7 END AS trend_u
  FROM trended
),
seasonal AS (
  SELECT event_type, day % 7 AS dow,
         CAST(SUM(x * {SEASON_SCALE} - trend_u) AS BIGINT) // COUNT(*) AS seasonal_u
  FROM tr WHERE trend_u IS NOT NULL
  GROUP BY 1, 2
)
SELECT t.event_type, t.day,
       CAST(t.x AS BIGINT) AS volume,
       CAST(t.trend_u AS DOUBLE) / {SEASON_SCALE} AS trend,
       CAST(s.seasonal_u AS DOUBLE) / {SEASON_SCALE} AS seasonal,
       CASE WHEN t.trend_u IS NOT NULL AND s.seasonal_u IS NOT NULL
            THEN CAST(t.x * {SEASON_SCALE} - t.trend_u - s.seasonal_u AS DOUBLE)
                 / {SEASON_SCALE} END AS residual
FROM tr t
LEFT JOIN seasonal s ON s.event_type = t.event_type AND s.dow = t.day % 7
ORDER BY t.event_type, t.day
"""
