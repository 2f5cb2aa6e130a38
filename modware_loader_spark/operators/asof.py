"""As-of (point-in-time) join — attach to each left row the most recent
right row with the same key and ``right_ts <= left_ts`` (backward; the
forward direction mirrors it).

Spark has no native ASOF JOIN (DuckDB, Pandas ``merge_asof`` and kdb do),
and the naive encodings both fail at scale: an inequality theta-join
explodes to |left|x|right| per key before a per-row argmax, and a
windowed subquery per left row re-scans the right side. The shape that
survives 100 TB is the **union-scan carry-forward**:

- tag right rows ``side=0`` and left rows ``side=1``, union them on a
  common schema (right payload in one struct column, NULL on left rows);
- one hash shuffle on the join key, sort within partitions by
  ``(ts, side)`` — right-before-left at equal timestamps makes the match
  inclusive;
- ``last(payload, ignorenulls=True)`` over the running window carries the
  latest right payload onto every left row;
- keep left rows; optionally null out carries older than ``tolerance``.

Cost: ONE shuffle of |left|+|right| rows, no pair explosion, no second
scan of either input. Skewed keys (one hot user) are the caveat — the
window sort serializes per key; pass ``salt_buckets=N`` to split each
key into N time buckets (each sorted independently in parallel) with
the previous bucket's last right payload chained in — the same carry-in
pattern as ``sources/stitch.py``. The chain itself is a slim
(key × bucket)-cardinality window, so the per-key serial section shrinks
from |rows per key| to N.

Ties inside the right side (same key, same ts) are broken by a caller-
supplied deterministic ``tie_col`` (greatest wins), matching what a
``QUALIFY row_number() ... DESC = 1`` pre-dedup produces — without it an
as-of join against a nondeterministically-ordered right side is not a
function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _salted_carry(
    unioned: DataFrame, keys: list[str], direction: str, n: int
) -> DataFrame:
    """Hot-key-safe carry: split each key's timeline into ``n`` equal
    time buckets, carry within buckets in parallel, then chain each
    bucket's final right payload into the next bucket (carry-in).

    Three stages, all shuffle-aligned on ``(keys…, __bkt)`` after the
    first exchange:

    1. per-(key, bucket) local carry — the big window, now ``n``-way
       parallel per key;
    2. per-(key, bucket) last-right-payload agg → a slim
       (|keys| × n)-row frame; a running window over *buckets* (serial
       section = n rows per key, not |rows per key|) shifts it one
       bucket forward (backward direction; mirrored for forward);
    3. join the carry-in back on (keys…, bucket) — same partitioning as
       stage 1, so only the slim side moves — and ``coalesce``.

    Output rows equal the unsalted operator's exactly: bucket edges
    can't split a tie (equal timestamps land in the same bucket), and a
    bucket's carry-in is by construction older (newer, for forward)
    than everything in the bucket.
    """
    asc = direction == "backward"
    ts_dt = dict(unioned.dtypes)["__ts"]
    if ts_dt.startswith("timestamp"):
        tsn = F.unix_micros(F.col("__ts").cast("timestamp")).cast("double")
    else:
        tsn = F.col("__ts").cast("double")
    # __tsn is used ONLY to derive the bucket id: the double cast is
    # monotone and maps equal timestamps to equal doubles, so bucket
    # boundaries stay tie-safe even where a long ts exceeds 2^53. All
    # ORDERING below stays on the native __ts column — int64-nanosecond
    # epochs 1 ulp apart must not collapse in the carry sort.
    u = unioned.withColumn("__tsn", tsn)
    # one slim action: global ts range to size the buckets (columnar
    # min/max over the two ts columns — cheap next to the carry shuffle)
    lo, hi = u.agg(F.min("__tsn"), F.max("__tsn")).first()
    if lo is None or hi == lo:
        u = u.withColumn("__bkt", F.lit(0))
    else:
        width = (float(hi) - float(lo)) / n
        u = u.withColumn(
            "__bkt",
            F.least(
                F.lit(n - 1),
                F.floor((F.col("__tsn") - F.lit(float(lo))) / F.lit(width)).cast("int"),
            ),
        )
    order = [
        F.asc("__ts") if asc else F.desc("__ts"),
        F.asc("__side"),
    ]
    local_w = (
        Window.partitionBy(*keys, "__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn("__carry", F.last("__pay", ignorenulls=True).over(local_w))
    # bucket representative: the right payload a later (earlier, for
    # forward) bucket would carry in — max-ts right row of the bucket
    picker = F.max_by("__pay", F.col("__ts")) if asc else F.min_by(
        "__pay", F.col("__ts")
    )
    b_last = (
        u.filter(F.col("__side") == 0)
        .groupBy(*keys, "__bkt")
        .agg(picker.alias("__bpay"))
    )
    # every (key, bucket) that exists on either side needs a carry-in row,
    # including buckets with no right rows (ignorenulls skips their gap)
    combos = u.select(*keys, "__bkt").distinct()
    cin_w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("__bkt") if asc else F.desc("__bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cin = (
        combos.join(b_last, [*keys, "__bkt"], "left")
        .withColumn("__cin", F.last("__bpay", ignorenulls=True).over(cin_w))
        .select(*keys, "__bkt", "__cin")
    )
    return (
        local.join(cin, [*keys, "__bkt"], "left")
        .withColumn("__carry", F.coalesce(F.col("__carry"), F.col("__cin")))
        .filter(F.col("__side") == 1)
        .drop("__tsn", "__bkt", "__cin")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    direction: str = "backward",
    tie_col: str | None = None,
    how: str = "inner",
    prefix: str = "asof_",
    tolerance: float | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Join each left row to the nearest preceding (``backward``) or
    following (``forward``) right row per key.

    ``payload_cols``: right columns to carry (default: all non-key,
    non-ts columns). Output = left columns + ``prefix + ts_col`` +
    ``prefix + c`` for each payload column. ``how``: ``inner`` drops
    left rows with no match, ``left`` keeps them with NULL payload.
    ``tolerance``: maximum |left_ts - right_ts| for a match — seconds
    for timestamp columns, same units as the column for numeric ones;
    stale carries become non-matches (pandas ``merge_asof`` semantics).
    ``salt_buckets``: hot-key mitigation — split every key's timeline
    into N equal-width time buckets so the carry window parallelizes
    within a key; output is identical to the unsalted operator (ties
    can't straddle buckets: equal timestamps share a bucket). Costs one
    slim min/max action + a (key × bucket) chain window; use when a
    single key's rows exceed an executor partition.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in keys and c != ts_col
        ]
    if tie_col is not None:
        # deterministic right side: keep the greatest tie_col per (key, ts)
        w = Window.partitionBy(*keys, ts_col).orderBy(F.desc(tie_col))
        right = (
            right.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    payload = F.struct(F.col(ts_col).alias(ts_col), *[F.col(c) for c in payload_cols])
    left_cols = left.columns
    pass_cols = [c for c in left_cols if c not in keys and c != ts_col]
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in pass_cols],
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__pay"].dataType).alias("__pay"),
        *[F.col(c) for c in pass_cols],
    )
    unioned = r_tagged.unionByName(l_tagged)

    if direction == "backward":
        order = [F.asc("__ts"), F.asc("__side")]
    elif direction == "forward":
        order = [F.desc("__ts"), F.asc("__side")]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if salt_buckets is not None and salt_buckets > 1:
        carried = _salted_carry(unioned, keys, direction, salt_buckets)
    else:
        carry_w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(
            "__carry", F.last("__pay", ignorenulls=True).over(carry_w)
        ).filter(F.col("__side") == 1)

    if tolerance is not None:
        if dict(left.dtypes)[ts_col].startswith("timestamp"):
            def _secs(c):
                return F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000.0)
        else:
            def _secs(c):
                return c.cast("double")
        stale = (
            F.abs(_secs(F.col("__ts")) - _secs(F.col("__carry").getField(ts_col)))
            > F.lit(float(tolerance))
        )
        carried = carried.withColumn(
            "__carry", F.when(stale, F.lit(None)).otherwise(F.col("__carry"))
        )

    out = carried.select(
        *[F.col(k) for k in keys],
        F.col("__ts").alias(ts_col),
        *[F.col(c) for c in left_cols if c not in keys and c != ts_col],
        F.col("__carry").getField(ts_col).alias(f"{prefix}{ts_col}"),
        *[F.col("__carry").getField(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    if how == "inner":
        out = out.filter(F.col(f"{prefix}{ts_col}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be inner|left, got {how!r}")
    return out
