"""Cardinality / frequency sketches: HyperLogLog distinct estimation and
Count-Min frequency estimation, in portable deterministic arithmetic.

At 100 TB, exact per-group ``countDistinct`` shuffles every distinct key
and a full n-gram frequency table can dwarf the corpus; production
pipelines answer "how many distinct users/domains/tokens per group" and
"how often does this gram appear" with fixed-size mergeable sketches.
Spark ships ``approx_count_distinct`` (HLL++), but its register layout
is engine-private — useless when an external system must reproduce or
consume the sketch. The twins here use md5-derived hashes and exact
dyadic arithmetic so any SQL engine computes bit-identical registers:

- **HLL** (Flajolet et al. 2007): register = first 32 md5 bits mod m,
  rho = leading-zero rank of the next 32 bits; per-group state is m
  small ints (mergeable by MAX — union of sketches is elementwise max).
  The estimator's ``2^-M_j`` terms are dyadic rationals, summed exactly
  in doubles, so even the float math is engine-identical; only the
  low-range linear-counting branch uses ``ln`` (rounded, documented).
- **Count-Min** (Cormode & Muthukrishnan 2005): d independent md5-salted
  hash rows x w counters; estimate = min over rows. State is d*w longs
  per group — constant, vs the unbounded exact gram table; errors are
  one-sided (overestimates only), the safe direction for "is this gram
  suspiciously frequent" gates.

Both sketches build with one groupBy over hashed columns (map-side
partial aggregation — the shuffle carries at most group x register
rows, never the raw keys) and both expose their state tables, because
at scale the state IS the artifact you persist and merge across days.

Reference scope: none; extension scope (training-data pipeline
reporting) mandated by the north-star baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 64  # registers; alpha below is the m=64 constant
HLL_ALPHA = 0.709


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    m: int = HLL_M,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HLL register table ``(group..., register, max_rho)``.

    One md5 per key supplies both coordinates: bits 1-32 pick the
    register (mod ``m``), bits 33-64 feed rho = 33 - bit_length = the
    1-based position of the highest set bit counted from bit 32 (an
    all-zero slice scores the max rank 33). Registers never hit by a
    key are absent — the estimator treats them as 0, and sketch UNION
    is ``groupBy(...).agg(max(max_rho))`` over concatenated tables.

    NULL keys are dropped up front (countDistinct semantics): md5 of a
    NULL concat is NULL, so an unfiltered NULL key row would carry a
    NULL max_rho into the group and poison the whole estimate to NULL.
    """
    df = df.filter(F.col(key_col).isNotNull())
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    reg = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(m))
    w = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(33)).otherwise(F.lit(33) - F.length(F.bin(w)))
    return (
        df.select(*group_cols, reg.alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """Distinct-count estimate per group from an ``hll_registers`` table:
    ``(group..., n_registers, estimate)``.

    Raw HLL: ``E = alpha * m^2 / sum_j 2^(-M_j)`` with absent registers
    contributing ``2^0 = 1``; the ``2^-M_j`` terms are exact dyadic
    doubles so the sum (and hence E) is bit-identical in any engine.
    Low range (E <= 2.5m, empty registers remain): linear counting
    ``m * ln(m / V)`` — the one libm call, so the final estimate is
    rounded to 4dp with the same convention as the cosine operators.
    ``n_registers`` (occupied count) rides along for sketch telemetry.
    """
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__present"),
    )
    denom = F.col("__present") + (F.lit(m) - F.col("n_registers")).cast("double")
    raw = F.lit(HLL_ALPHA * m * m) / denom
    v = F.lit(m) - F.col("n_registers")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(raw)
    return agg.select(
        *group_cols, "n_registers", F.round(est, 4).alias("estimate")
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    m: int = HLL_M,
    salt: str = "hll",
) -> DataFrame:
    """``hll_registers`` piped into ``hll_estimate`` — the one-shot API.

    Standard error ~ 1.04/sqrt(m) (13% at the default m=64 — telemetry
    grade; raise m for precision, state grows linearly). The whole plan
    is two hash aggregations over (group, register) — the raw keys never
    shuffle, which is the entire point vs ``countDistinct`` at 100 TB.
    """
    return hll_estimate(
        hll_registers(df, key_col, group_cols, m=m, salt=salt), group_cols, m=m
    )


def cms_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch state: ``(row, col, cnt)`` — ``depth`` md5-salted
    hash rows x ``width`` counters over key *occurrences* (or summed
    ``weight_col``).

    Built as explode-to-d-rows → one groupBy: map-side combine bounds
    the shuffle at d*width rows per partition regardless of key skew.
    Merging two sketches = union + re-sum (counters are additive).
    NULL keys are dropped (their md5 is NULL → NULL row coordinates
    that would silently collect into a junk counter).
    """
    df = df.filter(F.col(key_col).isNotNull())
    val = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    rows = df.select(
        F.col(key_col).cast("string").alias("__k"), val.alias("__v")
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"{salt}{d}:"), F.col("__k")
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long"),
                            F.lit(width),
                        ).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__rc"),
        "__v",
    ).select("__rc.row", "__rc.col", "__v")
    return rows.groupBy("row", "col").agg(F.sum("__v").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a ``cms_table``:
    ``(key, cms_count)`` = min over the d counters each key hashes to.

    The sketch is d*width rows — broadcast; the probe is a map-side
    join however large ``keys`` is. Estimates are exact for keys with
    no collisions and only ever OVER-estimate (eps ~ e/width of total
    mass, delta ~ exp(-depth)).
    """
    probes = keys.select(F.col(key_col)).select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"{salt}{d}:"),
                                            F.col(key_col).cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long"),
                            F.lit(width),
                        ).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__rc"),
    ).select(key_col, "__rc.row", "__rc.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )
