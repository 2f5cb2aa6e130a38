"""Local replica of the driver's correctness gate: run each ``queries()``
entry on Spark and its ``oracle_sql()`` on DuckDB over the same parquet,
compare row count + column names + order-insensitive values.

Values are canonicalized conservatively (floats via repr of round(12),
everything else via str) — stricter than any sane hash, so passing here
should imply passing the driver's hash.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 12))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon_cell(r[i]) for i in idx))
    out.sort()
    return sorted(c for c in cols), out


def non_scalar_columns(schema) -> list[str]:
    """Result columns the driver's canonicalizer cannot sort.

    The external gate canonicalizes via pandas ``sort_values`` over every
    column; Array/Map/Struct cells materialize as Python lists/dicts and
    raise ``TypeError: unhashable type: 'list'`` there (this zeroed
    ``embed_quantize_int8``'s r6 row). The local ``canon_cell`` used to
    stringify cells, hiding exactly that class of incompatibility — so
    flag it here instead: registered queries must emit scalar columns
    (explode arrays, or hash/join them to a string).
    """
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def compare(spark, sf_dir: str, name: str, fn, sql: str | None):
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    # Only oracle-backed queries flow through the driver's pandas canon;
    # rows-only entries are count-checked and may carry any shape.
    bad = non_scalar_columns(sdf.schema) if sql is not None else []
    if bad:
        return {
            "name": name,
            "ok": False,
            "status": "non_scalar_columns",
            "non_scalar_columns": bad,
            "error": (
                f"columns {bad} are array/map/struct-typed; the driver's "
                "pandas canonicalization cannot sort them — emit scalar "
                "columns (posexplode, or a deterministic string digest)"
            ),
        }
    srows = [tuple(r) for r in sdf.collect()]
    result = {"name": name, "spark_rows": len(srows)}
    if sql is None:
        result["status"] = "rows_only"
        result["ok"] = len(srows) >= 0
        return result
    con = duckdb_conn(sf_dir)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    result["oracle_rows"] = len(orows)
    # Dtype-drift guard: the driver hashes the oracle result after a pandas
    # conversion (``fetchdf``), where DuckDB HUGEINT (e.g. sum(BIGINT)) and
    # nullable ints materialize as float64 even when every value is integral.
    # ``fetchall`` yields Python ints, so the value comparison below is blind
    # to it (this bit CORRECTNESS_r04's pack_token_budget). Flag any column
    # that is float64 in pandas but purely int in fetchall: the oracle SQL
    # needs an explicit CAST(... AS BIGINT).
    odf = con.execute(sql).fetchdf()
    # The hash poisons only when the two sides LAND on different pandas
    # dtypes: the oracle column goes float64 (HUGEINT, or NULL-laden
    # BIGINT) while the Spark column stays int64 (pure non-null ints).
    # When Spark's column also holds NULLs, both sides become float64
    # and the hashes agree (CORRECTNESS_r04: m10/s5 green) — only the
    # asymmetric case is drift.
    drift = []
    scol_idx = {c: i for i, c in enumerate(scols)}
    for ci, cname in enumerate(ocols):
        if str(odf.dtypes.iloc[ci]) != "float64" or cname not in scol_idx:
            continue
        ovals = [r[ci] for r in orows]
        svals = [r[scol_idx[cname]] for r in srows]
        o_intish = ovals and all(
            v is None or (isinstance(v, int) and not isinstance(v, bool))
            for v in ovals
        )
        s_pure_int = svals and all(
            isinstance(v, int) and not isinstance(v, bool) for v in svals
        )
        if o_intish and s_pure_int:
            drift.append(cname)
    if drift:
        result["dtype_drift"] = drift
    sc, sr = canon_rows(scols, srows)
    oc, orr = canon_rows(ocols, orows)
    result["schema_ok"] = sc == oc
    result["count_ok"] = len(sr) == len(orr)
    result["values_ok"] = sr == orr
    result["ok"] = (
        result["schema_ok"]
        and result["count_ok"]
        and result["values_ok"]
        and not drift
    )
    if not result["schema_ok"]:
        result["spark_cols"] = sc
        result["oracle_cols"] = oc
    if result["schema_ok"] and not result["values_ok"]:
        diff_s = [r for r in sr if r not in set(orr)][:3]
        diff_o = [r for r in orr if r not in set(sr)][:3]
        result["spark_only"] = diff_s
        result["oracle_only"] = diff_o
    return result
