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


def spark_landing_kind(field, vals) -> str:
    """Predict the numpy dtype *kind* a Spark result column lands on
    after the driver's ``toPandas`` conversion.

    The external gate hashes both engines' results at the pandas level,
    so what matters is not the logical type but the LANDING dtype class:
    DuckDB ``fetchdf`` and Spark ``toPandas`` must agree or the hash can
    never match even when every value is identical. Three rounds hit
    this (r4 HUGEINT→float64 vs int64, r6 list cells, r10 DECIMAL(38,0)
    →float64 vs object(Decimal)); the r4/r6 guards were class-specific
    and DECIMAL slipped through — this predicts the landing kind for
    EVERY type so no further class can.

    Derived from the schema + the already-collected values (null
    presence flips integral/bool columns to float64/object) instead of
    a second ``toPandas`` execution, so the guard costs nothing.
    """
    from pyspark.sql import types as T

    dt = field.dataType
    has_null = any(v is None for v in vals)
    if isinstance(dt, T.DecimalType):
        return "O"  # object(decimal.Decimal) — the r10 killer
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "f" if has_null else "i"
    if isinstance(dt, T.BooleanType):
        return "O" if has_null else "b"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "M"
    if isinstance(dt, T.DateType):
        return "D"  # matches datetime64 OR object — pandas-version-dependent
    return "O"


def landing_mismatches(sdf_schema, scols, srows, ocols, odf) -> list[dict]:
    """Columns whose pandas landing dtype class differs between engines."""
    scol_idx = {c: i for i, c in enumerate(scols)}
    out = []
    for ci, cname in enumerate(ocols):
        if cname not in scol_idx:
            continue  # schema_ok check reports missing columns
        si = scol_idx[cname]
        okind = odf.dtypes.iloc[ci].kind
        if okind == "u":
            okind = "i"
        svals = [r[si] for r in srows]
        skind = spark_landing_kind(sdf_schema.fields[si], svals)
        if skind == "D":
            ok = okind in ("M", "O")
        else:
            ok = skind == okind
        if not ok:
            out.append(
                {
                    "column": cname,
                    "spark_kind": skind,
                    "oracle_kind": okind,
                    "oracle_dtype": str(odf.dtypes.iloc[ci]),
                }
            )
    return out


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
    # Landing-dtype guard: the driver hashes both results after a pandas
    # conversion, so the PAIR of landing dtypes must agree per column —
    # ``fetchall``/``canon_cell`` value equality is blind to it (r4
    # HUGEINT float64 vs int64; r10 DECIMAL float64 vs object(Decimal)).
    # Compare DuckDB's actual ``fetchdf`` dtype class against the
    # predicted Spark ``toPandas`` class for EVERY column and fail on
    # any mismatch — no per-class special cases left to slip through.
    odf = con.execute(sql).fetchdf()
    drift = landing_mismatches(sdf.schema, scols, srows, ocols, odf)
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
