"""Round-7 additions: weighted reservoir sampling (A-ES), the hashed
linear classifier gate, and the HLL / Count-Min sketches — semantics via
hand/Python models plus the plan shapes that matter at scale (oracle
parity is covered by test_oracle_parity.py)."""

from __future__ import annotations

import contextlib
import hashlib
import io
import math

import pytest
from pyspark.sql import functions as F

from modware_loader_spark.operators import classifier as CL
from modware_loader_spark.operators import sketch as SK
from modware_loader_spark.operators.sampling import weighted_sample


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ------------------------------------------- weighted reservoir (A-ES)


def _wrs_score(key, weight, salt="wrs"):
    u = (_u32(f"{salt}{key}") + 1) / 4294967296.0
    return round(math.log(u) / weight, 6)


def test_weighted_sample_matches_python_model(spark):
    rows = [(i, "g%d" % (i % 3), float(1 + i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    got = {
        (r["grp"], r["doc_id"])
        for r in weighted_sample(
            df, n=4, weight_col="w", key_col="doc_id", group_cols=["grp"]
        ).collect()
    }
    exp = set()
    for g in ("g0", "g1", "g2"):
        scored = [
            (_wrs_score(i, w), i)
            for i, gg, w in rows
            if gg == g
        ]
        # top-4 by score desc, id asc on ties
        best = sorted(scored, key=lambda t: (-t[0], t[1]))[:4]
        exp |= {(g, i) for _, i in best}
    assert got == exp


def test_weighted_sample_excludes_bad_weights_and_is_proportional(spark):
    rows = [(0, 1000.0)] + [(i, 1.0) for i in range(1, 10)]
    rows += [(99, 0.0), (98, -1.0), (97, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    ids = {r["doc_id"] for r in weighted_sample(df, 12, "w", "doc_id").collect()}
    assert ids == set(range(10))  # bad-weight rows never sampled
    # n=1 over many salts: the 1000x-weight row must win the vast majority
    wins = sum(
        1
        for s in range(60)
        if weighted_sample(df, 1, "w", "doc_id", salt=f"s{s}").collect()[0][
            "doc_id"
        ]
        == 0
    )
    assert wins >= 50


def test_weighted_sample_plan_shapes(spark):
    df = spark.range(100).selectExpr(
        "id AS doc_id", "id % 5 AS grp", "1.0 + id % 3 AS w"
    )
    grouped = weighted_sample(df, 3, "w", "doc_id", group_cols=["grp"])
    plan_g = grouped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan_g
    out = weighted_sample(df, 7, "w", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    assert out.count() == 7


# ------------------------------------------------ hashed linear classifier


def test_classifier_hand_computed(spark):
    n_buckets = 64
    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "cc"), (3, "")], ["doc_id", "text"]
    )
    # weights: only aa and cc buckets occupied
    b = {t: _u32(t) % n_buckets for t in ("aa", "bb", "cc", "")}
    wt = spark.createDataFrame(
        [(b["aa"], 5), (b["cc"], -7)], "bucket long, w_micros long"
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["score_micros"], r["keep"])
        for r in CL.linear_classifier_score(
            docs, wt, n_buckets=n_buckets, bias_micros=1
        ).collect()
    }
    # doc 1: aa x2 -> 10 (+bb 0) + bias 1 = 11; 3 tokens
    exp1 = 11 if b["bb"] not in (b["aa"], b["cc"]) else None
    if exp1 is not None:
        assert out[1] == (3, 11, 1)
    # doc 2: cc -> -7 + 1 = -6 -> dropped
    assert out[2] == (1, -6, 0)
    # doc 3: split("") == [""] -> one "" token (hash-bucket weighted 0
    # unless colliding); keep iff score >= 0
    n3, s3, k3 = out[3]
    assert n3 == 1 and k3 == int(s3 >= 0)


def test_classifier_is_partitioning_invariant_and_broadcasts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wt = CL.synth_weight_table(spark, 512)
    base = {
        r["doc_id"]: r["score_micros"]
        for r in CL.linear_classifier_score(docs, wt, 512).collect()
    }
    shuffled = {
        r["doc_id"]: r["score_micros"]
        for r in CL.linear_classifier_score(
            docs.repartition(17, "source"), wt, 512
        ).collect()
    }
    assert base == shuffled
    plan = _formatted_plan(CL.linear_classifier_score(docs, wt, 512))
    assert "BroadcastHashJoin" in plan
    # no-broadcast escape hatch still computes identical scores
    nb = {
        r["doc_id"]: r["score_micros"]
        for r in CL.linear_classifier_score(
            docs, wt, 512, broadcast_weights=False
        ).collect()
    }
    assert nb == base


# ----------------------------------------------------------------- HLL


def test_hll_register_python_model_and_merge(spark):
    df = spark.createDataFrame(
        [(i, "g") for i in range(200)], ["k", "grp"]
    )
    regs = {
        (r["register"], r["max_rho"])
        for r in SK.hll_registers(df, "k", ["grp"]).collect()
    }
    model: dict[int, int] = {}
    for i in range(200):
        hx = hashlib.md5(f"hll{i}".encode()).hexdigest()
        reg = int(hx[:8], 16) % 64
        w = int(hx[8:16], 16)
        rho = 33 if w == 0 else 33 - w.bit_length()
        model[reg] = max(model.get(reg, 0), rho)
    assert regs == set(model.items())
    # sketch union: max-merge of two halves == sketch of the whole
    a = SK.hll_registers(df.filter("k < 100"), "k", ["grp"])
    b = SK.hll_registers(df.filter("k >= 100"), "k", ["grp"])
    merged = {
        (r["register"], r["max_rho"])
        for r in a.unionByName(b)
        .groupBy("grp", "register")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    assert merged == regs


def test_hll_estimate_accuracy_and_low_range(spark):
    # 500 distinct keys, m=64 -> expect ~13% standard error; allow 3 sigma
    df = spark.createDataFrame([(i, "g") for i in range(500)], ["k", "grp"])
    est = SK.hll_distinct(df, "k", ["grp"]).collect()[0]["estimate"]
    assert abs(est - 500) / 500 < 0.4
    # duplicates must not inflate the estimate (set semantics)
    dup = spark.createDataFrame(
        [(i % 500, "g") for i in range(5000)], ["k", "grp"]
    )
    assert SK.hll_distinct(dup, "k", ["grp"]).collect()[0]["estimate"] == est
    # low range hits the linear-counting branch and lands near-exact
    small = spark.createDataFrame([(i, "g") for i in range(5)], ["k", "grp"])
    est5 = SK.hll_distinct(small, "k", ["grp"]).collect()[0]["estimate"]
    assert abs(est5 - 5) <= 1.0


# ----------------------------------------------------------- Count-Min


def test_cms_one_sided_and_exact_when_sparse(spark):
    rows = [(f"k{i % 10}",) for i in range(1000)]
    df = spark.createDataFrame(rows, ["k"])
    sk = SK.cms_table(df, "k", depth=4, width=1024)
    exact = {f"k{i}": 100 for i in range(10)}
    keys = spark.createDataFrame([(k,) for k in exact], ["k"])
    got = {
        r["k"]: r["cms_count"]
        for r in SK.cms_estimate(sk, keys, "k", depth=4, width=1024).collect()
    }
    assert all(got[k] >= exact[k] for k in exact)  # one-sided error
    # 10 keys in 1024 columns: min over 4 rows is collision-free -> exact
    assert got == exact
    # unseen key estimates 0 (all its counters empty)
    unseen = spark.createDataFrame([("nope",)], ["k"])
    assert (
        SK.cms_estimate(sk, unseen, "k", depth=4, width=1024).collect()[0][
            "cms_count"
        ]
        == 0
    )


def test_cms_sketches_are_additive(spark):
    df = spark.createDataFrame([(f"k{i % 7}",) for i in range(700)], ["k"])
    whole = {
        (r["row"], r["col"]): r["cnt"]
        for r in SK.cms_table(df, "k", depth=3, width=64).collect()
    }
    # additive merge: union + re-sum of two sketches over the same rows
    half1 = SK.cms_table(
        spark.createDataFrame([(f"k{i % 7}",) for i in range(350)], ["k"]),
        "k", depth=3, width=64,
    )
    half2 = SK.cms_table(
        spark.createDataFrame([(f"k{i % 7}",) for i in range(350, 700)], ["k"]),
        "k", depth=3, width=64,
    )
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in half1.unionByName(half2)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == whole


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], ["k", "w"]
    )
    sk = SK.cms_table(df, "k", depth=2, width=128, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",)], ["k"])
    got = {
        r["k"]: r["cms_count"]
        for r in SK.cms_estimate(sk, keys, "k", depth=2, width=128).collect()
    }
    assert got == {"a": 12, "b": 1}


def test_sketches_ignore_null_keys(spark):
    """A single NULL key must not poison the group estimate (its md5 is
    NULL -> NULL register/rho; countDistinct semantics ignore NULLs)."""
    df = spark.createDataFrame(
        [("g", f"k{i}") for i in range(40)] + [("g", None), ("h", None)],
        ["g", "k"],
    )
    est = {
        r["g"]: r["estimate"]
        for r in SK.hll_distinct(df, "k", ["g"]).collect()
    }
    assert "h" not in est  # all-NULL group contributes no registers
    assert est["g"] is not None and est["g"] > 0
    clean = {
        r["g"]: r["estimate"]
        for r in SK.hll_distinct(df.filter(F.col("k").isNotNull()), "k", ["g"]).collect()
    }
    assert est == clean
    # CMS: NULL keys contribute no counter mass
    sk_null = SK.cms_table(df, "k", depth=2, width=32)
    sk_clean = SK.cms_table(df.filter(F.col("k").isNotNull()), "k", depth=2, width=32)
    assert sorted(map(tuple, sk_null.collect())) == sorted(map(tuple, sk_clean.collect()))
