"""JL ±1 random projection: matrix determinism, shape, and the
distance-preservation sanity JL guarantees in expectation (oracle
parity is covered by test_oracle_parity.py)."""

from __future__ import annotations

import math

from modware_loader_spark.operators import similarity as S


def test_sign_matrix_deterministic_and_pm1():
    a = S.rp_sign_matrix(4, 8)
    b = S.rp_sign_matrix(4, 8)
    assert a == b
    assert all(v in (1.0, -1.0) for row in a for v in row)
    # not degenerate: both signs occur
    flat = [v for row in a for v in row]
    assert 1.0 in flat and -1.0 in flat


def test_projection_shape_and_linearity(spark):
    rows = [
        (0, [1.0] * 8),
        (1, [2.0] * 8),
        (2, [0.0] * 8),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.random_projection(df, out_dims=3, in_dims=8)
    got = {(r["vec_id"], r["k"]): r["proj"] for r in out.collect()}
    assert len(got) == 9
    for k in range(3):
        # linearity: doubling the vector doubles every projection;
        # the zero vector projects to zero
        assert got[(1, k)] == 2 * got[(0, k)]
        assert got[(2, k)] == 0.0
        # a ±1 row dotted with the all-ones vector = (#plus - #minus),
        # an integer of the same parity as the input dim
        assert got[(0, k)] == int(got[(0, k)])
        assert int(got[(0, k)]) % 2 == 8 % 2


def test_distance_preservation_in_expectation(spark):
    # E[||Px||^2] = out_dims * ||x||^2 for ±1 JL rows; with out_dims=32
    # the concentration is loose but the ratio must land well inside
    # [0.3, 3] for a fixed unit vector — a smoke check that signs are
    # balanced, not a statistical proof.
    import hashlib

    v = [1.0 if i % 3 else -0.5 for i in range(16)]
    norm2 = sum(x * x for x in v)
    df = spark.createDataFrame(
        [(0, v)], "vec_id long, embedding array<float>"
    )
    out = S.random_projection(df, out_dims=32, in_dims=16).collect()
    pnorm2 = sum(r["proj"] ** 2 for r in out)
    ratio = pnorm2 / (32 * norm2)
    assert 0.3 < ratio < 3.0
