from __future__ import annotations

import os

# Tiny-fixture tuning for the TEST session only (r13): every test runs
# on KB-scale data where per-task dispatch dominates, so fewer shuffle
# partitions cut the suite's wall clock ~25% (measured on
# test_ontology_load: 4m36s -> 3m25s) without changing any result or
# plan SHAPE (node counts are width-independent; no test pins a
# partition count). Real deployments size this via the same env var;
# bench.py does not inherit this default (separate process, env unset).
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")

import pytest

from modware_loader_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("modware-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
