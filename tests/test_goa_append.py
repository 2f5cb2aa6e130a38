"""GOA appender roles vs the reference goldens.

Reference tests: ``t/role/append_ncrna.t`` (23-line input + shared ncRNA
GAF → 226 lines) and ``t/role/appenduplicate.t`` (14-line input → 49 lines:
2 actin rows × 16 other members + 3 chr2-map hits).
"""

from __future__ import annotations

import os

import pytest

from modware_loader_spark.plans.goa_append import (
    append_duplicates,
    append_ncrna,
    duplicate_copies,
    load_chr2_dups,
    load_ncrna_gaf,
)
from modware_loader_spark.sources.gaf import parse_gaf

REF = "/root/reference"
NCRNA_GAF = os.path.join(REF, "share", "dicty_ncRNA.gaf")
CHR2_DUPS = os.path.join(REF, "share", "chr2dups.txt")
NCRNA_INPUT = os.path.join(REF, "t", "test_data", "test_dicty_ncrna.gaf2")
DUP_INPUT = os.path.join(REF, "t", "test_data", "testdicty.gaf2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(NCRNA_GAF), reason="reference share data not present"
)


def test_append_ncrna_golden_counts(spark):
    gaf = parse_gaf(spark, NCRNA_INPUT)
    ncrna = load_ncrna_gaf(spark, NCRNA_GAF)
    out = append_ncrna(gaf, ncrna)
    # reference: 23 file lines (3 comments) + 203 ncRNA rows = 226 output
    # lines; our DataFrames carry only the data rows.
    assert gaf.count() == 20
    assert ncrna.count() == 203
    assert out.count() == 223
    assert out.columns == gaf.columns


def test_append_duplicates_golden_counts(spark):
    gaf = parse_gaf(spark, DUP_INPUT)
    chr2 = load_chr2_dups(spark, CHR2_DUPS)
    copies = duplicate_copies(gaf, chr2_map=chr2)
    # reference: 14 lines (2 comments) → 49: 12 data + 2×16 actin + 3 chr2.
    assert gaf.count() == 12
    assert copies.count() == 35
    out = append_duplicates(gaf, chr2_map=chr2)
    assert out.count() == 47

    # the actin source rows (DDB_G0289663) re-key to exactly the 16 OTHER
    # group members, never back to themselves
    from modware_loader_spark.plans.goa_append import DUPLICATE_GROUPS

    sample = copies.where(copies.go_id == "GO:0001891").collect()
    got = sorted(r.db_object_id for r in sample)
    expected = sorted(set(DUPLICATE_GROUPS["actin"]) - {"DDB_G0289663"})
    assert got == expected


def test_append_duplicates_broadcast_plan(spark):
    gaf = parse_gaf(spark, DUP_INPUT)
    chr2 = load_chr2_dups(spark, CHR2_DUPS)
    plan = append_duplicates(gaf, chr2_map=chr2)._jdf.queryExecution().executedPlan().toString()
    # duplicate tables are broadcast — the big GAF side must not shuffle
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
