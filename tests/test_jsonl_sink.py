"""Sharded JSONL export: round trip, deterministic membership/order,
gzip file layout."""

from __future__ import annotations

import glob
import json
import os

from modware_loader_spark.sinks.jsonl import read_jsonl_shards, write_jsonl_shards


def test_jsonl_shards_round_trip_and_layout(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    path = str(tmp_path / "export")
    write_jsonl_shards(docs, path, n_shards=4)
    # layout: shard=K dirs with .json.gz part files
    dirs = sorted(os.path.basename(d) for d in glob.glob(os.path.join(path, "shard=*")))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    assert glob.glob(os.path.join(path, "shard=*", "*.json.gz"))
    back = read_jsonl_shards(spark, path)
    assert back.count() == n
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_jsonl_shards_reproducible_bytes(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    # different input partitioning must not change shard contents/order
    write_jsonl_shards(docs, pa, n_shards=3, codec=None)
    write_jsonl_shards(docs.repartition(7), pb, n_shards=3, codec=None)

    def shard_lines(root):
        out = {}
        for d in glob.glob(os.path.join(root, "shard=*")):
            lines = []
            for f in sorted(glob.glob(os.path.join(d, "part-*"))):
                with open(f) as fh:
                    lines += fh.readlines()
            out[os.path.basename(d)] = lines
        return out

    a, b = shard_lines(pa), shard_lines(pb)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], f"shard {k} diverged"
    # within-shard order follows pos
    any_shard = next(iter(a.values()))
    poss = [json.loads(line)["pos"] for line in any_shard]
    assert poss == sorted(poss)
