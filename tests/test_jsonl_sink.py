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

    def shard_files(root):
        out = {}
        for d in glob.glob(os.path.join(root, "shard=*")):
            out[os.path.basename(d)] = sorted(
                glob.glob(os.path.join(d, "part-*"))
            )
        return out

    fa, fb = shard_files(pa), shard_files(pb)
    assert fa.keys() == fb.keys()
    # one-file-per-shard byte reproducibility (the r11 token-mapped
    # exchange contract): each shard is owned by exactly one task, so
    # exactly one part file, and its BYTES are identical across runs
    # with different input partitioning.
    for k in fa:
        assert len(fa[k]) == 1 and len(fb[k]) == 1, (k, fa[k], fb[k])
        with open(fa[k][0], "rb") as f1, open(fb[k][0], "rb") as f2:
            assert f1.read() == f2.read(), f"shard {k} diverged"

    def shard_lines(root):
        out = {}
        for d, files in shard_files(root).items():
            lines = []
            for f in files:
                with open(f) as fh:
                    lines += fh.readlines()
            out[d] = lines
        return out

    a, b = shard_lines(pa), shard_lines(pb)
    # within-shard order follows pos
    any_shard = next(iter(a.values()))
    poss = [json.loads(line)["pos"] for line in any_shard]
    assert poss == sorted(poss)
