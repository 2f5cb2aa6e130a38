"""Sharded JSONL training-data export — the format LLM trainers consume.

The curation chain's terminal stage: write the kept corpus as
``shard=K/`` -partitioned ``.json[.gz]`` files with a deterministic
random document order INSIDE each shard, so a training run streaming
shard files sees the corpus in reproducible shuffled order (re-exports
after incremental recrawls produce byte-identical shards for unchanged
documents).

Spark shape: ``assign_shards`` (md5-uniform shard + within-shard
position, one hash shuffle) → ``repartition(shard)`` +
``sortWithinPartitions(shard, pos)`` → ``partitionBy("shard")`` native
JSON writer. No global sort, no single-node funnel; each shard's file
set is written by the task(s) owning that shard hash. Compression is
the writer's codec option (gzip by default — splittability does not
matter for training shards, which are consumed whole).

Reference scope: none (the reference's dumps are GFF3/FASTA/GAF/TSV;
extension scope — the export leg of the training-data pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modware_loader_spark.operators.packing import assign_shards


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    codec: str | None = "gzip",
    salt: str = "shard",
) -> None:
    """Export ``df`` as ``path/shard=K/*.json[.gz]`` with deterministic
    shard membership and reproducible within-shard order.

    The ``pos`` ordering column is kept IN the rows (harmless to
    trainers, and it lets a reader verify order / resume mid-shard);
    ``shard`` becomes the partition directory.
    """
    out = assign_shards(df, n_shards, key_col=key_col, salt=salt)
    # repartitionByRange, not repartition(n, col): hash-partitioning the
    # shard VALUE collides (hash(k) % n), leaving some tasks writing
    # multiple shards and others none; the range partitioner lands ~one
    # shard per task. Per-shard file content/order is deterministic
    # either way (partitionBy splits directories, the sort orders rows);
    # only task balance changes.
    writer = (
        out.repartitionByRange(n_shards, F.col("shard"), F.col("pos"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if codec:
        writer = writer.option("compression", codec)
    writer.json(path)


def read_jsonl_shards(spark, path: str) -> DataFrame:
    """Round-trip reader: the exported dataset with its ``shard``
    partition column and ``pos`` order column restored."""
    return spark.read.json(path)
