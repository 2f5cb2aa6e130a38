"""Sharded JSONL training-data export — the format LLM trainers consume.

The curation chain's terminal stage: write the kept corpus as
``shard=K/`` -partitioned ``.json[.gz]`` files with a deterministic
random document order INSIDE each shard, so a training run streaming
shard files sees the corpus in reproducible shuffled order (re-exports
after incremental recrawls produce byte-identical shards for unchanged
documents).

Spark shape: ``assign_shards`` (md5-uniform shard + within-shard
position, one hash shuffle) → token-mapped ``repartition`` (each shard
pre-solved to its OWN partition — one task, one part file, see
``_shard_tokens``) + ``sortWithinPartitions(shard, pos)`` →
``partitionBy("shard")`` native JSON writer. No global sort, no
single-node funnel, no sampling-dependent boundaries. Compression is
the writer's codec option (gzip by default — splittability does not
matter for training shards, which are consumed whole).

Reference scope: none (the reference's dumps are GFF3/FASTA/GAF/TSV;
extension scope — the export leg of the training-data pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modware_loader_spark.operators.packing import assign_shards

# (n_shards -> {shard: token}) memo: the token search is a pure function
# of n_shards and Spark's fixed murmur3 seed, so one tiny job per
# distinct n_shards per process.
_TOKEN_MEMO: dict[int, dict[int, int]] = {}


def _shard_tokens(spark, n_shards: int) -> dict[int, int]:
    """For each shard id k, the smallest int token t with
    ``pmod(hash(t), n_shards) == k`` — evaluated through Spark's own
    ``hash()`` (murmur3, fixed seed 42), so the mapping is exact for
    whatever hash the exchange will apply. Coupon-collector bound:
    ~n·ln n candidates expected; batches of 32·n until covered."""
    memo = _TOKEN_MEMO.get(n_shards)
    if memo is not None:
        return memo
    tokens: dict[int, int] = {}
    start = 0
    while len(tokens) < n_shards:
        batch = spark.range(start, start + 32 * n_shards).select(
            F.col("id").cast("int").alias("t"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_shards)).alias("p"),
        )
        for r in batch.collect():
            if r["p"] not in tokens:
                tokens[int(r["p"])] = int(r["t"])
        start += 32 * n_shards
    _TOKEN_MEMO[n_shards] = tokens
    return tokens


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
    # Exactly ONE task per shard, deterministically (r11, closing the
    # r10 repartitionByRange advice): hash-partitioning the shard VALUE
    # collides (hash(k) % n — some tasks own two shards, others none;
    # the r9 balance complaint), and repartitionByRange's boundary
    # SAMPLING made file splits depend on defaultParallelism / input
    # partition count, weakening the advertised byte-identical-shard
    # contract to per-directory content. Instead each shard id maps to
    # a probe TOKEN pre-solved so murmur3(token) lands in its own
    # partition — a pure function of (n_shards, Spark's fixed hash
    # seed), independent of data, configs and input partitioning:
    # one shard -> one task -> one part file, bit-reproducible.
    tokens = _shard_tokens(df.sparkSession, n_shards)
    tok = F.create_map(
        *[F.lit(x) for k, t in tokens.items() for x in (k, t)]
    )[F.col("shard")]
    writer = (
        out.withColumn("__tok", tok)
        .repartition(n_shards, F.col("__tok"))
        .drop("__tok")
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
