"""Scalar-function surface (SURVEY.md §2.7) — all JVM-side built-ins.

The reference's scalar work (split/trim/regex/concat/md5/length/strptime,
coordinate shifts, strand encoding — see e.g.
``lib/Modware/Loader/Role/WithChadoGFF3Helper.pm:328-342`` for the 1-based →
0-based interbase shift and ``:336-338`` for strand encoding,
``lib/Modware/Loader/Role/WithChadoHelper.pm:131-155`` for DB:ACC id
normalization, ``lib/Modware/Export/Command/chado2fasta.pm:359-378`` for
60-column FASTA wrap and ``:432-465`` for reverse-complement) maps 1:1 onto
``pyspark.sql.functions`` so every expression stays inside whole-stage
codegen — no Python in the hot path.

``md5_long``/``hex64`` exist so near-dup hashing (MinHash/SimHash) is
*portable*: Spark `conv(substring(md5(x),1,15),16,10)` and DuckDB
``cast('0x'||substring(md5(x),1,15) as bigint)`` produce identical 60-bit
integers, which lets the driver's DuckDB oracle hash-match our results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_array(values, element_sql_type: str = "bigint") -> Column:
    """A literal array column built as ONE parsed SQL expression.

    ``F.lit(<python list>)`` decomposes into ``array(*[lit(x) ...])`` —
    one py4j round trip PER ELEMENT — so a 4096-slot model literal costs
    ~3-5 s of driver-side plan construction on every query invocation
    (measured r12; the dense_fold_score fold was the worst offender).
    Rendering the same constant as SQL text and parsing it JVM-side is
    a single call (~10 ms at 4096 elements) and yields the identical
    constant-folded array.

    ``element_sql_type``: ``bigint`` (int values, ``L`` suffix) or
    ``double`` (``repr(float)`` + ``D`` — the exact round-trip text form
    ``operators/ivf._sql_arr`` already uses). Nested lists render as
    ``array(array(...), ...)`` of the element type.
    """

    def render(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(render(x) for x in v) + ")"
        if element_sql_type == "double":
            return f"{float(v)!r}D"
        return f"{int(v)}L"

    return F.expr(render(list(values)))


def md5_long(col: Column, seed: int | None = None) -> Column:
    """Deterministic 60-bit integer hash of a string column via md5.

    Portable across Spark and DuckDB (same md5, same hex prefix). ``seed``
    varies the hash family for MinHash by suffixing the input.
    """
    if seed is not None:
        col = F.concat(col.cast("string"), F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hex64(col: Column, bits: int = 60) -> Column:
    """First ``bits`` bits of md5 as a long (bits must be a multiple of 4)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, bits // 4), 16, 10).cast("long")


def round_half_away(x: float) -> int:
    """Driver-side round-ties-away-from-zero — the tie rule Spark's
    ``F.round`` (HALF_UP) and DuckDB's ``round`` share. Python's builtin
    ``round`` is banker's (half-even), which WOULD diverge from a SQL
    oracle on an exact .5 step (reachable: ``0.1 * 5.0 == 0.5`` exactly
    in IEEE). Repo-wide convention for any driver-computed integer that
    an engine-side ``round`` must reproduce (classifier weight updates,
    PageRank micro-unit constants)."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def dec_round(col: Column, scale: int = 2) -> Column:
    """Aggregate-stable rounding: exact decimal arithmetic, then round, then
    double. Using decimal for the sum makes the result independent of
    partition/accumulation order, so Spark and DuckDB agree bit-for-bit."""
    return F.round(col, scale).cast("double")


def dec(col: Column, precision: int = 38, scale: int = 6) -> Column:
    """Cast to exact decimal before summing (order-independent aggregation)."""
    return col.cast(f"decimal({precision},{scale})")


def normalize_id(col: Column, default_db: str = "internal") -> tuple[Column, Column]:
    """Split ``DB:ACC`` into (db, accession); bare ids get ``default_db``.

    Reference: ``lib/Modware/Loader/Role/WithChadoHelper.pm:131-155``.
    """
    has_prefix = F.instr(col, ":") > 0
    db = F.when(has_prefix, F.substring_index(col, ":", 1)).otherwise(F.lit(default_db))
    acc = F.when(has_prefix, F.substring_index(col, ":", -1)).otherwise(col)
    return db, acc


def strand_to_int(col: Column) -> Column:
    """GFF3 strand ``+``/``-``/``.`` → 1 / -1 / 0.

    Reference: ``lib/Modware/Loader/Role/WithChadoGFF3Helper.pm:336-338``.
    """
    return (
        F.when(col == "+", F.lit(1)).when(col == "-", F.lit(-1)).otherwise(F.lit(0)).cast("int")
    )


def to_interbase(start_col: Column) -> Column:
    """1-based GFF3 start → 0-based interbase (Chado convention).

    Reference: ``lib/Modware/Loader/Role/WithChadoGFF3Helper.pm:328-342``.
    """
    return (start_col.cast("long") - 1).cast("long")


def reverse_complement(col: Column) -> Column:
    """Reverse-complement a nucleotide string (JVM-side, no UDF).

    Reference: ``lib/Modware/Export/Command/chado2fasta.pm:432-465`` uses
    BioPerl revcom; here it is ``translate(reverse(seq))``.
    """
    return F.translate(F.reverse(col), "ATGCatgc", "TACGtacg")


def wrap_fasta(col: Column, width: int = 60) -> Column:
    """Insert newlines every ``width`` chars (FASTA 60-column wrap).

    Reference: ``lib/Modware/Export/Command/chado2fasta.pm:359-378``
    (``s/(\\S{1,60})/$1\\n/g``).
    """
    return F.regexp_replace(col, f"(.{{1,{width}}})", "$1\n")


# GFF3 column-9 percent-escaping (Bio::GFF3::LowLevel semantics, used by
# the reference at lib/Modware/Load/Command/gff3tochado.pm:10,208): the
# spec's reserved set for attribute values. '+' is NEVER touched (GFF3 is
# not form-encoding — url_decode would corrupt it). '%' decodes last /
# encodes first so literal percents round-trip.
_GFF3_CODES = [
    ("%3B", ";"),
    ("%3D", "="),
    ("%26", "&"),
    ("%2C", ","),
    ("%09", "\t"),
    ("%0A", "\n"),
    ("%0D", "\r"),
]


def gff3_unescape(col: Column) -> Column:
    """Decode %XX escapes in a GFF3 attribute value (case-insensitive)."""
    out = col
    for code, ch in _GFF3_CODES:
        out = F.regexp_replace(out, "(?i)" + code, ch)
    return F.regexp_replace(out, "(?i)%25", "%")


def gff3_escape(col: Column) -> Column:
    """Re-encode the reserved set for writing a GFF3 attribute value."""
    out = F.replace(col, F.lit("%"), F.lit("%25"))
    for code, ch in _GFF3_CODES:
        out = F.replace(out, F.lit(ch), F.lit(code))
    return out
