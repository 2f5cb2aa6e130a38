from modware_loader_spark.functions.scalar import (
    dec_round,
    gff3_escape,
    gff3_unescape,
    hex64,
    md5_long,
    normalize_id,
    reverse_complement,
    strand_to_int,
    to_interbase,
    wrap_fasta,
)

__all__ = [
    "dec_round",
    "gff3_escape",
    "gff3_unescape",
    "hex64",
    "md5_long",
    "normalize_id",
    "reverse_complement",
    "strand_to_int",
    "to_interbase",
    "wrap_fasta",
]
