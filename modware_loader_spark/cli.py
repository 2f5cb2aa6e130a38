"""Command-line surface mirroring the reference's app suite
(``bin/modware-load`` / ``modware-export`` verbs): each subcommand is one
of the plans over a persistent parquet Chado catalog.

    python -m modware_loader_spark.cli gff3tochado  --input f.gff3 --catalog DIR
    python -m modware_loader_spark.cli obo2chado    --input f.obo  --catalog DIR
    python -m modware_loader_spark.cli oboclosure2chado --input f.inf --catalog DIR
    python -m modware_loader_spark.cli chado2gff3   --catalog DIR --output out/
    python -m modware_loader_spark.cli chado2fasta  --catalog DIR --output out/

The reference wraps each command in one DB transaction
(``gff3tochado.pm:251,272-277``); here a load mutates the catalog only
after the merge succeeds (save at the end), giving the same all-or-nothing
contract per command.
"""

from __future__ import annotations

import argparse
import json
import sys

from modware_loader_spark.catalog import (
    ChadoCatalog,
    restore_loader_state,
    save_loader_state,
)
from modware_loader_spark.session import get_spark


def _gff3_loader(spark, catalog):
    from modware_loader_spark.plans.gff3_load import ChadoGFF3Loader

    loader = ChadoGFF3Loader(spark)
    restore_loader_state(loader, catalog)
    return loader


def cmd_gff3tochado(args) -> dict:
    spark = get_spark("gff3tochado")
    catalog = ChadoCatalog(spark, args.catalog)
    loader = _gff3_loader(spark, catalog)
    counts = loader.load_file(args.input)
    if not args.dry_run:
        save_loader_state(loader, catalog)
    return counts


def cmd_gb2chado(args) -> dict:
    from modware_loader_spark.plans.genbank_load import GenBankChadoLoader

    spark = get_spark("gb2chado")
    catalog = ChadoCatalog(spark, args.catalog)
    loader = GenBankChadoLoader(
        spark,
        reference_type=args.reference_type,
        id_prefix=args.id_prefix,
        mitochondrial=args.mitochondrial,
    )
    restore_loader_state(loader.gff3, catalog)
    counts = loader.load_file(args.input)
    if not args.dry_run:
        save_loader_state(loader.gff3, catalog)
    return counts


def cmd_obo2chado(args) -> dict:
    from modware_loader_spark.plans.ontology_load import ChadoOntologyLoader

    spark = get_spark("obo2chado")
    catalog = ChadoCatalog(spark, args.catalog)
    loader = ChadoOntologyLoader(spark)
    restore_loader_state(loader, catalog)
    counts = loader.load_file(args.input, force=args.force)
    if not args.dry_run:
        save_loader_state(loader, catalog)
    return counts


def cmd_dropontofromchado(args) -> dict:
    from modware_loader_spark.plans.ontology_load import (
        ChadoOntologyLoader,
        drop_ontology,
    )

    spark = get_spark("dropontofromchado")
    catalog = ChadoCatalog(spark, args.catalog)
    loader = ChadoOntologyLoader(spark)
    restore_loader_state(loader, catalog)
    counts: dict[str, int] = {}
    for ns in args.namespace.split(","):
        c = drop_ontology(loader, ns.strip(), partial=args.partial_lookup)
        for k, v in c.items():
            counts[k] = counts.get(k, 0) + v
    if not args.dry_run:
        save_loader_state(loader, catalog)
    return counts


def cmd_oboclosure2chado(args) -> dict:
    from modware_loader_spark.plans.closure_load import ClosureLoader
    from modware_loader_spark.plans.ontology_load import ChadoOntologyLoader

    spark = get_spark("oboclosure2chado")
    catalog = ChadoCatalog(spark, args.catalog)
    onto = ChadoOntologyLoader(spark)
    restore_loader_state(onto, catalog)
    closure = ClosureLoader(onto)
    restore_loader_state(onto, catalog)  # picks up cvtermpath if present
    counts = closure.load_file(args.input)
    if not args.dry_run:
        save_loader_state(onto, catalog)
    return counts


def cmd_chado2gff3(args) -> dict:
    from modware_loader_spark.plans.exports import chado2gff3_rows, sequence_regions
    from modware_loader_spark.sinks.gff3 import write_gff3

    spark = get_spark("chado2gff3")
    catalog = ChadoCatalog(spark, args.catalog)
    loader = _gff3_loader(spark, catalog)
    rows = chado2gff3_rows(loader)
    write_gff3(rows, args.output, sequence_regions=sequence_regions(loader))
    return {"features_exported": rows.count()}


def cmd_chado2alignmentgff3(args) -> dict:
    from modware_loader_spark.plans.exports import (
        chado2alignment_rows,
        sequence_regions,
    )
    from modware_loader_spark.sinks.gff3 import write_gff3

    spark = get_spark("chado2alignmentgff3")
    catalog = ChadoCatalog(spark, args.catalog)
    loader = _gff3_loader(spark, catalog)
    rows = chado2alignment_rows(
        loader,
        args.feature_type,
        match_type=args.match_type,
        force_name=args.force_name,
        add_description=args.add_description,
    )
    regions = sequence_regions(loader) if args.write_sequence_region else None
    write_gff3(rows, args.output, sequence_regions=regions)
    return {"features_exported": rows.count()}


def cmd_gff3alignment(args) -> dict:
    from modware_loader_spark.plans.gff3_filter import filter_gff3_alignments
    from modware_loader_spark.sinks.gff3 import write_gff3
    from modware_loader_spark.sources.gff3 import parse_gff3

    from pyspark.sql import functions as F

    from modware_loader_spark.functions import strand_to_int

    spark = get_spark("gff3alignment")
    features, _ = parse_gff3(spark, args.input)
    kept = filter_gff3_alignments(
        features.withColumn("strand", strand_to_int(F.col("strand"))),
        match_type=args.match_type,
        match_part_distance=args.match_part_distance,
    )
    write_gff3(kept.drop("line_idx"), args.output)
    return {"features_kept": kept.count()}


def cmd_chado2fasta(args) -> dict:
    from pyspark.sql import functions as F

    from modware_loader_spark.plans.exports import spliced_sequences
    from modware_loader_spark.sinks.fasta import write_fasta

    spark = get_spark("chado2fasta")
    catalog = ChadoCatalog(spark, args.catalog)
    loader = _gff3_loader(spark, catalog)
    if args.feature_type:
        seqs = spliced_sequences(loader, child_type=args.feature_type).select(
            F.col("parent").alias("id"), F.col("spliced").alias("sequence")
        )
    else:
        seqs = loader.tables["feature"].filter(F.col("residues").isNotNull()).select(
            F.col("uniquename").alias("id"), F.col("residues").alias("sequence")
        )
    write_fasta(seqs, args.output)
    return {"sequences_exported": seqs.count()}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="modware-spark")
    sub = p.add_subparsers(dest="command", required=True)

    def add(name, fn, catalog=True, **flags):
        sp = sub.add_parser(name)
        if catalog:
            sp.add_argument("--catalog", required=True, help="parquet catalog dir")
        sp.add_argument("--dry_run", action="store_true")
        for flag, kw in flags.items():
            sp.add_argument(flag, **kw)
        sp.set_defaults(fn=fn)

    add("gff3tochado", cmd_gff3tochado, **{"--input": {"required": True}})
    add("gb2chado", cmd_gb2chado,
        **{"--input": {"required": True},
           "--reference_type": {"default": "supercontig"},
           "--id_prefix": {"default": "GB"},
           "--mitochondrial": {"action": "store_true"}})
    add("obo2chado", cmd_obo2chado,
        **{"--input": {"required": True}, "--force": {"action": "store_true"}})
    add("oboclosure2chado", cmd_oboclosure2chado, **{"--input": {"required": True}})
    add("dropontofromchado", cmd_dropontofromchado,
        **{"--namespace": {"required": True,
                           "help": "cv namespace(s) to drop, comma-separated"},
           "--partial_lookup": {"action": "store_true"}})
    add("chado2gff3", cmd_chado2gff3, **{"--output": {"required": True}})
    add("chado2alignmentgff3", cmd_chado2alignmentgff3,
        **{"--output": {"required": True},
           "--feature_type": {"required": True},
           "--match_type": {"default": None},
           "--force_name": {"action": "store_true"},
           "--add_description": {"action": "store_true"},
           "--write_sequence_region": {"action": "store_true"}})
    add("gff3alignment", cmd_gff3alignment, catalog=False,
        **{"--input": {"required": True},
           "--output": {"required": True},
           "--match_type": {"default": "protein_match"},
           "--match_part_distance": {"type": int, "required": True}})
    add("chado2fasta", cmd_chado2fasta,
        **{"--output": {"required": True}, "--feature_type": {"default": None}})

    args = p.parse_args(argv)
    result = args.fn(args)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
