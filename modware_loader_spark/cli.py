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

    def add(name, fn, **flags):
        sp = sub.add_parser(name)
        sp.add_argument("--catalog", required=True, help="parquet catalog dir")
        sp.add_argument("--dry_run", action="store_true")
        for flag, kw in flags.items():
            sp.add_argument(flag, **kw)
        sp.set_defaults(fn=fn)

    add("gff3tochado", cmd_gff3tochado, **{"--input": {"required": True}})
    add("obo2chado", cmd_obo2chado,
        **{"--input": {"required": True}, "--force": {"action": "store_true"}})
    add("oboclosure2chado", cmd_oboclosure2chado, **{"--input": {"required": True}})
    add("chado2gff3", cmd_chado2gff3, **{"--output": {"required": True}})
    add("chado2fasta", cmd_chado2fasta,
        **{"--output": {"required": True}, "--feature_type": {"default": None}})

    args = p.parse_args(argv)
    result = args.fn(args)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
