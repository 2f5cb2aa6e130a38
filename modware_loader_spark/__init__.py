"""modware_loader_spark — a PySpark-native analytics/ETL engine with the
query and data-processing capabilities of dictyBase/Modware-Loader.

The reference (Perl 5 / Moose / DBIx::Class, ``/root/reference``) is a
staging-table + set-operation merge engine over the Chado relational schema.
This package re-expresses every operator in its inventory (see SURVEY.md §2)
as idiomatic Spark DataFrame pipelines:

- ``sources``   — GFF3 / OBO / GAF / FASTA / transitive-closure-file /
                  TSV scans (reference §2.1 S1-S13)
- ``sinks``     — GFF3 / FASTA / GAF / TSV writers (reference §2.2 K1-K9)
- ``operators`` — the relational merge core (M1-M14), export-side query
                  operators (E1-E14), upsert/rank ops (U1-U6), transform
                  ops (T1-T4), plus the large-scale training-data-pipeline
                  extensions (dedup, similarity search, text analysis,
                  multimodal plumbing)
- ``functions`` — the scalar-function surface (§2.7)
- ``plans``     — end-to-end load/export pipelines mirroring the reference
                  CLI commands (gff3tochado, obo2chado, oboclosure2chado,
                  gaf2chado, chado2gff3, chado2fasta, chado2gaf)
- ``streaming`` — Structured Streaming variants for the events table

Everything is DataFrame-first: Catalyst handles pushdown/pruning/join
selection; custom Python appears only in parsers and clearly-marked
Pandas-UDF slow paths.
"""

__version__ = "0.1.0"
