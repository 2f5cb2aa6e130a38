"""bibtex2chado equivalent (S13 completion): BibTeX entries → Chado pub /
pubauthor / pubprop tables.

Reference: ``lib/Modware/Import/Command/bibtex2chado.pm`` with the BibTeX
plugin (``lib/Modware/Plugin/Import/Publication/BibTeX.pm``):
- uniquename = pmid, else the ``id`` field with a leading ``PUB``
  stripped (``BibTeX.pm:5-17``);
- pubplace = 'PubMed' for pmid entries, else the upper-cased citekey
  prefix before the id (``BibTeX.pm:19-29``);
- pub type = journal_article when a ``status`` field exists, else
  unpublished (``BibTeX.pm:31-37``);
- column map title/volume/series_name←journal/pyear←year/pages
  (``bibtex2chado.pm:64-70``);
- pubprops only for doi/status/month/issn/abstract when present
  (``create_pub_properties``, ``:105-117``);
- authors split on ``and``, rank = position+1, braces stripped from
  name parts (``create_authors``, ``:119-140``);
- the 8 pub_type cvterms find-or-created up front
  (``find_or_create_pub_type_cvterms``, ``:142-159``).

Golden counts (``t/loader/bibtex2chado.t``): 5 pubs, 16 authors,
12 pubprops from ``t/test_data/literature/test.bib``.

Spark shape: one parse scan → three projections; the author fan-out is a
posexplode (rank from position, no window); cvterm dims are a broadcast
find-or-create batch (U1), never row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modware_loader_spark.operators.merge import generate_ids
from modware_loader_spark.sources.bibtex import parse_bibtex

PUB_TYPE_TERMS = [
    "unpublished",
    "journal_article",
    "status",
    "doi",
    "month",
    "issn",
    "abstract",
    "thesis",
]
PROP_FIELDS = ["doi", "status", "month", "issn", "abstract"]


def load_bibtex_pubs(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """→ {pub, pubauthor, pubprop, cvterm} Chado-shaped DataFrames."""
    entries = parse_bibtex(spark, path)
    f = lambda k: F.element_at(F.col("fields"), k)  # noqa: E731

    cvterm = spark.createDataFrame(
        [(i + 1, name, "pub_type") for i, name in enumerate(PUB_TYPE_TERMS)],
        "cvterm_id long, name string, cv string",
    )
    type_ids = {name: i + 1 for i, name in enumerate(PUB_TYPE_TERMS)}

    base = entries.select(
        "citekey",
        "fields",
        F.coalesce(
            f("pmid"), F.regexp_replace(f("id"), r"^PUB", "")
        ).alias("uniquename"),
        F.when(f("pmid").isNotNull(), F.lit("PubMed"))
        .otherwise(F.upper(F.expr("replace(citekey, element_at(fields, 'id'), '')")))
        .alias("pubplace"),
        F.when(
            f("status").isNotNull(), F.lit(type_ids["journal_article"])
        )
        .otherwise(F.lit(type_ids["unpublished"]))
        .cast("long")
        .alias("type_id"),
        f("title").alias("title"),
        f("volume").alias("volume"),
        f("journal").alias("series_name"),
        f("year").alias("pyear"),
        f("pages").alias("pages"),
    )
    pub = generate_ids(base, ["uniquename"], id_col="pub_id", start=1).localCheckpoint()

    authors_raw = pub.select(
        "pub_id",
        F.posexplode(F.split(F.element_at(F.col("fields"), "author"), r"\s+and\s+")),
    ).withColumnsRenamed({"pos": "rank0", "col": "raw"})
    braced = F.regexp_extract("raw", r"^\{(.*)\}$", 1)
    has_comma = F.instr(F.trim(F.col("raw")), ",") > 0
    trimmed = F.trim(F.regexp_replace("raw", r"[{}]", ""))
    pubauthor = authors_raw.filter(F.trim("raw") != "").select(
        "pub_id",
        (F.col("rank0") + 1).cast("int").alias("rank"),
        F.when(braced != "", braced)
        .when(has_comma, F.trim(F.substring_index(trimmed, ",", 1)))
        .otherwise(F.element_at(F.split(trimmed, r"\s+"), -1))
        .alias("surname"),
        F.when(braced != "", F.lit(None).cast("string"))
        .when(has_comma, F.trim(F.substring_index(trimmed, ",", -1)))
        .otherwise(
            F.nullif(
                F.trim(
                    F.regexp_replace(trimmed, r"\s*\S+$", "")
                ),
                F.lit(""),
            )
        )
        .alias("givennames"),
    )

    props = None
    for prop in PROP_FIELDS:
        p = pub.filter(F.element_at("fields", prop).isNotNull()).select(
            "pub_id",
            F.lit(type_ids[prop]).cast("long").alias("type_id"),
            F.element_at("fields", prop).alias("value"),
        )
        props = p if props is None else props.unionByName(p)

    return {
        "pub": pub.drop("fields", "citekey"),
        "pubauthor": pubauthor,
        "pubprop": props,
        "cvterm": cvterm,
    }
