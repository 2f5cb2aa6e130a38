"""dictybib update: stamp BibTeX entries with the pub's creation date.

Reference: ``lib/Modware/Update/Command/dictybib.pm:25-82`` — for each
parsed BibTeX entry that does NOT already carry a ``timestamp`` field,
find the chado pub by pmid (uniquename), and re-emit the entry with a
fixed field order (journal title status nlmuniqueid pmid year, then the
optional volume/pages/doi/month/issn/abstract, author, and a trailing
``timestamp = {Y.M.D}``). Entries with no matching pub, or already
stamped, are skipped.

Spark shape: the per-entry ``find({uniquename => pmid})`` becomes one
join against the pub table; the printf serialization is a single
``concat_ws`` projection — the whole update is scan → join → map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REQUIRED_FIELDS = ["journal", "title", "status", "nlmuniqueid", "pmid", "year"]
OPTIONAL_FIELDS = ["volume", "pages", "doi", "month", "issn", "abstract"]


def dictybib_update(entries: DataFrame, pub: DataFrame) -> DataFrame:
    """entries (entry_type, citekey, fields map) ⋈ pub (uniquename,
    created_at) → (citekey, pmid, timestamp, fields) for the entries the
    reference would re-emit."""
    unstamped = entries.filter(~F.map_contains_key("fields", "timestamp"))
    pmid = F.col("fields")["pmid"]
    pubs = pub.select(
        F.col("uniquename").alias("__pmid"),
        F.date_format(F.col("created_at").cast("date"), "yyyy.M.d").alias(
            "timestamp"
        ),
    )
    return (
        unstamped.withColumn("__pmid", pmid)
        .filter(F.col("__pmid").isNotNull())
        .join(pubs, "__pmid")
        .select("citekey", F.col("__pmid").alias("pmid"), "timestamp", "fields")
    )


def nonpub2bib_rows(
    pub: DataFrame,
    pubprop: DataFrame,
    pubauthor: DataFrame,
    cvterm: DataFrame,
    timestamp: bool = True,
) -> DataFrame:
    """dictynonpub2bib (``lib/Modware/Export/Command/dictynonpub2bib.pm:
    34-109``): every non-PUBMED pub rendered as a BibTeX article keyed
    ``lc(pubplace) + uniquename``, with journal/title/volume/year/pages
    present-only fields, the abstract pubprop, rank-ordered
    ``surname, givennames`` authors joined with ' and ', and an optional
    created_at timestamp line.

    Spark shape: the reference runs one query per pubplace then N author/
    abstract lookups per pub; here it is one filter + two grouped joins +
    a concat projection. Returns (citekey, text).
    """
    base = pub.filter(
        F.col("pubplace").isNotNull() & (F.upper("pubplace") != "PUBMED")
    )
    abstract_type = cvterm.filter(F.col("name") == "abstract").select(
        F.col("cvterm_id").alias("type_id")
    )
    abstracts = (
        pubprop.join(F.broadcast(abstract_type), "type_id")
        .groupBy("pub_id")
        .agg(F.min("value").alias("abstract"))  # rows => 1
    )
    authors = pubauthor.groupBy("pub_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rank", "surname", "givennames"))
                ),
                lambda s: F.concat_ws(", ", s.surname, s.givennames),
            ),
            " and ",
        ).alias("author")
    )
    joined = base.join(abstracts, "pub_id", "left").join(authors, "pub_id", "left")

    def opt(name, col):
        return F.when(
            col.isNotNull(), F.format_string("%s = {%s},", F.lit(name), col)
        )

    parts = [
        F.format_string(
            "@article{%s,", F.concat(F.lower("pubplace"), F.col("uniquename"))
        ),
        F.format_string("id = {%s},", F.col("uniquename")),
        opt("journal", F.col("series_name")),
        opt("title", F.col("title")),
        opt("volume", F.col("volume")),
        opt("year", F.col("pyear")),
        opt("pages", F.col("pages")),
        opt("abstract", F.col("abstract")),
        opt("author", F.col("author")),
    ]
    if timestamp and "created_at" in pub.columns:
        parts.append(
            F.format_string(
                "timestamp = {%s}",
                F.date_format(F.col("created_at").cast("date"), "yyyy.M.d"),
            )
        )
    parts.append(F.lit("}"))
    body = F.array_join(F.filter(F.array(*parts), lambda p: p.isNotNull()), "\n")
    return joined.select(
        F.concat(F.lower("pubplace"), F.col("uniquename")).alias("citekey"),
        body.alias("text"),
    )


def render_bibtex(stamped: DataFrame) -> DataFrame:
    """→ one ``text`` column per entry, byte-shaped like dictybib.pm:64-81
    (@article header, required fields, present optional fields, author,
    timestamp, closing brace)."""
    fields = F.col("fields")
    parts = [F.format_string("@article{%s,", F.col("citekey"))]
    for name in REQUIRED_FIELDS:
        parts.append(
            F.format_string("%s = {%s},", F.lit(name), F.coalesce(fields[name], F.lit("")))
        )
    for name in OPTIONAL_FIELDS:
        parts.append(
            F.when(
                F.map_contains_key("fields", name),
                F.format_string("%s = {%s},", F.lit(name), fields[name]),
            )
        )
    parts.append(
        F.format_string("author = {%s},", F.coalesce(fields["author"], F.lit("")))
    )
    parts.append(F.format_string("timestamp = {%s}", F.col("timestamp")))
    parts.append(F.lit("}"))
    body = F.array_join(
        F.filter(F.array(*parts), lambda p: p.isNotNull()), "\n"
    )
    return stamped.select("citekey", body.alias("text"))
