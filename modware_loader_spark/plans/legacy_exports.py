"""Legacy-schema (dictyBase cgm_ddb) exports — the S8 surface.

Reference commands, all raw-SQL-over-DBI or DBIC cursor walks:

- ``colleague`` (``lib/Modware/Export/Command/colleague.pm``): colleague
  CSV (joined email/phone/remark, first-row-per-email dedup, :43-74 SQL,
  :160-166 cache) + group-leader→member relations (:17-40 SQL driven
  once per PI row).
- ``colleague2gene`` (``colleague2gene.pm:13-28``): email → associated
  gene ids, grouped in email order.
- ``curatornotes`` (``curatornotes.pm:15-39``): public/private note
  featureprops of live genes keyed by the gene's dbxref accession.
- ``dictypub`` (``dictypub.pm:63-120``): (pubmed, gene_name, ddb id) for
  gene feature_pubs with a PUBMED pubplace.
- ``dictypubannotation`` (``dictypubannotation.pm:40-85``): per
  (pub, gene) the literature-topic props, each token
  ``initials:timecreated:topic`` when a curator assignment exists.
- ``dscorders`` (``dscorders.pm:17-54``): strain + plasmid order logs
  joined to the ordering colleague's email; strains = order items MINUS
  items naming a plasmid.

Spark shape: every per-row inner query of the reference (the PI check +
relation fetch per colleague, the gene2ddb lookup per pub row, the
curator lookup per pubprop) becomes one broadcast join; every
stack-and-flush grouping becomes groupBy + ``collect_list`` sorted for
determinism. All inputs are plain DataFrames — in production the legacy
schema arrives as a second catalog root or ``spark.read.jdbc``, exactly
like the Chado side (catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COLLEAGUE_COLUMNS = [
    "email", "first_name", "last_name", "suffix", "profession", "job_title",
    "institution", "address1", "address2", "city", "state", "region",
    "country", "zipcode", "is_subscribed", "phone_num", "research_interest",
]


def colleague_rows(
    colleague: DataFrame,
    coll_email: DataFrame,
    email: DataFrame,
    coll_phone: DataFrame | None = None,
    phone: DataFrame | None = None,
    colleague_remark: DataFrame | None = None,
) -> DataFrame:
    """The colleague CSV body (colleague.pm:43-74), deduped to the first
    row per email (:158-166) — row_number over colleague_no keeps the
    dedup deterministic where the cursor order was incidental."""
    out = (
        colleague.join(coll_email, "colleague_no")
        .join(email, "email_no")
    )
    if coll_phone is not None and phone is not None:
        out = out.join(coll_phone, "colleague_no", "left").join(
            phone, "phone_no", "left"
        )
    else:
        out = out.withColumn("phone_num", F.lit(None).cast("string"))
    if colleague_remark is not None:
        out = out.join(
            colleague_remark.withColumnsRenamed({"remark": "research_interest"}),
            "colleague_no",
            "left",
        )
    else:
        out = out.withColumn("research_interest", F.lit(None).cast("string"))
    # Oracle 'a2'||' '||a3||' '||a4 semantics: nulls concat as empty
    addr2 = F.concat(
        F.coalesce("address2", F.lit("")),
        F.lit(" "),
        F.coalesce("address3", F.lit("")),
        F.lit(" "),
        F.coalesce("address4", F.lit("")),
    )
    out = out.withColumn("address2", addr2).withColumnsRenamed(
        {"postal_code": "zipcode"}
    )
    w = Window.partitionBy("email").orderBy("colleague_no")
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("colleague_no", *COLLEAGUE_COLUMNS)
    )


def colleague_relations(
    colleagues: DataFrame,
    pi: DataFrame,
    coll_email: DataFrame,
    email: DataFrame,
) -> DataFrame:
    """(leader_email, member_emails): for each exported colleague who is a
    PI (pi.pi_no, :34-40), the member colleagues' emails (:17-32); leaders
    with no members drop (:186-188)."""
    member_email = (
        pi.select(F.col("pi_no").alias("colleague_no_leader"), "colleague_no")
        .join(coll_email, "colleague_no")
        .join(email, "email_no")
        .select(
            F.col("colleague_no_leader").alias("colleague_no"),
            F.col("email").alias("member_email"),
        )
    )
    return (
        colleagues.select("colleague_no", F.col("email").alias("leader_email"))
        .join(member_email, "colleague_no")
        .groupBy("leader_email")
        .agg(F.array_sort(F.collect_list("member_email")).alias("member_emails"))
    )


def colleague_genes(
    email: DataFrame,
    coll_email: DataFrame,
    coll_locus: DataFrame,
    feature: DataFrame,
) -> DataFrame:
    """colleague2gene: (email, gene_ids) — the reference's stack-and-flush
    over an email-ordered cursor is just a groupBy."""
    return (
        email.join(coll_email, "email_no")
        .join(coll_locus, "colleague_no")
        .join(
            feature.select(
                F.col("feature_id").alias("locus_no"), "uniquename"
            ),
            "locus_no",
        )
        .groupBy("email")
        .agg(F.array_sort(F.collect_list("uniquename")).alias("gene_ids"))
        .orderBy("email")
    )


def curator_notes(
    featureprop: DataFrame,
    feature: DataFrame,
    cvterm: DataFrame,
    dbxref: DataFrame,
    note_type: str,
) -> DataFrame:
    """curatornotes: (accession, notes) for live genes; ``note_type`` is
    'public' or 'private' (the featureprop type cvterm name)."""
    note_ids = cvterm.filter(F.col("name") == note_type).select(
        F.col("cvterm_id").alias("type_id")
    )
    gene_ids = cvterm.filter(F.col("name") == "gene").select(
        F.col("cvterm_id").alias("type_id")
    )
    genes = feature.join(F.broadcast(gene_ids), "type_id")
    if "is_deleted" in feature.columns:
        genes = genes.filter(F.col("is_deleted") == 0)
    return (
        featureprop.join(F.broadcast(note_ids), "type_id")
        .join(genes.select("feature_id", "dbxref_id"), "feature_id")
        .join(dbxref.select("dbxref_id", "accession"), "dbxref_id")
        .groupBy("accession")
        .agg(F.array_sort(F.collect_list("value")).alias("notes"))
        .orderBy("accession")
    )


def dicty_publinks(
    feature_pub: DataFrame,
    feature: DataFrame,
    pub: DataFrame,
    dbxref: DataFrame,
    cvterm: DataFrame,
    gene2ddb: DataFrame | None = None,
) -> DataFrame:
    """dictypub: (pubmed, gene_name, ddb_id). Rows whose pub uniquename
    starts with PUB are the reference's error branch — dropped; rows with
    no gene→DDB mapping likewise (:100-116). gene2ddb: (accession, ddb_id)
    legacy map; when None the accession itself is used."""
    gene_ids = cvterm.filter(F.col("name") == "gene").select(
        F.col("cvterm_id").alias("type_id")
    )
    genes = feature.join(F.broadcast(gene_ids), "type_id")
    if "is_deleted" in feature.columns:
        genes = genes.filter(F.col("is_deleted") == 0)
    pubs = pub.filter(F.col("pubplace") == "PUBMED").select(
        "pub_id", F.col("uniquename").alias("pubmed")
    )
    out = (
        feature_pub.join(pubs, "pub_id")
        .filter(~F.col("pubmed").startswith("PUB"))
        .join(genes.select("feature_id", "name", "dbxref_id"), "feature_id")
        .join(dbxref.select("dbxref_id", "accession"), "dbxref_id")
    )
    if gene2ddb is not None:
        out = out.join(F.broadcast(gene2ddb), "accession")
    else:
        out = out.withColumn("ddb_id", F.col("accession"))
    return out.select(
        "pubmed", F.col("name").alias("gene_name"), "ddb_id"
    ).orderBy("pubmed", "ddb_id")


def pub_annotations(
    feature_pub: DataFrame,
    feature: DataFrame,
    pub: DataFrame,
    dbxref: DataFrame,
    feature_pubprop: DataFrame,
    cvterm: DataFrame,
    curator_feature_pubprop: DataFrame | None = None,
    curator: DataFrame | None = None,
) -> DataFrame:
    """dictypubannotation: (pubmed, accession, annotations) — each
    annotation token is ``initials:timecreated:topic`` when a curator
    assignment row exists, else just the topic name. Rows without props
    still export with an empty token list."""
    props = feature_pubprop.join(
        F.broadcast(cvterm.select(F.col("cvterm_id").alias("type_id"),
                                  F.col("name").alias("topic"))),
        "type_id",
    )
    if curator_feature_pubprop is not None and curator is not None:
        assigned = curator_feature_pubprop.join(
            F.broadcast(curator.select("curator_id", "initials")), "curator_id"
        ).select("feature_pubprop_id", "initials", "timecreated")
        props = props.join(assigned, "feature_pubprop_id", "left")
        token = F.when(
            F.col("initials").isNotNull(),
            F.concat_ws(":", "initials", "timecreated", "topic"),
        ).otherwise(F.col("topic"))
    else:
        token = F.col("topic")
    tokens = props.groupBy("feature_pub_id").agg(
        F.array_sort(F.collect_list(token)).alias("annotations")
    )
    return (
        feature_pub.join(
            pub.select("pub_id", F.col("uniquename").alias("pubmed")), "pub_id"
        )
        .join(feature.select("feature_id", "dbxref_id"), "feature_id")
        .join(dbxref.select("dbxref_id", "accession"), "dbxref_id")
        .join(tokens, "feature_pub_id", "left")
        .select(
            "pubmed",
            "accession",
            F.coalesce("annotations", F.array()).alias("annotations"),
        )
        .orderBy("pubmed", "accession")
    )


def _order_emails(stock_order, colleague, coll_email, email):
    return (
        stock_order.withColumnsRenamed({"colleague_id": "colleague_no"})
        .join(colleague.select("colleague_no"), "colleague_no")
        .join(coll_email, "colleague_no")
        .join(email, "email_no")
    )


def dsc_plasmid_orders(
    plasmid: DataFrame,
    stock_item_order: DataFrame,
    stock_order: DataFrame,
    colleague: DataFrame,
    coll_email: DataFrame,
    email: DataFrame,
) -> DataFrame:
    """dscorders plasmid log (:17-28): (email, name, order_date)."""
    orders = _order_emails(stock_order, colleague, coll_email, email)
    return (
        plasmid.select("name")
        .join(stock_item_order.withColumnsRenamed({"item": "name"}), "name")
        .join(
            orders.withColumnsRenamed({"stock_order_id": "stock_item_order_id"}),
            "stock_item_order_id",
        )
        .select("email", "name", "order_date")
        .orderBy("order_date", "email")
    )


def dsc_strain_orders(
    stock_center: DataFrame,
    plasmid: DataFrame,
    stock_item_order: DataFrame,
    stock_order: DataFrame,
    colleague: DataFrame,
    coll_email: DataFrame,
    email: DataFrame,
    dbxref: DataFrame,
) -> DataFrame:
    """dscorders strain log (:33-53): order items MINUS plasmid-named
    items, resolved to the strain's dbxref accession."""
    pair = ["stock_item_order_id", "item_id"]
    plasmid_items = stock_item_order.join(
        plasmid.select(F.col("name").alias("item")), "item", "left_semi"
    ).select(*pair)
    # MINUS (:38-44) — positional, so pin the column order on both sides
    items = stock_item_order.select(*pair).exceptAll(plasmid_items)
    orders = _order_emails(stock_order, colleague, coll_email, email)
    return (
        stock_center.withColumnsRenamed({"id": "item_id"})
        .join(items, "item_id")
        .join(
            orders.withColumnsRenamed({"stock_order_id": "stock_item_order_id"}),
            "stock_item_order_id",
        )
        .join(
            dbxref.select("dbxref_id", F.col("accession").alias("strain_id")),
            "dbxref_id",
        )
        .select("email", "strain_id", "order_date")
        .orderBy("order_date", "email")
    )
