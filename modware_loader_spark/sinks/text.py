"""Single-file text sink without a full-table driver collect.

``DataFrame.collect()``-then-``"".join`` holds the whole render in driver
memory; fine for a literature table, wrong as a habit. This sink keeps
the data executor-side: global sort → ``write.text`` (one part per range
partition, so lexicographic part order IS the sort order) → a streamed
driver-side concatenation of part files (bounded memory: one copy buffer,
never the whole dataset).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_single_text(
    df: DataFrame,
    text_col: str,
    path: str,
    order_by: str | list[str] | None = None,
    record_separator: str = "\n",
) -> int:
    """Write ``text_col`` rows to ONE local file at ``path``.

    Each record is written as its text + ``record_separator`` + the text
    datasource's own newline (so ``"\\n"`` yields blank-line-separated
    records, the BibTeX convention). Returns the row count (from the
    write-side accumulator-free count of part lines is not needed — the
    caller usually wants it, so we count the frame once before writing).
    """
    cols = [order_by] if isinstance(order_by, str) else list(order_by or [])
    # count BEFORE the sort so the shuffle runs once (the count is a
    # narrow scan-side aggregate; executing the sorted plan twice would
    # double the export's heavy work)
    n = df.count()
    # NULL text would make concat() NULL and the text datasource rejects
    # NULL values (failing the whole write) — render NULLs as empty
    # records instead.
    out = df.select(
        F.concat(
            F.coalesce(F.col(text_col), F.lit("")), F.lit(record_separator)
        ).alias("value"),
        *[F.col(c) for c in cols],
    )
    if cols:
        out = out.orderBy(*cols)
    out = out.select("value")
    tmp = tempfile.mkdtemp(prefix="single_text_", dir=os.path.dirname(path) or ".")
    try:
        out.write.mode("overwrite").text(os.path.join(tmp, "parts"))
        with open(path, "wb") as dst:
            for part in sorted(glob.glob(os.path.join(tmp, "parts", "part-*"))):
                with open(part, "rb") as src:
                    shutil.copyfileobj(src, dst)
        # every record carries the separator, so the file ends with one
        # extra separator vs the join()-style byte format — trim it
        # (records end "…<sep>\n"; the canonical tail is a single "\n")
        sep = record_separator.encode()
        if sep and n:
            with open(path, "rb+") as fh:
                fh.seek(0, os.SEEK_END)
                size = fh.tell()
                tail = sep + b"\n"
                fh.seek(max(0, size - len(tail)))
                if fh.read() == tail:
                    fh.truncate(size - len(sep))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return n
