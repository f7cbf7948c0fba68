"""CSV export sink (reference to_csv, export.py:35-66).

The reference writes a single timestamped CSV file with QUOTE_NONNUMERIC.
Here the export is a distributed ``df.write.csv`` into a timestamped
directory (quoteAll — every value a worksheet yields is a string, so the
reference's 'quote non-numeric' degenerates to quote-everything); a
``single_file`` mode coalesces to one part for spreadsheet-scale exports
that need a literal file.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame


def _now_str() -> str:
    # Reference now_str (export.py:14-15): filesystem-safe UTC timestamp.
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H-%M-%S")


def to_csv(
    df: DataFrame,
    out_dir: str,
    document: str,
    sheet: str = "",
    single_file: bool = False,
    now_str: str | None = None,
) -> str:
    """Write a timestamped CSV export; returns the output path (the
    reference returns the temp filename, export.py:66). Document/sheet
    names come from the user-editable control table, so path separators
    are flattened — one export is always exactly one entry directly under
    ``out_dir``, never a traversal outside it."""
    if now_str is None:
        # Auto-stamped exports get a short unique suffix: the timestamp is
        # second-granular, so two jobs exporting the same document+sheet in
        # one concurrent tick computed the SAME path and the overwrite mode
        # silently replaced the first export while both reported Success
        # (r11 review). An explicit now_str keeps the fully deterministic
        # path — that caller owns idempotence.
        stamp = f"{_now_str()} {uuid.uuid4().hex[:8]}"
    else:
        stamp = now_str
    name = f"{stamp} {document}" + (f" - {sheet}" if sheet else "")
    name = name.replace("/", "_").replace("\\", "_").replace("\0", "_")
    path = os.path.join(out_dir, name)
    writer = df.coalesce(1) if single_file else df
    writer.write.option("header", True).option("quoteAll", True).mode("overwrite").csv(path)
    return path
