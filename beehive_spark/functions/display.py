"""ASCII report printers (reference parity D1/D2).

Re-expresses the reference's console reporters for the Spark engine:

- :func:`pretty_print_rows` — bordered table over list- or dict-rows
  (reference ``display-utils.js:21-116`` prettyPrintRows, including
  its contract that dict-rows require a dict header mapping);
- :func:`pretty_print_uuid_changes` — the fixed-width uuid-rewrite
  report (reference ``uuid-checks.js:136-223`` prettyPrintUuidChanges:
  first column sized off the key name with a 10-char floor, two
  40-wide uuid columns);
- :func:`show_df` — bounded DataFrame adapter: takes ``limit`` rows
  (never a full collect) and renders them with the same table.

These are driver-side conveniences for small result sets — the merge
pipeline's reconciliation and dry-run reports; nothing here touches
executor-side data paths.
"""

from __future__ import annotations

import io
import sys
from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame


def _fmt(value: Any) -> str:
    return str(value)


def pretty_print_rows(
    rows: Sequence[Any],
    col_headers: Sequence[str] | Mapping[str, str],
    out=None,
) -> str:
    """Print rows as a ``+---+``-bordered table; returns the rendering.

    ``rows`` may be sequences (positional) or mappings; mapping rows
    require ``col_headers`` to be a mapping of row-key -> display name
    (same contract, and same error, as the reference).
    """
    out = out if out is not None else sys.stdout
    buf = io.StringIO()
    is_dict_headers = isinstance(col_headers, Mapping)
    if is_dict_headers:
        keys = list(col_headers.keys())
        header_vals = [_fmt(col_headers[k]) for k in keys]
    else:
        keys = None
        header_vals = [_fmt(h) for h in col_headers]

    widths = [len(h) for h in header_vals]

    def cells(row: Any) -> list[str]:
        if isinstance(row, Mapping):
            if not is_dict_headers:
                raise ValueError(
                    "if passed rows are objects the passed header columns "
                    "should be an object mapping the keys to column display values"
                )
            return [_fmt(row.get(k)) for k in keys]
        return [_fmt(v) for v in row]

    materialized = [cells(r) for r in rows]
    for row in materialized:
        for i, v in enumerate(row):
            if i < len(widths):
                widths[i] = max(widths[i], len(v))
    widths = [w + 2 for w in widths]

    def border() -> str:
        return "".join("+" + "-" * w for w in widths) + "+\n"

    def line(vals: list[str]) -> str:
        parts = []
        for v, w in zip(vals, widths):
            parts.append("| " + v + " " * max(0, w - len(v) - 1))
        return "".join(parts) + "|\n"

    buf.write(border())
    buf.write(line(header_vals))
    buf.write(border())
    for row in materialized:
        buf.write(line(row))
    buf.write(border())
    rendered = buf.getvalue()
    out.write(rendered)
    return rendered


def pretty_print_uuid_changes(changes: Sequence[Mapping[str, Any]], out=None) -> str:
    """Fixed-layout report of uuid rewrites: ``(id, initial uuid, new
    uuid)`` rows with a 40-char uuid column pair, matching the
    reference's collision-correction output."""
    out = out if out is not None else sys.stdout
    if not changes:
        out.write("(no uuid changes)\n")
        return "(no uuid changes)\n"
    buf = io.StringIO()
    keys = list(changes[0].keys())
    col1 = keys[0]
    col1_len = col1.__len__() + 2 if len(col1) >= 10 else 12
    uuid_w = 40
    widths = [col1_len, uuid_w, uuid_w]

    def border() -> str:
        return (
            "+"
            + "-" * widths[0]
            + "".join("+" + "-" * (w - 1) for w in widths[1:])
            + "+\n"
        )

    def cell(v: Any, w: int) -> str:
        s = _fmt(v)
        return "| " + s + " " * max(0, w - len(s) - 2)

    buf.write(border())
    buf.write(cell(col1, widths[0]) + cell("Initial UUID", uuid_w) + cell("New UUID", uuid_w) + "|\n")
    buf.write(border())
    for ch in changes:
        ks = list(ch.keys())
        row = cell(ch[ks[0]], widths[0])
        for k in ks[1:3]:
            row += cell(ch[k], uuid_w)
        buf.write(row + "|\n")
    buf.write(border())
    rendered = buf.getvalue()
    out.write(rendered)
    return rendered


def show_df(df: DataFrame, limit: int = 20, out=None) -> str:
    """Render the first ``limit`` rows of a DataFrame with
    :func:`pretty_print_rows` — a driver-safe peek (``take``, not
    ``collect``) for CLI reports."""
    rows = [[row[c] for c in df.columns] for row in df.take(limit)]
    return pretty_print_rows(rows, list(df.columns), out=out)
