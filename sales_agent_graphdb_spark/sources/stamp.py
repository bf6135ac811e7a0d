"""Source-freshness stamps for materialized layouts (ANN indexes,
clustered table rewrites): a marker file records the source parquet's
``mtime:size`` so repeated queries in a round reuse the expensive
ingest-side write, while any testdata regeneration invalidates it
automatically. ONE protocol definition — ann_search.py and
sources_io.py both build on it (review r03: it was hand-rolled per
site)."""

from __future__ import annotations

import os
from pathlib import Path

_MARKER = "_SRC_STAMP"


def src_stamp(src_path: str, version: str = "") -> str:
    base = f"{os.path.getmtime(src_path)}:{os.path.getsize(src_path)}"
    return f"{base}:{version}" if version else base


def is_fresh(layout_dir: str, src_path: str, version: str = "") -> bool:
    """True iff the materialized layout at ``layout_dir`` was built from
    the CURRENT source file with the CURRENT layout recipe. ``version``
    is the recipe tag: a site that changes how it lays data out bumps
    its tag so stale layouts rebuild instead of being silently reused
    (the source file alone can't see code changes)."""
    try:
        return (Path(layout_dir) / _MARKER).read_text() == src_stamp(
            src_path, version
        )
    except OSError:
        return False


def mark(layout_dir: str, src_path: str, version: str = "") -> None:
    (Path(layout_dir) / _MARKER).write_text(src_stamp(src_path, version))
