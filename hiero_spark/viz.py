"""Render layer (SURVEY.md §7.1 item 7; BASELINE.json "DataFrame API +
interactive visualization layer").

hiero's web UI consumes tiny sketch outputs (bucket counts, pages,
heavy-hitter lists) and renders them client-side. The headless equivalent:
functions that turn a sketch-output DataFrame into a render-ready
Vega-Lite spec (JSON dict, data inlined) or an ASCII preview. Collecting
here is by design and bounded — sketch outputs are at most
buckets/K/page-size rows, never the base table (the §7.2 "bounded collect"
rule); all heavy lifting already happened in the distributed sketch.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

_SCHEMA = "https://vega.github.io/schema/vega-lite/v5.json"
_MAX_RENDER_ROWS = 10_000  # a render spec is a screenful, not a dataset


def _values(df: DataFrame) -> list[dict[str, Any]]:
    rows = df.limit(_MAX_RENDER_ROWS + 1).collect()
    if len(rows) > _MAX_RENDER_ROWS:
        raise ValueError(
            f"render input exceeds {_MAX_RENDER_ROWS} rows — render sketch "
            "outputs (histograms/pages/top-k), not base tables"
        )
    return [r.asDict(recursive=True) for r in rows]


def histogram_spec(hist: DataFrame, x: str, y: str, title: str = "") -> dict:
    """A4/A5 bar chart from a (bucket, count) sketch output."""
    return {
        "$schema": _SCHEMA,
        "title": title,
        "data": {"values": _values(hist)},
        "mark": "bar",
        "encoding": {
            "x": {"field": x, "type": "ordinal"},
            "y": {"field": y, "type": "quantitative"},
        },
    }


def cdf_spec(cdf: DataFrame, x: str, y: str, title: str = "") -> dict:
    """A5 cumulative line chart."""
    spec = histogram_spec(cdf, x, y, title)
    spec["mark"] = "line"
    return spec


def heatmap_spec(hm: DataFrame, x: str, y: str, v: str, title: str = "") -> dict:
    """A6 heatmap from (bucket_x, bucket_y, count)."""
    return {
        "$schema": _SCHEMA,
        "title": title,
        "data": {"values": _values(hm)},
        "mark": "rect",
        "encoding": {
            "x": {"field": x, "type": "ordinal"},
            "y": {"field": y, "type": "ordinal"},
            "color": {"field": v, "type": "quantitative"},
        },
    }


def trellis_spec(tr: DataFrame, x: str, y: str, v: str, facet: str, title: str = "") -> dict:
    """A7 trellis: array of heatmaps faceted by the third column."""
    spec = heatmap_spec(tr, x, y, v, title)
    spec["encoding"]["facet"] = {"field": facet, "type": "nominal", "columns": 4}
    return spec


def table_page(page: DataFrame) -> dict:
    """O1 spreadsheet page: {columns, rows} for a table widget."""
    cols = page.columns
    return {"columns": cols, "rows": [[d[c] for c in cols] for d in _values(page)]}


def ascii_histogram(hist: DataFrame, label: str, count: str, width: int = 40) -> str:
    """Terminal preview of a (label, count) sketch output."""
    rows = _values(hist)
    if not rows:
        return "(empty)"
    peak = max(r[count] for r in rows) or 1
    lines = []
    for r in rows:
        bar = "#" * max(1, round(r[count] / peak * width)) if r[count] else ""
        lines.append(f"{str(r[label]):>12} | {bar} {r[count]}")
    return "\n".join(lines)
