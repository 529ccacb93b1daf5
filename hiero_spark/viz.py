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


def markdown_table(df: DataFrame, title: str = "") -> str:
    """Sketch-output DataFrame -> GitHub-flavored markdown table (bounded
    by the render cap like every collect here)."""
    rows = _values(df)
    if not rows:
        return f"### {title}\n\n(empty)\n" if title else "(empty)\n"
    cols = list(rows[0].keys())
    out = []
    if title:
        out.append(f"### {title}\n")
    out.append("| " + " | ".join(cols) + " |")
    out.append("|" + "|".join("---" for _ in cols) + "|")
    for r in rows:
        out.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
    return "\n".join(out) + "\n"


def dataset_card(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", lang_col: str = "lang") -> str:
    """Compose the dataset card a corpus release ships: column profile,
    declared-constraint report, language mix, and the exact-duplication
    rate — every number from a bounded sketch output, all heavy passes
    distributed (profile + checks are one scan each; dedup is the N1
    groupBy)."""
    from pyspark.sql import functions as F

    from hiero_spark.functions.checks import Checks
    from hiero_spark.functions.dedup import exact_dedup
    from hiero_spark.operators.sketches import histogram_categorical, profile_table

    n = docs.count()
    dups = exact_dedup(docs, text_col, id_col)
    n_unique = dups.count()
    checks = (
        Checks()
        .not_null(id_col)
        .unique(id_col)
        .not_null(text_col)
        .report(docs)
    )
    parts = [
        "# Dataset card\n",
        f"- rows: {n}",
        f"- exact-duplicate rate: {(n - n_unique) / max(n, 1):.4f} "
        f"({n - n_unique} rows collapse to {n_unique} distinct texts)\n",
        markdown_table(profile_table(docs), "Column profile"),
        markdown_table(checks, "Constraints"),
        markdown_table(
            histogram_categorical(docs, lang_col).orderBy(lang_col),
            "Language mix",
        ),
    ]
    return "\n".join(parts)
