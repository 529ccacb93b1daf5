"""examples/ui.html — the UI seam demo (round-8 verdict #8).

The page is static JS; these tests (a) serve it over the real socket and
(b) replay the exact request flows its script issues — table discovery,
NextK scroll with resume tokens, the progressive-histogram NDJSON stream
— proving the API shape is sufficient for the reference's defining
spreadsheet interactions without a browser in the loop.
"""

import json
import re
import threading
import urllib.request

import pytest

from hiero_spark.server import serve
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def api(spark):
    srv = serve(spark, SF_SMOKE)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get_raw(base, path):
    with urllib.request.urlopen(base + path, timeout=300) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def _get_json(base, path):
    status, _ctype, body = _get_raw(base, path)
    return status, json.loads(body)


def test_ui_page_served_and_wired_to_real_endpoints(api):
    status, ctype, body = _get_raw(api, "/ui")
    assert status == 200 and ctype.startswith("text/html")
    html = body.decode()
    # the page drives endpoints that must exist in this server
    for endpoint in ("/api/tables", "/api/page/", "/api/progressive/histogram"):
        assert endpoint in html, f"ui.html lost its {endpoint} wiring"
    # root also serves the page (convenience)
    status2, ctype2, body2 = _get_raw(api, "/")
    assert status2 == 200 and body2 == body


def test_ui_scroll_flow_resumes_without_overlap(api):
    """Replays the page's loadMore() logic: first page, then resume from
    next_after, skipping the inclusive resume row — the rendered grid
    must be a gapless, duplicate-free prefix of the ordered table."""
    _, tables = _get_json(api, "/api/tables")
    cols = {t["name"]: t["columns"] for t in tables}["orders"]
    order_col = cols[0]["name"]

    _, p1 = _get_json(api, f"/api/page/orders?order={order_col}&k=15")
    rendered = list(p1["rows"])
    after = urllib.request.quote(json.dumps(p1["next_after"]))
    _, p2 = _get_json(api, f"/api/page/orders?order={order_col}&k=15&after={after}")
    rendered += p2["rows"][1:]  # inclusive resume row skipped, like the JS

    keys = [r[order_col] for r in rendered]
    assert len(keys) == 29
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys), "scroll rendered a duplicate row"


def test_ui_histogram_flow_parses_as_the_page_would(api):
    """Replays runHistogram(): read the NDJSON stream incrementally,
    split on newlines, render each tier — tiers must be well-formed,
    fractions monotone to 1.0, every bucket_count a non-negative int."""
    url = (
        api
        + "/api/progressive/histogram?table=orders&col=o_totalprice"
        + "&buckets=12&tiers=4"
    )
    tiers = []
    buf = b""
    with urllib.request.urlopen(url, timeout=300) as r:
        while True:
            chunk = r.read(256)  # small reads: the page parses incrementally
            if not chunk:
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                if line.strip():
                    tiers.append(json.loads(line))
    fracs = [t["fraction"] for t in tiers]
    assert len(tiers) == 4 and fracs == sorted(fracs) and fracs[-1] == 1.0
    for t in tiers:
        assert t["rows"], "a tier rendered an empty histogram"
        for row in t["rows"]:
            assert isinstance(row["bucket_count"], int) and row["bucket_count"] >= 0


def test_ui_html_is_dependency_free():
    """No build chain, no CDN: the page must reference nothing external."""
    import os

    page = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "ui.html",
    )
    with open(page) as fh:
        html = fh.read()
    assert not re.search(r"""src\s*=\s*["']https?://""", html)
    assert not re.search(r"""href\s*=\s*["']https?://""", html)
    assert "import " not in html.split("<script>")[1]  # no ES modules/CDN


def test_ui_brush_to_filter_flow(api, spark):
    """Replays the brush interaction (round-9 verdict #5): run the root
    histogram, brush buckets [2, 4] using the tier's lo/hi/buckets meta
    (the JS brushValueRange math), then drive the CHILD VIEW — a filtered
    page scroll and a filtered re-refined histogram — and check both
    against ground truth."""
    from hiero_spark import catalog

    url = (
        api
        + "/api/progressive/histogram?table=orders&col=o_totalprice"
        + "&buckets=12&tiers=3"
    )
    with urllib.request.urlopen(url, timeout=300) as r:
        tiers = [json.loads(x) for x in r.read().splitlines() if x.strip()]
    final = tiers[-1]
    lo, hi, n = final["lo"], final["hi"], final["buckets"]
    w = (hi - lo) / n
    b0, b1 = 2, 4
    vlo, vhi = lo + b0 * w, lo + (b1 + 1) * w   # brushValueRange, mid-range

    fp = f"&fcol=o_totalprice&flo={vlo}&fhi={vhi}"
    # child-view scroll: every rendered row is inside the brushed range
    # (next_k rows carry the ORDER columns, so order by the brushed one)
    _, page = _get_json(api, f"/api/page/orders?order=o_totalprice&k=15{fp}")
    assert page["rows"], "brushed child view rendered no rows"
    assert all(vlo <= float(r["o_totalprice"]) < vhi for r in page["rows"])

    # child-view histogram: refines over exactly the filtered rows
    url2 = (
        api
        + "/api/progressive/histogram?table=orders&col=o_totalprice"
        + f"&buckets=12&tiers=3{fp}"
    )
    with urllib.request.urlopen(url2, timeout=300) as r:
        ftiers = [json.loads(x) for x in r.read().splitlines() if x.strip()]
    got = sum(row["bucket_count"] for row in ftiers[-1]["rows"])
    exact = (
        catalog.load_table(spark, SF_SMOKE, "orders")
        .filter(f"CAST(o_totalprice AS double) >= {vlo} "
                f"AND CAST(o_totalprice AS double) < {vhi}")
        .count()
    )
    assert got == exact
    # the brushed range is a proper subset: fewer rows than the root view
    root_total = sum(row["bucket_count"] for row in final["rows"])
    assert 0 < got < root_total

    # top-bucket brush: the stretched upper edge keeps the column max
    vtop_lo, vtop_hi = lo + (n - 1) * w, hi + w  # JS: b1+1 >= buckets
    fp_top = f"&fcol=o_totalprice&flo={vtop_lo}&fhi={vtop_hi}"
    _, ptop = _get_json(api, f"/api/page/orders?order=-o_totalprice&k=5{fp_top}")
    assert ptop["rows"] and float(ptop["rows"][0]["o_totalprice"]) == hi


def test_ui_html_has_brush_wiring():
    """The static page must actually wire the brush: bar rows carry
    bucket indices, mouse handlers build the range, and every child-view
    request carries the fcol/flo/fhi filter params."""
    import os

    page = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "ui.html",
    )
    with open(page) as fh:
        html = fh.read()
    for needle in (
        "data-bucket", "mousedown", "mouseup", "applyBrush",
        "filterParams", "fcol=", "clear-filter",
    ):
        assert needle in html, f"ui.html lost its brush wiring: {needle}"
