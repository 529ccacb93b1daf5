"""The bench stdout contract: ONE JSON line the driver can always parse.

The driver records only a 2000-byte TAIL of bench.py's stdout and
json-parses the last line.  Round 10's line grew past that window
(queries + queries_calibrated ≈ 1.8 KB of payload) and the driver
recorded "parsed": null — a silent loss of the round's headline number.
Bulky per-query maps now live in BENCH_DETAIL.json; these tests pin the
stdout line's size budget and the tail-recovery fallback so neither
regresses.
"""

import json
import re

DRIVER_TAIL_BYTES = 2000


def _line_for(n_queries: int) -> str:
    """Reconstruct the stdout line's shape for a headline set of
    n_queries (names sized like the real registry's longest)."""
    queries = {
        f"n6_decontamination_hashed_{i:02d}": round(0.123 + i / 997, 3)
        for i in range(n_queries)
    }
    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 21.785,
            "unit": "sec",
            "queries": queries,
            "sf": 0.1,
            "n_reps": 2,
            "estimator": "min",
            "calibration_sec": 0.081,
            "calibration_spark_sec": 0.412,
            "common_subset_ratio": 0.678,
            "common_subset_ratio_calibrated": 0.912,
            "calibration_basis": "spark_fixed_job",
            "multifile_total": 23.955,
            "detail_file": "BENCH_DETAIL.json",
        }
    )


def test_stdout_line_fits_driver_tail():
    """31 headline queries today; assert headroom to 40 so coverage
    growth does not silently re-overflow the 2000-byte window.  (The
    r13 'calibration_basis' field costs 44 bytes; the 40-query margin
    drops 100 -> 56 but the line still fits the real 2000 budget.)"""
    assert len(_line_for(31)) < DRIVER_TAIL_BYTES - 400
    assert len(_line_for(40)) < DRIVER_TAIL_BYTES - 56


def test_bench_emits_no_bulky_maps_on_stdout():
    """The per-query calibrated map and common-subset detail belong in
    BENCH_DETAIL.json; their reappearance on the stdout line is exactly
    the r10 overflow."""
    src = open("bench.py").read()
    # the detail-file dump must carry them ...
    detail = src.split('json.dump(')[1]
    assert '"queries_calibrated": queries_calibrated' in detail
    # ... and the stdout print must not
    stdout_obj = src.split("print(")[-1]
    assert '"queries_calibrated"' not in stdout_obj
    assert '"common_subset": common_subset' not in stdout_obj


def test_tail_recovery_regex_matches_r10_shape():
    """The fallback that reconstructs a truncated round's queries from
    the driver tail: a name cut at the tail boundary has no opening
    quote and must be skipped, not misread as a short name."""
    tail = (
        'enue": 0.362, "q10_returned_items": 1.21, "a8_heavy_hitters": '
        '0.359}, "sf": 0.1, "n_reps": 2, "calibration_sec": 0.109, '
        '"queries_calibrated": {"q1_pricing_summary": 3.1}}'
    )
    m = re.search(r'"queries": \{', tail)
    qfrag = tail[m.end():] if m else tail
    stop = qfrag.find("}")
    qpart = qfrag[:stop] if stop != -1 else qfrag
    pairs = dict(re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', qpart))
    assert pairs == {"q10_returned_items": "1.21", "a8_heavy_hitters": "0.359"}
    assert "enue" not in pairs  # truncated name skipped
    calm = re.search(r'"calibration_sec": ([0-9.]+)', tail)
    assert calm and float(calm.group(1)) == 0.109
