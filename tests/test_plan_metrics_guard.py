"""Plan-metrics regression guard: exchange / broadcast / scan counts
pinned per bench query (round-5 verdict item 6).

Wall-clock on this host carries up to ~1.7x ambient noise; plan shape
carries none. This guard recomputes each bench query's PRE-AQE
physical plan fingerprint -- (shuffle exchanges, broadcast exchanges,
scan nodes) -- at sf0.001 under the test session's fixed confs and
compares it against tests/plan_metrics_pins.json. It would have
caught the tpch_q11/q15 class (a plan rewrite adding or removing an
exchange) with zero timing involved.

Counts are sf-dependent (size-based broadcast thresholds flip joins
between scales), so pins are valid ONLY for sf0.001 + the conftest
session confs -- both fixed here.

Re-pinning after a DELIBERATE plan change:

    PIN_PLAN_METRICS=1 python -m pytest tests/test_plan_metrics_guard.py -q

then commit the regenerated json WITH a commit message naming the
entries whose fingerprints changed and why. A diff in the pins file
without such a note is the exact silent-regression this guard exists
to make loud.
"""

from __future__ import annotations

import json
import os
import pathlib

import pytest

from s3_parquet_to_postgres_spark.plans import all_queries

PINS_PATH = pathlib.Path(__file__).with_name("plan_metrics_pins.json")
PIN_MODE = os.environ.get("PIN_PLAN_METRICS") == "1"

# The bench workload (bench.py's HEADLINE + EXTRA, imported so the
# guard can never drift from what the driver times) leads the list;
# round-6 widening: the REST of the catalog follows, so every declared
# plan's exchange/scan fingerprint is pinned, not just the timed ones.
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "benchmod", pathlib.Path(__file__).parents[1] / "bench.py"
)
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)
BENCH_NAMES = list(dict.fromkeys(
    _bench.HEADLINE + _bench.EXTRA + sorted(all_queries())
))


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


def plan_fingerprint(df) -> list[int]:
    """[shuffle exchanges, broadcast exchanges, scan nodes] of the
    pre-AQE physical plan (deterministic without executing)."""
    plan = df._jdf.queryExecution().sparkPlan()
    shuffles = broadcasts = scans = 0
    for node in _walk(plan):
        name = node.nodeName()
        if "BroadcastExchange" in name:
            broadcasts += 1
        elif name.startswith("Exchange") or "ShuffleExchange" in name:
            shuffles += 1
        elif "Scan" in name:
            scans += 1
    return [shuffles, broadcasts, scans]


def _load_pins() -> dict[str, list[int]]:
    if not PINS_PATH.exists():
        return {}
    return json.loads(PINS_PATH.read_text())


_new_pins: dict[str, list[int]] = {}


@pytest.fixture(scope="session", autouse=True)
def _pin_writer():
    """In pin mode, persist the collected fingerprints from a session
    finalizer -- not from a trailing test, whose execution position is
    a file-order accident that xdist / -p randomization breaks. A
    partial selection (-k / deselection / a distributed worker seeing
    only a slice) writes NOTHING: a pins file missing entries would
    make the guard fail opaquely for everyone else."""
    yield
    if not PIN_MODE:
        return
    if len(_new_pins) < len(BENCH_NAMES):
        import warnings

        warnings.warn(
            "PIN_PLAN_METRICS=1 ran with a partial selection "
            f"({len(_new_pins)}/{len(BENCH_NAMES)} fingerprints) -- "
            "pins NOT written; run the whole file with no -k/-p "
            "selection.",
            stacklevel=1,
        )
        return
    PINS_PATH.write_text(
        json.dumps(dict(sorted(_new_pins.items())), indent=1) + "\n"
    )


@pytest.mark.parametrize("name", BENCH_NAMES)
def test_plan_fingerprint_pinned(name, spark, sf_dir):
    got = plan_fingerprint(all_queries()[name](spark, sf_dir))
    if PIN_MODE:
        _new_pins[name] = got
        return
    pins = _load_pins()
    if name not in pins:
        pytest.fail(
            f"{name}: no pinned plan fingerprint -- regenerate with "
            "PIN_PLAN_METRICS=1"
        )
    want = pins[name]
    labels = ("shuffle exchanges", "broadcast exchanges", "scans")
    if got != want:
        deltas = [
            f"{lbl}: {w} -> {g}" for lbl, w, g in zip(labels, want, got)
            if g != w
        ]
        worse = any(g > w for g, w in zip(got, want))
        kind = "plan REGRESSION" if worse else "plan change (improvement?)"
        pytest.fail(
            f"{name}: {kind} vs pinned fingerprint ({'; '.join(deltas)}). "
            "If deliberate, re-pin with PIN_PLAN_METRICS=1 and cite the "
            "design decision in the commit."
        )


def test_no_unpinned_bench_queries():
    """Every bench/catalog query has a pinned fingerprint (the write
    itself happens in the _pin_writer session finalizer)."""
    if PIN_MODE:
        pytest.skip("pin mode: pins are being regenerated")
    pins = _load_pins()
    missing = [n for n in BENCH_NAMES if n not in pins]
    assert not missing, f"unpinned bench queries: {missing}"
