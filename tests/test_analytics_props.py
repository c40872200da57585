"""Brute-force differentials and invariants for the session-4
analytics entries (attribution, Gini, forecast, RFM, PSI, Benford) —
independent Python recomputations, not the DuckDB oracle replay that
test_oracle_parity.py already runs."""

from __future__ import annotations

import math
from collections import defaultdict

from s3_parquet_to_postgres_spark.plans.mining import (
    agg_benford,
    agg_gini_segment,
    event_attribution_ushape,
    event_forecast_linear,
    ml_rfm_segments,
    table_drift_psi,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )


def test_attribution_matches_bruteforce(spark):
    rows = _events(spark)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    credit = defaultdict(int)
    touches = defaultdict(int)
    for evs in by_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        # journeys end at each purchase; touches after the last
        # purchase are unattributed
        journey: list[str] = []
        for r in evs:
            if r["event_type"] == "purchase":
                n = len(journey)
                for i, ch in enumerate(journey):
                    touches[ch] += 1
                    if n == 1:
                        credit[ch] += 1000
                    elif n == 2:
                        credit[ch] += 500
                    elif i == 0 or i == n - 1:
                        credit[ch] += 400
                    else:
                        credit[ch] += math.floor(200 / (n - 2))
                journey = []
            elif r["event_type"] in ("view", "click", "signup"):
                journey.append(r["event_type"])
    got = {
        r["channel"]: (r["credit_milli"], r["touches"])
        for r in event_attribution_ushape(spark, SF).collect()
    }
    want = {ch: (credit[ch], touches[ch]) for ch in touches}
    assert got == want
    assert want, "no journeys in fixture; test is vacuous"


def test_gini_matches_bruteforce(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    by_seg = defaultdict(list)
    for r in cust:
        if r["c_acctbal"] > 0:
            by_seg[r["c_mktsegment"]].append(
                (r["c_acctbal"], r["c_custkey"])
            )
    got = {
        r["c_mktsegment"]: (r["n"], r["total_cents"], r["gini"])
        for r in agg_gini_segment(spark, SF).collect()
    }
    for seg, vals in by_seg.items():
        vals.sort()
        xq = [math.floor(v * 100 + 0.5) for v, _ in vals]
        n, sx = len(xq), sum(xq)
        six = sum((i + 1) * x for i, x in enumerate(xq))
        gini = (2.0 * six - (n + 1) * sx) / (n * sx)
        giniq = math.floor(gini * 1e6 + 0.5) / 1e6
        assert got[seg][0] == n and got[seg][1] == sx
        assert abs(got[seg][2] - giniq) < 1e-9
        assert 0.0 <= got[seg][2] < 1.0


def test_forecast_matches_bruteforce(spark):
    rows = _events(spark)
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        day = math.floor(
            r["ts"].timestamp() * 1e6 / 86400000000.0
        )
        daily[r["user_id"]][day] += math.floor(r["value"] * 100 + 0.5)
    got = {
        r["user_id"]: (r["n_days"], r["slope_per_day"],
                       r["next_day_forecast"])
        for r in event_forecast_linear(spark, SF).collect()
    }
    checked = 0
    for uid, dd in daily.items():
        if len(dd) < 2:
            assert uid not in got
            continue
        ts_, vs = list(dd), list(dd.values())
        n = len(ts_)
        st, sv = sum(ts_), sum(vs)
        stt = sum(t * t for t in ts_)
        stv = sum(t * v for t, v in zip(ts_, vs))
        den = n * stt - st * st
        slope = (n * stv - st * sv) / den
        intercept = (sv - slope * st) / n
        fc = intercept + slope * (max(ts_) + 1)
        assert got[uid][0] == n
        assert abs(got[uid][1] - slope / 100) < 2e-6
        assert abs(got[uid][2] - fc / 100) < 2e-4
        checked += 1
    assert checked > 0


def test_rfm_quintiles_are_balanced(spark):
    rows = ml_rfm_segments(spark, SF).collect()
    n = len(rows)
    assert n > 0
    for col in ("r", "f", "m"):
        sizes = defaultdict(int)
        for r in rows:
            assert 1 <= r[col] <= 5
            sizes[r[col]] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1
    for r in rows:
        assert r["segment"] == r["r"] * 100 + r["f"] * 10 + r["m"]


def test_psi_terms_nonnegative_and_consistent(spark):
    rows = table_drift_psi(spark, SF).collect()
    assert len(rows) == 10
    t_old = sum(r["n_old"] for r in rows)
    t_new = sum(r["n_new"] for r in rows)
    for r in rows:
        p = (r["n_old"] + 1) / (t_old + 10)
        q = (r["n_new"] + 1) / (t_new + 10)
        term = math.floor((p - q) * math.log(p / q) * 1e9 + 0.5)
        assert r["psi_term_q"] == term
        # (p - q) ln(p/q) >= 0 always (same sign factors)
        assert r["psi_term_q"] >= 0


def test_benford_shares_sum_to_one(spark):
    rows = agg_benford(spark, SF).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["observed_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-4


def test_pca_power_matches_numpy_replay(spark):
    """ml_pca_power must equal an independent numpy reimplementation
    of the same quantized recipe bit-for-bit, and the returned
    direction must dominate the all-ones start vector's Rayleigh
    quotient on the true Gram matrix."""
    import math as _math

    import numpy as np

    from s3_parquet_to_postgres_spark.plans.mining import (
        _PCA_DIM,
        _PCA_ITERS,
        _PCA_Q,
        ml_pca_power,
    )

    got = {
        r["dim"]: (r["v_q6"], r["eig_q6"])
        for r in ml_pca_power(spark, SF).collect()
    }

    emb = np.array(
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("embedding").toPandas()["embedding"].tolist(),
        dtype=np.float64,
    )
    qv = np.floor(emb * _PCA_Q + 0.5).astype(np.int64)
    g = qv.T @ qv  # exact: magnitudes << 2^53 at this scale
    n = float(emb.shape[0])
    gq = np.floor(
        g.astype(np.float64) * 1_000_000.0 / (n * float(_PCA_Q) * _PCA_Q)
        + 0.5
    ).astype(np.int64)
    v = np.full(_PCA_DIM, 1_000_000, dtype=np.int64)
    eig = None
    for _ in range(_PCA_ITERS):
        u = gq @ v
        m = float(np.max(np.abs(u)))
        v = np.floor(u.astype(np.float64) * 1_000_000.0 / m + 0.5).astype(
            np.int64
        )
        eig = int(_math.floor(m / 1_000_000.0 + 0.5))
    nz = np.nonzero(v)[0]
    if v[nz[0]] < 0:
        v = -v
    for d in range(_PCA_DIM):
        assert got[d] == (int(v[d]), eig), (d, got[d], int(v[d]), eig)

    # Rayleigh dominance: the fitted direction explains more of the
    # Gram energy than the start vector.
    gf = g.astype(np.float64)
    vf = v.astype(np.float64)
    ones = np.ones(_PCA_DIM)
    r_fit = vf @ gf @ vf / (vf @ vf)
    r_ones = ones @ gf @ ones / (ones @ ones)
    assert r_fit > r_ones


def test_pca_power_empty_corpus_returns_zero_direction(spark, tmp_path):
    """Empty embeddings table: the Gram normalizer divides by n == 0,
    so every quantized cell is NULL -- the operator must fall through
    the degenerate-Gram guard (all-zero direction, eig 0) instead of
    crashing on a None cell in the driver mat-vec."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s3_parquet_to_postgres_spark.plans.mining import (
        _PCA_DIM,
        ml_pca_power,
    )

    schema = pa.schema([
        pa.field("vec_id", pa.int64()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("label", pa.int32()),
    ])
    pq.write_table(
        pa.table([[], [], []], schema=schema),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = ml_pca_power(spark, str(tmp_path)).collect()
    assert len(rows) == _PCA_DIM
    assert all((r["v_q6"], r["eig_q6"]) == (0, 0) for r in rows)


def test_adaboost_invariants(spark):
    """Chosen stumps must satisfy the weak-learner condition (weighted
    error share < 1/2, hence alpha > 0) and alphas must be
    non-increasing as the reweighted rounds get harder on this
    feature family; ensemble accuracy never drops below the first
    round's."""
    from s3_parquet_to_postgres_spark.plans.mining import ml_adaboost_stumps

    rows = sorted(
        ml_adaboost_stumps(spark, SF).collect(), key=lambda r: r["round"]
    )
    assert [r["round"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert 0 < r["err_share_q6"] < 500_000, r
        assert r["alpha_q6"] > 0, r
        assert 0 <= r["n_correct"] <= r["n_docs"]
    assert rows[0]["alpha_q6"] >= rows[1]["alpha_q6"] >= rows[2]["alpha_q6"]
    assert rows[-1]["n_correct"] >= rows[0]["n_correct"] * 0.9
