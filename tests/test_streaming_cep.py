"""Streaming CEP == batch CEP: the applyInPandasWithState pattern
matcher (streaming/cep.py), replayed over time-split micro-batches,
must emit exactly the rows of the lead()-compiled batch entry
(event_pattern_match) -- including matches whose 3-event lookahead
SPANS a micro-batch boundary, which is the whole reason the streaming
half needs state."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.catalog import read_table
from s3_parquet_to_postgres_spark.plans.ext import event_pattern_match
from s3_parquet_to_postgres_spark.streaming.cep import pattern_matches

SF = "/root/testdata/sf0.001"


def test_streaming_pattern_matches_batch(spark, tmp_path):
    events = read_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    src = tmp_path / "src"
    src.mkdir()
    # Land the log as three time-ordered files (per-user order is
    # preserved because the split is global on ts) with distinct
    # mtimes so the file source drains them oldest-first.
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = events.agg(
        F.expr(
            "percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.34)"
        ).alias("t1"),
        F.expr(
            "percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.67)"
        ).alias("t2"),
    ).first()
    t1, t2 = bounds["t1"], bounds["t2"]
    chunks = [
        events.filter(ep <= t1),
        events.filter((ep > t1) & (ep <= t2)),
        events.filter(ep > t2),
    ]
    for i, ch in enumerate(chunks):
        stage = tmp_path / f"stage{i}"
        ch.coalesce(1).write.parquet(str(stage))
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        os.rename(str(stage / part), str(src / f"{i}.parquet"))
        time.sleep(1.1)  # distinct mtimes -> deterministic drain order

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        pattern_matches(stream)
        .writeStream.format("memory")
        .queryName("t_cep")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {tuple(r) for r in spark.table("t_cep").collect()}
    batch = {tuple(r) for r in event_pattern_match(spark, SF).collect()}
    assert len(batch) > 0
    assert streamed == batch

    # The split must actually have exercised cross-batch state: at
    # least one match's signup and error land in different chunks.
    ids = {}
    for i, ch in enumerate(chunks):
        for r in ch.select("event_id").collect():
            ids[r["event_id"]] = i
    spanning = [
        m for m in batch if ids[m[1]] != ids[m[2]]  # signup vs error chunk
    ]
    assert spanning, "time split produced no boundary-spanning matches"


class _FakeState:
    """Minimal GroupState stand-in for unit-driving _match_pattern."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.exists = True
        self._v = v


def test_matcher_is_chunk_order_invariant():
    """applyInPandasWithState may deliver one group's micro-batch as
    SEVERAL pandas chunks in arbitrary order; the state machine must
    concat-then-sort ONCE, not advance per chunk. Drive _match_pattern
    directly with shuffled chunk splits and demand identical output."""
    import itertools

    import pandas as pd

    from s3_parquet_to_postgres_spark.streaming.cep import _match_pattern

    rows = pd.DataFrame(
        {
            "ts": [1, 2, 3, 4, 5, 6, 7, 8],
            "event_id": [10, 11, 12, 13, 14, 15, 16, 17],
            "event_type": [
                "signup", "view", "error", "signup",
                "view", "purchase", "error", "signup",
            ],
        }
    )

    def run(chunks):
        state = _FakeState()
        out = list(_match_pattern((7,), iter(chunks), state))
        pairs = sorted(
            (int(r.signup_event_id), int(r.error_event_id))
            for df in out
            for r in df.itertuples()
        )
        return pairs, state.get

    want_pairs, want_state = run([rows])
    assert want_pairs  # fixture produces at least one match
    for cut1, cut2 in [(3, 6), (2, 4), (1, 7)]:
        parts = [rows.iloc[:cut1], rows.iloc[cut1:cut2], rows.iloc[cut2:]]
        for perm in itertools.permutations(parts):
            # shuffle rows WITHIN chunks too
            shuffled = [
                p.sample(frac=1, random_state=13).reset_index(drop=True)
                for p in perm
            ]
            got_pairs, got_state = run(shuffled)
            assert got_pairs == want_pairs
            assert got_state == want_state
