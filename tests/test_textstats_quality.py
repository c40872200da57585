"""Hand-computed + discrimination tests for the corpus text-analysis
signals added on top of the oracle-parity sweep: repetition (Gopher),
unigram-LM scoring, and PMI collocations behave like the statistics
they claim to be, not just match DuckDB."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from s3_parquet_to_postgres_spark.operators import textstats as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionSignals:
    def test_hand_computed_degenerate_doc(self, spark):
        # "a a a a a a": 6 tokens, 11 chars; five 2-grams, all "a a".
        df = _docs(spark, [(1, "a a a a a a")])
        row = T.repetition_signals(df).collect()[0]
        assert row.top2_count == 5
        # coverage = 5 occurrences x 3 chars / 11 chars (can exceed 1,
        # the paper's overlapping definition)
        assert row.top2_char_frac == pytest.approx(15 / 11, abs=1e-6)
        assert row.dup2_frac == pytest.approx(4 / 5)  # 1 distinct of 5
        assert row.top5_count == 2
        assert row.dup5_frac == pytest.approx(1 / 2)

    def test_diverse_doc_scores_zero_duplication(self, spark):
        df = _docs(spark, [(1, "b c d e f g h")])
        row = T.repetition_signals(df).collect()[0]
        assert row.top2_count == 1
        assert row.dup2_frac == 0.0
        assert row.dup3_frac == 0.0
        assert row.dup5_frac == 0.0

    def test_discriminates_repetitive_from_natural(self, spark):
        df = _docs(
            spark,
            [
                (1, "spam spam spam spam spam spam spam spam"),
                (2, "the quick brown fox jumps over the lazy dog"),
            ],
        )
        out = {r.doc_id: r for r in T.repetition_signals(df).collect()}
        assert out[1].dup2_frac > out[2].dup2_frac
        assert out[1].top3_char_frac > out[2].top3_char_frac

    def test_short_docs_keep_a_zero_row(self, spark):
        # A 1-token doc has no 2-grams; it still gets a row of zeros
        # (narrow map: every document in, every document out).
        df = _docs(spark, [(1, "only"), (2, "two tokens")])
        out = {r.doc_id: r for r in T.repetition_signals(df).collect()}
        assert set(out) == {1, 2}
        assert out[1].top2_count == 0
        assert out[1].dup5_frac == 0.0
        assert out[2].top2_count == 1


class TestRepetitionProperty:
    def test_fold_matches_counter_reference(self, spark):
        # Property-style differential: the sort+run-length fold must
        # equal the obvious Counter-based definition on adversarial
        # token streams (runs, ties, short docs). Deterministic
        # corpus enumerating the tricky shapes; one Spark job total.
        import collections
        import itertools
        import random

        rng = random.Random(42)
        vocab = ["a", "b", "ab", "a b"[:1], "xyz"]
        docs = []
        # exhaustive tiny docs (all 3-token combos over 2 tokens)
        for i, combo in enumerate(itertools.product(["a", "b"], repeat=3)):
            docs.append((i, " ".join(combo)))
        # random medium docs
        for i in range(100, 140):
            n = rng.randrange(2, 30)
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
        df = _docs(spark, docs)
        got = {r.doc_id: r for r in T.repetition_signals(df).collect()}

        def expect(text, n):
            toks = text.split()
            grams = [
                " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
            ]
            if not grams:
                return 0, 0.0, 0.0
            counts = collections.Counter(grams)
            top_cnt = max(counts.values())
            top_gram = min(g for g, c in counts.items() if c == top_cnt)
            chars = max(len(text), 1)
            cf = round(top_cnt * len(top_gram) / chars, 6)
            dup = round((len(grams) - len(counts)) / len(grams), 6)
            return top_cnt, cf, dup

        for doc_id, text in docs:
            for n in (2, 3, 5):
                tc, cf, dup = expect(text, n)
                row = got[doc_id]
                assert row[f"top{n}_count"] == tc, (doc_id, n)
                assert abs(row[f"top{n}_char_frac"] - cf) < 2e-6, (doc_id, n)
                assert abs(row[f"dup{n}_frac"] - dup) < 2e-6, (doc_id, n)


class TestUnigramLM:
    def test_hand_computed_logprob(self, spark):
        # Corpus: "x x y" + "x y". Counts: x=3, y=2, total=5.
        # doc 1: avg lp = (2*ln(3/5) + 1*ln(2/5)) / 3
        df = _docs(spark, [(1, "x x y"), (2, "x y")])
        out = {r.doc_id: r for r in T.unigram_lm_scores(df).collect()}
        lp_x, lp_y = math.log(3 / 5), math.log(2 / 5)
        assert out[1].n_tokens == 3
        assert out[1].avg_logprob == pytest.approx(
            (2 * lp_x + lp_y) / 3, abs=1e-5
        )
        assert out[2].avg_logprob == pytest.approx(
            (lp_x + lp_y) / 2, abs=1e-5
        )

    def test_rare_word_doc_scores_lower(self, spark):
        common = " ".join(["the"] * 20)
        df = _docs(
            spark,
            [(1, common), (2, common), (3, common), (4, "zyzzyva qoph")],
        )
        out = {r.doc_id: r for r in T.unigram_lm_scores(df).collect()}
        # Doc of corpus-rare words is less probable under the corpus
        # unigram LM -- the CCNet-style quality ordering.
        assert out[4].avg_logprob < out[1].avg_logprob
        assert out[4].ppl > out[1].ppl

    def test_case_folded(self, spark):
        df = _docs(spark, [(1, "The the THE")])
        row = T.unigram_lm_scores(df).collect()[0]
        assert row.avg_logprob == pytest.approx(0.0, abs=1e-6)  # p=1
        assert row.ppl == pytest.approx(1.0, abs=1e-4)


class TestBigramLM:
    def test_word_salad_scores_lower_than_fluent(self, spark):
        # Same unigram profile, different transitions: the shuffled
        # doc is exactly what the bigram rung catches and the unigram
        # rung cannot.
        fluent = "a b a b a b a b"
        rows = [(i, fluent) for i in range(6)] + [(9, "a a b b a a b b")]
        df = _docs(spark, rows)
        bi = {r.doc_id: r.avg_logprob for r in T.bigram_lm_scores(df).collect()}
        uni = {r.doc_id: r.avg_logprob for r in T.unigram_lm_scores(df).collect()}
        assert bi[9] < bi[0]
        assert abs(uni[9] - uni[0]) < 1e-9  # unigram rung is blind to it

    def test_single_token_docs_drop_out(self, spark):
        df = _docs(spark, [(1, "only"), (2, "two tokens")])
        ids = [r.doc_id for r in T.bigram_lm_scores(df).collect()]
        assert ids == [2]


class TestCollocations:
    def test_collocated_pair_beats_independent(self, spark):
        # "san francisco" always co-occur; "of" is everywhere.
        rows = [(i, "san francisco is of interest of note") for i in range(6)]
        rows += [(10 + i, "of the city of the bay of fog") for i in range(6)]
        df = _docs(spark, rows)
        out = T.pmi_collocations(df, min_count=5, top_n=5).collect()
        assert out, "expected at least one collocation"
        by_name = {r.bigram: r for r in out}
        # The perfectly-collocated pair is present, with positive PMI,
        # and outranks the promiscuous "of the" pair.
        assert "san francisco" in by_name
        sf = by_name["san francisco"]
        assert sf.pmi > 0
        assert sf.pmi == out[0].pmi  # ties with its equally-exclusive peers
        if "of the" in by_name:
            assert sf.pmi > by_name["of the"].pmi
        # Ranking is deterministic: pmi desc, bigram asc.
        ranks = [r.rnk for r in out]
        assert ranks == sorted(ranks)
        assert out[0].bigram == min(
            r.bigram for r in out if r.pmi == out[0].pmi
        )

    def test_min_count_filters_rare_bigrams(self, spark):
        df = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
        assert T.pmi_collocations(df, min_count=2, top_n=5).count() == 0
