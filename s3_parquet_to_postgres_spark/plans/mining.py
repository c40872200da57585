"""Graph/text mining catalog: TextRank keyword extraction and a
multinomial naive-Bayes language classifier trained and scored fully
inside the engine.

Both entries are end-to-end "train on the corpus, apply to the
corpus" programs whose every arithmetic step follows the catalog's
cross-engine determinism rules (base.py): counts and count-ratios are
exact, transcendental log-likelihoods are quantized to scaled BIGINT
per term and summed exactly, and every argmax/top-k carries a total
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import QuerySpec, t
from .ext import pagerank_oracle_sql

# Token conventions. TextRank works on the alphabetic-word stream
# ('the' stoplisted; {3,} drops one/two-letter noise); naive Bayes
# uses the same whitespace tokens as the LM entries so its vocabulary
# matches text_unigram_lm's.
_WORD_FILTER_SQL = (
    "list_filter(regexp_extract_all(lower(text), '[a-z]{3,}'),"
    " tk -> tk != 'the')"
)
_WORD_FILTER_SPARK = (
    "filter(regexp_extract_all(lower(text), '[a-z]{3,}', 0),"
    " tk -> tk != 'the')"
)
_WS_TOKS_SQL = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
    " tk -> tk != '')"
)
_WS_TOKS_SPARK = (
    "filter(split(trim(lower(text)), '\\\\s+'), tk -> tk != '')"
)


# --------------------------------------------------------------------------
# TextRank (Mihalcea & Tarau 2004): keywords = PageRank over the
# adjacent-token co-occurrence graph
# --------------------------------------------------------------------------


def text_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 corpus keywords by TextRank: distinct undirected
    adjacent-token co-occurrence edges, then the shared power-iteration
    ``pagerank`` operator (operators/components.py — edge list
    checkpointed once, one equi-join + one partial-agg per round).

    Scale shape: the corpus is scanned ONCE to build token-pair edges
    (a narrow per-doc arrays_zip, no join); ``distinct`` collapses the
    stream to the vocabulary co-occurrence graph, which is orders of
    magnitude smaller than the corpus (|V|^2-bounded, Zipf-sparse in
    practice), so the 10 pagerank rounds iterate over a small table.
    """
    from ..operators.components import pagerank

    d = t(spark, sf_dir, "documents").select(
        F.expr(_WORD_FILTER_SPARK).alias("w")
    )
    adj = d.filter(F.expr("size(w) >= 2")).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> struct(element_at(w, i) AS a,"
                " element_at(w, i + 1) AS b))"
            )
        ).alias("s")
    ).filter(F.expr("s.a <> s.b"))
    e = adj.select(
        F.least("s.a", "s.b").alias("a"),
        F.greatest("s.a", "s.b").alias("b"),
    ).distinct()
    edges = e.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    pr = pagerank(edges).select(F.col("id").alias("token"), "pagerank")
    return pr.orderBy(F.desc("pagerank"), F.asc("token")).limit(25)


_TEXTRANK_EDGES_SQL = f"""
WITH toks AS (
  SELECT {_WORD_FILTER_SQL} AS w FROM documents
), adj AS (
  SELECT unnest(list_transform(range(1, len(w)),
           i -> {{'a': w[i], 'b': w[i + 1]}})) AS s
  FROM toks WHERE len(w) >= 2
), e AS (
  SELECT DISTINCT least(s.a, s.b) AS a, greatest(s.a, s.b) AS b
  FROM adj WHERE s.a <> s.b
)
SELECT a AS src, b AS dst FROM e
UNION ALL SELECT b AS src, a AS dst FROM e
"""

TEXT_TEXTRANK_SQL = f"""
SELECT token, pagerank
FROM ({pagerank_oracle_sql(_TEXTRANK_EDGES_SQL, id_alias="token")}) pr
ORDER BY pagerank DESC, token ASC LIMIT 25
"""


# --------------------------------------------------------------------------
# Multinomial naive Bayes (add-one smoothing): language classifier
# trained on (lang, token) counts, applied back to the corpus
# --------------------------------------------------------------------------


def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial naive-Bayes ``lang`` classifier on the
    corpus and emit the resubstitution confusion matrix
    (actual, predicted, n).

    Model: P(c | d) ∝ P(c) · Π_t P(t | c), add-one smoothing
    P(t | c) = (count(t, c) + 1) / (total_c + |V|). Each per-term
    log-likelihood is quantized to a scaled BIGINT (1e-9) and the
    per-(doc, class) sums are exact integer arithmetic, so the argmax
    (tie → lexicographically first class) is bit-stable cross-engine.
    Defined over docs with >= 1 whitespace token.

    Scale shape: the model — (vocab × classes) likelihoods, per-class
    defaults, priors — is tiny and broadcast; the corpus token stream
    is scanned once, fanned out ONLY by the class count (a narrow
    explode), and reduced by a map-side-combinable (doc, class) sum.
    No shuffle touches anything wider than (doc_id, class, BIGINT).
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.expr(_WS_TOKS_SPARK).alias("w")
    )
    occ = d.select("doc_id", "lang", F.explode("w").alias("tok"))
    cc = occ.groupBy(F.col("lang").alias("cls"), "tok").agg(
        F.count("*").alias("c")
    )
    ctot = cc.groupBy("cls").agg(F.sum("c").alias("tot"))
    vdf = cc.select("tok").distinct().agg(F.count("*").alias("vocab"))
    q = F.lit(1.0e9)

    def _lnq(ratio: F.Column) -> F.Column:
        return F.floor(F.log(ratio) * q + F.lit(0.5)).cast("long")

    lik = (
        cc.join(F.broadcast(ctot), "cls")
        .crossJoin(F.broadcast(vdf))
        .select(
            "cls", "tok",
            _lnq((F.col("c") + F.lit(1.0))
                 / (F.col("tot") + F.col("vocab"))).alias("llq"),
        )
    )
    dflt = ctot.crossJoin(F.broadcast(vdf)).select(
        "cls",
        _lnq(F.lit(1.0) / (F.col("tot") + F.col("vocab"))).alias("dq"),
    )
    dd = occ.select("doc_id", "lang").distinct()
    ndocs = dd.agg(F.count("*").alias("n"))
    pri = (
        dd.groupBy(F.col("lang").alias("cls"))
        .agg(F.count("*").alias("nc"))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "cls",
            _lnq(F.col("nc").cast("double") / F.col("n")).alias("pq"),
        )
    )
    scored = (
        occ.crossJoin(F.broadcast(dflt))
        .join(F.broadcast(lik), ["cls", "tok"], "left")
        .groupBy(F.col("doc_id"), F.col("lang").alias("actual"), F.col("cls"))
        .agg(F.sum(F.coalesce(F.col("llq"), F.col("dq"))).alias("s"))
        .join(F.broadcast(pri), "cls")
        .select("doc_id", "actual", "cls",
                (F.col("s") + F.col("pq")).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    pred = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return pred.groupBy(
        F.col("actual"), F.col("cls").alias("predicted")
    ).agg(F.count("*").alias("n"))


ML_NAIVE_BAYES_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, {_WS_TOKS_SQL} AS w FROM documents
), occ AS (
  SELECT doc_id, lang, unnest(w) AS tok FROM d
), cc AS (
  SELECT lang AS cls, tok, count(*) AS c FROM occ GROUP BY 1, 2
), ctot AS (
  SELECT cls, sum(c) AS tot FROM cc GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok) AS vocab FROM cc
), lik AS (
  SELECT cls, tok,
         CAST(floor(ln((c + 1.0) / (tot + vocab)) * 1000000000.0 + 0.5)
              AS BIGINT) AS llq
  FROM cc JOIN ctot USING (cls), v
), dflt AS (
  SELECT cls,
         CAST(floor(ln(1.0 / (tot + vocab)) * 1000000000.0 + 0.5)
              AS BIGINT) AS dq
  FROM ctot, v
), dd AS (
  SELECT DISTINCT doc_id, lang FROM occ
), pri AS (
  SELECT lang AS cls,
         CAST(floor(ln(CAST(count(*) AS DOUBLE)
                       / (SELECT count(*) FROM dd)) * 1000000000.0 + 0.5)
              AS BIGINT) AS pq
  FROM dd GROUP BY 1
), sc AS (
  SELECT o.doc_id, o.lang AS actual, f.cls,
         CAST(sum(coalesce(l.llq, f.dq)) AS BIGINT) AS s
  FROM occ o
  CROSS JOIN dflt f
  LEFT JOIN lik l ON l.cls = f.cls AND l.tok = o.tok
  GROUP BY 1, 2, 3
), sc2 AS (
  SELECT sc.doc_id, sc.actual, sc.cls, sc.s + pri.pq AS score
  FROM sc JOIN pri ON pri.cls = sc.cls
), pred AS (
  SELECT doc_id, actual, cls AS predicted FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cls ASC) AS rn
    FROM sc2
  ) WHERE rn = 1
)
SELECT actual, predicted, count(*) AS n FROM pred GROUP BY 1, 2
"""


SPECS: list[QuerySpec] = [
    QuerySpec("text_textrank", text_textrank, TEXT_TEXTRANK_SQL),
    QuerySpec("ml_naive_bayes", ml_naive_bayes, ML_NAIVE_BAYES_SQL),
]
