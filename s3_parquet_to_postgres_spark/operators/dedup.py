"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard -- the standard near-dup ladder for training-corpus cleaning.

Algorithms from the public literature: MinHash (Broder 1997,
"On the resemblance and containment of documents"), banded LSH
(Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3),
SimHash (Charikar 2002; Manku et al. 2007 for the chunk-pigeonhole
near-dup search), prefix filtering (Chaudhuri et al. 2006; PPJoin,
Xiao et al. 2008).

Scale posture: nothing here ever builds an all-pairs cross join.
Exact dedup is a hash aggregation on the content key; MinHash/LSH and
shingle-Jaccard generate candidate pairs by *equi-joining on bucket
keys* (band signatures / shared shingles), so the shuffle volume is
proportional to collisions, not n^2. All hashing is Spark-built-in
(xxhash64 / sha2 / crc32), JVM-side, deterministic across runs.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.layout import explode_width, spread
from .textstats import ws_tokens

# Mersenne prime 2^31-1: universal-hash modulus. 31-bit values keep
# every intermediate (h*a + b, h,a,b < 2^31) below 2^63, so the math
# stays in plain long arithmetic with no overflow even under ANSI mode
# (Spark 4 default) -- no BIGDECIMAL, no wraparound, fully JVM-side.
_P = (1 << 31) - 1

# Exact-set cluster collapse engages once copies exceed this multiple
# of distinct sets (docs / clusters). Direct id-level pairing is
# cheaper below it (fewer stages, narrower pair keys); rep-level
# pairing wins above it because direct pair volume grows with the
# SQUARE of cluster size. Shared by containment_pairs here and
# passage_overlap_pairs (textstats.py), which measure the ratio with
# one aggregation over their already-checkpointed per-doc set table.
CLUSTER_COLLAPSE_MIN_DUP = 1.5


def portable_hash60(col: Column | str) -> Column:
    """Cross-engine deterministic 60-bit hash: the first 15 hex chars
    of md5, parsed as an integer. Bit-identical in DuckDB as
    ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``, which is
    what makes MinHash/SimHash catalog entries value-exact against
    the oracle. xxhash64 stays the default for production paths
    (one JVM hash vs md5 + hex parse)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _shingle_hash(hash_family: str) -> "Callable[[Column], Column]":
    if hash_family == "xxhash64":
        return lambda c: F.pmod(F.xxhash64(c), F.lit(_P))
    if hash_family == "portable":
        return lambda c: F.pmod(portable_hash60(c), F.lit(_P))
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per key: the one with the smallest
    ``order_col``. Deterministic (unlike dropDuplicates, whose survivor
    depends on partition order) and shuffle-optimal: one hash
    aggregation, no sort of the full data."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-TOKENIZED array
    column (JVM-side: transform + array_distinct; no UDF). Take a
    materialized attribute, not the tokenize expression itself: this
    references ``toks`` three times, and an inline split() would be
    re-evaluated per reference (and again by filter pushdown).

    Guarded for texts shorter than ``n`` tokens: ``sequence(1, 0)``
    is DESCENDING in Spark ([1, 0]), so an unguarded upper bound of 0
    would feed slice() a zero start and throw."""
    k = F.size(toks) - (n - 1)
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
    return F.array_distinct(grams)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a raw text column. Prefer
    ``shingles_of`` over a materialized token column in plans -- this
    convenience form embeds the tokenization 3x."""
    return shingles_of(ws_tokens(text), n)


def _hash_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) universal-hash parameters per permutation;
    derived from the index so executors need no broadcast state."""
    out = []
    for i in range(num_hashes):
        a = (seed * 1_000_003 + i * 7_919) % _P or 1
        b = (seed * 7_753 + i * 104_729) % _P
        out.append((a, b))
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures.

    Shape chosen for scale AND codegen: explode shingles once, hash
    each to one long, compute the num_hashes permuted hashes in a
    single Project, then ONE hash aggregation of plain ``min(col)``
    functions. Nesting the permutations as array transforms instead
    (num_hashes copies of the shingle expression tree) blows the
    whole-stage-codegen method-size limit and falls back to
    interpreted eval -- ~100x slower at sf0.1. Keeping the pmod
    arithmetic in the Project rather than inside the aggregate
    functions roughly halves the generated aggregate class, cutting
    its janino compile time (the dominant fixed cost of this plan).
    Partial (map-side) min aggregation means shuffle volume is
    num_hashes longs per doc, independent of document length.
    """
    sh = spread(df).withColumn("__toks", ws_tokens(text_col)).select(
        F.col(id_col).alias("id"),
        F.explode(shingles_of(F.col("__toks"), n)).alias("shingle"),
    ).select("id", _shingle_hash(hash_family)(F.col("shingle")).alias("h"))
    # SQL-text expressions, not composed Column objects: each F.pmod(
    # F.col()*F.lit()+F.lit()) chain is ~8 py4j round trips and with
    # num_hashes of them the driver spends ~1s just BUILDING the plan;
    # one parsed string per column is ~5x cheaper (measured 1.07s ->
    # 0.22s) and produces the identical expression tree.
    proj = sh.selectExpr(
        "id",
        *[
            f"pmod(h * {a}L + {b}L, {_P}L) AS h{i}"
            for i, (a, b) in enumerate(_hash_params(num_hashes))
        ],
    )
    return (
        proj.groupBy("id")
        .agg(F.expr("min(h0) AS m0"),
             *[F.expr(f"min(h{i}) AS m{i}") for i in range(1, num_hashes)])
        .selectExpr(
            "id",
            "array(" + ",".join(f"m{i}" for i in range(num_hashes)) + ") AS sig",
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    max_bucket_size: int = 1024,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    shingle -> minhash signature -> split into ``bands`` bands of
    ``num_hashes/bands`` rows -> group docs by (band, band-hash) ->
    emit in-bucket pairs. Returns (id_a < id_b, jaccard_est).

    Grouping into buckets (collect_list) instead of a band-key
    self-join means the signature aggregation -- the expensive
    full-corpus scan -- runs ONCE; Catalyst does not deduplicate the
    common subplan of a self-join, so the join formulation scans and
    sketches the corpus twice. Shuffle volume is one (sig, band) row
    per doc-band either way; candidates only, never all pairs.
    ``max_bucket_size`` drops degenerate buckets (boilerplate/empty
    text collapsing onto one band hash) whose in-bucket pairing would
    go quadratic at corpus scale; everything in such a bucket pairs
    with everything, so no discriminating near-dup signal is lost.
    """
    rows = num_hashes // bands
    from ..session import eager_build_scope

    # Duplication-adaptive collapse (r11, the containment_pairs design
    # at the SIGNATURE level): every output row is a pure function of
    # the two signatures -- the band hashes that bucket a pair and the
    # zip_with equality estimate that scores it -- so docs with
    # IDENTICAL signatures (exact copies always are) can collapse to
    # one representative before banding. The signature table is
    # checkpointed (the plan's most expensive stage, now with two
    # consumers), one stats job picks the shape. Above the dup
    # threshold, banding/bucketing/pair-exploding run per DISTINCT
    # signature: copy pairs come from the cluster table as intra
    # pairs (identical sigs agree on all num_hashes rows => estimate
    # exactly 1.0), cross pairs fan members back via equi-joins on a
    # 16-byte md5 signature key. The bucket-size guard counts DOCS
    # (sum of cluster sizes), preserving the declared cap; an intra
    # pair is emitted iff its cluster reaches >= 1 kept bucket --
    # exactly pre-collapse reachability (a size>=2 cluster's own
    # bucket always holds >= 2 docs, so only an over-cap boilerplate
    # storm drops it, same as before).
    with eager_build_scope(df.sparkSession):
        sig = minhash_signatures(
            df, id_col, text_col, num_hashes, n, hash_family
        ).localCheckpoint(eager=False)
        n_docs, n_sigs = sig.agg(
            F.count("*"), F.count_distinct("sig")
        ).first()
    # Band bucket key: hash of the band's signature slice rendered as
    # a comma-joined string. md5 under the portable family so the
    # DuckDB oracle reproduces the buckets byte-for-byte.
    band_hasher = F.xxhash64 if hash_family == "xxhash64" else F.md5

    def band_cols(src: DataFrame, keep: list[str]) -> DataFrame:
        return src.select(
            *keep,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: band_hasher(
                        F.concat_ws(
                            ",", F.transform(
                                F.slice("sig", b * rows + 1, rows),
                                lambda x: x.cast("string"),
                            )
                        )
                    ),
                )
            ).alias("band", "band_hash"),
        )

    if n_docs <= CLUSTER_COLLAPSE_MIN_DUP * (n_sigs or 1):
        banded = band_cols(sig, ["id", "sig"])
        buckets = (
            banded.groupBy("band", "band_hash")
            .agg(F.collect_list(F.struct("id", "sig")).alias("ms"))
            .filter(
                (F.size("ms") >= 2) & (F.size("ms") <= max_bucket_size)
            )
        )
        pair_expr = F.expr(
            "flatten(transform(ms, (x, i) ->"
            " transform(slice(ms, i + 2, size(ms)), y ->"
            " named_struct("
            "   'id_a', least(x.id, y.id),"
            "   'id_b', greatest(x.id, y.id),"
            "   'jaccard_est',"
            "   size(filter(zip_with(x.sig, y.sig, (p, q) -> p = q),"
            f"              e -> e)) / {num_hashes}))))"
        )
        return (
            buckets.select(F.explode(pair_expr).alias("p"))
            .select("p.id_a", "p.id_b", "p.jaccard_est")
            .dropDuplicates(["id_a", "id_b"])
        )
    # Cluster path: one rep per distinct signature. 16-byte binary
    # cluster key (md5 over the comma-joined signature, the
    # containment ck convention) so the member fan-out joins shuffle
    # 16 bytes per row instead of the 32-long array.
    sk = F.unhex(F.md5(F.concat_ws(
        ",", F.transform(F.col("sig"), lambda x: x.cast("string"))
    )))
    keyed = sig.select("id", "sig", sk.alias("ck"))
    clusters = keyed.groupBy("ck").agg(
        F.first("sig").alias("sig"), F.count("*").alias("csize")
    )
    banded = band_cols(clusters, ["ck", "sig", "csize"])
    # Same-key repartition pins the bucket stage's width against AQE
    # byte-based coalescing (explode_width rationale: the C(k,2) pair
    # explode multiplies CPU beyond its input bytes); the following
    # same-key groupBy reuses the exchange, no shuffle added.
    width = explode_width(df.sparkSession, int(n_sigs or 0) * bands)
    buckets = (
        banded.repartition(width, "band", "band_hash")
        .groupBy("band", "band_hash")
        .agg(
            F.collect_list(F.struct("ck", "sig")).alias("ms"),
            F.sum("csize").alias("nd"),
        )
        .filter((F.col("nd") >= 2) & (F.col("nd") <= max_bucket_size))
    )
    pair_expr = F.expr(
        "flatten(transform(ms, (x, i) ->"
        " transform(slice(ms, i + 2, size(ms)), y ->"
        " named_struct("
        "   'ck_a', if(x.ck < y.ck, x.ck, y.ck),"
        "   'ck_b', if(x.ck < y.ck, y.ck, x.ck),"
        "   'jaccard_est',"
        "   size(filter(zip_with(x.sig, y.sig, (p, q) -> p = q),"
        f"              e -> e)) / {num_hashes}))))"
    )
    rep_pairs = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.ck_a", "p.ck_b", "p.jaccard_est")
        .dropDuplicates(["ck_a", "ck_b"])
    )
    cross = (
        rep_pairs
        .join(keyed.select(F.col("ck").alias("ck_a"),
                           F.col("id").alias("ida")), "ck_a")
        .join(keyed.select(F.col("ck").alias("ck_b"),
                           F.col("id").alias("idb")), "ck_b")
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "jaccard_est",
        )
    )
    kept_cks = buckets.select(
        F.explode(F.transform("ms", lambda m: m["ck"])).alias("ck")
    ).distinct()
    multi = clusters.filter(F.col("csize") >= 2).join(kept_cks, "ck")
    k1 = keyed.join(multi.select("ck"), "ck").select("ck", "id")
    intra = (
        k1.join(k1.select("ck", F.col("id").alias("idb")), "ck")
        .filter(F.col("id") < F.col("idb"))
        .select(
            F.col("id").alias("id_a"), F.col("idb").alias("id_b"),
            # Identical signatures agree on every row; the original
            # expression evaluates to size/num_hashes = exactly 1.0.
            (F.lit(num_hashes) / F.lit(num_hashes))
            .alias("jaccard_est"),
        )
    )
    return cross.unionByName(intra)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64, hash_family: str = "xxhash64") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sign of the sum
    of +-1 votes from each token's xxhash64 bit. Hamming-close
    signatures => near-duplicate texts. Pure column expressions."""
    # Explode distinct tokens to one row each, hash once, compute the
    # per-bit +-1 votes in one Project, then ONE aggregation of plain
    # sum(col) functions (nested array aggregates per bit would exceed
    # the codegen method-size limit, and votes inside the aggregate
    # functions double its generated-code size -- see
    # minhash_signatures). Map-side partial sums keep the shuffle at
    # `bits` longs per doc.
    # 2^63 would overflow signed long; the portable hash only has 60
    # meaningful bits (bits above are always 0 -> constant -1 votes,
    # harmless but wasted), so portable callers pass bits <= 48.
    nbits = min(bits, 63)
    token_hash = (
        F.xxhash64 if hash_family == "xxhash64" else portable_hash60
    )
    if hash_family not in ("xxhash64", "portable"):
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    tok = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(ws_tokens(text_col))).alias("tk"),
    ).select("id", token_hash(F.col("tk")).alias("h"))
    # SQL-text expressions for the same py4j-build-cost reason as
    # minhash_signatures (nbits * 3 composed-Column chains would cost
    # ~1000 driver round trips per plan).
    proj = tok.selectExpr(
        "id",
        *[f"IF(getbit(h, {i}) = 1, 1, -1) AS b{i}" for i in range(nbits)],
    )
    agg = proj.groupBy("id").agg(
        F.expr("sum(b0) AS v0"),
        *[F.expr(f"sum(b{i}) AS v{i}") for i in range(1, nbits)],
    )
    sig_sql = " + ".join(f"IF(v{i} > 0, {2 ** i}L, 0L)" for i in range(nbits))
    return agg.selectExpr(f"id AS {id_col}", f"({sig_sql}) AS simhash")


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = 8,
                       max_bucket_size: int = 1024,
                       bits: int = 64,
                       hash_family: str = "xxhash64") -> DataFrame:
    """Near-dup pairs by SimHash: block on signature chunks, then
    verify hamming distance exactly.

    Pigeonhole completeness: with 4 chunks, a pair differing in at
    most 3 bits MUST share an identical chunk, so blocking is
    lossless for ``max_hamming <= 3``. Beyond that it is recall-based
    (a hamming-4 pair can place one differing bit in every chunk and
    never collide); callers wanting a lossless larger radius should
    raise the chunk count to ``max_hamming + 1`` (Manku et al. 2007's
    construction), trading bucket-key width for bucket size.

    Like ``minhash_lsh_pairs``, buckets are grouped (collect_list)
    rather than self-joined on the chunk key: the signature
    aggregation is the expensive corpus scan and a self-join would
    run it twice. Oversize buckets (a chunk value shared by huge
    cohorts of boilerplate docs) are dropped -- their in-bucket
    pairing is quadratic and carries no discriminating signal.
    """
    sigs = simhash(df, id_col, text_col, bits, hash_family)
    # 4 pigeonhole chunks covering the full signature width:
    # ceil(nbits/4) bits each -- 16 for the default 64(63)-bit
    # signature, 12 for the portable 48-bit one. Floor division would
    # shrink the chunk key space (15-bit chunks for bits=64): merged,
    # bigger buckets that cross max_bucket_size get dropped wholesale,
    # and the top signature bits would never participate in blocking.
    chunk_bits = (min(bits, 63) + 3) // 4
    chunk_mask = (1 << chunk_bits) - 1
    chunks = sigs.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk_no"),
                    F.shiftright("simhash", i * chunk_bits)
                    .bitwiseAND(F.lit(chunk_mask))
                    .alias("chunk"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select("id", "simhash", F.col("c.chunk_no"), F.col("c.chunk"))
    buckets = (
        chunks.groupBy("chunk_no", "chunk")
        .agg(F.collect_list(F.struct("id", "simhash")).alias("ms"))
        .filter(
            (F.size("ms") >= 2) & (F.size("ms") <= max_bucket_size)
        )
    )
    pair_expr = F.expr(
        "flatten(transform(ms, (x, i) ->"
        " transform(slice(ms, i + 2, size(ms)), y ->"
        " named_struct("
        "   'id_a', least(x.id, y.id),"
        "   'id_b', greatest(x.id, y.id),"
        "   'hamming',"
        "   CAST(bit_count(x.simhash ^ y.simhash) AS BIGINT)))))"
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
    strategy: str | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs at or above ``threshold``.

    ``max_shingle_df`` (declared semantics when set): shingles whose
    global document frequency exceeds the cap are dropped from every
    document's set BEFORE sizes and intersections -- Jaccard over
    non-boilerplate shingles. This bounds the inverted index's
    worst-case fan-out (a shingle shared by k documents produces k^2
    candidate rows; boilerplate headers/footers at corpus scale make
    k unbounded) at the cost of ignoring exactly the shingles that
    carry no discriminating signal. Applied identically in both
    strategies, so they remain result-identical.

    Two exact strategies, chosen by threshold (both return identical
    results -- pinned by tests):

    * ``inverted`` (default for t < 0.3): inverted-index self-join
      counting shared shingles per pair. One aggregation computes all
      intersections; best when the prefix bound can't prune.
    * ``prefix`` (default for t >= 0.3): PPJoin-family prefix
      filtering. Order each doc's shingles by global rarity, index
      only the first |A| - ceil(t*|A|) + 1 -- the prefix-filter
      theorem guarantees every qualifying pair collides inside those
      prefixes -- then verify candidates with one array_intersect per
      pair. At t=0.8 the prefix is ~20% of the set and hot shingles
      (the k^2 fan-out of the inverted join) sit past the prefix
      boundary, so candidate volume collapses. This is the 100 TB path
      for real near-dup thresholds.
    """
    if strategy is None:
        strategy = "prefix" if threshold >= 0.3 else "inverted"
    if strategy == "inverted":
        return _jaccard_inverted(df, id_col, text_col, n, threshold,
                                 max_shingle_df)
    if strategy != "prefix":
        raise ValueError(f"unknown strategy: {strategy!r}")
    sh = spread(df).withColumn("__toks", ws_tokens(text_col)).select(
        F.col(id_col).alias("id"),
        F.explode(shingles_of(F.col("__toks"), n)).alias("shingle"),
    )
    # Global df per shingle as a WINDOW count, not a groupBy+join:
    # the join form derives the corpus shingle explode TWICE
    # (Catalyst does not deduplicate the common subplan); the window
    # attaches gdf in the same single shuffle that the filter needs.
    sh = sh.withColumn(
        "gdf", F.count("*").over(Window.partitionBy("shingle"))
    )
    if max_shingle_df is not None:
        sh = sh.filter(F.col("gdf") <= max_shingle_df)
    # Canonical order: rarest first (ties broken by shingle text) --
    # shared rare shingles surface in the first prefix positions.
    ordered = (
        sh
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("gdf", "shingle"))),
                lambda s: s["shingle"],
            ).alias("sh_arr")
        )
        .withColumn("n_sh", F.size("sh_arr"))
        # alpha = minimum overlap a qualifying partner must have with
        # this set; the -1e-9 counters binary float ceil overshoot
        # (0.1*20 -> 2.0000000000000004 must still give alpha=2).
        .withColumn(
            "p_len",
            F.least(
                F.col("n_sh"),
                F.col("n_sh")
                - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
                .cast("int")
                + F.lit(1),
            ),
        )
    )
    # Candidate generation on SLIM (id, shingle) rows only -- the
    # shingle arrays are joined back after pair dedup, so pre-dedup
    # collision volume never materializes array payloads.
    prefix = ordered.select(
        "id", F.explode(F.slice("sh_arr", 1, F.col("p_len"))).alias("shingle")
    )
    cand = (
        prefix.select(F.col("id").alias("id_a"), "shingle")
        .join(prefix.select(F.col("id").alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    arrs = ordered.select("id", "sh_arr", "n_sh")
    cand = (
        cand.join(
            arrs.select(F.col("id").alias("id_a"), F.col("sh_arr").alias("arr_a"),
                        F.col("n_sh").alias("n_a")),
            "id_a",
        )
        .join(
            arrs.select(F.col("id").alias("id_b"), F.col("sh_arr").alias("arr_b"),
                        F.col("n_sh").alias("n_b")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _jaccard_inverted(
    df: DataFrame, id_col: str, text_col: str, n: int, threshold: float,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Inverted-index exact Jaccard: count shared shingles per pair.

    Shingles group into per-shingle posting lists (collect_list), and
    everything else -- document sizes, pair intersections -- derives
    from that bucket table. The earlier formulation joined the
    exploded shingle table against itself and against two size
    aggregations, materializing the shingle pipeline (the expensive
    corpus explode) FOUR times in the plan; Catalyst does not
    deduplicate a self-join's common subplan.

    With ``max_shingle_df`` set, hot shingles are pruned with a
    COUNT aggregation (fixed-size state) + broadcast-able semi-join
    BEFORE any posting list is collected: a boilerplate shingle
    shared by millions of docs never concentrates its ids in one
    aggregation buffer, and a surviving list holds at most cap ids.
    That prune re-derives the exploded shingle table (two corpus
    explodes total -- still half the old plan's four, and the explode
    is cheap next to an unbounded collect_list buffer). The cap also
    bounds pair fan-out at cap^2 per shingle (declared semantics,
    reproduced by the oracle). Without a cap the single-scan
    formulation is kept, but it is only safe on corpora known to
    lack boilerplate."""
    sh = spread(df).withColumn("__toks", ws_tokens(text_col)).select(
        F.col(id_col).alias("id"),
        F.explode(shingles_of(F.col("__toks"), n)).alias("shingle"),
    )
    if max_shingle_df is not None:
        # WINDOW-count df cap, not groupBy+semi-join: the semi-join
        # derives the corpus shingle explode twice (no common-subplan
        # dedup in Catalyst); the window filters in the one shuffle,
        # with no O(|shingles|) keep-list to broadcast.
        sh = (
            sh.withColumn(
                "__gdf", F.count("*").over(Window.partitionBy("shingle"))
            )
            .filter(F.col("__gdf") <= max_shingle_df)
            .drop("__gdf")
        )
    # Materialize the capped posting-list table ONCE: both consumers
    # below (sizes, pair_inter) would otherwise re-derive the whole
    # corpus explode + df-prune tree, doubling the scan and shuffle
    # work. Post-cap buckets are bounded (distinct shingles x <=cap
    # ids), so the localCheckpoint is cheap and truncates the
    # expensive lineage; lazy (eager=False) so building the plan
    # stays job-free and the persist folds into the first action.
    buckets = (
        sh.groupBy("shingle")
        .agg(F.collect_list("id").alias("ids"))
        .localCheckpoint(eager=False)
    )
    # Doc sizes from the (capped) posting lists -- no corpus rescan.
    sizes = (
        buckets.select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_sh"))
    )
    # In-bucket ordered pairs; count of shared shingles per pair.
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) ->"
        " transform(slice(ids, i + 2, size(ids)), y ->"
        " named_struct('id_a', least(x, y), 'id_b', greatest(x, y)))))"
    )
    pair_inter = (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pair_inter.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 100,
) -> DataFrame:
    """EXACT shingle-containment pairs: C(A in B) = |A ∩ B| / |A|
    (Broder 1997's second resemblance measure). Containment is the
    one-sided near-dup test Jaccard misses: a short document pasted
    inside a much longer one scores near-zero Jaccard (the union is
    dominated by B) but containment ~1 -- the quote/boilerplate/
    subset-dup case in training-corpus curation. Emits pairs where
    EITHER direction clears ``threshold``, with both directions
    reported.

    Scale posture (r10 redesign, measured at 16x volume): docs
    collapse to EXACT-SHINGLE-SET clusters before any pairing.
    Containment is a pure set function, so every member of a cluster
    has identical size, identical intersection with any partner, and
    identical containments — the posting-list/intersection machinery
    only ever needs to run on one representative per cluster, and the
    member-level answer is a pure JOIN fan-out of the rep-level one.
    On a corpus with heavy exact duplication (the 16x key-shifted
    stress IS one: every text appears 16x; real crawl corpora are
    boilerplate-ridden the same way) this collapses the dominant
    stage — the r9 shape fed ~13M candidate pairs into a pair-count
    aggregation at 16x (11.5-12.2 s wall; profiled at ~10 s of it in
    the pair stage) because copies pair copy-against-copy; rep-level
    pairing is copy-count-free and the 2.4M required output rows are
    produced by two equi-joins instead of a 13M-group aggregation.
    A PPJoin-style prefix filter was measured first and rejected: at
    threshold 0.5 the prefix is ~65% of these small post-cap sets and
    cut candidates only 33% (12.9M -> 8.7M) while forcing an array
    join-back per survivor.

    Rep-level machinery is the same bounded posting-list shape as
    ``_jaccard_inverted`` (doc-level ``max_shingle_df`` cap applied
    BEFORE clustering, bounding per-shingle fan-out; cluster count
    per shingle <= capped df). Cluster state is never collected: a
    cluster key is md5 over the canonically-sorted shingle list
    (\\x1f-joined; shingles are whitespace-tokenized word n-grams, so
    the separator cannot split ambiguously on any \\s-tokenized
    corpus), membership stays a TABLE, and both expansions are
    equi-joins on that key. Cluster size is STRUCTURALLY bounded by
    ``max_shingle_df``: a kept shingle shared by all k members has
    df >= k, and kept means df <= cap — so k <= cap, intra fan-out
    <= C(cap, 2) per cluster, and a boilerplate storm larger than
    the cap loses all its shingles to the df filter and pairs not at
    all (exactly the pre-collapse behavior: its bucket rows were
    df-dropped too). No O(corpus) broadcast anywhere.

    Duplication-adaptive shape (r11): on a LOW-duplication corpus the
    clusters are ~all singletons and the rep machinery (the groupBy(ck)
    rep aggregation, both member fan-out joins, the intra self-join +
    union) only adds stages while doubling the pair-stage key width
    (16-byte ck vs the caller's id). The per-doc set table the cluster
    key derives from is checkpointed anyway, so ONE cheap stats
    aggregation on it (docs vs distinct cks — the discriminator the
    r10 log thought unknowable) picks the shape at plan-construction
    time, the same measure-then-plan move AQE makes for join strategy.
    Both shapes compute the exact same pairs: the direct path pairs
    ids in the very same capped posting buckets (identical docs then
    share every shingle, so their pair surfaces with inter = n, i.e.
    containment exactly 1.0 = the cluster path's intra literal), the
    cluster path collapses copies first and fans members back. The
    switch threshold is conservative: the cluster path wins once
    copies are >~1.5x docs because pair volume grows with the SQUARE
    of cluster size on the direct path (measured r10: 16x copies made
    the direct pair stage ~10 s of an 11.5 s wall at 16x volume,
    halved by collapsing).
    """
    sh = spread(df).withColumn("__toks", ws_tokens(text_col)).select(
        F.col(id_col).alias("id"),
        F.explode(shingles_of(F.col("__toks"), n)).alias("shingle"),
    )
    if max_shingle_df is not None:
        # WINDOW-count df cap, not groupBy+semi-join: the semi-join
        # derives the corpus shingle explode twice (no common-subplan
        # dedup in Catalyst); the window filters in the one shuffle,
        # with no O(|shingles|) keep-list to broadcast.
        sh = (
            sh.withColumn(
                "__gdf", F.count("*").over(Window.partitionBy("shingle"))
            )
            .filter(F.col("__gdf") <= max_shingle_df)
            .drop("__gdf")
        )
    # Canonical per-doc set table, checkpointed ONCE: feeds the
    # membership table, the representative selection and the rep
    # posting explode — without it each consumer re-derives the
    # corpus tokenize + df-cap tree. Per-doc state is the doc's own
    # distinct-shingle list (bounded by document length, the buffer
    # any per-doc tokenize op holds).
    from ..session import eager_build_scope

    with eager_build_scope(df.sparkSession):
        docs_arr = (
            sh.groupBy("id")
            .agg(F.sort_array(F.collect_list("shingle")).alias("shs"))
            .select(
                "id", "shs", F.size("shs").alias("n_sh"),
                # 16-byte binary cluster key (unhex(md5)): the pair
                # stage shuffles two cks per candidate row, so the
                # narrower key halves its dominant columns vs md5's
                # 32-char hex string.
                F.unhex(F.md5(F.concat_ws("\x1f", "shs"))).alias("ck"),
            )
            .localCheckpoint(eager=False)
        )
        # One stats job on the (now-materialized) checkpoint decides
        # the pairing shape AND the pair-stage width; the checkpoint is
        # reused by every branch below, so the corpus scan still
        # happens once. AQE off for the build (eager_build_scope): one
        # job instead of one per shuffle stage.
        n_docs, n_clusters, n_post = docs_arr.agg(
            F.count("*"), F.count_distinct("ck"), F.sum("n_sh")
        ).first()
    width = explode_width(docs_arr.sparkSession, n_post or 0)
    if n_docs <= CLUSTER_COLLAPSE_MIN_DUP * n_clusters:
        post = docs_arr.select(
            "id", "n_sh", F.explode("shs").alias("shingle")
        )
        buckets = post.repartition(width, "shingle").groupBy("shingle").agg(
            F.collect_list(F.struct("id", "n_sh")).alias("cs")
        )
        pair_expr = F.expr(
            "flatten(transform(cs, (x, i) ->"
            " transform(slice(cs, i + 2, size(cs)), y ->"
            " named_struct("
            "'id_a', if(x.id < y.id, x.id, y.id),"
            " 'n_a', if(x.id < y.id, x.n_sh, y.n_sh),"
            " 'id_b', if(x.id < y.id, y.id, x.id),"
            " 'n_b', if(x.id < y.id, y.n_sh, x.n_sh)))))"
        )
        pairs = (
            buckets.filter(F.size("cs") >= 2)
            .select(F.explode(pair_expr).alias("p"))
            .groupBy(
                F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"),
                F.col("p.n_a").alias("n_a"), F.col("p.n_b").alias("n_b"),
            )
            .agg(F.count("*").alias("inter"))
        )
        return pairs.select(
            "id_a", "id_b",
            (F.col("inter") / F.col("n_a")).alias("containment_a_in_b"),
            (F.col("inter") / F.col("n_b")).alias("containment_b_in_a"),
        ).filter(
            (F.col("containment_a_in_b") >= threshold)
            | (F.col("containment_b_in_a") >= threshold)
        )
    members = docs_arr.select("id", "ck", "n_sh")
    # One representative per cluster, WITHOUT a rep-id join: every
    # member's shs/n_sh are identical by construction of ck, so
    # first() is deterministic in value and the cluster table drops
    # straight out of one aggregation.
    rep_sh = (
        docs_arr.groupBy("ck")
        .agg(F.first("n_sh").alias("n_sh"), F.first("shs").alias("shs"))
        .select("ck", "n_sh", F.explode("shs").alias("shingle"))
    )
    buckets = rep_sh.repartition(width, "shingle").groupBy("shingle").agg(
        F.collect_list(F.struct("ck", "n_sh")).alias("cs")
    )
    # In-bucket i<j cluster combinations, canonicalized by cluster
    # key with the set sizes kept aligned: the aggregation yields
    # (pair, n_a, n_b, inter) complete, so no size join ever touches
    # the pair table.
    pair_expr = F.expr(
        "flatten(transform(cs, (x, i) ->"
        " transform(slice(cs, i + 2, size(cs)), y ->"
        " named_struct("
        "'ck_a', if(x.ck < y.ck, x.ck, y.ck),"
        " 'n_a', if(x.ck < y.ck, x.n_sh, y.n_sh),"
        " 'ck_b', if(x.ck < y.ck, y.ck, x.ck),"
        " 'n_b', if(x.ck < y.ck, y.n_sh, x.n_sh)))))"
    )
    rep_pairs = (
        buckets.filter(F.size("cs") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.ck_a").alias("ck_a"), F.col("p.ck_b").alias("ck_b"),
            F.col("p.n_a").alias("n_a"), F.col("p.n_b").alias("n_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    qual = rep_pairs.select(
        "ck_a", "ck_b",
        (F.col("inter") / F.col("n_a")).alias("c_ab"),
        (F.col("inter") / F.col("n_b")).alias("c_ba"),
    ).filter((F.col("c_ab") >= threshold) | (F.col("c_ba") >= threshold))
    # Cross-cluster expansion: every member pair inherits the rep
    # pair's containments; the reported a/b orientation follows the
    # member ids (output contract: id_a < id_b).
    cross = (
        qual
        .join(members.select(F.col("ck").alias("ck_a"),
                             F.col("id").alias("ida")), "ck_a")
        .join(members.select(F.col("ck").alias("ck_b"),
                             F.col("id").alias("idb")), "ck_b")
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            F.when(F.col("ida") < F.col("idb"), F.col("c_ab"))
            .otherwise(F.col("c_ba")).alias("containment_a_in_b"),
            F.when(F.col("ida") < F.col("idb"), F.col("c_ba"))
            .otherwise(F.col("c_ab")).alias("containment_b_in_a"),
        )
    )
    if threshold > 1.0:
        # Identical sets score exactly 1.0 both ways — above-1
        # thresholds (degenerate: containment cannot exceed 1) admit
        # no intra-cluster pair.
        return cross
    # Intra-cluster pairs: identical sets, containment inter/n = 1.0
    # exactly in both engines' float division (n/n).
    m2 = members.select(F.col("ck"), F.col("id").alias("idb"))
    intra = (
        members.join(m2, "ck")
        .filter(F.col("id") < F.col("idb"))
        .select(
            F.col("id").alias("id_a"), F.col("idb").alias("id_b"),
            F.lit(1.0).alias("containment_a_in_b"),
            F.lit(1.0).alias("containment_b_in_a"),
        )
    )
    return cross.unionByName(intra)
