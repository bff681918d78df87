"""Deduplication operators, from exact to fuzzy (training-data pipeline core).

Every variant is built to avoid the quadratic trap: candidate pairs come
from equi-joins on blocking keys (hash, band, bucket), never from a full
cross join. At 100 TB the only shuffles are on those keys.

Strategy ladder:
  exact          — hash-groupBy on a content fingerprint (one shuffle)
  minhash LSH    — shingle → minhash signature → band → bucket equi-join
  simhash        — near-dup via small-Hamming-distance signatures
  n-gram Jaccard — verify stage on blocked candidates
  embedding      — cosine near-dup on LSH/IVF buckets (see similarity.py)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_weather_data_pipeline_spark.functions import text as TX


def pin_once(c):
    """Value-identical nondeterministic no-op: ``c + int(rand(0) * 0)``.

    Aliasing an expensive expression behind this marks the enclosing
    PROJECTION nondeterministic, which blocks PushDownPredicates from
    substituting any downstream predicate through it — the expression is
    guaranteed to evaluate exactly once per row, with filters staying
    above the projection as attribute references.

    Why the projection and not the filter: a nondeterministic term in the
    FILTER only stops join/aggregate pushdown; Spark 4.1 still pushes a
    nondeterministic filter through deterministic projects, re-inlining
    the aliased expression into the predicate (observed: array_intersect
    evaluated 2x per candidate pair inside the pushed filter, plus once in
    the surviving project). Pinned by
    tests/test_plans.py::test_jaccard_pushdown_barrier_holds so an
    optimizer change that folds rand*0 fails loudly.
    """
    return c + (F.rand(seed=0) * F.lit(0)).cast("int")


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "md5",
) -> DataFrame:
    """Exact dedup on normalized-content fingerprint; the survivor is the
    lowest id (deterministic). Generalizes the reference's keyed dedup D1
    (src/transform.py:85-92) to content-hash keys.

    Plan: project fingerprint → hash aggregate (partial+final) → semi-join
    back. The semi-join is on (fingerprint, id) so it stays an equi-join.

    ``hash_family``: "md5" (oracle-reproducible default) or "xxhash64"
    (production fast path: cheaper per byte, 8-byte shuffle keys). The
    surviving ROWS are identical either way — only the internal key
    representation changes (see functions/text.py fingerprint).
    """
    with_fp = df.withColumn(
        "__fp", TX.fingerprint(F.col(text_col), hash_family)
    )
    survivors = with_fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return (
        with_fp.join(survivors, ["__fp", id_col], "left_semi").drop("__fp")
    )

def dedup_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "md5",
) -> DataFrame:
    """Dedup a NEW batch against an already-ingested corpus, then within
    itself — the shape every periodic ingest runs: yesterday's 100 TB is
    already clean; today's slice must not re-admit anything seen before,
    nor its own internal duplicates.

    Two stages, both linear:
      1. within-batch exact dedup (hash aggregate on the fingerprint,
         min-id survivor) — the batch never self-joins;
      2. left_anti against the corpus's fingerprint projection — a single
         equi-join on the 32-char hash. At scale the corpus side is a
         narrow fingerprint store (hash + nothing else, column-pruned from
         the full table or maintained as its own table); the join shuffles
         16-byte keys, never documents. Idempotent: re-running over an
         already-merged corpus yields zero survivors.

    Returns the surviving ``(id, fingerprint)`` pairs; join back on the
    id to recover full rows.
    """
    fp = TX.fingerprint(F.col(text_col), hash_family=hash_family)
    batch = new_df.select(F.col(id_col), fp.alias("fingerprint"))
    survivors = batch.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    corpus_fp = corpus_df.select(fp.alias("fingerprint"))
    return survivors.join(corpus_fp, "fingerprint", "left_anti").select(
        id_col, "fingerprint"
    )



def duplicate_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "md5",
) -> DataFrame:
    """Exact-duplicate cluster summary: fingerprint → size + canonical id."""
    return (
        df.withColumn("fingerprint", TX.fingerprint(F.col(text_col), hash_family))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 4,
    shingle_k: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Per-document MinHash signature as columns h0..h{n-1}.

    Plan shape matters here: the naive nested-HOF form
    (``array_min(transform(shingles, md5))`` × num_hashes) recomputes the
    shingle array per hash function and falls out of codegen — 10×+ slower.
    Instead: explode shingles once → project the md5s → partial+final
    min aggregate. Everything stays in whole-stage codegen and the map-side
    partial min shrinks the shuffle to one row per doc.

    Hash family: ONE md5 per group of four functions, split into 32-bit
    words — h_i(s) = int(substr(md5('i//4:' || s), 8*(i%4)+1, 8), 16).
    The md5 dominated the signature stage's cost, so many-words-from-one-
    strong-hash cuts it 4x; the separate md5/substr projection layers stay
    uncollapsed (4 references to a non-cheap expr block CollapseProject),
    so each md5 evaluates once. Words aggregate as LONGs, not hex strings:
    min(long) runs in HashAggregate (fixed-width buffer) while min(string)
    falls back to SortAggregate — a per-map-partition SORT of the exploded
    shingle rows, O(n log n) in corpus size, vs the O(1)-per-row conv()
    parse. At sf0.1 the two are within noise (1.2 vs 1.5s — partitions are
    tiny, sorts are cheap); the hash-agg form is kept because it is the
    one that scales, and its partial rows shuffle as 8 bytes, not 8-char
    strings. Fixed-width lowercase hex is order-isomorphic to its numeric
    value, so signatures are unchanged modulo representation; the SQL
    oracle mirrors via ('0x'||substr)::BIGINT.
    """
    # Project the token array first, shingle from the bound column — the
    # single-expression form re-tokenizes per shingle (see word_shingles_of).
    toked = df.select(F.col(id_col), TX.tokens(F.col(text_col)).alias("__t"))
    shingles = TX.word_shingles_of(F.col("__t"), shingle_k)
    exploded = toked.select(F.col(id_col), F.explode_outer(shingles).alias("__s"))
    if hash_family == "xxhash64":
        # Production fast path: one 64-bit non-crypto hash per function
        # (seeded by the function index), no hex parsing. Same plan shape
        # — project → partial/final min(long) HashAggregate — but the
        # per-shingle hash cost drops ~10x vs md5. Signatures are NOT
        # equal to the md5 family's (different hash values, same MinHash
        # semantics), so the DuckDB oracle keeps md5.
        hashed = exploded.select(
            id_col,
            *[
                F.xxhash64(F.lit(i), F.col("__s")).alias(f"__h{i}")
                for i in range(num_hashes)
            ],
        )
        return hashed.groupBy(id_col).agg(
            *[F.min(F.col(f"__h{i}")).alias(f"h{i}") for i in range(num_hashes)]
        )
    assert hash_family == "md5", hash_family
    n_seeds = (num_hashes + 3) // 4
    seeded = exploded.select(
        id_col,
        *[
            F.md5(F.concat(F.lit(f"{g}:"), F.col("__s"))).alias(f"__m{g}")
            for g in range(n_seeds)
        ],
    )
    return seeded.groupBy(id_col).agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.col(f"__m{i // 4}"), 8 * (i % 4) + 1, 8),
                    16,
                    10,
                ).cast("long")
            ).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_band_table(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, band_idx, band_val) rows from a signature table (h0..h{n-1}).

    The persistable half of LSH: a corpus store can keep this table on
    disk keyed by (band_idx, band_val) and probe it with each new
    batch's bands — candidate generation then scales with the BATCH, not
    the corpus (see streaming/corpus.py merge_batch_neardup_into_corpus).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    hash_family: str = "md5",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    rows_per_band = num_hashes / bands; two documents become a candidate
    pair when any band of their signatures matches exactly. Plan:
    map-side signature → explode bands → self equi-join on (band_idx,
    band_value) → distinct pairs. The join key is the band hash, so the
    shuffle is uniform unless the corpus has giant exact-dup clusters —
    those should be removed by dedup_exact first.

    ``signatures``: pass a precomputed (ideally persisted)
    :func:`minhash_signatures` result with h0..h{num_hashes-1} columns to
    amortize the signature scan when a pipeline consumes both the
    signatures and the candidate pairs (e.g. banding + estimate stages).
    """
    assert num_hashes % bands == 0
    sig = (
        signatures
        if signatures is not None
        else minhash_signatures(
            df, text_col, id_col, num_hashes, shingle_k, hash_family
        )
    )
    banded = minhash_band_table(sig, id_col, num_hashes, bands)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Per-document SimHash value — map-only; join on equal simhash (or on
    rotated prefixes for Hamming-distance search) downstream."""
    return df.select(
        F.col(id_col), TX.simhash_bits(F.col(text_col), bits).alias("simhash")
    )


def simhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    bands: int = 2,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup candidate pairs via band blocking + Hamming verify.

    Pigeonhole: two signatures within Hamming distance < ``bands`` collide
    on at least one band, so the band equi-join finds all such pairs with
    NO cross join — the same blocked self-join shape as MinHash-LSH, with
    candidate volume bounded by band-bucket collisions (2^(bits/bands)
    buckets per band). Survivors are verified exactly with
    bit_count(xor) <= max_hamming inside codegen.
    """
    rb = bits // bands
    mask = (1 << rb) - 1
    sig = simhash_table(df, text_col, id_col, bits)
    banded = sig.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        (
                            F.shiftright(F.col("simhash"), rb * b)
                            .bitwiseAND(F.lit(mask))
                        ).alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_idx", "band.band_val")
    left = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("__sa"),
        "band_idx",
        "band_val",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("__sb"),
        "band_idx",
        "band_val",
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
    )
    hamming = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def jaccard_pairs(
    df: DataFrame,
    blocking: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Verified near-dup pairs: equi-join on blocking keys, then exact
    token-set Jaccard >= threshold.

    The blocking key bounds the pair count (choose keys so blocks are
    O(100s) of docs); the Jaccard verify runs as array expressions inside
    codegen. This is the verify stage LSH candidates feed into at scale.
    """
    proj = df.select(
        F.col(id_col),
        *[F.col(c) for c in blocking],
        F.array_distinct(TX.tokens(F.col(text_col))).alias("__toks"),
    ).withColumn("__n", F.size(F.col("__toks")))
    left, right = proj.alias("l"), proj.alias("r")
    cond = (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    for c in blocking:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    inter = pin_once(
        F.size(F.array_intersect(F.col("l.__toks"), F.col("r.__toks")))
    )
    # Two chained projects, intersect isolated in the first: array_intersect
    # is referenced twice downstream (numerator + union arithmetic), so
    # CollapseProject keeps the layers separate and the expensive intersect
    # runs ONCE per pair. Inlining it under a when()/filter re-evaluates it
    # up to 4x (CSE skips conditional branches) — measured 2.5x slower.
    # |A∪B| = |A|+|B|-|A∩B| avoids materializing the union array.
    # pin_once makes this projection a pushdown barrier so the threshold
    # filter below can never substitute the intersect into a predicate.
    paired = left.join(right, cond).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        inter.alias("__inter"),
        (F.col("l.__n") + F.col("r.__n")).alias("__tot"),
    )
    # Exact int/int division — bit-identical across engines, no rounding.
    jac = F.when(
        F.col("__tot") > 0,
        F.col("__inter").cast("double") / (F.col("__tot") - F.col("__inter")),
    ).otherwise(F.lit(0.0))
    return paired.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def token_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, __toks, __n) distinct-token sets — the Jaccard-verify side
    input, factored out so it can be computed once per corpus and
    shared across verify stages (plans/artifacts.py). Row-local and
    deterministic: token_sets(S) for any id-subset S with unchanged
    text equals this table filtered to S."""
    return df.select(
        F.col(id_col),
        F.array_distinct(TX.tokens(F.col(text_col))).alias("__toks"),
    ).withColumn("__n", F.size(F.col("__toks")))


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    toksets: DataFrame | None = None,
) -> DataFrame:
    """Verify candidate pairs (id_a, id_b) with exact token-set Jaccard.

    This is the scale-correct verify stage: the candidate set comes from
    LSH banding (``minhash_lsh_pairs``), whose size is bounded by signature
    collisions — NOT from attribute blocking, whose cells grow linearly
    with the corpus and make the pair count quadratic. Two equi-joins pull
    each side's token set onto the pair, then the same codegen'd
    intersect-once arithmetic as ``jaccard_pairs`` scores it.

    ``toksets``: optional precomputed (ideally persisted)
    :func:`token_sets` result covering at least every id in ``pairs`` —
    pass it when a pipeline verifies several candidate sets over one
    corpus (the equi-joins pick exactly the candidate ids, so a
    superset table is safe).
    """
    toks = (
        toksets
        if toksets is not None
        else token_sets(df, text_col, id_col)
    )
    a = toks.select(
        F.col(id_col).alias("id_a"),
        F.col("__toks").alias("__ta"),
        F.col("__n").alias("__na"),
    )
    b = toks.select(
        F.col(id_col).alias("id_b"),
        F.col("__toks").alias("__tb"),
        F.col("__n").alias("__nb"),
    )
    inter = pin_once(F.size(F.array_intersect(F.col("__ta"), F.col("__tb"))))
    # Same two-layer projection as jaccard_pairs: isolate the intersect
    # behind the pin_once barrier so it evaluates once per pair (see the
    # measured notes there).
    paired = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("__inter"),
            (F.col("__na") + F.col("__nb")).alias("__tot"),
        )
    )
    jac = F.when(
        F.col("__tot") > 0,
        F.col("__inter").cast("double") / (F.col("__tot") - F.col("__inter")),
    ).otherwise(F.lit(0.0))
    return paired.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def dedup_keyed_first(
    df: DataFrame, keys: Sequence[str], order: Sequence[str]
) -> DataFrame:
    """Generic deterministic keep-first dedup (D1 generalized): row_number
    over (keys, order) — one shuffle, winner independent of partitioning."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(c) for c in order]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
