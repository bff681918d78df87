"""Exact shared-passage detection over gram-position tables.

Relational form of exact-substring dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"): two
documents share a verbatim passage of >= k + R - 1 normalized chars iff
their Rabin-Karp k-gram hash sequences match at R consecutive positions
on one alignment diagonal (pos_a - pos_b). Run detection is the
gaps-and-islands trick — pos minus row_number per (pair, diagonal) — so
the whole operator is windows + hash aggregates, no per-row iteration.

Scale composition: standalone, the pair stage joins every repeated gram
position (the honest cost of exact-match semantics — bounded by the
``max_occ`` stop-gram filter, but still the full gram table). At 100 TB
pass ``candidates=`` (e.g. `doc_winnow_overlap_pairs`' sketch-blocked
output): the gram table is then routed THROUGH the candidate pair list,
so the expensive gram-gram match runs only inside candidate pairs and
the shuffle scales with |candidates| x doc-gram-length instead of the
whole corpus' gram self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.functions import text as TX


def _rk_arrow_udf(k: int):
    """Arrow-batched Rabin-Karp k-gram hasher over ALREADY-NORMALIZED
    ([a-z0-9]*, hence ASCII) text — the vectorized twin of
    TX.rolling_kgram_hashes_of, bit-identical by construction: the same
    fold ``h = (h*B + code) % M`` runs k times over numpy int64 slices
    (codes < 128 and h < M ≈ 2^31, so h*31 + 127 < 2^36 — exact in
    int64, same arithmetic as the JVM fold). Nested def + in-body
    imports (cloudpickle by-value; no module-level deps on workers);
    annotations attached AFTER def — this repo's `from __future__
    import annotations` stringifies inline hints (see
    functions/vector.cosine_arrow)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    B, M = TX.ROLL_BASE, TX.ROLL_MOD

    def _rk(col):
        import numpy as np
        import pandas as pd

        out = []
        for s in col:
            if not s:  # None or empty -> empty array (HOF parity)
                out.append(np.empty(0, dtype=np.int64))
                continue
            try:
                raw = s.encode("ascii")
            except UnicodeEncodeError as e:  # precondition, not a bug
                raise ValueError(
                    "_rk_arrow_udf requires [a-z0-9]-normalized ASCII "
                    "input (rolling_hashes normalizes before calling); "
                    f"got non-ASCII text {s[:40]!r}..."
                ) from e
            codes = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            n = codes.shape[0]
            if n < k:  # short text hashes whole (HOF parity)
                h = 0
                for c in codes:
                    h = (h * B + int(c)) % M
                out.append(np.array([h], dtype=np.int64))
                continue
            m = n - k + 1
            h = np.zeros(m, dtype=np.int64)
            for j in range(k):
                h = (h * B + codes[j : j + m]) % M
            out.append(h)
        return pd.Series(out)

    _rk.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_rk, "array<long>")


def rolling_hashes(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """(doc_id, __h) — per-doc Rabin-Karp k-gram hash ARRAYS over
    alnum-normalized text. The shared upstream of both substring sketches:
    :func:`gram_positions` explodes it positionally, and the winnow
    fingerprint sketch takes per-window minima of the same arrays — a
    composition (sketch blocking -> exact verify) should evaluate this
    ONE pass, persist it, and derive both tables from the cache.

    ``impl='arrow'`` (default) computes the arrays in ONE Arrow-batched
    pandas_udf — the sanctioned escape hatch, swapped in after
    measuring (r12): the pure-HOF chain is O(n·k) INTERPRETED
    evaluation per doc (an inner `aggregate` of k element_at steps per
    position — higher-order functions never enter whole-stage codegen),
    ~1.3s per sf0.1 corpus pass vs 0.67s vectorized, and values are
    bit-identical (cross-impl pin in tests + the full oracle parity
    suite). ``impl='hof'`` keeps the JVM-side original: each chain
    stage projects a bound column (HOF re-eval trap — a nested
    expression re-evaluates the whole chain per element; measured 100x
    on this exact chain); it stays the reference implementation the
    DuckDB oracles mirror and needs no Python workers."""
    assert impl in ("arrow", "hof"), impl
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    if impl == "arrow":
        return docs.select(
            F.col(id_col).alias("doc_id"),
            _rk_arrow_udf(k)(norm).alias("__h"),
        )
    chars = docs.select(
        F.col(id_col).alias("doc_id"), TX.chars_of(norm).alias("__ch")
    )
    codes = chars.select(
        "doc_id", TX.char_codes_of(F.col("__ch")).alias("__codes")
    )
    return codes.select(
        "doc_id",
        TX.rolling_kgram_hashes_of(F.col("__codes"), k).alias("__h"),
    )


def gram_positions(
    docs: DataFrame | None = None,
    k: int = 8,
    min_occ: int = 2,
    max_occ: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashes: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, pos, gh) Rabin-Karp k-gram hash positions.

    Grams occurring fewer than ``min_occ`` times corpus-wide can never
    produce a pair and are dropped (the bulk of the table); grams above
    ``max_occ`` are boilerplate and would blow up the pair join's
    per-key buckets.

    ``hashes``: optional precomputed (ideally persisted)
    :func:`rolling_hashes` result — pass it when another consumer (e.g.
    the winnow sketch) derives from the same arrays, so the text is
    normalized and hashed once for the whole composition."""
    from pyspark.sql.window import Window

    h = (
        hashes
        if hashes is not None
        else rolling_hashes(docs, k, id_col, text_col)
    )
    # posexplode_OUTER + isNotNull: the plain variant makes the optimizer
    # infer a size()>0 filter that re-evaluates the rolling-hash chain
    # per row (doc_winnow_fingerprints precedent).
    g0 = h.select(
        "doc_id", F.posexplode_outer(F.col("__h")).alias("pos", "gh")
    ).filter(F.col("gh").isNotNull())
    occ = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    return (
        g0.withColumn("__occ", occ)
        .filter((F.col("__occ") >= min_occ) & (F.col("__occ") <= max_occ))
        .drop("__occ")
    )


def exact_passage_pairs(
    grams: DataFrame,
    min_run: int = 16,
    k: int = 8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs sharing >= ``min_run`` consecutive matching gram hashes.

    ``grams``: output of :func:`gram_positions` — persist it when it
    feeds both sides of the standalone self-join (the query wrapper in
    `plans/llmops.py` does; an unpersisted frame re-evaluates the whole
    Rabin-Karp chain per join side).

    ``candidates``: optional (id_a, id_b) pair list (id_a < id_b). When
    given, gram matching runs only INSIDE these pairs: grams join onto
    the candidate list by doc id first, so no gram self-join over the
    corpus ever happens — the 100 TB path behind sketch blocking.
    The pair list is de-duplicated defensively (``distinct()``): a
    repeated (id_a, id_b) row would duplicate every matched gram row,
    corrupting the gaps-and-islands row_number (tied ``pa`` values make
    the window nondeterministic) and inflating ``max_run_grams``. The
    distinct is a no-op shuffle-wise when the input is already unique
    (it collapses into the same hash aggregate the join partial uses).

    Returns (id_a, id_b, max_run_grams, max_match_chars).
    """
    from pyspark.sql.window import Window

    if candidates is None:
        l, r = grams.alias("l"), grams.alias("r")
        m = l.join(
            r,
            (F.col("l.gh") == F.col("r.gh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        ).select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.col("l.pos").alias("l_pos"),
            F.col("r.pos").alias("r_pos"),
        )
    else:
        # Route grams THROUGH the candidate list: fan candidate pairs out
        # by the left doc's grams (bounded by per-doc gram count), then
        # equi-join the right doc's grams on (id_b, gh) — the gram hash
        # stays IN the join key, so per-pair matching is a hash lookup,
        # never a per-pair gram cross product.
        cand = candidates.select("id_a", "id_b").distinct()
        l = grams.select(
            F.col("doc_id").alias("id_a"),
            F.col("pos").alias("l_pos"),
            "gh",
        )
        r = grams.select(
            F.col("doc_id").alias("id_b"),
            F.col("pos").alias("r_pos"),
            "gh",
        )
        m = cand.join(l, "id_a").join(r, ["id_b", "gh"]).select(
            "id_a", "id_b", "l_pos", "r_pos"
        )
    m = m.select(
        "id_a",
        "id_b",
        F.col("l_pos").alias("pa"),
        (F.col("l_pos") - F.col("r_pos")).alias("diag"),
    )
    island = F.col("pa") - F.row_number().over(
        Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    )
    runs = m.withColumn("island", island)
    r2 = runs.groupBy("id_a", "id_b", "diag", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        r2.groupBy("id_a", "id_b")
        .agg(F.max("run_len").alias("max_run_grams"))
        .filter(F.col("max_run_grams") >= min_run)
        .select(
            "id_a",
            "id_b",
            "max_run_grams",
            (F.col("max_run_grams") + F.lit(k - 1))
            .cast("long")
            .alias("max_match_chars"),
        )
    )


def _cdc_arrow_udf(k: int, divisor: int):
    """Arrow-batched CDC chunker over ALREADY-NORMALIZED text — the
    vectorized twin of the HOF chain in :func:`cdc_chunks`, chunk-for-
    chunk identical: same Rabin-Karp fold (exact in int64, see
    _rk_arrow_udf), boundary after 1-based gram position p at char
    offset p+k-1, spans kept iff end > start, Python slicing clamps the
    short-text out-of-range cut to the whole string exactly like
    Spark's substr. Nested def + in-body imports (cloudpickle
    by-value); annotations attached after def (__future__ stringifies
    inline hints)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    B, M = TX.ROLL_BASE, TX.ROLL_MOD

    def _chunks(col):
        import numpy as np
        import pandas as pd

        out = []
        for s in col:
            if not s:
                out.append([])
                continue
            try:
                raw = s.encode("ascii")
            except UnicodeEncodeError as e:  # precondition, not a bug
                raise ValueError(
                    "_cdc_arrow_udf requires [a-z0-9]-normalized ASCII "
                    "input (cdc_chunks normalizes before calling); "
                    f"got non-ASCII text {s[:40]!r}..."
                ) from e
            codes = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            n = codes.shape[0]
            if n < k:
                h = 0
                for c in codes:
                    h = (h * B + int(c)) % M
                cuts = [k] if h % divisor == 0 else []
            else:
                m = n - k + 1
                h = np.zeros(m, dtype=np.int64)
                for j in range(k):
                    h = (h * B + codes[j : j + m]) % M
                cuts = [
                    int(j) + k for j in np.flatnonzero(h % divisor == 0)
                ]
            out.append(
                [
                    s[a:b]
                    for a, b in zip([0] + cuts, cuts + [n])
                    if b > a
                ]
            )
        return pd.Series(out)

    _chunks.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_chunks, "array<string>")


def cdc_chunks(
    docs: DataFrame,
    k: int = 8,
    divisor: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """(doc_id, chunk) content-defined chunks of the alnum-normalized
    text — gear/FastCDC-style chunking re-expressed relationally: a
    chunk boundary falls after every position whose Rabin-Karp k-gram
    hash is ≡ 0 (mod ``divisor``), giving ~``divisor``-char average
    chunks whose boundaries move WITH the content. That is the property
    fixed-size chunking lacks and the reason storage dedup uses CDC
    (FastCDC, Xia et al., USENIX ATC'16): an insertion or deletion
    re-chunks only its own chunk, so two near-identical documents still
    share every chunk outside the edit — sub-document dedup by hash
    equality, no alignment pass.

    Entirely map-side (normalize → rolling hashes → boundary positions
    → offset pairs → substrings, each stage a bound column — the HOF
    re-eval trap), no shuffle until a consumer aggregates on the chunk
    fingerprint. ``explode_outer`` keeps zero-chunk documents as a null
    row so per-doc reports cover the whole corpus.

    Simplification vs production FastCDC: no min/max chunk clamps and a
    single divisor (no normalized two-gear levels) — boundary density
    is then exactly geometric with mean ``divisor``; clamps would be
    two extra filter conditions on the same positions array.

    ``impl='arrow'`` (default) computes the chunk arrays in one
    Arrow-batched pandas_udf (the r12 measured swap — the HOF chain is
    O(n·k) interpreted evaluation, 1.84s vs ~0.5s per sf0.1 corpus
    pass; chunk-for-chunk identical, cross-impl pin in tests);
    ``impl='hof'`` keeps the JVM-side relational original the DuckDB
    oracle mirrors."""
    assert impl in ("arrow", "hof"), impl
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    if impl == "arrow":
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(
                _cdc_arrow_udf(k, divisor)(norm)
            ).alias("chunk"),
        )
    b0 = docs.select(F.col(id_col).alias("doc_id"), norm.alias("__norm"))
    b1 = b0.select("doc_id", "__norm", TX.chars_of(F.col("__norm")).alias("__ch"))
    b2 = b1.select(
        "doc_id", "__norm", TX.char_codes_of(F.col("__ch")).alias("__codes")
    )
    b3 = b2.select(
        "doc_id",
        "__norm",
        TX.rolling_kgram_hashes_of(F.col("__codes"), k).alias("__h"),
    )
    # boundary positions in the hash array (1-based); Spark's sequence()
    # DESCENDS when stop < start, so the empty-array case needs a guard
    # (DuckDB's end-exclusive range() just yields [])
    pos_seq = F.when(
        F.size(F.col("__h")) > 0,
        F.sequence(F.lit(1), F.size(F.col("__h"))),
    ).otherwise(F.array().cast("array<int>"))
    b4 = b3.select(
        "doc_id",
        "__norm",
        F.filter(
            pos_seq,
            lambda i: F.element_at(F.col("__h"), i) % divisor == 0,
        ).alias("__bpos"),
    )
    # text-offset cut after each boundary gram's last char; chunk spans
    # are [start+1, end] over consecutive cuts, with 0 and len(norm) as
    # the outer sentinels
    b5 = b4.select(
        "doc_id",
        "__norm",
        F.transform(F.col("__bpos"), lambda p: p + F.lit(k - 1)).alias(
            "__cuts"
        ),
    )
    b6 = b5.select(
        "doc_id",
        "__norm",
        F.concat(F.array(F.lit(0)), F.col("__cuts")).alias("__starts"),
        F.concat(
            F.col("__cuts"), F.array(F.length(F.col("__norm")))
        ).alias("__ends"),
    )
    # index-based span materialization (a span is kept iff end > start —
    # drops the empty tail when the last cut lands on the text end, and
    # the short-text fallback's out-of-range cut degenerates to the
    # clamped whole-string chunk identically in both engines)
    b7 = b6.select(
        "doc_id",
        "__norm",
        "__starts",
        "__ends",
        F.filter(
            F.sequence(F.lit(1), F.size(F.col("__starts"))),
            lambda i: F.element_at(F.col("__ends"), i)
            > F.element_at(F.col("__starts"), i),
        ).alias("__idx"),
    )
    b8 = b7.select(
        "doc_id",
        F.transform(
            F.col("__idx"),
            lambda i: F.col("__norm").substr(
                F.element_at(F.col("__starts"), i) + 1,
                F.element_at(F.col("__ends"), i)
                - F.element_at(F.col("__starts"), i),
            ),
        ).alias("__chunks"),
    )
    return b8.select(
        "doc_id", F.explode_outer(F.col("__chunks")).alias("chunk")
    )


def _winnow_arrow_udf(w: int):
    """Arrow-batched winnow sketch over the ``__h`` hash arrays — the
    vectorized twin of TX.winnow_fingerprints_of: per-w-window minima
    (windows = max(m-w+1, 1), the short-array window clamping exactly
    as F.slice clamps), distinct preserving first occurrence
    (pd.unique) — same SET per doc, which is all the exploded
    fingerprint relation exposes. Nested def + in-body imports;
    annotations attached after def."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fps(col):
        import numpy as np
        import pandas as pd

        out = []
        for h in col:
            if h is None or len(h) == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            a = np.asarray(h, dtype=np.int64)
            m = a.shape[0]
            if m <= w:
                wins = a.min(keepdims=True)
            else:
                mm = m - w + 1
                wins = a[:mm].copy()
                for j in range(1, w):
                    np.minimum(wins, a[j : j + mm], out=wins)
            out.append(pd.unique(wins))
        return pd.Series(out)

    _fps.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_fps, "array<long>")


def winnow_fingerprint_table(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashes: DataFrame | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """(doc_id, fingerprint) winnowing sketch rows (MOSS local-similarity
    sketch): distinct per-w-window minima of the Rabin-Karp k-gram hash
    arrays. Any shared substring of >= k+w-1 normalized chars yields a
    shared fingerprint — the recall guarantee sketch blocking rests on.
    ``hashes``: optional precomputed :func:`rolling_hashes` result for
    shared-pass compositions. ``impl='arrow'`` (default) takes the
    window minima in one Arrow-batched pandas_udf (r12 measured swap —
    the HOF form is O(n·w) interpreted; set-identical rows, cross-impl
    pin in tests); ``impl='hof'`` keeps the JVM-side original the
    DuckDB oracles mirror (map-only; layered projections — HOF re-eval
    trap, see rolling_hashes)."""
    assert impl in ("arrow", "hof"), impl
    h = (
        hashes
        if hashes is not None
        else rolling_hashes(docs, k, id_col, text_col, impl=impl)
    )
    if impl == "arrow":
        fps = h.select(
            "doc_id", _winnow_arrow_udf(w)(F.col("__h")).alias("__fps")
        )
        return fps.select(
            "doc_id",
            F.explode_outer(F.col("__fps")).alias("fingerprint"),
        ).filter(F.col("fingerprint").isNotNull())
    fps = h.select(
        "doc_id",
        TX.winnow_fingerprints_of(F.col("__h"), w).alias("__fps"),
    )
    # explode_OUTER + isNotNull: plain explode infers a size()>0 filter
    # that sinks below the projections and re-evaluates the whole chain
    # per row (>100x measured; doc_winnow_fingerprints precedent).
    return fps.select(
        "doc_id", F.explode_outer(F.col("__fps")).alias("fingerprint")
    ).filter(F.col("fingerprint").isNotNull())
