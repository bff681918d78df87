"""LLM training-data pipeline queries: dedup, similarity, text analysis,
multimodal plumbing — the beyond-reference operator set (BASELINE.json
north star), each with a DuckDB oracle where SQL can express it.

Hash functions are md5-based so both engines reproduce them bit-for-bit;
at production scale the same structures run on xxhash64 (also built-in on
both) for speed. Shingle/signature expressions are generated from one
Python spec so the Spark plan and the SQL oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.functions import text as TX
from etl_weather_data_pipeline_spark.functions import vector as VX
from etl_weather_data_pipeline_spark.operators.dedup import (
    dedup_exact,
    duplicate_groups,
    minhash_lsh_pairs,
    pin_once,
    simhash_table,
)
from etl_weather_data_pipeline_spark.plans import artifacts as AR
from etl_weather_data_pipeline_spark.plans.catalog import (
    Query,
    davg,
    dround,
    load,
    o_davg,
    o_dround,
)

QUERIES: list[Query] = []


def q(name, description, oracle=None, tags=()):
    def deco(fn):
        QUERIES.append(Query(name, description, fn, oracle, tuple(tags)))
        return fn

    return deco


# --- shared oracle fragments (mirror functions/text.py exactly) -------------

# \s+ split, exactly like TX.tokens (string_split on ' ' would diverge the
# moment a document contains tabs/newlines/double spaces).
O_TOKS = r"regexp_split_to_array(trim(text), '\s+')"
# Mirrors TX.word_shingles incl. the 0<n<k fallback (whole doc as one
# shingle) — the plain range(1, len-1) form emits nothing for <3 tokens.
O_SHINGLES = (
    f"CASE WHEN len({O_TOKS}) >= 3 THEN "
    f"list_transform(range(1, len({O_TOKS}) - 1), "
    f"i -> {O_TOKS}[i] || ' ' || {O_TOKS}[i+1] || ' ' || {O_TOKS}[i+2]) "
    f"WHEN len({O_TOKS}) > 0 THEN [array_to_string({O_TOKS}, ' ')] "
    f"ELSE CAST([] AS VARCHAR[]) END"
)
O_FINGERPRINT = "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"


def o_minhash(i: int) -> str:
    """Oracle mirror of minhash_signatures component i: min over the i%4-th
    32-bit word of md5('i//4:' || shingle), as BIGINT (the Spark side
    aggregates LONG words so min() stays in HashAggregate)."""
    g, off = i // 4, 8 * (i % 4) + 1
    return (
        f"list_min(list_transform({O_SHINGLES}, "
        f"s -> ('0x' || substr(md5('{g}:' || s), {off}, 8))::BIGINT))"
    )


def o_simhash(bits: int = 16) -> str:
    """Oracle mirror of TX.simhash_bits: per-bit ±1 votes from md5 hex chars."""
    terms = []
    for bit in range(bits):
        hex_pos, bit_in_char = bit // 4, 3 - (bit % 4)
        vote = (
            f"list_sum(list_transform({O_TOKS}, t -> CASE WHEN "
            f"((strpos('0123456789abcdef', substr(md5(t), {hex_pos + 1}, 1)) - 1)"
            f" >> {bit_in_char}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << (bits - 1 - bit)} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@q(
    "doc_dedup_exact",
    "Exact dedup on content fingerprint (md5 of normalized text); survivor "
    "= lowest doc_id. One hash-agg shuffle + semi-join back.",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    JOIN (SELECT {O_FINGERPRINT} AS fp, MIN(doc_id) AS doc_id
          FROM documents GROUP BY 1) s
      ON d.doc_id = s.doc_id
    """,
)
def doc_dedup_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return dedup_exact(docs).select("doc_id", "lang", "source", "n_chars")


@q(
    "doc_duplicate_groups",
    "Exact-duplicate cluster summary: fingerprint -> cluster size + "
    "canonical id (the groupBy half of exact dedup).",
    oracle=f"""
    SELECT {O_FINGERPRINT} AS fingerprint,
           COUNT(*) AS n_dups, MIN(doc_id) AS canonical_id
    FROM documents GROUP BY 1
    """,
)
def doc_duplicate_groups(spark, sf_dir):
    return duplicate_groups(load(spark, sf_dir, "documents"))


@q(
    "doc_minhash_signatures",
    "MinHash signatures (4 hash fns over 3-word shingles) as columns. "
    "Map-only projection; the signature stage of MinHash-LSH dedup.",
    oracle=f"""
    SELECT doc_id,
           {o_minhash(0)} AS mh0, {o_minhash(1)} AS mh1,
           {o_minhash(2)} AS mh2, {o_minhash(3)} AS mh3
    FROM documents
    """,
)
def doc_minhash_signatures(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import minhash_signatures

    docs = load(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=4, shingle_k=3)
    return sig.select(
        "doc_id", *[F.col(f"h{i}").alias(f"mh{i}") for i in range(4)]
    )


def _o_lsh_ctes(
    num_hashes: int = 8,
    bands: int = 4,
    table: str = "documents",
    prefix: str = "",
) -> str:
    """CTE chain ``sig, bands, cand`` ending in the distinct LSH candidate
    pairs — composable (``WITH {_o_lsh_ctes()} SELECT ... FROM cand``) so
    the verify-stage oracle can consume the same candidates. ``table`` lets
    the chain run over a CTE (any relation with doc_id + text);
    ``prefix`` renames the chain (``p1sig, p1bands, p1cand``) so two
    relations' band tables can coexist in one WITH (cross-table band
    probes, e.g. the near-dup merge-state oracle)."""
    rows = num_hashes // bands
    sig_cols = ", ".join(f"{o_minhash(i)} AS h{i}" for i in range(num_hashes))
    return f"""
    {prefix}sig AS (SELECT doc_id, {sig_cols} FROM {table}),
    {prefix}bands AS (
      SELECT doc_id, b.band_idx, b.band_val
      FROM {prefix}sig, unnest([{', '.join(
          '{' + f"'band_idx': {b}, 'band_val': " + " || '|' || ".join(
              f'h{b * rows + r}' for r in range(rows)) + '}'
          for b in range(bands))}]) AS t(b)
    ),
    {prefix}cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM {prefix}bands l JOIN {prefix}bands r
        ON l.band_idx = r.band_idx AND l.band_val = r.band_val
           AND l.doc_id < r.doc_id
    )"""


@q(
    "doc_minhash_lsh_pairs",
    "MinHash+LSH candidate pairs (8 hashes, 4 bands x 2 rows): signature -> "
    "explode bands -> self equi-join on band value -> distinct pairs. The "
    "shuffle key is the band hash, never a cross join.",
    oracle=f"WITH {_o_lsh_ctes(8, 4)} SELECT id_a, id_b FROM cand",
)
def doc_minhash_lsh_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
    )


@q(
    "doc_minhash_lsh_pairs_xxh",
    "doc_minhash_lsh_pairs on the xxhash64 production hash family — same "
    "plan shape (explode once -> partial/final min HashAggregate -> band "
    "equi-join), ~10x cheaper per-shingle hashing, no hex parsing. "
    "Signature VALUES are engine-specific (DuckDB has no xxhash64), so "
    "the pair list itself cannot hash-match an oracle — instead this is "
    "a PROPERTY oracle on the family-independent invariant: two docs "
    "with an identical token sequence have identical shingle sets, "
    "hence identical MinHash signatures under ANY hash family, hence "
    "collide in every band. The query emits the exact-duplicate pair "
    "count (cross-checkable in SQL via md5 of the joined token "
    "sequence) plus the boolean that every such pair appears in the "
    "xxh candidate set; the md5 variant remains the correctness "
    "witness for the shared plan structure, bench.py records the "
    "speed delta.",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string({O_TOKS}, ' ')) AS fp
      FROM documents),
    dup_pairs AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b
      FROM fp l JOIN fp r ON l.fp = r.fp AND l.doc_id < r.doc_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_dup_pairs,
           TRUE AS exact_dups_covered
    FROM dup_pairs
    """,
)
def doc_minhash_lsh_pairs_xxh(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4, hash_family="xxhash64",
        signatures=AR.shared_minhash_sigs(
            spark, sf_dir, hash_family="xxhash64"
        ),
    )
    # Token-sequence fingerprint (NOT the usual normalized-text one:
    # shingles are case-sensitive raw tokens, so the dup definition must
    # match the shingle space — identical token array <=> identical
    # space-joined token string).
    fp = docs.select(
        "doc_id",
        F.md5(F.array_join(TX.tokens(F.col("text")), " ")).alias("__fp"),
    )
    l = fp.select(F.col("doc_id").alias("id_a"), F.col("__fp"))
    r = fp.select(F.col("doc_id").alias("id_b"), F.col("__fp"))
    dup_pairs = l.join(r, "__fp").filter(
        F.col("id_a") < F.col("id_b")
    ).select("id_a", "id_b")
    missing = dup_pairs.join(pairs, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("__n_missing")
    )
    return (
        dup_pairs.agg(F.count(F.lit(1)).alias("n_exact_dup_pairs"))
        .crossJoin(F.broadcast(missing))
        .select(
            "n_exact_dup_pairs",
            (F.col("__n_missing") == 0).alias("exact_dups_covered"),
        )
    )


@q(
    "doc_simhash",
    "SimHash (16-bit, md5 bit-votes over tokens) per document — map-only; "
    "equal values (or small Hamming distance via rotations) = near-dups.",
    oracle=f"SELECT doc_id, {o_simhash(16)} AS simhash FROM documents",
)
def doc_simhash(spark, sf_dir):
    return simhash_table(load(spark, sf_dir, "documents"), bits=16)


@q(
    "doc_simhash_pairs",
    "SimHash near-dup pairs: 2 bands x 8 bits block the self-join "
    "(pigeonhole finds every pair within Hamming < 2 bands; 256 buckets "
    "per band bound candidate volume), bit_count(xor) <= 3 verifies "
    "exactly. Same blocked shape as MinHash-LSH, integer ops end to end.",
    oracle=f"""
    WITH s AS (SELECT doc_id, {o_simhash(16)} AS simhash FROM documents),
    b AS (
      SELECT doc_id, simhash, t.b AS band_idx,
             (simhash >> (8 * t.b)) & 255 AS band_val
      FROM s, unnest([0, 1]) AS t(b)),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
             l.simhash AS sa, r.simhash AS sb
      FROM b l JOIN b r
        ON l.band_idx = r.band_idx AND l.band_val = r.band_val
           AND l.doc_id < r.doc_id)
    SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
)
def doc_simhash_pairs(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import (
        simhash_band_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    return simhash_band_pairs(docs, bits=16, bands=2, max_hamming=3)


@q(
    "doc_jaccard_pairs",
    "Verified near-dup pairs: MinHash-LSH candidates -> exact token-set "
    "Jaccard >= 0.5 verify. The candidate count is bounded by signature "
    "collisions, so the pair stage stays sub-quadratic at any corpus size "
    "(attribute blocking like (lang, len//100) has cells that grow linearly "
    "with the corpus -> quadratic pairs; kept only as a library form, "
    "operators/dedup.py jaccard_pairs).",
    oracle=f"""
    WITH {_o_lsh_ctes(8, 4)},
    t AS (SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM documents)
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
             / (len(l.toks) + len(r.toks)
                - len(list_intersect(l.toks, r.toks))) AS jaccard
    FROM cand c JOIN t l ON l.doc_id = c.id_a
                JOIN t r ON r.doc_id = c.id_b
    WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
             / (len(l.toks) + len(r.toks)
                - len(list_intersect(l.toks, r.toks))) >= 0.5
    """,
)
def doc_jaccard_pairs(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
    )
    return jaccard_verify(
        docs, cand, threshold=0.5,
        toksets=AR.shared_token_sets(spark, sf_dir),
    )


@q(
    "neardup_threshold_sweep",
    "Jaccard-threshold calibration sweep — the report a corpus team "
    "reads BEFORE committing to a dedup threshold (every near-dup "
    "query here hardcodes 0.5; this shows what 0.5 vs 0.9 would cost): "
    "ONE LSH candidate pass + ONE exact-Jaccard scoring pass, then "
    "per-threshold pair counts and docs-dropped-under-min-id-policy "
    "for thresholds 0.5..0.9. Scale shape: the sweep adds NOTHING to "
    "the dedup run's cost profile — candidates are scored once "
    "(threshold=0 verify) and the 5-row threshold table broadcasts "
    "into a theta-join over the (tiny, collision-bounded) scored "
    "pairs; no per-threshold re-scan of the corpus. Counting id_b "
    "distinct per threshold mirrors the drop-the-larger-id survivor "
    "policy, so n_docs_dropped is exactly how many docs each "
    "threshold would remove.",
    oracle=f"""
    WITH {_o_lsh_ctes(8, 4)},
    tk AS (SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM documents),
    sc AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
               / (len(l.toks) + len(r.toks)
                  - len(list_intersect(l.toks, r.toks))) AS j
      FROM cand c JOIN tk l ON l.doc_id = c.id_a
                  JOIN tk r ON r.doc_id = c.id_b),
    th AS (SELECT CAST(x AS DOUBLE) AS threshold
           FROM (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)) v(x))
    SELECT th.threshold,
           CAST(COUNT(sc.id_a) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT sc.id_b) AS BIGINT) AS n_docs_dropped
    FROM th LEFT JOIN sc ON sc.j >= th.threshold
    GROUP BY th.threshold
    """,
)
def neardup_threshold_sweep(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
    )
    # threshold=0.0 keeps every candidate with its exact score — the
    # sweep then re-reads the scored pairs, never the corpus
    scored = jaccard_verify(
        docs, cand, threshold=0.0,
        toksets=AR.shared_token_sets(spark, sf_dir),
    )
    th = spark.createDataFrame(
        [(0.5,), (0.6,), (0.7,), (0.8,), (0.9,)], "threshold double"
    )
    joined = F.broadcast(th).join(
        scored, scored["jaccard"] >= th["threshold"], "left"
    )
    return joined.groupBy("threshold").agg(
        F.count("id_a").cast("long").alias("n_pairs"),
        F.countDistinct("id_b").cast("long").alias("n_docs_dropped"),
    )


@q(
    "doc_neardup_clusters",
    "Near-dup CLUSTERS, not just pairs: LSH candidates -> Jaccard >= 0.5 "
    "verify -> connected components (iterative min-label propagation; "
    "a~b, b~c groups a,b,c even though a~c was never scored). cluster_id "
    "= min doc_id in the component. The Spark side is the iterative "
    "operator (equi-join + min-agg per round, bounded by component "
    "diameter); the oracle is the same closure via recursive SQL.",
    oracle=f"""
    WITH RECURSIVE
    {_o_lsh_ctes(8, 4)},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM documents),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach AS (SELECT a, b FROM e
              UNION
              SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a)
    SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
)
def doc_neardup_clusters(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
    )
    pairs = jaccard_verify(
        docs, cand, threshold=0.5,
        toksets=AR.shared_token_sets(spark, sf_dir),
    ).select("id_a", "id_b")
    return connected_components(pairs)


@q(
    "neardup_cluster_keep",
    "Cluster-representative RETENTION: for each near-dup cluster keep "
    "the most information-rich member (max distinct-token count, ties "
    "to the lower doc_id) instead of the min-id convention every dedup "
    "query here uses — the policy real curation runs want, because the "
    "canonical-by-id doc can be the truncated or boilerplate-padded "
    "variant while a later crawl carries the full text. Pipeline: LSH "
    "candidates -> Jaccard >= 0.5 verify -> connected components -> "
    "score members map-side -> ONE window pass per cluster (row_number "
    "+ count over the same partition spec share a single shuffle). "
    "Scale shape: the window partitions by cluster_id — cluster count "
    "shrinks with dedup progress and near-dup clusters are small, so "
    "no skewed giant partition; the scoring join is doc_id-equi on the "
    "components output (rows = clustered docs only, not the corpus).",
    oracle=f"""
    WITH RECURSIVE
    {_o_lsh_ctes(8, 4)},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM documents),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach AS (SELECT a, b FROM e
              UNION
              SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
    comp AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
             FROM reach GROUP BY a),
    scored AS (
      SELECT c.cluster_id, c.doc_id,
             CAST(len(t.toks) AS BIGINT) AS n_uniq_toks,
             row_number() OVER (
               PARTITION BY c.cluster_id
               ORDER BY len(t.toks) DESC, c.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
      FROM comp c JOIN toksets t ON t.doc_id = c.doc_id)
    SELECT cluster_id, n_members, doc_id AS keep_doc_id,
           n_uniq_toks AS keep_n_uniq_toks,
           n_members - 1 AS n_dropped
    FROM scored WHERE rn = 1
    """,
)
def neardup_cluster_keep(spark, sf_dir):
    from pyspark.sql import Window

    from etl_weather_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
    )
    pairs = jaccard_verify(
        docs, cand, threshold=0.5,
        toksets=AR.shared_token_sets(spark, sf_dir),
    ).select("id_a", "id_b")
    comps = connected_components(pairs)
    scored = comps.join(
        docs.select(
            "doc_id",
            F.size(F.array_distinct(TX.tokens(F.col("text"))))
            .cast("long")
            .alias("__nu"),
        ),
        "doc_id",
    )
    part = Window.partitionBy("cluster_id")
    ranked = scored.select(
        "cluster_id",
        "doc_id",
        "__nu",
        F.row_number()
        .over(part.orderBy(F.col("__nu").desc(), "doc_id"))
        .alias("__rn"),
        F.count(F.lit(1)).over(part).alias("n_members"),
    )
    return ranked.filter(F.col("__rn") == 1).select(
        "cluster_id",
        "n_members",
        F.col("doc_id").alias("keep_doc_id"),
        F.col("__nu").alias("keep_n_uniq_toks"),
        (F.col("n_members") - 1).alias("n_dropped"),
    )


@q(
    "doc_ngram_jaccard_pairs",
    "Character-3-gram Jaccard verify over MinHash-LSH candidates — the "
    "n-gram flavor of near-dup detection (robust to word-boundary edits "
    "that break token Jaccard). Gram sets come from slicing a once-"
    "projected char array (substr-per-position would be a quadratic UTF-8 "
    "scan); candidates stay LSH-bounded, never attribute-blocked.",
    oracle=f"""
    WITH {_o_lsh_ctes(8, 4)},
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(ch) > 0 THEN
                list_transform(range(1, greatest(len(ch) - 2, 1) + 1),
                               i -> array_to_string(ch[i:i+2], ''))
                ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id,
                   CASE WHEN length(norm) > 0 THEN string_split(norm, '')
                        ELSE CAST([] AS VARCHAR[]) END AS ch
            FROM (SELECT doc_id,
                         lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                             AS norm
                  FROM documents))
    )
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE)
             / (len(l.grams) + len(r.grams)
                - len(list_intersect(l.grams, r.grams))) AS trigram_jaccard
    FROM cand c JOIN g l ON l.doc_id = c.id_a
                JOIN g r ON r.doc_id = c.id_b
    WHERE CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE)
             / (len(l.grams) + len(r.grams)
                - len(list_intersect(l.grams, r.grams))) >= 0.6
    """,
)
def doc_ngram_jaccard_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
    )
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    # Project chars once (bound column), THEN build grams from slices —
    # the HOF re-evaluation trap (word_shingles_of) applies here too.
    chars = docs.select("doc_id", TX.chars_of(norm).alias("__c"))
    grams = chars.select(
        "doc_id", TX.char_ngrams_of(F.col("__c"), 3).alias("__g")
    ).withColumn("__n", F.size("__g"))
    a = grams.select(
        F.col("doc_id").alias("id_a"),
        F.col("__g").alias("__ga"),
        F.col("__n").alias("__na"),
    )
    b = grams.select(
        F.col("doc_id").alias("id_b"),
        F.col("__g").alias("__gb"),
        F.col("__n").alias("__nb"),
    )
    # pin_once: the intersect evaluates once per pair; the threshold filter
    # cannot be substituted through the (nondeterministic) projection.
    inter = pin_once(F.size(F.array_intersect(F.col("__ga"), F.col("__gb"))))
    paired = (
        cand.join(a, "id_a")
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
    return paired.select("id_a", "id_b", jac.alias("trigram_jaccard")).filter(
        F.col("trigram_jaccard") >= 0.6
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@q(
    "doc_text_stats",
    "Per-document text features: token/char counts, mean token length, "
    "stopword + vocabulary ratios, quality bucket — all array expressions "
    "inside codegen, no Python.",
    oracle=f"""
    SELECT doc_id,
           len({O_TOKS}) AS token_count,
           length(text) AS char_count,
           CAST(list_sum(list_transform({O_TOKS}, t -> length(t))) AS DOUBLE)
             / len({O_TOKS}) AS avg_token_len,
           CAST(len(list_filter({O_TOKS},
                t -> list_contains(['the','a','of','and','to','in','is','it'], t)))
                AS DOUBLE) / len({O_TOKS}) AS stopword_ratio,
           CAST(len(list_distinct({O_TOKS})) AS DOUBLE) / len({O_TOKS})
               AS distinct_ratio,
           CASE WHEN len({O_TOKS}) < 5 THEN 'too_short'
                WHEN CAST(len(list_distinct({O_TOKS})) AS DOUBLE)
                     / len({O_TOKS}) < 0.3 THEN 'repetitive'
                WHEN CAST(len(list_filter({O_TOKS},
                     t -> list_contains(['the','a','of','and','to','in','is','it'], t)))
                     AS DOUBLE) / len({O_TOKS}) > 0.6 THEN 'boilerplate'
                ELSE 'ok' END AS quality_bucket
    FROM documents
    """,
)
def doc_text_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    tok_n = TX.token_count(text)
    sw = TX.stopword_ratio(text)
    dr = TX.distinct_token_ratio(text)
    return docs.select(
        "doc_id",
        tok_n.alias("token_count"),
        TX.char_count(text).alias("char_count"),
        TX.avg_token_len(text).alias("avg_token_len"),
        sw.alias("stopword_ratio"),
        dr.alias("distinct_ratio"),
        TX.quality_bucket(tok_n, sw, dr).alias("quality_bucket"),
    )


def _o_lang_score(words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return (
        r"len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), "
        f"t -> list_contains([{arr}], t)))"
    )


_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN {_o_lang_score(words)} = "
        f"greatest({', '.join(_o_lang_score(w) for w in TX.LANG_PROFILES.values())}) "
        f"AND greatest({', '.join(_o_lang_score(w) for w in TX.LANG_PROFILES.values())}) > 0 "
        f"THEN '{lang}'"
        for lang, words in TX.LANG_PROFILES.items()
    )
    + " ELSE 'und' END"
)


@q(
    "doc_lang_id",
    "Language-ID heuristic: stopword-profile scores, argmax with fixed tie "
    "order (en,es,de,fr), 'und' when all zero. Pure when-chain.",
    oracle=f"""
    SELECT {_LANG_CASE} AS predicted_lang, lang AS labeled_lang,
           COUNT(*) AS n
    FROM documents GROUP BY 1, 2
    """,
)
def doc_lang_id(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            TX.lang_id(F.col("text")).alias("predicted_lang"),
            F.col("lang").alias("labeled_lang"),
        )
        .groupBy("predicted_lang", "labeled_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "doc_fingerprints",
    "Document fingerprinting: md5 content hash + 16-char prefix key for "
    "sharded dedup joins.",
    oracle=f"""
    SELECT doc_id, {O_FINGERPRINT} AS fingerprint,
           substr({O_FINGERPRINT}, 1, 16) AS shard_key
    FROM documents
    """,
)
def doc_fingerprints(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    fp = TX.fingerprint(F.col("text"))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 16).alias("shard_key"),
    )


@q(
    "doc_token_counts",
    "Token budgeting: whitespace token count plus a BPE-ish subword "
    "estimate (word/punct pieces via regexp, ceil(len/4) subwords per "
    "piece — the ~4-chars-per-token rule). Map-only regexp + array fold.",
    oracle=r"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
           CAST(coalesce(list_sum(list_transform(
                regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]', 0),
                t -> (length(t) + 3) // 4)), 0) AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def doc_token_counts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("long").alias("ws_tokens"),
        TX.subword_count(F.col("text")).alias("bpe_tokens"),
    )


# Winnowing fragment shared between the Spark plan and the oracle spec:
# k=8-char grams hashed with Rabin-Karp (base 31 mod 2^31-1), window w=4
# minima, distinct. Any shared substring of >= k+w-1 = 11 normalized chars
# yields a shared fingerprint.
_WINNOW_K, _WINNOW_W = 8, 4
# Stop-fingerprint / candidate thresholds shared by the winnow overlap
# pairs, the blocked compositions, and the streaming funnel oracle
# (defined here because decorator f-strings evaluate at module load).
_WINNOW_MAX_DF = 50
_WINNOW_MIN_SHARED = 8


def _o_rolling(
    k: int = _WINNOW_K, table: str = "documents", prefix: str = ""
) -> str:
    """CTE chain ``c, h`` ending in per-doc Rabin-Karp k-gram hash arrays
    — shared by the winnow, exact-passage, and dedup-funnel oracles.
    ``table``: any relation with doc_id + text (a CTE name works).
    ``prefix`` renames the chain (``p1c, p1h``) so several relations'
    hash chains can coexist in one WITH (the funnel-merge-state
    oracle)."""
    base, mod = TX.ROLL_BASE, TX.ROLL_MOD
    return f"""
    {prefix}c AS (
      SELECT doc_id,
             CASE WHEN length(norm) > 0 THEN
                list_transform(string_split(norm, ''), ch -> unicode(ch))
             ELSE CAST([] AS INT[]) END AS codes
      FROM (SELECT doc_id,
                   regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS norm
            FROM {table})),
    {prefix}h AS (
      SELECT doc_id,
             CASE WHEN len(codes) >= {k} THEN
                list_transform(range(1, len(codes) - {k} + 2),
                  i -> list_reduce(
                         list_prepend(CAST(0 AS BIGINT), codes[i:i+{k - 1}]),
                         (a, x) -> (a * {base} + x) % {mod}))
             WHEN len(codes) > 0 THEN
                [list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                             (a, x) -> (a * {base} + x) % {mod})]
             ELSE CAST([] AS BIGINT[]) END AS hashes
      FROM {prefix}c)"""


def _o_winnow_rows(w: int = _WINNOW_W, prefix: str = "") -> str:
    """CTE fragment ``wf`` — (doc_id, fingerprint) winnow sketch rows.
    Assumes the rolling chain's ``h`` (doc_id, hashes) is in scope (same
    ``prefix``), so the fragment composes with the passage-gram chain
    over ONE shared rolling pass (the blocked-passage oracle)."""
    return f"""
    {prefix}wf AS (
      SELECT doc_id, unnest(fps) AS fingerprint FROM (
        SELECT doc_id,
               CASE WHEN len(hashes) > 0 THEN
                  list_distinct(list_transform(
                    range(1, greatest(len(hashes) - {w - 1}, 1) + 1),
                    i -> list_min(hashes[i:i+{w - 1}])))
               ELSE CAST([] AS BIGINT[]) END AS fps
        FROM {prefix}h) t)"""


def _o_winnow(k: int = _WINNOW_K, w: int = _WINNOW_W) -> str:
    return f"""
    WITH {_o_rolling(k)},
    {_o_winnow_rows(w)}
    SELECT doc_id, fingerprint FROM wf
    """


@q(
    "doc_winnow_fingerprints",
    "Winnowing (rolling-hash) document fingerprints: Rabin-Karp polynomial "
    "hash of every 8-char gram over alnum-normalized text, then the "
    "distinct per-4-window minima (MOSS local-similarity sketch). Char "
    "codes project once; each gram folds k codes with O(1) element_at — "
    "map-only, O(n*k) per doc, no shuffle until the consumer joins on "
    "fingerprint.",
    oracle=_o_winnow(),
)
def doc_winnow_fingerprints(spark, sf_dir):
    return _winnow_fps(
        load(spark, sf_dir, "documents"),
        hashes=AR.shared_rolling_hashes(spark, sf_dir, _WINNOW_K),
    )


def _winnow_fps(docs, hashes=None) -> DataFrame:
    """(doc_id, fingerprint) winnowing sketch rows; shared by the
    fingerprint listing and the overlap-pair consumer. Delegates to the
    operator (operators/passages.py winnow_fingerprint_table — also the
    streaming funnel sink's stage-3 sketch) at this module's k/w.
    ``hashes``: precomputed rolling-hash arrays (the session artifact
    store) — the dominant map cost, hashed once per corpus."""
    from etl_weather_data_pipeline_spark.operators.passages import (
        winnow_fingerprint_table,
    )

    return winnow_fingerprint_table(
        docs, k=_WINNOW_K, w=_WINNOW_W, hashes=hashes
    )


# Quality-bucket CASE over a relation with a `text` column (mirrors
# TX.quality_bucket + its input ratios exactly; reused by doc_text_stats'
# oracle semantics and the curation pipeline).
_O_QUALITY = (
    f"CASE WHEN len({O_TOKS}) < 5 THEN 'too_short' "
    f"WHEN CAST(len(list_distinct({O_TOKS})) AS DOUBLE) / len({O_TOKS}) < 0.3 "
    f"THEN 'repetitive' "
    f"WHEN CAST(len(list_filter({O_TOKS}, "
    f"t -> list_contains([{','.join(repr(w) for w in TX.EN_STOPWORDS)}], t))) "
    f"AS DOUBLE) / len({O_TOKS}) > 0.6 THEN 'boilerplate' ELSE 'ok' END"
)

_O_SUBWORDS = (
    r"CAST(coalesce(list_sum(list_transform("
    r"regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]', 0), "
    r"t -> (length(t) + 3) // 4)), 0) AS BIGINT)"
)

# Persisted intermediates (curation flagship's deduped corpus; winnow
# overlap's fingerprint sketch) must outlive the (lazy) query function so
# the caller's action can consume the cache — but an unbounded lifetime
# leaks one MEMORY_AND_DISK cache per invocation in a long-lived session
# (bench loops, two-SF parity runs). Bound it to AT MOST ONE alive: each
# persisting invocation releases the previous, and harnesses call
# release_curation_cache() when done with the result.
_CURATION_PERSISTED: list[DataFrame] = []


def release_curation_cache() -> None:
    """Unpersist the curation flagship's cached intermediate (idempotent).

    Call after the returned DataFrame's action has run; the result itself
    stays valid (it would just recompute without the cache).
    """
    while _CURATION_PERSISTED:
        _CURATION_PERSISTED.pop().unpersist()


@q(
    "corpus_curation_pipeline",
    "The LLM-data flagship: quality-filter ('ok' bucket) -> exact dedup "
    "(fingerprint, min-id survivor) -> near-dup removal (MinHash-LSH "
    "candidates, Jaccard >= 0.5 verify, drop the larger id of each "
    "verified pair) -> per-language doc/token budget. Every stage is the "
    "already-benchmarked bucketed operator; the whole chain is hash-agg + "
    "equi-join shuffles only, no stage quadratic in the corpus.",
    oracle=f"""
    WITH ok_docs AS (
      SELECT doc_id, lang, text FROM documents WHERE {_O_QUALITY} = 'ok'),
    survivors AS (
      SELECT d.doc_id, d.lang, d.text
      FROM ok_docs d
      JOIN (SELECT {O_FINGERPRINT} AS fp, MIN(doc_id) AS doc_id
            FROM ok_docs GROUP BY 1) s
        ON d.doc_id = s.doc_id),
    {_o_lsh_ctes(8, 4, table="survivors")},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM survivors),
    dropped AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    final AS (
      SELECT * FROM survivors
      WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len({O_TOKS})) AS BIGINT) AS ws_tokens,
           CAST(SUM({_O_SUBWORDS}) AS BIGINT) AS bpe_tokens
    FROM final GROUP BY lang
    """,
)
def corpus_curation_pipeline(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify

    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    quality = TX.quality_bucket(
        TX.token_count(text),
        TX.stopword_ratio(text),
        TX.distinct_token_ratio(text),
    )
    ok = docs.filter(quality == "ok")
    # Materialize the deduped intermediate ONCE: four DAG branches consume
    # it (LSH signatures, both verify sides, the final aggregate) and
    # without a persist each branch re-scans + re-dedups the corpus — a 5x
    # read amplification that dwarfs everything at 100 TB. Narrow to the
    # three consumed columns first so the cached footprint is minimal;
    # MEMORY_AND_DISK spills instead of OOMing on big corpora (a real
    # cluster job would use a reliable checkpoint for executor-loss safety).
    # Lifecycle: the cache must outlive this (lazy) function so the
    # caller's action can hit it, so it is tracked module-level with AT
    # MOST ONE alive — each invocation releases the previous one, and
    # release_curation_cache() frees the last (bench/tests call it).
    from pyspark import StorageLevel

    release_curation_cache()
    kept = (
        dedup_exact(ok)
        .select("doc_id", "lang", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(kept)
    cand = minhash_lsh_pairs(
        kept, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir).join(
            kept.select("doc_id"), "doc_id", "left_semi"
        ),
    )
    dropped = (
        jaccard_verify(
            kept, cand, threshold=0.5,
            toksets=AR.shared_token_sets(spark, sf_dir),
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    final = kept.join(dropped, "doc_id", "left_anti")
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.token_count(text).cast("long")).alias("ws_tokens"),
        F.sum(TX.subword_count(text)).alias("bpe_tokens"),
    )


@q(
    "corpus_curation_pipeline_v2",
    "Curation flagship v2 — the full CCNet/LLaMA recipe the standalone "
    "scorers feed (r7 verdict directive #5): exact dedup (min-id "
    "survivor) -> MinHash-LSH near-dup removal (Jaccard >= 0.5, larger "
    "id drops) -> bigram-LM quality band (LM TRAINED ON THE STAGE-2 "
    "SURVIVORS, per-doc mean conditional logprob >= -3.45; garbled "
    "word order and <2-token docs drop — CCNet's perplexity gate) -> "
    "fitted-classifier filter (score > 0.5, weights shared with "
    "doc_quality_classifier via the _pq_codebooks-style memo — one GD "
    "run serves both queries). Stage counts through the LM band are "
    "EXACT (the LM is deterministic arithmetic, mirrored in DuckDB "
    "CTE-for-CTE); the fitted stage is property-checked: it must be "
    "genuinely selective (0 < n_final < n_after_lm) and keep the "
    "information-dense side (avg distinct-token ratio of kept > "
    "dropped — the planted concept's direction), plus the fit's own "
    "loss-monotone/finite booleans. Scale shape: stages are hash-agg + "
    "equi-join shuffles only (v1's contract); the LM rides ONE "
    "persisted survivor frame; classifier scoring is plan-literal "
    "weights — no extra shuffle at all.",
    oracle=f"""
    WITH survivors0 AS (
      SELECT d.doc_id, d.lang, d.text
      FROM documents d
      JOIN (SELECT {O_FINGERPRINT} AS fp, MIN(doc_id) AS doc_id
            FROM documents GROUP BY 1) s
        ON d.doc_id = s.doc_id),
    {_o_lsh_ctes(8, 4, table="survivors0")},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM survivors0),
    dropped AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    s2 AS (
      SELECT * FROM survivors0
      WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
    tok AS (SELECT doc_id, unnest({O_TOKS}) AS token FROM s2),
    big AS (
      SELECT doc_id, t.first AS first, t.bigram AS bigram FROM (
        SELECT doc_id, unnest(
          CASE WHEN len({O_TOKS}) >= 2 THEN
            list_transform(range(1, len({O_TOKS})),
              i -> struct_pack(first := {O_TOKS}[i],
                               bigram := {O_TOKS}[i] || ' ' || {O_TOKS}[i+1]))
          ELSE CAST([] AS STRUCT(first VARCHAR, bigram VARCHAR)[]) END
        ) AS t
        FROM s2)),
    uvocab AS (SELECT token, COUNT(*) AS ucnt FROM tok GROUP BY token),
    v AS (SELECT COUNT(*) AS vsize FROM uvocab),
    bvocab AS (SELECT bigram, COUNT(*) AS bcnt FROM big GROUP BY bigram),
    lmsc AS (
      SELECT b.doc_id,
             {o_dround("ln(bv.bcnt + 0.5)", 8)}
               - {o_dround(
                   "ln(uv.ucnt + 0.5 * (SELECT vsize FROM v))", 8)} AS lp
      FROM big b JOIN bvocab bv USING (bigram)
                 JOIN uvocab uv ON uv.token = b.first),
    per AS (
      SELECT doc_id,
             {o_dround(
                 "CAST(SUM(CAST(lp AS DECIMAL(28,10))) AS DOUBLE)"
                 " / COUNT(*)", 6)} AS s
      FROM lmsc GROUP BY doc_id),
    s3 AS (
      SELECT doc_id FROM s2 JOIN per USING (doc_id)
      WHERE per.s >= -3.45)
    SELECT (SELECT COUNT(*) FROM documents) AS n_input,
           (SELECT COUNT(*) FROM survivors0) AS n_after_exact,
           (SELECT COUNT(*) FROM s2) AS n_after_neardup,
           (SELECT COUNT(*) FROM s3) AS n_after_lm,
           TRUE AS classifier_stage_selective,
           TRUE AS classifier_keeps_denser,
           TRUE AS loss_monotone,
           TRUE AS weights_finite
    """,
)
def corpus_curation_pipeline_v2(spark, sf_dir):
    import math

    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.dedup import (
        jaccard_verify,
    )
    from etl_weather_data_pipeline_spark.operators.logreg import (
        logreg_score,
    )

    docs = load(spark, sf_dir, "documents")
    release_curation_cache()
    # stage 1: exact dedup (same persisted shape + rationale as v1)
    kept = (
        dedup_exact(docs)
        .select("doc_id", "lang", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(kept)
    cand = minhash_lsh_pairs(
        kept, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir).join(
            kept.select("doc_id"), "doc_id", "left_semi"
        ),
    )
    dropped = (
        jaccard_verify(
            kept, cand, threshold=0.5,
            toksets=AR.shared_token_sets(spark, sf_dir),
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    # stage 2 survivors feed the LM train (tok, big), the band join,
    # and the count — persist the narrow frame once
    s2 = kept.join(dropped, "doc_id", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _CURATION_PERSISTED.append(s2)
    # stage 3: bigram LM over the SURVIVORS (doc_bigram_logprob's exact
    # arithmetic, retargeted at s2 — score the corpus with an LM trained
    # on what dedup kept)
    toked = s2.select("doc_id", TX.tokens(F.col("text")).alias("__t"))
    tok = toked.select("doc_id", F.explode("__t").alias("token"))
    uvocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("ucnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(uvocab)
    v = uvocab.agg(F.count(F.lit(1)).alias("vsize"))
    big = (
        toked.select(
            "doc_id",
            F.explode_outer(
                F.when(
                    F.size("__t") >= 2,
                    F.expr(
                        "transform(sequence(0, size(__t) - 2), "
                        "i -> struct(__t[i] AS first, "
                        "concat(__t[i], ' ', __t[i + 1]) AS bigram))"
                    ),
                )
            ).alias("b"),
        )
        .filter(F.col("b").isNotNull())
        .select("doc_id", F.col("b.first").alias("first"), "b.bigram")
    )
    bvocab = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("bcnt"))
    lmsc = (
        big.join(bvocab, "bigram")
        .join(uvocab, big["first"] == uvocab["token"])
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            (
                dround(F.log(F.col("bcnt") + F.lit(0.5)), 8)
                - dround(
                    F.log(F.col("ucnt") + F.lit(0.5) * F.col("vsize")), 8
                )
            ).alias("lp"),
        )
    )
    per = lmsc.groupBy("doc_id").agg(
        dround(
            F.sum(F.col("lp").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("__s")
    )
    s3 = s2.join(
        per.filter(F.col("__s") >= F.lit(-3.45)).select("doc_id"),
        "doc_id",
        "left_semi",
    ).select("doc_id", "text")
    # stage 4: fitted classifier (weights from the shared memo; when
    # cold, train on the FULL table — the memo contract — persisting
    # the training features for the 11 GD aggregates)
    if sf_dir not in _QUALITY_CLF_CACHE:
        feats_full = _quality_features(docs).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        _CURATION_PERSISTED.append(feats_full)
        w, losses = _quality_weights(feats_full, sf_dir)
    else:
        w, losses = _QUALITY_CLF_CACHE[sf_dir]
    monotone = all(b <= a + 1e-12 for a, b in zip(losses, losses[1:]))
    finite = all(math.isfinite(x) for x in w)
    scored = _quality_features(s3).select(
        "doc_id",
        "f_dr",
        logreg_score(_QUALITY_FCOLS, w).alias("__p"),
    )
    clf = scored.agg(
        F.count(F.lit(1)).alias("__n_lm"),
        F.count(F.when(F.col("__p") > 0.5, 1)).alias("__n_final"),
        F.avg(F.when(F.col("__p") > 0.5, F.col("f_dr"))).alias(
            "__dr_keep"
        ),
        F.avg(F.when(F.col("__p") <= 0.5, F.col("f_dr"))).alias(
            "__dr_drop"
        ),
    )
    n_input = docs.agg(F.count(F.lit(1)).alias("__n_in"))
    n_exact = kept.agg(F.count(F.lit(1)).alias("__n_ex"))
    n_s2 = s2.agg(F.count(F.lit(1)).alias("__n_s2"))
    return (
        n_input.crossJoin(n_exact)
        .crossJoin(n_s2)
        .crossJoin(clf)
        .select(
            F.col("__n_in").cast("long").alias("n_input"),
            F.col("__n_ex").cast("long").alias("n_after_exact"),
            F.col("__n_s2").cast("long").alias("n_after_neardup"),
            F.col("__n_lm").cast("long").alias("n_after_lm"),
            (
                (F.col("__n_final") > 0)
                & (F.col("__n_final") < F.col("__n_lm"))
            ).alias("classifier_stage_selective"),
            F.coalesce(
                F.col("__dr_keep") > F.col("__dr_drop"), F.lit(False)
            ).alias("classifier_keeps_denser"),
            F.lit(bool(monotone)).alias("loss_monotone"),
            F.lit(bool(finite)).alias("weights_finite"),
        )
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_O_COS = (
    "CASE WHEN sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv, q.qv)) > 0 "
    "THEN list_dot_product(e.embedding::DOUBLE[], q.qv) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv, q.qv))) ELSE 0.0 END"
)


def _lsh_planes(n_planes: int = 4, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed literal spec — no RNG
    so both engines and every run agree)."""
    return [
        [(((i * (j + 3) + (j + 1) * (j + 1)) % 7) - 3) / 3.0 for i in range(dim)]
        for j in range(n_planes)
    ]


def _o_lsh_bucket(planes: list[list[float]], col: str = "embedding") -> str:
    bits = []
    for j, p in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in p) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product({col}::DOUBLE[], {arr}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


@q(
    "ann_cosine_topk",
    "Brute-force cosine top-10 against the vec_id=0 query vector — the "
    "exactness baseline for ANN. Per-row cosine is a codegen'd fold; top-k "
    "is TakeOrdered (partial top-k per partition, no full sort).",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, {o_dround(_O_COS, 6)} AS cosine
    FROM embeddings e, q
    ORDER BY cosine DESC, e.vec_id
    LIMIT 10
    """,
)
def ann_cosine_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            dround(VX.cosine(F.col("embedding"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


@q(
    "embedding_neardup_pairs",
    "Embedding near-dup pairs blocked on (label, lsh_bucket): cosine >= "
    "0.95 within each cell. Label alone has fixed cardinality, so its "
    "cells grow linearly with the corpus (quadratic pairs at scale); the "
    "4-plane hyperplane bucket multiplies the cell count by up to 16 and, "
    "like any LSH blocking, keeps near-identical vectors co-bucketed with "
    "high probability — standard recall-for-scale trade.",
    oracle=f"""
    WITH b AS (SELECT vec_id, label, embedding,
                      {_o_lsh_bucket(_lsh_planes())} AS bucket
               FROM embeddings)
    SELECT l.vec_id AS id_a, r.vec_id AS id_b,
           {o_dround(
               'list_dot_product(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) / '
               '(sqrt(list_dot_product(l.embedding::DOUBLE[], l.embedding::DOUBLE[]))'
               ' * sqrt(list_dot_product(r.embedding::DOUBLE[], r.embedding::DOUBLE[])))',
               6,
           )} AS cosine
    FROM b l JOIN b r
      ON l.label = r.label AND l.bucket = r.bucket AND l.vec_id < r.vec_id
    WHERE {o_dround(
        'list_dot_product(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) / '
        '(sqrt(list_dot_product(l.embedding::DOUBLE[], l.embedding::DOUBLE[]))'
        ' * sqrt(list_dot_product(r.embedding::DOUBLE[], r.embedding::DOUBLE[])))',
        6,
    )} >= 0.95
    """,
)
def embedding_neardup_pairs(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.similarity import lsh_bucket

    emb = load(spark, sf_dir, "embeddings").withColumn(
        "bucket", lsh_bucket(F.col("embedding"), _lsh_planes())
    )
    left = emb.alias("l")
    right = emb.alias("r")
    cos = dround(VX.cosine(F.col("l.embedding"), F.col("r.embedding")), 6)
    return (
        left.join(
            right,
            (F.col("l.label") == F.col("r.label"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("id_a"),
            F.col("r.vec_id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.95)
    )


@q(
    "embedding_semdedup_probe",
    "SemDeDup-style SEMANTIC dedup with a planted-duplicate recall "
    "probe (Abbas et al. 2023: k-means-cluster the embeddings, then "
    "pairwise-cosine dedup WITHIN clusters — clustering is what makes "
    "the pairwise stage tractable). k SCALES WITH THE TABLE, "
    "max(8, ceil(n_union/150)) — SemDeDup's own recipe: with fixed k "
    "the within-cluster pair stage is O(n^2/k), quadratic in corpus "
    "size; scaled k keeps expected cluster sizes (and the pair "
    "volume) bounded, and the materialized pair count is ASSERTED "
    "in-query against a 4*n^2/k budget (8x the balanced-cluster "
    "expectation — k-means clusters on near-random vectors are "
    "uneven but not 8x uneven; a fixed-k regression or a degenerate "
    "clustering flips the boolean at bench SF via --check-invariants)."
    " The synthetic embeddings carry no "
    "planted near-dups, so the probe PLANTS them: a perturbed copy of "
    "every 5th vector (component-wise ±8% deterministic pattern, "
    "cosine ~0.997 to its original) joins the corpus at vec_id + 1e6, "
    "deterministic k-means (lowest-id seeds) clusters the union, and "
    "within-cluster cosine >= 0.95 pairs are the dedup output. "
    "Invariant booleans: planted recall >= 0.8 (a planted copy is "
    "only missed when the perturbation flips its cluster at a Voronoi "
    "boundary — measured 0.99/1.0/0.988 across the three SFs at the "
    "scaled k of 8/8/16; sf0.1 recall at k=16 equals r8's fixed-k=8 "
    "value, 395/400 — the scale-up cost nothing), pair volume within "
    "budget (measured 22.4k/22.4k/180k vs budgets 180k/180k/1.44M), "
    "k-means "
    "SSE non-increasing, >= 2 populated clusters; exact cross-checks: "
    "n_vectors, n_planted (driver-exact literals from the sizing "
    "count — the same count that picks k). In-plan raise_error guards "
    "the planted-id space (vec_id >= 1e6 would corrupt the recall "
    "decode). The recall and volume counts come out of ONE aggregate "
    "over the join output — a second counting branch would re-run the "
    "whole within-cluster join (the two-branch re-evaluation trap).",
    oracle="""
    SELECT COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_planted,
           TRUE AS planted_recall_floor_ok,
           TRUE AS pair_volume_bounded,
           TRUE AS sse_monotone,
           TRUE AS clusters_nonempty
    FROM embeddings
    """,
)
def embedding_semdedup_probe(spark, sf_dir):
    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.kmeans import (
        kmeans_fit_full,
    )

    emb = load(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted_id = F.when(
        F.col("vec_id") < 1000000, F.col("vec_id") + 1000000
    ).otherwise(
        F.raise_error(
            F.lit("embedding_semdedup_probe: vec_id >= 1e6 collides "
                  "with the planted-id space; raise the offset")
        )
    )
    pert = base.filter(F.col("vec_id") % 5 == 0).select(
        planted_id.alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x * (1.0 + 0.08 * ((i % 3) - 1)),
        ).alias("embedding"),
    )
    union = base.unionByName(pert).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(union)
    # One sizing pass over the (persisted) union picks k and yields the
    # exact cross-check counts as driver literals (planted rows are the
    # >= 1e6 id space — no density assumption on the source ids).
    szrow = union.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("vec_id") >= 1000000, 1)).alias("pl"),
    ).first()
    n_union, n_pl = szrow["n"], szrow["pl"]
    n_vec = n_union - n_pl
    k = max(8, -(-n_union // 150))  # ceil-div; SemDeDup: k grows with n
    pair_budget = 4 * n_union * n_union // k
    # centroid memo (r11 directive #5): the union-with-planted input is
    # a deterministic function of (sf_dir), so its trained centroids
    # are exact-input memoizable like the raw-table ones — keyed by the
    # data-dependent k so a corpus-size change can never hit a stale
    # entry. Assignments recompute map-side (the training's own final
    # assignment rule); the union join with asg disappears.
    from etl_weather_data_pipeline_spark.operators.kmeans import (
        argmin_index,
    )
    from etl_weather_data_pipeline_spark.plans.artifacts import (
        _get_literal,
    )

    def _train():
        _, sse, cents = kmeans_fit_full(union, k=k, iterations=3)
        return (sse, cents)

    sse_hist, cents = _get_literal(
        spark, sf_dir, f"semdedup_probe_centroids_k{k}_i3", _train
    )
    sse_monotone = all(
        later <= earlier * (1 + 1e-9) + 1e-9
        for earlier, later in zip(sse_hist, sse_hist[1:])
    )
    clustered = union.withColumn(
        "cluster", argmin_index(F.col("embedding"), cents)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(clustered)
    left = clustered.select(
        F.col("vec_id").alias("id_a"),
        F.col("cluster"),
        F.col("embedding").alias("__va"),
    )
    right = clustered.select(
        F.col("vec_id").alias("id_b"),
        F.col("cluster"),
        F.col("embedding").alias("__vb"),
    )
    joined = (
        left.join(right, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            VX.cosine(F.col("__va"), F.col("__vb")).alias("__cos"),
        )
    )
    is_dup = F.col("__cos") >= 0.95
    is_planted = (F.col("id_b") >= 1000000) & (
        F.col("id_a") == F.col("id_b") - 1000000
    )
    pairagg = joined.agg(
        F.count(F.lit(1)).alias("__n_pairs"),
        F.count(F.when(is_dup & is_planted, 1)).alias("__n_rec"),
    )
    n_clusters = clustered.agg(
        F.countDistinct("cluster").alias("__n_cl")
    )
    return pairagg.crossJoin(n_clusters).select(
        F.lit(n_vec).cast("long").alias("n_vectors"),
        F.lit(n_pl).cast("long").alias("n_planted"),
        (
            F.col("__n_rec").cast("double") >= F.lit(n_pl) * F.lit(0.8)
        ).alias("planted_recall_floor_ok"),
        (F.col("__n_pairs") <= F.lit(pair_budget)).alias(
            "pair_volume_bounded"
        ),
        F.lit(bool(sse_monotone)).alias("sse_monotone"),
        (F.col("__n_cl") >= F.lit(2)).alias("clusters_nonempty"),
    )


@q(
    "ann_multi_query_topk",
    "Top-5 neighbors for MANY queries at once (vec_id 0-2): broadcast the "
    "tiny query set, score every (vector, query) pair map-side, window "
    "top-k per query — the batch-serving shape (one scan regardless of "
    "query count; the window's partial top-k bounds the shuffle).",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT q.q_id, e.vec_id, {o_dround(_O_COS, 6)} AS cosine
      FROM embeddings e, q),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, vec_id) AS rn
      FROM scored)
    SELECT q_id, vec_id, cosine FROM ranked WHERE rn <= 5
    """,
)
def ann_multi_query_topk(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.similarity import topk_join

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return topk_join(emb, queries, k=5)


@q(
    "ann_ivf_topk",
    "IVF-style ANN as a SELF-CHECKING recall query: probe label cells "
    "nearest the query centroid, brute-force inside, then join the IVF "
    "top-10 against the exact brute-force top-10 IN-QUERY and emit the "
    "IVF invariants as booleans — recall@10 clears a conservative "
    "tripwire floor (0.3: the synthetic labels aren't cosine-clustered, "
    "so absolute recall at n_probe=3/10 is data-dependent; measured "
    "0.5/0.5/0.3 at the three SFs), and recall is MONOTONE in n_probe "
    "(the n_probe=5 candidate set is a superset of n_probe=3's — "
    "provable, and anything displacing a true top-10 hit is itself a "
    "true top-10 hit; measured 0.9 at the gate SF). All inputs are "
    "deterministic (dround6 cosine, vec_id tie-break), so the booleans "
    "are stable and a probe/recall regression hash-fails the driver "
    "row. The two-phase probe selection can't be one SQL statement, "
    "hence the property oracle. Centroids are computed ONCE and shared "
    "by both probes (cell_centroids amortization API).",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS k,
           TRUE AS recall_floor_ok,
           TRUE AS probe_recall_monotone
    """,
)
def ann_ivf_topk(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        cell_centroids,
        ivf_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    qv = [r[0] for r in emb.filter(F.col("vec_id") == 0).select(
        F.explode("embedding")
    ).collect()]
    cents = cell_centroids(emb)
    ivf3 = ivf_topk(emb, qv, k=10, n_probe=3, centroids=cents).select("vec_id")
    ivf5 = ivf_topk(emb, qv, k=10, n_probe=5, centroids=cents).select("vec_id")
    exact = brute_force_topk(emb, qv, k=10).select("vec_id")
    h3 = ivf3.join(exact, "vec_id").agg(F.count(F.lit(1)).alias("__h3"))
    h5 = ivf5.join(exact, "vec_id").agg(F.count(F.lit(1)).alias("__h5"))
    return h3.crossJoin(h5).select(
        F.lit(10).cast("long").alias("k"),
        (F.col("__h3") >= F.lit(3)).alias("recall_floor_ok"),
        (F.col("__h5") >= F.col("__h3")).alias("probe_recall_monotone"),
    )


@q(
    "ann_ivf_trained_topk",
    "The TRAINED-quantizer IVF path driven end-to-end — FAISS's actual "
    "IVF composition (kmeans_cells Voronoi cells from k-means over the "
    "vectors themselves -> cell_centroids -> ivf_topk(cell_col='cell') "
    "probe), where ann_ivf_topk blocks on the metadata label column. "
    "Self-checking like its sibling: the trained-IVF top-10 joins the "
    "exact brute-force top-10 IN-QUERY and the invariants come out as "
    "booleans — recall@10 at n_probe=3/8 trained cells clears the 0.3 "
    "tripwire (measured 1.0/0.9/1.0 across the three SFs — trained "
    "cells track cosine geometry, vs 0.5/0.5/0.3 for the metadata "
    "label cells), recall is MONOTONE in n_probe (n_probe=5's "
    "candidate set provably contains n_probe=3's: deterministic "
    "centroid ordering, longer prefix), and the probe actually PRUNES "
    "(n_probe=3's candidate rows < n_vectors). Exact cross-check: "
    "n_vectors counted FROM the assigned table — a kmeans_cells join "
    "that drops or duplicates a vector hash-fails the driver row, so "
    "the oracle's COUNT(*) doubles as the assignment-coverage check. "
    "The residual-PQ half of the trained stack is exercised through "
    "pq_residual_frame(label_col='cell'): trained cells must explain "
    "MORE vector energy than the metadata label partition — "
    "sum ||x − centroid(cell)||² under k-means cells < under labels "
    "(the reason FAISS trains its coarse quantizer at all; the "
    "residual the PQ stage codes is exactly this remainder, so lower "
    "coarse energy = tighter codes at any byte budget — the r8 "
    "ann_ivfpq_residual_topk ANOVA argument, one level up). Measured "
    "deterministic margins: 465.6<490.2 / 464.9<489.3 / 1905<1990 "
    "across the three SFs; both sides are map-only when-chain literal "
    "centroids + zip_with, no join. One persisted assigned table "
    "feeds centroids + both probes + the candidate counts + the "
    "trained-residual aggregate (the multi-consumer re-evaluation "
    "trap); centroids compute ONCE and are shared by both probes and "
    "the residual map (cell_centroids amortization API). At 100 TB "
    "the assigned table is written clustered by cell so each probe "
    "prunes to n_probe partitions (ivf_topk's documented layout "
    "contract).",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS k,
           COUNT(*) AS n_vectors,
           TRUE AS recall_floor_ok,
           TRUE AS probe_recall_monotone,
           TRUE AS probe_prunes_scan,
           TRUE AS trained_coarse_tighter
    FROM embeddings
    """,
)
def ann_ivf_trained_topk(spark, sf_dir):
    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.kmeans import (
        argmin_index,
    )
    from etl_weather_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        cell_centroids,
        ivf_topk,
    )
    from etl_weather_data_pipeline_spark.plans.artifacts import (
        shared_kmeans_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    # trained quantizer from the session artifact store (r11 directive
    # #5): identical deterministic Lloyd to the old inline kmeans_cells
    # run, with the assignment join replaced by the map-side argmin the
    # training's own final assignment satisfies — one less shuffle, no
    # duplicate Lloyd across consumers/repeats.
    _, cents8 = shared_kmeans_centroids(spark, sf_dir, k=8, iterations=3)
    cells = emb.withColumn(
        "cell", argmin_index(F.col("embedding"), cents8)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(cells)
    # cents is tiny (k rows) but feeds MANY separate driver actions
    # (both probe selections, the probe-cell recompute, the centroid
    # collect for the residual map) — persist it so the centroid
    # aggregation really does compute once from the cells cache.
    cents = cell_centroids(cells, cell_col="cell").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _CURATION_PERSISTED.append(cents)
    ivf3 = ivf_topk(
        cells, qv, k=10, n_probe=3, cell_col="cell", centroids=cents
    ).select("vec_id")
    ivf5 = ivf_topk(
        cells, qv, k=10, n_probe=5, cell_col="cell", centroids=cents
    ).select("vec_id")
    exact = brute_force_topk(emb, qv, k=10).select("vec_id")
    h3 = ivf3.join(exact, "vec_id").agg(F.count(F.lit(1)).alias("__h3"))
    h5 = ivf5.join(exact, "vec_id").agg(F.count(F.lit(1)).alias("__h5"))
    stats = cells.agg(F.count(F.lit(1)).alias("__n"))
    # the 3 probed cells via the SAME selection rule ivf_topk runs
    # (similarity.choose_probe_cells: raw cosine DESC, cell-id
    # tie-break), so this count is the probe's true candidate volume
    # and cannot desync from the probe set if the rule ever changes
    from etl_weather_data_pipeline_spark.operators.similarity import (
        choose_probe_cells,
    )

    probe_cells = choose_probe_cells(cents, qv, n_probe=3, cell_col="cell")
    cand3 = cells.filter(F.col("cell").isin(probe_cells)).agg(
        F.count(F.lit(1)).alias("__c3")
    )
    # Residual-PQ half of the trained stack: the coarse-energy
    # comparison that justifies training cells at all. Both residual
    # frames are map-only (pq_residual_frame: literal centroid
    # when-chain + zip_with); the trained side reads the cells cache,
    # the label side one extra scan.
    from etl_weather_data_pipeline_spark.operators.quantization import (
        pq_residual_frame,
    )

    cmap_trained = {
        r["cell"]: [float(x) for x in r["centroid"]]
        for r in cents.collect()
    }
    cmap_label = {
        r["label"]: [float(x) for x in r["centroid"]]
        for r in cell_centroids(emb, cell_col="label").collect()
    }

    def _energy(rf, out):
        sq = F.aggregate(
            F.col("__res"), F.lit(0.0), lambda a, x: a + x * x
        )
        return rf.select(sq.alias("__sq")).agg(F.sum("__sq").alias(out))

    e_t = _energy(
        pq_residual_frame(cells, cmap_trained, label_col="cell"), "__et"
    )
    e_l = _energy(
        pq_residual_frame(emb, cmap_label, label_col="label"), "__el"
    )
    return (
        stats.crossJoin(h3)
        .crossJoin(h5)
        .crossJoin(cand3)
        .crossJoin(e_t)
        .crossJoin(e_l)
        .select(
            F.lit(10).cast("long").alias("k"),
            F.col("__n").cast("long").alias("n_vectors"),
            (F.col("__h3") >= F.lit(3)).alias("recall_floor_ok"),
            (F.col("__h5") >= F.col("__h3")).alias(
                "probe_recall_monotone"
            ),
            (F.col("__c3") < F.col("__n")).alias("probe_prunes_scan"),
            (F.col("__et") < F.col("__el")).alias(
                "trained_coarse_tighter"
            ),
        )
    )


@q(
    "ann_ivf_index_topk",
    "The PERSISTED IVF index store driven end-to-end "
    "(operators/ann_index.py — ivf_topk's documented 100 TB layout as "
    "an on-disk store, the ANN analogue of the streaming _bands/_winnow "
    "side tables): build the index from the even-id half of the "
    "embeddings (deterministic k-means training, vectors written "
    "partitioned by cell=, centroid matrix FROZEN alongside), then "
    "INCREMENTALLY add the odd-id half (map-only argmin against the "
    "frozen centroids, appended into matching cell= partitions — the "
    "store is never read or shuffled by an add), then probe. Exact "
    "cross-checks: n_vectors (the post-add store must hold every "
    "embedding — a dropped or duplicated row hash-fails) and n_added. "
    "Invariant booleans: store_assign_consistent (EVERY stored row's "
    "cell equals the argmin over the frozen centroids, build-time and "
    "added rows alike — the store invariant that makes rebuild a safe "
    "recovery), recall_floor_ok (index top-10 vs exact brute-force "
    "top-10 overlap >= 3 at n_probe=3; trained cells track cosine "
    "geometry — measured 8/10 at sf0.001), probe_recall_monotone "
    "(n_probe=5 hits >= n_probe=3 hits; the probe-cell rule is the "
    "SHARED similarity.choose_probe_cells, so the prefix property is "
    "structural), probe_prunes_scan (the 3-cell candidate row count < "
    "n_vectors), and probe_prunes_files (the probed cell= partition "
    "dirs hold strictly fewer parquet files than the store — "
    "footer-level evidence the probe's I/O is partition-bounded, "
    "independent of plan inspection; the PartitionFilters plan pin "
    "lives in tests/test_plans.py). The index is built WITH residual "
    "PQ codes (pq_m=4, pq_k=16 — the FAISS IVFADC layout: codes "
    "quantize x - centroid(cell), codebooks freeze into the meta "
    "marker, adds encode with the same frozen rule), adding four "
    "invariants: codes_consistent (EVERY stored row's codes equal the "
    "frozen-codebook recompute via the shared residual_codes_expr — "
    "built and added rows alike), adc_reads_codes_only (the ADC "
    "probe's scan ReadSchema carries codes but NOT the raw vector "
    "column — column pruning stacked on partition pruning, dim floats "
    "-> m ints of I/O per row), adc_rerank_matches_exact_probe "
    "(ADC with rerank >= candidate count re-reads raw vectors for the "
    "shortlist and must equal the exact probe BIT-FOR-BIT — the "
    "two-phase FAISS probe's correctness anchor), and "
    "adc_rerank_recall_floor_ok (ADC shortlist-50 + exact rerank "
    "recalls >= 3 of the true top-10; measured 7/5/6 across the three "
    "SFs — raw 4x16 codes alone recall 3/2/1, which is exactly why "
    "production IVFADC reranks). Store layout can't be expressed in "
    "SQL, hence the property oracle.",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS k,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_added,
           TRUE AS store_assign_consistent,
           TRUE AS recall_floor_ok,
           TRUE AS probe_recall_monotone,
           TRUE AS probe_prunes_scan,
           TRUE AS probe_prunes_files,
           TRUE AS codes_consistent,
           TRUE AS adc_reads_codes_only,
           TRUE AS adc_rerank_matches_exact_probe,
           TRUE AS adc_rerank_recall_floor_ok
    FROM embeddings
    """,
)
def ann_ivf_index_topk(spark, sf_dir):
    import tempfile

    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.operators.kmeans import (
        argmin_index,
    )
    from etl_weather_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        choose_probe_cells,
    )

    tmp = tempfile.mkdtemp(prefix="ann_ivf_index_")
    root = tmp + "/index"
    # every returned value is a DRIVER literal computed before the
    # finally, so the temp index can be removed (r12 leak fix: this
    # query used to leave one index dir behind per invocation)
    import shutil

    try:
        emb = load(spark, sf_dir, "embeddings")
        meta = AX.write_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 0), root, n_cells=8,
            iterations=3, pq_m=4, pq_k=16, pq_iterations=2,
        )
        n_added = AX.add_to_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 1), root
        )
        idx = AX.read_ivf_vectors(spark, root)
        cents = AX.read_ivf_centroid_matrix(spark, root)
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        # ONE pass over the store: size + assignment-consistency + PQ-code
        # consistency mismatches (both recomputes use the SHARED rules —
        # argmin_index / residual_codes_expr — so a drifted build or add
        # path flips a boolean here)
        # eqNullSafe, not !=: a null-element vector (rejected at write time
        # by assign_cells' guard, but conceivable in a hand-written store)
        # nulls the recomputed argmin, and `cell != null` is null — F.count
        # would silently skip exactly the broken rows (r10 advice). The
        # null-safe negation counts them as inconsistent.
        srow = idx.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(
                    ~F.col("cell").eqNullSafe(
                        argmin_index(F.col("embedding"), cents).cast("int")
                    ),
                    1,
                )
            ).alias("bad"),
            F.count(
                F.when(
                    ~F.col("codes").eqNullSafe(
                        AX.residual_codes_expr(
                            "embedding", "cell", cents, meta["pq"]["codebooks"]
                        )
                    ),
                    1,
                )
            ).alias("badc"),
        ).first()
        n_vec, n_bad, n_badc = srow["n"], srow["bad"], srow["badc"]
        exact = brute_force_topk(emb, qv, k=10).select("vec_id")
        top3 = AX.ivf_index_topk(spark, root, qv, k=10, n_probe=3)
        top5 = AX.ivf_index_topk(spark, root, qv, k=10, n_probe=5)
        h3 = top3.select("vec_id").join(exact, "vec_id").count()
        h5 = top5.select("vec_id").join(exact, "vec_id").count()
        # IVFADC: the codes-only probe's scan must NOT read the raw vector
        # column (column pruning stacked on partition pruning); with a
        # candidate-count rerank it must reproduce the exact probe
        # bit-for-bit; with a 50-shortlist it must clear the recall floor
        adc_plan = (
            AX.ivf_index_topk(spark, root, qv, k=10, n_probe=3, method="adc")
            ._jdf.queryExecution().executedPlan().toString()
        )
        rs = [ln for ln in adc_plan.splitlines() if "ReadSchema" in ln]
        adc_codes_only = bool(rs) and all(
            "codes" in ln and "embedding" not in ln for ln in rs
        )
        rr_all = AX.ivf_index_topk(
            spark, root, qv, k=10, n_probe=3, method="adc", rerank=n_vec
        )
        rr_match = [tuple(r) for r in rr_all.collect()] == [
            tuple(r) for r in top3.select("vec_id", "cosine").collect()
        ]
        rr50 = AX.ivf_index_topk(
            spark, root, qv, k=10, n_probe=3, method="adc", rerank=50
        )
        h_rr = rr50.select("vec_id").join(exact, "vec_id").count()
        # candidate volume of the 3-cell probe = rows in the probed files;
        # the probe cells come from the SAME shared selection rule the
        # probes above used (choose_probe_cells), so this is the true volume
        probed_files = AX.probe_partition_files(
            root,
            [
                int(c)
                for c in choose_probe_cells(
                    AX.read_ivf_centroids(spark, root), qv, 3, "cell"
                )
            ],
        )
        # probed cells are the nearest to a query vector that IS in the
        # index, so in practice they hold files — but an empty probed cell
        # writes no dir, and read.parquet() with zero paths raises
        cand3 = (
            spark.read.parquet(*probed_files).count() if probed_files else 0
        )
        n_files_probed = len(probed_files)
        n_files_all = len(AX.all_partition_files(root))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.range(1).select(
        F.lit(10).cast("long").alias("k"),
        F.lit(n_vec).cast("long").alias("n_vectors"),
        F.lit(n_added).cast("long").alias("n_added"),
        F.lit(bool(n_bad == 0)).alias("store_assign_consistent"),
        F.lit(bool(h3 >= 3)).alias("recall_floor_ok"),
        F.lit(bool(h5 >= h3)).alias("probe_recall_monotone"),
        F.lit(bool(cand3 < n_vec)).alias("probe_prunes_scan"),
        F.lit(bool(n_files_probed < n_files_all)).alias(
            "probe_prunes_files"
        ),
        F.lit(bool(n_badc == 0)).alias("codes_consistent"),
        F.lit(bool(adc_codes_only)).alias("adc_reads_codes_only"),
        F.lit(bool(rr_match)).alias("adc_rerank_matches_exact_probe"),
        F.lit(bool(h_rr >= 3)).alias("adc_rerank_recall_floor_ok"),
    )


# pq_fit is deterministic (lowest-id seeds, fixed iteration count), so
# the codebooks are a pure function of the table — memoize per sf_dir
# and the three PQ queries (single / IVF-composed / multi-query) share
# one training run instead of refitting 12 aggregate jobs each.
_PQ_CODEBOOK_CACHE: dict[str, tuple] = {}


def _pq_codebooks(emb, sf_dir):
    from etl_weather_data_pipeline_spark.operators.quantization import (
        pq_fit,
    )

    if sf_dir not in _PQ_CODEBOOK_CACHE:
        _PQ_CODEBOOK_CACHE[sf_dir] = pq_fit(emb, m=4, k=16, iterations=3)
    return _PQ_CODEBOOK_CACHE[sf_dir]


@q(
    "ann_pq_topk_battery",
    "Product-quantization ANN battery (Jegou et al. 2011) — the "
    "consolidation of ann_pq_topk + ann_pq_multi_topk into one driver "
    "slot (identical operator surface, labeled branches, the "
    "set-op/grouping-battery pattern; registry cap policy). Branch "
    "'single' is the memory-side half of 100 TB ANN (IVF prunes WHICH "
    "rows scan; PQ shrinks WHAT scans per row, 64 floats -> 4 "
    "byte-codes = 64x, FAISS IVF-PQ stacks both): per-subspace Lloyd "
    "codebooks (deterministic lowest-id seeding), map-only encoding, "
    "asymmetric-distance shortlist from m table lookups per row (the "
    "m x k exact query->centroid table travels as plan literals), then "
    "the production composition — exact re-rank of the ADC-100 "
    "shortlist. Branch 'multi' is batch ADC serving (the PQ twin of "
    "ann_multi_query_topk's exact broadcast join): the 3-query set "
    "broadcasts, each subspace's 16-entry distance table is built "
    "IN-PLAN from the query-vector column against the literal "
    "codebook (one codegen'd expression serves every query), and a "
    "per-query window takes the shortlist — the codes table never "
    "shuffles before the top-k. The encoded table persists ONCE and "
    "feeds BOTH branches' six consumers (as separate queries each "
    "branch paid its own encode pass — the consolidation deletes one "
    "full PQ-encode of the corpus). Invariant booleans, 'single' row: "
    "re-ranked recall@10 clears the 0.3 tripwire floor (synthetic "
    "embeddings are near-random, the distance-concentration worst "
    "case: measured 0.9/1.0/0.6 across the three SFs), shortlist "
    "recall MONOTONE in shortlist size (ADC-100's id set provably "
    "contains ADC-50's: same deterministic ordering, longer prefix), "
    "every code in [0,16), every subspace's Lloyd SSE non-increasing. "
    "'multi' rows, PER QUERY: the ADC-50 shortlist recalls >= 3 of "
    "that query's exact L2 top-10 (measured minima 5/6/4 across the "
    "three SFs) and shortlist recall is monotone 50 vs 25. Exact "
    "cross-check: n_vectors on every row. Codebooks shared via the "
    "deterministic per-table memo.",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n_vectors FROM embeddings)
    SELECT 'single' AS branch, CAST(0 AS BIGINT) AS q_id,
           CAST(10 AS BIGINT) AS k, n.n_vectors,
           TRUE AS recall_floor_ok, TRUE AS shortlist_recall_monotone,
           TRUE AS codes_in_range, TRUE AS sse_monotone
    FROM n
    UNION ALL
    SELECT 'multi', CAST(u.q AS BIGINT), CAST(10 AS BIGINT),
           n.n_vectors, TRUE, TRUE, TRUE, TRUE
    FROM n, unnest([0, 1, 2]) AS u(q)
    """,
)
def ann_pq_topk_battery(spark, sf_dir):
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from etl_weather_data_pipeline_spark.operators.quantization import (
        pq_adc_topk,
        pq_adc_topk_join,
        pq_encode,
    )

    emb = load(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    codebooks, hists = _pq_codebooks(emb, sf_dir)
    sse_monotone = all(
        later <= earlier * (1 + 1e-9) + 1e-9
        for h in hists
        for earlier, later in zip(h, h[1:])
    )
    enc = pq_encode(emb, codebooks).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(enc)
    # --- branch 'single': ADC shortlists + the exact re-rank read path
    sl50 = pq_adc_topk(enc, codebooks, qv, k=50).select("vec_id")
    sl100 = pq_adc_topk(enc, codebooks, qv, k=100).select("vec_id")
    qlit = VX.double_array(qv)
    exact10 = (
        emb.select(
            "vec_id",
            VX.l2_distance(F.col("embedding"), qlit).alias("__d"),
        )
        .orderBy("__d", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    rerank10 = (
        sl100.join(emb, "vec_id")
        .select(
            "vec_id",
            VX.l2_distance(F.col("embedding"), qlit).alias("__d"),
        )
        .orderBy("__d", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    h_rr = rerank10.join(exact10, "vec_id").agg(
        F.count(F.lit(1)).alias("__hrr")
    )
    h50 = sl50.join(exact10, "vec_id").agg(F.count(F.lit(1)).alias("__h50"))
    h100 = sl100.join(exact10, "vec_id").agg(
        F.count(F.lit(1)).alias("__h100")
    )
    stats = enc.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (
            (F.max(F.array_max("codes")) < F.lit(16))
            & (F.min(F.array_min("codes")) >= F.lit(0))
        ).alias("codes_in_range"),
    )
    single = (
        stats.crossJoin(h_rr)
        .crossJoin(h50)
        .crossJoin(h100)
        .select(
            F.lit("single").alias("branch"),
            F.lit(0).cast("long").alias("q_id"),
            F.lit(10).cast("long").alias("k"),
            "n_vectors",
            (F.col("__hrr") >= F.lit(3)).alias("recall_floor_ok"),
            (F.col("__h100") >= F.col("__h50")).alias(
                "shortlist_recall_monotone"
            ),
            "codes_in_range",
            F.lit(bool(sse_monotone)).alias("sse_monotone"),
        )
    )
    # --- branch 'multi': batch ADC over the broadcast 3-query set ---
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    msl25 = pq_adc_topk_join(enc, codebooks, qs, k=25).select(
        "q_id", "vec_id"
    )
    msl50 = pq_adc_topk_join(enc, codebooks, qs, k=50).select(
        "q_id", "vec_id"
    )
    exw = Window.partitionBy("q_id").orderBy("__d", "vec_id")
    mex10 = (
        emb.crossJoin(F.broadcast(qs))
        .select(
            "q_id",
            "vec_id",
            VX.l2_distance(F.col("embedding"), F.col("q_vec")).alias(
                "__d"
            ),
        )
        .withColumn("__rn", F.row_number().over(exw))
        .filter(F.col("__rn") <= 10)
        .select("q_id", "vec_id")
    )
    mh25 = (
        msl25.join(mex10, ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("__h25"))
    )
    mh50 = (
        msl50.join(mex10, ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("__h50"))
    )
    multi = (
        qs.select("q_id")
        .join(mh50, "q_id", "left")
        .join(mh25, "q_id", "left")
        .crossJoin(stats)
        .select(
            F.lit("multi").alias("branch"),
            F.col("q_id").cast("long").alias("q_id"),
            F.lit(10).cast("long").alias("k"),
            "n_vectors",
            (F.coalesce(F.col("__h50"), F.lit(0)) >= F.lit(3)).alias(
                "recall_floor_ok"
            ),
            (
                F.coalesce(F.col("__h50"), F.lit(0))
                >= F.coalesce(F.col("__h25"), F.lit(0))
            ).alias("shortlist_recall_monotone"),
            "codes_in_range",
            F.lit(bool(sse_monotone)).alias("sse_monotone"),
        )
    )
    return single.unionByName(multi)


_QUALITY_FCOLS = ["f_sw", "f_dr", "f_len"]

# Fitted quality-classifier weights per sf_dir — the _pq_codebooks-style
# memo: full-batch GD with lowest-id-free deterministic aggregates is a
# pure function of the table, so the standalone report and the v2
# curation pipeline share ONE training run (10 iterations = 11
# aggregate jobs) instead of refitting each.
_QUALITY_CLF_CACHE: dict[str, tuple] = {}


def _quality_features(docs):
    """(doc_id, f_sw, f_dr, f_len, y) classifier feature projection —
    shared by doc_quality_classifier (fit + self-check) and
    corpus_curation_pipeline_v2 (scoring stage) so the two can never
    drift. f_len is clamped to [0,1]: the loss_monotone gate rests on
    the 'lr=4.0 is below 2/L' convexity argument and L scales with the
    feature bound — an unclamped length on a longer-doc vintage could
    flip the invariant (r7 ADVICE)."""
    return docs.select(
        "doc_id",
        TX.stopword_ratio(F.col("text")).alias("f_sw"),
        TX.distinct_token_ratio(F.col("text")).alias("f_dr"),
        F.least(F.length("text") / F.lit(2000.0), F.lit(1.0)).alias(
            "f_len"
        ),
    ).withColumn("y", (F.col("f_dr") > F.lit(0.46)).cast("int"))


def _quality_weights(feats, sf_dir):
    """Memoized logreg fit. CONTRACT: ``feats`` must be
    _quality_features over the FULL documents table of ``sf_dir`` (both
    callers build it that way), so whichever query warms the cache,
    every consumer scores with weights trained on the same set."""
    from etl_weather_data_pipeline_spark.operators.logreg import (
        logreg_fit,
    )

    if sf_dir not in _QUALITY_CLF_CACHE:
        _QUALITY_CLF_CACHE[sf_dir] = logreg_fit(
            feats, _QUALITY_FCOLS, "y", lr=4.0, iterations=10
        )
    return _QUALITY_CLF_CACHE[sf_dir]


@q(
    "doc_quality_classifier",
    "Classifier-based quality scoring (the CCNet / LLaMA recipe: train "
    "a linear classifier on cheap text features and filter the crawl "
    "by its score) via full-batch gradient descent as DataFrame "
    "aggregates — weights travel as plan literals, each GD iteration "
    "is ONE map-side pass + one aggregate carrying every partial "
    "gradient AND the loss, driver state is d+1 floats "
    "(operators/logreg.py). The synthetic corpus carries no real "
    "curated-vs-crawl signal, so the label is a PLANTED separable "
    "concept (distinct-token ratio above 0.46) the optimizer must "
    "recover — the self-check that fails if any gradient component is "
    "wrong. Invariant booleans: loss non-increasing EVERY iteration "
    "(convex loss, step below 2/L), final loss well under ln 2 "
    "(measured 0.54 at all three SFs from 0.693), training accuracy "
    "clears 0.85 (measured 0.94/0.99/0.98), finite weights. Exact "
    "cross-check: n_docs.",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           TRUE AS loss_monotone,
           TRUE AS loss_dropped,
           TRUE AS accuracy_floor_ok,
           TRUE AS weights_finite
    FROM documents
    """,
)
def doc_quality_classifier(spark, sf_dir):
    import math

    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.logreg import (
        logreg_score,
    )

    docs = load(spark, sf_dir, "documents")
    fcols = _QUALITY_FCOLS
    # The regex-heavy feature projection feeds 11 GD aggregates plus
    # the final accuracy pass — persist the narrow frame once (bounded
    # registry) instead of re-tokenizing the corpus per pass.
    feats = _quality_features(docs).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(feats)
    w, losses = _quality_weights(feats, sf_dir)
    monotone = all(b <= a + 1e-12 for a, b in zip(losses, losses[1:]))
    correct = (
        (logreg_score(fcols, w) > 0.5).cast("int") == F.col("y")
    ).cast("int")
    return feats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.lit(bool(monotone)).alias("loss_monotone"),
        F.lit(bool(losses[-1] < 0.65)).alias("loss_dropped"),
        (F.avg(correct) >= F.lit(0.85)).alias("accuracy_floor_ok"),
        F.lit(all(math.isfinite(x) for x in w)).alias("weights_finite"),
    )


# Trained-tokenizer state per (session, sf_dir) — merges, final vocab,
# base total. bpe_train is deterministic (count-DESC/lexicographic pair
# selection, greedy fold), so one 8-merge training run serves both the
# merge report and the application query. Unlike the float-only PQ
# memos, the cached vocab is a localCheckpointed DataFrame whose RDD
# dies with its SparkContext, so the key includes the application id —
# a session restart in the same Python process retrains instead of
# dereferencing a dead checkpoint.
_BPE_STATE: dict[tuple[str, str], tuple] = {}


def _bpe_state(docs, sf_dir):
    from etl_weather_data_pipeline_spark.operators.bpe import bpe_train

    key = (docs.sparkSession.sparkContext.applicationId, sf_dir)
    if key not in _BPE_STATE:
        _BPE_STATE[key] = bpe_train(docs, n_merges=8)
    return _BPE_STATE[key]


@q(
    "corpus_bpe_merges",
    "BPE tokenizer training (Sennrich et al. 2016 — the GPT/LLaMA "
    "tokenizer algorithm) as an iterative DataFrame loop: collapse the "
    "corpus to (word-type, count) ONCE (the only full-corpus pass — a "
    "100 TB corpus has a bounded word-type set, so every merge round "
    "is a small explode + hash aggregate on that table), then 8 rounds "
    "of most-frequent-adjacent-pair selection (count DESC, "
    "lexicographic tie-break: deterministic) and greedy left-to-right "
    "merge application via a codegen'd fold; one job per round "
    "(operators/components.py checkpoint pattern). Merge CONTENT "
    "(pair strings/counts) can't be mirrored without replicating the "
    "loop, so the oracled surface is the invariants: per-round "
    "booleans pin positive pair counts and a STRICTLY decreasing "
    "weighted symbol total (greedy always applies the selected pair "
    "at least once — a broken fold flips it), and the exact "
    "cross-check is the word-type count both engines compute "
    "independently. Merge sequence itself is pinned on a classic toy "
    "corpus in tests/test_llmops.py.",
    oracle=f"""
    WITH wt AS (
      SELECT COUNT(DISTINCT t) AS n_word_types
      FROM (SELECT unnest({O_TOKS}) AS t FROM documents))
    SELECT CAST(u.m AS INT) AS merge_idx,
           wt.n_word_types,
           TRUE AS pair_count_positive,
           TRUE AS symbols_decreasing
    FROM wt, unnest(range(8)) AS u(m)
    """,
)
def corpus_bpe_merges(spark, sf_dir):
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StructField,
        StructType,
    )

    docs = load(spark, sf_dir, "documents")
    merges, vocab, base_total = _bpe_state(docs, sf_dir)
    # The oracle emits exactly 8 rows (unnest(range(8))); bpe_train can
    # early-stop if the pair table empties (vocab of single-symbol
    # words). That cannot happen on a real corpus — fail LOUDLY here so
    # a testdata drift surfaces as this message, not as a confusing
    # row-count mismatch at the driver gate (ASCII-guard precedent).
    if len(merges) != 8:
        raise AssertionError(
            f"bpe_train early-stopped at {len(merges)}/8 merges — "
            "corpus vocab too small for the oracle's fixed row count"
        )
    prev = [base_total] + [m.total_symbols_after for m in merges[:-1]]
    rows = [
        (
            m.merge_idx,
            m.pair_count > 0,
            m.total_symbols_after < p,
        )
        for m, p in zip(merges, prev)
    ]
    schema = StructType(
        [
            StructField("merge_idx", IntegerType()),
            StructField("pair_count_positive", BooleanType()),
            StructField("symbols_decreasing", BooleanType()),
        ]
    )
    return (
        spark.createDataFrame(rows, schema)
        .crossJoin(
            vocab.agg(F.count(F.lit(1)).alias("n_word_types"))
        )
        .select(
            "merge_idx",
            "n_word_types",
            "pair_count_positive",
            "symbols_decreasing",
        )
    )


@q(
    "corpus_bpe_apply",
    "Trained-tokenizer APPLICATION (the other half of corpus_bpe_merges "
    "— what a data pipeline actually runs per batch once the tokenizer "
    "is frozen): per-source doc/word/BPE-token totals under the trained "
    "8-merge segmentation, via operators/bpe.py bpe_token_counts — "
    "explode words, broadcast the bounded word-type vocab, sum segment "
    "counts; the fact side never shuffles before the per-source "
    "aggregate. Training is shared with corpus_bpe_merges through the "
    "deterministic per-table memo (one run serves both). Segment "
    "counts depend on the learned merges (not SQL-mirrorable without "
    "replaying the loop), so the oracled surface is: EXACT per-source "
    "n_docs and n_words, plus invariant booleans — every doc's BPE "
    "token count lies in [n_words, n_chars + n_words] (a word is at "
    "least one symbol and at most chars+1 — merges only shrink), and "
    "the corpus-wide token total EQUALS the training loop's final "
    "weighted symbol total (scored corpus == training corpus and every "
    "word is in-vocab, so application must conserve what training "
    "measured — a broken merge application or OOV fallback flips it).",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len({O_TOKS})) AS BIGINT) AS n_words,
           TRUE AS bpe_within_bounds,
           TRUE AS conserves_training_total
    FROM documents GROUP BY source
    """,
)
def corpus_bpe_apply(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.bpe import (
        bpe_token_counts,
    )

    docs = load(spark, sf_dir, "documents")
    merges, vocab, base_total = _bpe_state(docs, sf_dir)
    final_total = (
        merges[-1].total_symbols_after if merges else base_total
    )
    per = bpe_token_counts(docs, vocab)
    meta = docs.select(
        "doc_id",
        "source",
        F.aggregate(
            TX.tokens(F.col("text")),
            F.lit(0),
            lambda acc, x: acc + F.length(x),
        ).alias("__chars"),
    )
    j = per.join(meta, "doc_id")
    in_bounds = (F.col("n_bpe_tokens") >= F.col("n_words")) & (
        F.col("n_bpe_tokens") <= F.col("__chars") + F.col("n_words")
    )
    tot = j.agg(F.sum("n_bpe_tokens").alias("__tot"))
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.min(in_bounds).alias("bpe_within_bounds"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_words",
            "bpe_within_bounds",
            (F.col("__tot") == F.lit(final_total)).alias(
                "conserves_training_total"
            ),
        )
    )


@q(
    "corpus_curriculum_stages",
    "Curriculum-ordered training stages: rank the corpus by an "
    "easy-to-hard proxy (distinct-token ratio — repetitive/boilerplate "
    "docs first, information-dense last), cut into 4 equal stages, and "
    "report each stage's doc count, token budget, and score range — "
    "the stage manifest a curriculum-learning run consumes (feed "
    "stages in order; the companion export_training_shards writes the "
    "files). The ordering key is an exact int/int ratio (ties to "
    "doc_id) so both engines rank identically. The exact ntile needs a "
    "full ordering — fine for this manifest; at 100 TB the SAME stage "
    "assignment comes from approx-percentile score cutoffs + a "
    "map-side bucket join (the events_mad_outliers exact/approx "
    "pattern applies).",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(list_distinct({O_TOKS})) AS DOUBLE)
               / len({O_TOKS}) AS score,
             len({O_TOKS}) AS n_toks
      FROM documents),
    staged AS (
      SELECT ntile(4) OVER (ORDER BY score, doc_id) AS stage,
             score, n_toks
      FROM scored)
    SELECT CAST(stage AS INT) AS stage,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS stage_tokens,
           {o_dround('MIN(score)', 6)} AS score_min,
           {o_dround('MAX(score)', 6)} AS score_max
    FROM staged GROUP BY stage
    """,
)
def corpus_curriculum_stages(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        TX.distinct_token_ratio(F.col("text")).alias("__score"),
        F.size(TX.tokens(F.col("text"))).cast("long").alias("__n_toks"),
    )
    staged = scored.select(
        F.ntile(4)
        .over(Window.orderBy("__score", "doc_id"))
        .alias("stage"),
        "__score",
        "__n_toks",
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n_toks").alias("stage_tokens"),
        dround(F.min("__score"), 6).alias("score_min"),
        dround(F.max("__score"), 6).alias("score_max"),
    )


@q(
    "ann_ivfpq_topk",
    "The full IVF-PQ stack (the FAISS production composition, both "
    "halves from this repo's operators): IVF probes the 3 label cells "
    "nearest the query centroid (WHICH rows scan shrinks by "
    "cells/n_probe — at 100 TB the table is clustered by cell, so this "
    "is partition pruning), then PQ answers INSIDE the probed cells "
    "with asymmetric-distance table lookups over byte-codes (WHAT "
    "scans per row shrinks 64x), then exact re-rank of the ADC-50 "
    "shortlist. Codebooks train globally (as production does — one "
    "codebook serves every cell), encoding is map-only on the pruned "
    "scan. Invariant booleans: re-ranked recall@10 vs the IN-CELL "
    "exact top-10 clears the 0.3 tripwire (measured 0.9/0.8/0.6 "
    "across SFs; in-cell is the right truth — cell-selection loss is "
    "ann_ivf_topk's separately-measured concern), shortlist recall "
    "monotone in size (same deterministic ordering, longer prefix), "
    "and the probe genuinely prunes (in-cell count < corpus count). "
    "Two-phase probe selection -> property oracle, like ann_ivf_topk.",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS k,
           TRUE AS recall_floor_ok,
           TRUE AS shortlist_recall_monotone,
           TRUE AS probe_prunes_scan
    """,
)
def ann_ivfpq_topk(spark, sf_dir):
    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.quantization import (
        pq_adc_topk,
        pq_encode,
    )
    from etl_weather_data_pipeline_spark.operators.similarity import (
        cell_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    qlit = VX.double_array(qv)
    cents = cell_centroids(emb)
    # probe selection: cell id breaks similarity ties (determinism —
    # same rationale as ivf_topk)
    probe = [
        r["label"]
        for r in cents.select(
            "label", VX.cosine(F.col("centroid"), qlit).alias("__s")
        )
        .orderBy(F.col("__s").desc(), "label")
        .limit(3)
        .collect()
    ]
    pruned = emb.filter(F.col("label").isin(probe)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _CURATION_PERSISTED.append(pruned)
    codebooks, _ = _pq_codebooks(emb, sf_dir)
    enc = pq_encode(pruned, codebooks).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(enc)
    sl25 = pq_adc_topk(enc, codebooks, qv, k=25).select("vec_id")
    sl50 = pq_adc_topk(enc, codebooks, qv, k=50).select("vec_id")
    incell10 = (
        pruned.select(
            "vec_id",
            VX.l2_distance(F.col("embedding"), qlit).alias("__d"),
        )
        .orderBy("__d", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    rerank10 = (
        sl50.join(pruned, "vec_id")
        .select(
            "vec_id",
            VX.l2_distance(F.col("embedding"), qlit).alias("__d"),
        )
        .orderBy("__d", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    h_rr = rerank10.join(incell10, "vec_id").agg(
        F.count(F.lit(1)).alias("__hrr")
    )
    h25 = sl25.join(incell10, "vec_id").agg(
        F.count(F.lit(1)).alias("__h25")
    )
    h50 = sl50.join(incell10, "vec_id").agg(
        F.count(F.lit(1)).alias("__h50")
    )
    n_in = pruned.agg(F.count(F.lit(1)).alias("__n_in"))
    n_all = emb.agg(F.count(F.lit(1)).alias("__n_all"))
    return (
        h_rr.crossJoin(h25)
        .crossJoin(h50)
        .crossJoin(n_in)
        .crossJoin(n_all)
        .select(
            F.lit(10).cast("long").alias("k"),
            (F.col("__hrr") >= F.lit(3)).alias("recall_floor_ok"),
            (F.col("__h50") >= F.col("__h25")).alias(
                "shortlist_recall_monotone"
            ),
            (F.col("__n_in") < F.col("__n_all")).alias("probe_prunes_scan"),
        )
    )


# Residual IVF-PQ state per sf_dir: the full cell-centroid map (cells ×
# dim floats) plus codebooks trained on r = x − centroid(cell). Both are
# deterministic functions of the table (mean centroids; lowest-id Lloyd
# seeds), so the memo shares one training run across queries/sessions
# the way _pq_codebooks does.
_PQ_RES_CACHE: dict[str, tuple] = {}


def _pq_residual_state(emb, sf_dir):
    from etl_weather_data_pipeline_spark.operators.quantization import (
        pq_fit,
        pq_residual_frame,
    )
    from etl_weather_data_pipeline_spark.operators.similarity import (
        cell_centroids,
    )

    if sf_dir not in _PQ_RES_CACHE:
        cents_map = {
            r["label"]: [float(x) for x in r["centroid"]]
            for r in cell_centroids(emb).collect()
        }
        rf = pq_residual_frame(emb, cents_map)
        codebooks, hists = pq_fit(
            rf, m=4, k=16, iterations=3, vec_col="__res"
        )
        _PQ_RES_CACHE[sf_dir] = (cents_map, codebooks, hists)
    return _PQ_RES_CACHE[sf_dir]


@q(
    "ann_ivfpq_residual_topk",
    "IVF-PQ with RESIDUAL encoding — the actual FAISS IVFPQ "
    "composition (Jegou et al. 2011 §IV; the r7 whole-vector variant "
    "was the honest half-step): codes quantize r = x − centroid(cell), "
    "whose energy is what remains AFTER the coarse quantizer explains "
    "the cell, so the same byte budget codes a tighter distribution; "
    "the query side residualizes per probed cell (one m × 16 LUT per "
    "cell, n_probe·m·16 driver floats as plan literals) which adds the "
    "centroid term back exactly. Residualization and encoding are "
    "map-only (centroid matrix = when-chain literals, no join); ADC is "
    "m lookups via a label-routed when-chain, all codegen. Invariant "
    "booleans: re-ranked recall@10 vs in-cell exact clears the 0.3 "
    "tripwire, shortlist recall monotone (ADC-50 ⊇ ADC-25, same "
    "deterministic order), probe genuinely prunes, residual Lloyd SSE "
    "non-increasing, and the HEADLINE claim — residual codes are "
    "TIGHTER than whole-vector codes at the identical byte budget: "
    "full-table squared reconstruction error, residual decode "
    "(centroid + codebook) vs whole decode, measured in THIS query "
    "with both paths sharing the scan. Reconstruction error — not a "
    "single query's recall@10 — is the right comparison: residual "
    "coding provably shrinks the coded distribution (ANOVA: within- "
    "cell SS <= total SS, strict when any cell means differ) and the "
    "measured gap holds at all three SFs (359<365 / 358<365 / "
    "1541<1547), while per-query recall deltas on these near-random "
    "synthetic embeddings are distance-concentration coin flips "
    "(measured rerank hits res-vs-whole at sf0.01: 7v8, 10v8, 6v9, "
    "8v9, 8v8). Exact cross-check: n_vectors.",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS k,
           COUNT(*) AS n_vectors,
           TRUE AS recall_floor_ok,
           TRUE AS shortlist_recall_monotone,
           TRUE AS probe_prunes_scan,
           TRUE AS sse_monotone,
           TRUE AS residual_tighter_codes
    FROM embeddings
    """,
)
def ann_ivfpq_residual_topk(spark, sf_dir):
    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.quantization import (
        pq_adc_topk_residual,
        pq_encode,
        pq_recon_sqerr,
        pq_residual_frame,
    )

    emb = load(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    qlit = VX.double_array(qv)
    cents_map, res_codebooks, res_hists = _pq_residual_state(emb, sf_dir)
    sse_monotone = all(
        later <= earlier * (1 + 1e-9) + 1e-9
        for h in res_hists
        for earlier, later in zip(h, h[1:])
    )
    # probe selection identical to ann_ivfpq_topk (centroids from the
    # same map — no second centroid pass)
    import math

    def _cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b)
        )
        return num / den if den else 0.0

    probe = [
        lbl
        for lbl, _ in sorted(
            ((lbl, _cos(c, qv)) for lbl, c in cents_map.items()),
            key=lambda t: (-t[1], t[0]),
        )[:3]
    ]
    pruned = emb.filter(F.col("label").isin(probe)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _CURATION_PERSISTED.append(pruned)
    enc_res = pq_encode(
        pq_residual_frame(pruned, cents_map),
        res_codebooks,
        vec_col="__res",
        keep_cols=("label",),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(enc_res)
    sl25 = pq_adc_topk_residual(
        enc_res, res_codebooks, cents_map, qv, probe, k=25
    ).select("vec_id")
    sl50 = pq_adc_topk_residual(
        enc_res, res_codebooks, cents_map, qv, probe, k=50
    ).select("vec_id")
    # code-tightness comparison vs the whole-vector design, full table,
    # both encodes + reconstructions in single map-side passes (the
    # residual one rides its __res column along — no join)
    whole_codebooks, _ = _pq_codebooks(emb, sf_dir)
    rf_full = pq_residual_frame(emb, cents_map)
    err_res = pq_encode(
        rf_full, res_codebooks, vec_col="__res", keep_cols=("__res",)
    ).agg(
        F.sum(pq_recon_sqerr(res_codebooks, "__res")).alias("__err_res")
    )
    err_whole = pq_encode(
        emb, whole_codebooks, keep_cols=("embedding",)
    ).agg(
        F.sum(pq_recon_sqerr(whole_codebooks, "embedding")).alias(
            "__err_whole"
        )
    )
    incell10 = (
        pruned.select(
            "vec_id",
            VX.l2_distance(F.col("embedding"), qlit).alias("__d"),
        )
        .orderBy("__d", "vec_id")
        .limit(10)
        .select("vec_id")
    )

    def _rerank_hits(shortlist):
        r10 = (
            shortlist.join(pruned, "vec_id")
            .select(
                "vec_id",
                VX.l2_distance(F.col("embedding"), qlit).alias("__d"),
            )
            .orderBy("__d", "vec_id")
            .limit(10)
            .select("vec_id")
        )
        return r10.join(incell10, "vec_id").agg(
            F.count(F.lit(1)).alias("__h")
        )

    h_rr = _rerank_hits(sl50).withColumnRenamed("__h", "__hrr")
    h25 = sl25.join(incell10, "vec_id").agg(
        F.count(F.lit(1)).alias("__h25")
    )
    h50 = sl50.join(incell10, "vec_id").agg(
        F.count(F.lit(1)).alias("__h50")
    )
    n_in = pruned.agg(F.count(F.lit(1)).alias("__n_in"))
    n_all = emb.agg(F.count(F.lit(1)).alias("__n_all"))
    return (
        h_rr.crossJoin(h25)
        .crossJoin(h50)
        .crossJoin(n_in)
        .crossJoin(n_all)
        .crossJoin(err_res)
        .crossJoin(err_whole)
        .select(
            F.lit(10).cast("long").alias("k"),
            F.col("__n_all").cast("long").alias("n_vectors"),
            (F.col("__hrr") >= F.lit(3)).alias("recall_floor_ok"),
            (F.col("__h50") >= F.col("__h25")).alias(
                "shortlist_recall_monotone"
            ),
            (F.col("__n_in") < F.col("__n_all")).alias(
                "probe_prunes_scan"
            ),
            F.lit(bool(sse_monotone)).alias("sse_monotone"),
            (F.col("__err_res") < F.col("__err_whole")).alias(
                "residual_tighter_codes"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary columns + typed metadata)
# ---------------------------------------------------------------------------


@q(
    "multimodal_binary_features",
    "Opaque-binary plumbing: treat text bytes as a payload column, extract "
    "byte length + head-bytes hex key (the JVM-side half of multimodal "
    "feature extraction; the decode stub is in streaming/multimodal.py).",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           lower(hex(encode(substr(text, 1, 8)))) AS head_hex
    FROM documents
    """,
)
def multimodal_binary_features(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.col("text")).alias("byte_len"),
        F.lower(F.hex(F.encode(F.substring(F.col("text"), 1, 8), "utf-8"))).alias(
            "head_hex"
        ),
    )


@q(
    "embedding_lsh_buckets",
    "Random-hyperplane LSH bucketing (the cheap ANN cell assignment when "
    "no centroids exist): one sign bit per fixed plane packed into a "
    "bucket id; bucket histogram. Map-only + one tiny agg.",
    oracle=f"""
    SELECT {_o_lsh_bucket(_lsh_planes())} AS bucket,
           COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec_id
    FROM embeddings GROUP BY 1
    """,
)
def embedding_lsh_buckets(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.similarity import lsh_bucket

    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select(
            lsh_bucket(F.col("embedding"), _lsh_planes()).alias("bucket"),
            "vec_id",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


@q(
    "corpus_vocab_stats",
    "Corpus-level vocabulary statistics: per-token document frequency and "
    "total count (explode -> two-level agg; the building block for TF-IDF "
    "and stopword discovery at corpus scale).",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({O_TOKS}) AS token FROM documents)
    SELECT token,
           COUNT(*) AS total_count,
           COUNT(DISTINCT doc_id) AS doc_freq
    FROM tok GROUP BY token
    """,
)
def corpus_vocab_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("total_count"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )


# Fixed "benchmark" phrases for the decontamination demo — in production
# this set comes from the eval suites' n-grams and is broadcast the same
# way (it is small relative to the corpus by construction).
_BENCH_PHRASES = [
    "the quick brown",
    "lorem ipsum dolor",
    "to be or",
    "data science is",
]


@q(
    "doc_contamination_flags",
    "Benchmark decontamination: flag documents whose 3-word shingles "
    "overlap a benchmark phrase set. The phrase set is tiny by "
    "construction -> broadcast semi-join against the exploded shingles "
    "(one scan, no shuffle of the corpus); flagged docs are dropped "
    "before training so eval answers never leak into the training set.",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({O_SHINGLES}) AS shingle FROM documents),
    flagged AS (
      SELECT DISTINCT doc_id FROM sh
      WHERE shingle IN ({", ".join(f"'{p}'" for p in _BENCH_PHRASES)}))
    SELECT d.doc_id, d.lang,
           (f.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
    """,
)
def doc_contamination_flags(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("__t")
    )
    sh = toked.select(
        "doc_id",
        F.explode_outer(TX.word_shingles_of(F.col("__t"), 3)).alias("__s"),
    )
    flagged = (
        sh.filter(F.col("__s").isin(_BENCH_PHRASES))
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(flagged), "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("contaminated"), F.lit(False)).alias(
                "contaminated"
            ),
        )
    )


@q(
    "source_quality_stats",
    "Per-source curation dashboard: doc count, exact-duplicate rate "
    "(1 - distinct fingerprints / docs), language diversity, token "
    "budget, and ok-quality share. The decide-what-to-crawl-more view; "
    "one hash aggregate over map-side expressions.",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           {o_dround("1.0 - CAST(COUNT(DISTINCT " + O_FINGERPRINT + ") AS DOUBLE)"
                     " / COUNT(*)", 6)} AS dup_rate,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(len({O_TOKS})) AS BIGINT) AS ws_tokens,
           {o_dround("CAST(COUNT(*) FILTER (WHERE " + _O_QUALITY + " = 'ok') AS DOUBLE)"
                     " / COUNT(*)", 6)} AS ok_share
    FROM documents GROUP BY source
    """,
)
def source_quality_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    quality = TX.quality_bucket(
        TX.token_count(text),
        TX.stopword_ratio(text),
        TX.distinct_token_ratio(text),
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dround(
            F.lit(1.0)
            - F.countDistinct(TX.fingerprint(text)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(TX.token_count(text).cast("long")).alias("ws_tokens"),
        dround(
            F.count(F.when(quality == "ok", 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("ok_share"),
    )


@q(
    "doc_pii_scrub",
    "PII scrubbing: count + redact emails and long digit runs (chained "
    "global regexp_replace; ASCII patterns so Java and RE2 agree). "
    "Output carries the scrubbed text's md5 so the oracle verifies the "
    "REDACTION ITSELF, not just the counts. Map-only.",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text,
               '{TX.PII_EMAIL}', 0)) AS n_emails,
           len(regexp_extract_all(text,
               '{TX.PII_LONG_DIGITS}', 0)) AS n_long_digits,
           md5(regexp_replace(regexp_replace(text,
               '{TX.PII_EMAIL}', '<EMAIL>', 'g'),
               '{TX.PII_LONG_DIGITS}', '<NUM>', 'g')) AS scrubbed_md5
    FROM documents
    """,
)
def doc_pii_scrub(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n_email, n_digits = TX.pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_digits.alias("n_long_digits"),
        F.md5(TX.pii_scrub(F.col("text"))).alias("scrubbed_md5"),
    )


@q(
    "corpus_train_split",
    "Deterministic train/val/test assignment (80/10/10) from a hash of "
    "the doc id — reproducible across runs, engines, partitionings, and "
    "corpus growth (a doc NEVER changes split when new data arrives), "
    "unlike the RNG-seeded df.sample/sampleBy. Map-only, no shuffle "
    "except the summary aggregate.",
    oracle="""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 1000 < 800 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 1000 < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT lang, split, COUNT(*) AS n_docs
    FROM assigned GROUP BY lang, split
    """,
)
def corpus_train_split(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.sampling import (
        assign_split,
    )

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang", assign_split(F.col("doc_id"), 0.8, 0.1).alias("split")
        )
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@q(
    "doc_stratified_sample",
    "Exactly 20 docs per language, picked deterministically: rank within "
    "each stratum by (md5(doc_id), doc_id), keep the first 20 — a "
    "pseudo-random yet fully reproducible stratified sample "
    "(WindowGroupLimit caps each partition's rows per group before the "
    "shuffle).",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT doc_id, lang FROM ranked WHERE rn <= 20
    """,
)
def doc_stratified_sample(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.sampling import (
        stratified_take_n,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_take_n(docs, ["lang"], 20, "doc_id")


@q(
    "doc_tfidf_top_terms",
    "Top-3 TF-IDF terms per document: token explode -> tf (per doc) and "
    "df (per corpus) aggregates -> score join -> windowed top-k. The "
    "corpus size N enters the plan as a broadcast 1-row aggregate (no "
    "driver round-trip); scores are decimal-rounded BEFORE ranking so the "
    "sort order can't flip on engine-specific ln() last-ulp noise.",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({O_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df
              FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT t.doc_id, t.token,
             {o_dround("t.tf * ln(n.n / d.df)", 6)} AS tfidf
      FROM tf t JOIN dfreq d USING (token), n),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rn
      FROM scored)
    SELECT doc_id, token, tfidf FROM ranked WHERE rn <= 3
    """,
)
def doc_tfidf_top_terms(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            dround(
                F.col("tf") * F.log(F.col("n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tfidf")
    )


@q(
    "label_centroids",
    "Per-cell embedding centroids, one row per (label, dimension) — the "
    "precompute for IVF ANN. posexplode -> partial+final decimal-backed "
    "mean; linear in rows x dims, no driver collect.",
    oracle="""
    WITH ex AS (
      SELECT label,
             unnest(list_transform(embedding, (v, i) -> {'pos': i, 'v': v}))
                 AS pv
      FROM embeddings)
    SELECT label, CAST(pv.pos AS INT) AS pos,
           CAST(ROUND(CAST(
             CAST(SUM(CAST(pv.v AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*) AS DECIMAL(28,10)), 6) AS DOUBLE) AS centroid
    FROM ex GROUP BY label, pv.pos
    """,
)
def label_centroids(spark, sf_dir):
    from etl_weather_data_pipeline_spark.plans.catalog import dround

    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).alias("pos"), "v")
    mean = (
        F.sum(F.col("v").cast("decimal(18,9)")).cast("double")
        / F.count(F.lit(1))
    )
    return exploded.groupBy("label", "pos").agg(
        dround(mean, 6).alias("centroid")
    )


# ---------------------------------------------------------------------------
# Round-3 curation additions: estimate ladder, span dedup, quantile gating,
# quantization, dup-graph stats, repetition, length histogram
# ---------------------------------------------------------------------------


@q(
    "doc_minhash_jaccard_estimate",
    "Signature-based Jaccard ESTIMATE on LSH candidate pairs — the cheap "
    "middle rung of the dedup ladder (band -> estimate -> exact verify): "
    "est = fraction of matching minhash values, computed from the 8-long "
    "signatures already in hand, no token arrays touched. At 100 TB the "
    "estimate prunes most candidates before the exact verify's array "
    "intersects; persist the signature table to share it between the "
    "banding and estimate joins (the curation flagship shows the pattern).",
    oracle=f"""
    WITH {_o_lsh_ctes(8, 4)}
    SELECT c.id_a, c.id_b,
           CAST({' + '.join(
               f'(CASE WHEN l.h{i} = r.h{i} THEN 1 ELSE 0 END)'
               for i in range(8))} AS DOUBLE) / 8.0 AS jaccard_est
    FROM cand c JOIN sig l ON l.doc_id = c.id_a
                JOIN sig r ON r.doc_id = c.id_b
    """,
)
def doc_minhash_jaccard_estimate(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = load(spark, sf_dir, "documents")
    sig = AR.shared_minhash_sigs(spark, sf_dir)
    cand = minhash_lsh_pairs(docs, num_hashes=8, bands=4, signatures=sig)
    left = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"h{i}").alias(f"__la{i}") for i in range(8)],
    )
    right = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"h{i}").alias(f"__lb{i}") for i in range(8)],
    )
    matches = sum(
        F.when(F.col(f"__la{i}") == F.col(f"__lb{i}"), 1).otherwise(0)
        for i in range(8)
    )
    return (
        cand.join(left, "id_a")
        .join(right, "id_b")
        .select(
            "id_a",
            "id_b",
            (matches.cast("double") / F.lit(8.0)).alias("jaccard_est"),
        )
    )


_SPAN_W = 8


@q(
    "doc_span_dedup",
    "Span-level (pseudo-paragraph) boilerplate detection: chunk each doc "
    "into consecutive 8-token spans, find spans occurring in >= 2 distinct "
    "docs. The line/span-level dedup every LLM corpus pipeline runs on "
    "headers/footers/license blocks. Map-only chunking (tokens projected "
    "once, explode_outer to dodge the inferred-filter recompute trap) + "
    "one hash aggregate on the span string.",
    oracle=f"""
    WITH toked AS (SELECT doc_id, {O_TOKS} AS t FROM documents),
    spans AS (
      SELECT doc_id, s.span
      FROM toked, unnest(list_transform(
             range(0, CAST(ceil(len(t) / {_SPAN_W}.0) AS INT)),
             i -> array_to_string(t[i*{_SPAN_W}+1 : i*{_SPAN_W}+{_SPAN_W}], ' ')
           )) AS s(span))
    SELECT span, COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences, MIN(doc_id) AS first_doc_id
    FROM spans GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def doc_span_dedup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TX.tokens(F.col("text")).alias("__t"))
    n_spans = F.ceil(F.size("__t") / F.lit(float(_SPAN_W))).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - F.lit(1)),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("__t"), i * _SPAN_W + F.lit(1), F.lit(_SPAN_W))
        ),
    )
    ex = toked.select("doc_id", F.explode_outer(spans).alias("span")).filter(
        F.col("span").isNotNull()
    )
    return (
        ex.groupBy("span")
        .agg(
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@q(
    "doc_quality_quantile_filter",
    "Quantile-based quality gating PER SOURCE: percent_rank of the "
    "distinct-token-ratio score within each source, drop the bottom decile "
    "— relative thresholds track each source's own distribution instead of "
    "a global cutoff that over-prunes clean sources. One window shuffle on "
    "source; the rank ordering key is an exact int/int ratio so both "
    "engines rank identically.",
    oracle=f"""
    SELECT doc_id, source,
           {o_dround('score', 6)} AS score,
           {o_dround('pct_rank', 6)} AS pct_rank
    FROM (
      SELECT doc_id, source,
             CAST(len(list_distinct({O_TOKS})) AS DOUBLE) / len({O_TOKS})
               AS score,
             percent_rank() OVER (
               PARTITION BY source
               ORDER BY CAST(len(list_distinct({O_TOKS})) AS DOUBLE)
                          / len({O_TOKS})) AS pct_rank
      FROM documents)
    WHERE pct_rank >= 0.1
    """,
)
def doc_quality_quantile_filter(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        TX.distinct_token_ratio(F.col("text")).alias("__score"),
    )
    pr = F.percent_rank().over(
        Window.partitionBy("source").orderBy("__score")
    )
    return (
        scored.select(
            "doc_id",
            "source",
            F.col("__score").alias("__s"),
            pr.alias("__pr"),
        )
        .filter(F.col("__pr") >= 0.1)
        .select(
            "doc_id",
            "source",
            dround(F.col("__s"), 6).alias("score"),
            dround(F.col("__pr"), 6).alias("pct_rank"),
        )
    )


@q(
    "embedding_quantize_stats",
    "L2-normalize + int8-quantize every embedding (the storage/ANN "
    "compression step), reporting scalar stats per vector (norm, "
    "quantized sum/min/max — scalars because the driver canonicalizer "
    "cannot sort array cells). One posexplode; the window norm and the "
    "final aggregate share the vec_id shuffle. Determinism: the squared "
    "sum goes through decimal so both engines accumulate exactly; "
    "sqrt/division/floor are then bit-identical IEEE ops.",
    oracle="""
    WITH ex AS (
      SELECT vec_id, CAST(u.v AS DOUBLE) AS v
      FROM embeddings, unnest(embedding) AS u(v)),
    n AS (
      SELECT vec_id, v,
             CAST(SUM(CAST(v*v AS DECIMAL(28,10)))
                  OVER (PARTITION BY vec_id) AS DOUBLE) AS norm2
      FROM ex),
    qv AS (
      SELECT vec_id, norm2,
             CASE WHEN norm2 > 0
                  THEN CAST(floor(v * 127.0 / sqrt(norm2)) AS BIGINT)
                  ELSE 0 END AS q
      FROM n)
    SELECT vec_id,
           CAST(ROUND(CAST(sqrt(norm2) AS DECIMAL(28,10)), 6) AS DOUBLE)
             AS l2_norm,
           CAST(SUM(q) AS BIGINT) AS q_sum,
           MIN(q) AS q_min, MAX(q) AS q_max
    FROM qv GROUP BY vec_id, norm2
    """,
)
def embedding_quantize_stats(spark, sf_dir):
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("__pos", "__vf")
    ).select("vec_id", F.col("__vf").cast("double").alias("__v"))
    w = Window.partitionBy("vec_id")
    n = ex.select(
        "vec_id",
        "__v",
        F.sum((F.col("__v") * F.col("__v")).cast("decimal(28,10)"))
        .over(w)
        .cast("double")
        .alias("__norm2"),
    )
    q = F.when(
        F.col("__norm2") > 0,
        F.floor(F.col("__v") * 127.0 / F.sqrt(F.col("__norm2"))).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        n.select("vec_id", "__norm2", q.alias("__q"))
        .groupBy("vec_id", "__norm2")
        .agg(
            F.sum("__q").alias("q_sum"),
            F.min("__q").alias("q_min"),
            F.max("__q").alias("q_max"),
        )
        .select(
            "vec_id",
            dround(F.sqrt(F.col("__norm2")), 6).alias("l2_norm"),
            "q_sum",
            "q_min",
            "q_max",
        )
    )


@q(
    "neardup_degree_stats",
    "Near-dup graph degree per document (how many verified partners each "
    "doc has) — the diagnostic that finds template/boilerplate hubs before "
    "clustering. Verified pairs -> union both endpoints -> one count "
    "aggregate.",
    oracle=f"""
    WITH {_o_lsh_ctes(8, 4)},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM documents),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    ends AS (SELECT id_a AS doc_id FROM pairs
             UNION ALL SELECT id_b FROM pairs)
    SELECT doc_id, COUNT(*) AS degree FROM ends GROUP BY doc_id
    """,
)
def neardup_degree_stats(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
    )
    pairs = jaccard_verify(
        docs, cand, threshold=0.5,
        toksets=AR.shared_token_sets(spark, sf_dir),
    ).select("id_a", "id_b")
    ends = pairs.select(F.col("id_a").alias("doc_id")).unionAll(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    return ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))


@q(
    "neardup_transitivity_stats",
    "Near-dup graph transitivity report: nodes/edges/wedges/triangles "
    "and the global clustering coefficient (3*triangles / wedges) of "
    "the LSH+Jaccard verified pair graph. The cluster-QA companion to "
    "degree stats and connected components: high transitivity means "
    "near-dup clusters are genuine cliques (template families, exact "
    "re-posts); low transitivity with high degree means chain-shaped "
    "clusters — min-id cluster dedup would then over-merge, and the "
    "threshold or blocking needs review. Triangles count once via "
    "their middle vertex (edges are id_a < id_b, so (a,b)+(b,c)+(a,c) "
    "is the unique representation) — three equi-joins on a sparse "
    "LSH-bounded edge list, never a cartesian; the edge list persists "
    "(five consumers).",
    oracle=f"""
    WITH {_o_lsh_ctes(8, 4)},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM documents),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    ends AS (SELECT id_a AS doc_id FROM pairs
             UNION ALL SELECT id_b FROM pairs),
    deg AS (SELECT doc_id, COUNT(*) AS degree FROM ends GROUP BY 1),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM pairs),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM pairs e1
      JOIN pairs e2 ON e2.id_a = e1.id_b
      JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b)
    SELECT a.n_nodes, ne.n_edges, a.n_wedges, t.n_triangles,
           CASE WHEN a.n_wedges > 0 THEN
             {o_dround(
                 "3.0 * t.n_triangles / a.n_wedges", 6)}
           ELSE 0.0 END AS transitivity
    FROM agg a, ne, tri t
    """,
)
def neardup_transitivity_stats(spark, sf_dir):
    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify

    docs = load(spark, sf_dir, "documents")
    release_curation_cache()
    cand = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
    )
    edges = (
        jaccard_verify(
            docs, cand, threshold=0.5,
            toksets=AR.shared_token_sets(spark, sf_dir),
        )
        .select("id_a", "id_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(edges)
    ends = edges.select(F.col("id_a").alias("doc_id")).unionAll(
        edges.select(F.col("id_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    agg = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("degree * (degree - 1) DIV 2"))
        .cast("long")
        .alias("n_wedges"),
    )
    ne = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    e2 = edges.select(
        F.col("id_a").alias("id_b"), F.col("id_b").alias("id_c")
    )
    e3 = edges.select(
        F.col("id_a"), F.col("id_b").alias("id_c")
    )
    tri = (
        edges.join(e2, "id_b")
        .join(e3, ["id_a", "id_c"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    trans = F.when(
        F.col("n_wedges") > 0,
        dround(
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
        ),
    ).otherwise(F.lit(0.0))
    return (
        agg.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            trans.alias("transitivity"),
        )
    )


@q(
    "doc_repetition_stats",
    "Within-document repetition profile: total/distinct token counts and "
    "the dominant token's frequency share (catches 'aaaa aaaa ...' style "
    "degenerate docs that length/stopword filters miss). Explode once -> "
    "(doc, token) count -> per-doc aggregate; both shuffles are on doc_id "
    "prefixes.",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, u.tok
      FROM (SELECT doc_id, {O_TOKS} AS t FROM documents), unnest(t) AS u(tok)),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM ex GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(c) AS BIGINT) AS top_token_count,
           {o_dround('CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)', 6)}
             AS top_token_ratio
    FROM cnt GROUP BY doc_id
    """,
)
def doc_repetition_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TX.tokens(F.col("text")).alias("__t"))
    ex = toked.select(
        "doc_id", F.explode_outer(F.col("__t")).alias("tok")
    ).filter(F.col("tok").isNotNull())
    cnt = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("__c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("__c").alias("top_token_count"),
        dround(
            F.max("__c").cast("double") / F.sum("__c").cast("double"), 6
        ).alias("top_token_ratio"),
    )


@q(
    "corpus_length_histogram",
    "Document length histogram (64-char buckets) with per-bucket token "
    "budget — the corpus-shape dashboard behind max-length truncation "
    "choices. Integer bucket arithmetic, one hash aggregate.",
    oracle=f"""
    SELECT n_chars // 64 AS len_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(len({O_TOKS})) AS BIGINT) AS total_tokens,
           {o_davg(f'len({O_TOKS})', 0)} AS avg_tokens
    FROM documents GROUP BY 1
    """,
)
def corpus_length_histogram(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.expr("n_chars div 64").alias("len_bucket"),
            TX.token_count(F.col("text")).alias("__tc"),
        )
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("__tc").cast("long")).alias("total_tokens"),
            davg(F.col("__tc"), 0).alias("avg_tokens"),
        )
    )


# The only mapInPandas (Python-worker + Arrow) query in the registry; the
# round-1 driver harness died exactly here. Driver-window placement is set
# by catalog._DRIVER_WINDOW_PRIORITY (dead-LAST in the whole window) so a
# repeat harness death costs no other query its driver row.
@q(
    "multimodal_decode_features",
    "Arrow-batched decode over a binary payload column via mapInPandas. "
    "The decoder is a deterministic stand-in (real image/audio codecs "
    "absent in this container: header-bounded 31-polynomial checksum, "
    "dimensions derived from it) — and BECAUSE it is deterministic "
    "arithmetic over the payload bytes, the oracle reproduces it "
    "relationally (ASCII corpus: byte == char code), so the driver "
    "gate now hash-checks the entire Arrow round-trip end-to-end — "
    "mapInPandas batching, re-chunking, schema, id alignment. With a "
    "real codec this reverts to property checks (byte_len vs "
    "octet_length, row-count conservation); the plumbing under test "
    "is identical either way.",
    oracle="""
    WITH cs AS (
      SELECT doc_id,
             CAST(length(text) AS INTEGER) AS byte_len,
             CASE WHEN length(text) > 0
                  THEN CAST(unicode(substr(text, 1, 1)) AS INTEGER)
                  ELSE 0 END AS head_byte,
             CASE WHEN length(text) > 0 THEN
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substr(text, 1, 64), ''),
                     ch -> CAST(unicode(ch) AS BIGINT))),
                 (a, x) -> (a * 31 + x) % 2147483648)
             ELSE CAST(0 AS BIGINT) END AS checksum
      FROM documents)
    SELECT doc_id, byte_len, head_byte, checksum,
           CAST(checksum % 64 + 1 AS INTEGER) AS width,
           CAST(checksum % 48 + 1 AS INTEGER) AS height
    FROM cs
    """,
)
def multimodal_decode_features(spark, sf_dir):
    from etl_weather_data_pipeline_spark.streaming.multimodal import (
        decode_features,
    )

    docs = load(spark, sf_dir, "documents")
    # The oracle equates utf-8 payload BYTES with character codepoints
    # (length(text) / unicode(substr)) — true only while the corpus is
    # pure ASCII. Guard at the source (lazy per-row CASE): a regenerated
    # testdata vintage with one multi-byte char fails loudly right here
    # instead of surfacing as an inscrutable driver hash mismatch.
    payloads = docs.select(
        "doc_id",
        F.when(
            F.col("text").rlike("^[\x00-\x7f]*$"),
            F.encode(F.col("text"), "utf-8"),
        )
        .otherwise(
            F.raise_error(
                F.lit("multimodal_decode_features: non-ASCII text breaks "
                      "the byte==codepoint oracle equivalence")
            )
        )
        .alias("payload"),
    )
    # Per-batch memory is bounded INSIDE the operator (max_batch_rows
    # re-chunks the session's Arrow batches) — no shared session conf is
    # mutated, so callers running other Arrow queries afterward are
    # unaffected.
    return decode_features(payloads, max_batch_rows=256)


@q(
    "multimodal_resize_stats",
    "Arrow-batched image RESIZE over a binary payload column — the "
    "third multimodal plumbing shape (decode: 1 row -> 1 feature row; "
    "frame_sample: 1 -> N; resize: 1 binary -> 1 smaller binary), the "
    "per-image preprocessing step a vision-training pipeline runs. The "
    "resizer is the deterministic stub (PIL absent; "
    "streaming/multimodal.py resize_images — a PIL swap is a "
    "two-liner that must preserve the pinned contract), so the oracle "
    "hash-checks the round trip end-to-end: per doc, the stub source "
    "dims (same checksum derivation the decode oracle mirrors) and "
    "the resized payload's measured byte length, which must equal "
    "width*height EXACTLY — a resizer writing a wrong-sized buffer "
    "fails the driver gate row-by-row.",
    oracle="""
    WITH cs AS (
      SELECT doc_id,
             CASE WHEN length(text) > 0 THEN
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substr(text, 1, 64), ''),
                     ch -> CAST(unicode(ch) AS BIGINT))),
                 (a, x) -> (a * 31 + x) % 2147483648)
             ELSE CAST(0 AS BIGINT) END AS checksum
      FROM documents)
    SELECT doc_id,
           CAST(checksum % 64 + 1 AS INTEGER) AS src_width,
           CAST(checksum % 48 + 1 AS INTEGER) AS src_height,
           CAST(192 AS INTEGER) AS resized_len
    FROM cs
    """,
)
def multimodal_resize_stats(spark, sf_dir):
    from etl_weather_data_pipeline_spark.streaming.multimodal import (
        resize_images,
    )

    docs = load(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        F.when(
            F.col("text").rlike("^[\x00-\x7f]*$"),
            F.encode(F.col("text"), "utf-8"),
        )
        .otherwise(
            F.raise_error(
                F.lit("multimodal_resize_stats: non-ASCII text breaks "
                      "the byte==codepoint oracle equivalence")
            )
        )
        .alias("payload"),
    )
    out = resize_images(payloads, width=16, height=12, max_batch_rows=256)
    return out.select(
        "doc_id",
        F.col("src_width"),
        F.col("src_height"),
        F.length(F.col("resized")).cast("int").alias("resized_len"),
    )


@q(
    "multimodal_frame_stats",
    "Arrow-batched FRAME SAMPLING over a binary payload column — the "
    "1 -> N multimodal mapInPandas shape (decode: 1 -> 1 feature row; "
    "resize: 1 -> 1 smaller binary; frame_sample: 1 payload -> N frame "
    "rows, standing in for video frame extraction). The fan-out is the "
    "shape where a wrong Arrow batch iterator silently DUPLICATES or "
    "DROPS rows — exactly what a per-row hash check catches and a "
    "row-count check can miss — so the deterministic stub (one row per "
    "32-byte offset, max 4, carrying the byte at the offset) is "
    "mirrored relationally: every emitted (doc_id, frame_idx, offset, "
    "frame_byte) row is hash-checked by the driver gate, and docs "
    "shorter than one frame stride must emit NOTHING on both engines "
    "(the empty-fan-out edge where off-by-one iterators double-emit "
    "or crash). Real codec swap keeps the plumbing: schema, "
    "re-chunked batch memory bound, id alignment.",
    oracle="""
    WITH f AS (
      SELECT doc_id, text, CAST(u.i AS INTEGER) AS frame_idx
      FROM documents,
           unnest(range(0, least(4, length(text) // 32))) AS u(i))
    SELECT doc_id, frame_idx,
           CAST(frame_idx * 32 AS INTEGER) AS "offset",
           CAST(unicode(substr(text, frame_idx * 32 + 1, 1)) AS INTEGER)
             AS frame_byte
    FROM f
    """,
)
def multimodal_frame_stats(spark, sf_dir):
    from etl_weather_data_pipeline_spark.streaming.multimodal import (
        frame_sample,
    )

    docs = load(spark, sf_dir, "documents")
    # Same ASCII source guard as the other multimodal oracles: the
    # byte==codepoint equivalence is what lets DuckDB mirror the stub.
    payloads = docs.select(
        "doc_id",
        F.when(
            F.col("text").rlike("^[\x00-\x7f]*$"),
            F.encode(F.col("text"), "utf-8"),
        )
        .otherwise(
            F.raise_error(
                F.lit("multimodal_frame_stats: non-ASCII text breaks "
                      "the byte==codepoint oracle equivalence")
            )
        )
        .alias("payload"),
    )
    return frame_sample(payloads, every_n_bytes=32, max_frames=4)


# --- round-3 batch 2: chunking, packing, mixture sampling, quality rules ----

_CHUNK_W = 32  # tokens per chunk
_CHUNK_STRIDE = 24  # tokens between chunk starts (overlap = 8)


@q(
    "doc_chunk_spans",
    "Overlapping fixed-size token chunks (32-token windows, stride 24) "
    "with chunk index and per-chunk token count — the context-window "
    "chunking step every RAG / training pipeline runs before embedding. "
    "Map-only: tokens projected once, the CHEAP index sequence is "
    "exploded (explode_outer + isNotNull, dodging the inferred-filter "
    "recompute trap) and the slice is taken after the explode, so the "
    "token array is never re-tokenized per chunk.",
    oracle=f"""
    WITH toked AS (SELECT doc_id, {O_TOKS} AS t FROM documents),
    idx AS (
      SELECT doc_id, t, CAST(u.i AS BIGINT) AS chunk_idx
      FROM toked, unnest(range(0, CAST(greatest(1,
             ceil((len(t) - {_CHUNK_W - _CHUNK_STRIDE})
                  / {_CHUNK_STRIDE}.0)) AS BIGINT))) AS u(i))
    SELECT doc_id, chunk_idx,
           array_to_string(
             t[chunk_idx*{_CHUNK_STRIDE}+1
               : chunk_idx*{_CHUNK_STRIDE}+{_CHUNK_W}], ' ') AS chunk_text,
           CAST(len(t[chunk_idx*{_CHUNK_STRIDE}+1
               : chunk_idx*{_CHUNK_STRIDE}+{_CHUNK_W}]) AS BIGINT)
             AS n_chunk_tokens
    FROM idx
    """,
)
def doc_chunk_spans(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TX.tokens(F.col("text")).alias("__t"))
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(
            (F.size("__t") - F.lit(_CHUNK_W - _CHUNK_STRIDE))
            / F.lit(float(_CHUNK_STRIDE))
        ),
    )
    ex = toked.select(
        "doc_id",
        "__t",
        F.explode_outer(
            F.sequence(F.lit(0).cast("long"), n_chunks - F.lit(1))
        ).alias("chunk_idx"),
    ).filter(F.col("chunk_idx").isNotNull())
    start = (F.col("chunk_idx") * _CHUNK_STRIDE + 1).cast("int")
    piece = F.slice(F.col("__t"), start, _CHUNK_W)
    return ex.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


_PACK_BUDGET = 256  # tokens per packed training sequence


@q(
    "corpus_sequence_pack",
    "Sequence packing for training: concatenate each source's docs in "
    "doc_id order and cut every 256 tokens — seq_id = floor(start_offset "
    "/ budget) from a running token sum, the standard concat-then-chunk "
    "packing that turns ragged docs into fixed-budget training rows. "
    "ONE shuffle: the window partitions by source and the downstream "
    "(source, seq_id) aggregate reuses that partitioning (hash(source) "
    "already clusters every (source, seq_id) group).",
    oracle=f"""
    WITH toked AS (
      SELECT doc_id, source, CAST(len({O_TOKS}) AS BIGINT) AS n_toks
      FROM documents),
    run AS (
      SELECT source, doc_id, n_toks,
             CAST(SUM(n_toks) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
      FROM toked)
    SELECT source,
           CAST(FLOOR((running - n_toks) / {_PACK_BUDGET}.0) AS BIGINT)
             AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS seq_tokens,
           MIN(doc_id) AS first_doc_id, MAX(doc_id) AS last_doc_id
    FROM run GROUP BY 1, 2
    """,
)
def corpus_sequence_pack(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        "source",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = toked.withColumn("running", F.sum("n_toks").over(w))
    seq_id = F.floor(
        (F.col("running") - F.col("n_toks")) / F.lit(float(_PACK_BUDGET))
    )
    return (
        run.select("source", seq_id.alias("seq_id"), "n_toks", "doc_id")
        .groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


# Oracle mirror of operators/sampling.hash_bucket (md5 family, 1000 buckets).
_O_BUCKET = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000)"
)


@q(
    "corpus_temperature_sample",
    "Temperature-balanced source mixture (alpha = 0.5): per-source "
    "sampling rate r_s = min(1, sqrt(mass_s)/SUM(sqrt(mass)) * target / "
    "n_s) over the token mass, then a deterministic keep decision from "
    "the doc-id hash — the multinomial source re-weighting used to stop "
    "head domains drowning the mixture. The rates come from a tiny "
    "projected aggregate (20 rows) broadcast back onto the fact scan: "
    "no fact-side shuffle at any scale. Determinism: sqrt is a "
    "correctly-rounded IEEE op, and the cross-source sum of sqrts is "
    "routed through exact decimals so neither engine's accumulation "
    "order matters.",
    oracle=f"""
    WITH m AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CAST(len({O_TOKS}) AS BIGINT)) AS BIGINT) AS mass
      FROM documents GROUP BY source),
    s AS (SELECT source, n_docs, {o_dround("sqrt(mass)", 6)} AS sq FROM m),
    d AS (SELECT CAST(SUM(CAST(sq AS DECIMAL(18,6))) AS DOUBLE) AS denom,
                 CAST(SUM(n_docs) AS BIGINT) AS total_docs
          FROM s),
    r AS (SELECT source,
                 least(1.0, (sq / denom) * (0.5 * total_docs) / n_docs)
                   AS rate
          FROM s, d)
    SELECT doc.doc_id, doc.source, {o_dround("r.rate", 6)} AS sample_rate
    FROM documents doc JOIN r ON doc.source = r.source
    WHERE {_O_BUCKET} / 1000.0 < r.rate
    """,
)
def corpus_temperature_sample(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.sampling import (
        hash_bucket,
    )

    docs = load(spark, sf_dir, "documents")
    m = (
        docs.select(
            "source", F.size(TX.tokens(F.col("text"))).cast("long").alias("__n")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("__n_docs"),
            F.sum("__n").alias("__mass"),
        )
    )
    s = m.select(
        "source",
        "__n_docs",
        dround(F.sqrt(F.col("__mass")), 6).alias("__sq"),
    )
    d = s.agg(
        F.sum(F.col("__sq").cast("decimal(18,6)"))
        .cast("double")
        .alias("__denom"),
        F.sum("__n_docs").alias("__total_docs"),
    )
    rates = s.crossJoin(F.broadcast(d)).select(
        "source",
        F.least(
            F.lit(1.0),
            (F.col("__sq") / F.col("__denom"))
            * (F.lit(0.5) * F.col("__total_docs"))
            / F.col("__n_docs"),
        ).alias("__rate"),
    )
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .filter(hash_bucket(F.col("doc_id")) / F.lit(1000.0) < F.col("__rate"))
        .select(
            "doc_id", "source", dround(F.col("__rate"), 6).alias("sample_rate")
        )
    )


# Built from the single source of truth so a future edit to EN_STOPWORDS
# can't silently desynchronize the oracle from the Spark side.
_O_SW = "[" + ",".join(f"'{w}'" for w in TX.EN_STOPWORDS) + "]"


@q(
    "doc_gopher_quality_flags",
    "Gopher-style quality-rule battery (Rae et al. 2021 §A1.1 heuristics, "
    "re-derived over this corpus's signals): per-doc boolean flags for "
    "token-count bounds, mean word length, stopword floor, alphabetic-"
    "token ratio, and repetition, plus the conjunctive pass verdict. "
    "Pure map-side Column expressions — tokens projected once, every "
    "rule in whole-stage codegen, no shuffle, no UDF.",
    oracle=f"""
    WITH t AS (SELECT doc_id, {O_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) BETWEEN 20 AND 1000 AS flag_word_count,
           (CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / len(toks)) BETWEEN 3.0 AND 10.0 AS flag_mean_word_len,
           len(list_filter(toks, x -> list_contains({_O_SW}, x))) >= 2
             AS flag_stopword,
           (CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
             AS DOUBLE) / len(toks)) >= 0.8 AS flag_alpha,
           (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) >= 0.3
             AS flag_repetition,
           (len(toks) BETWEEN 20 AND 1000)
             AND ((CAST(list_sum(list_transform(toks, x -> length(x)))
                   AS DOUBLE) / len(toks)) BETWEEN 3.0 AND 10.0)
             AND (len(list_filter(toks, x -> list_contains({_O_SW}, x))) >= 2)
             AND ((CAST(len(list_filter(toks,
                   x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                   / len(toks)) >= 0.8)
             AND ((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
                   >= 0.3)
             AS pass_gopher
    FROM t
    """,
)
def doc_gopher_quality_flags(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TX.tokens(F.col("text")).alias("__t"))
    t = F.col("__t")
    n = F.size(t)
    mean_len = (
        F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)).cast(
            "double"
        )
        / n
    )
    sw = F.array(*[F.lit(w) for w in TX.EN_STOPWORDS])
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    alpha_ratio = (
        F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast("double") / n
    )
    distinct_ratio = F.size(F.array_distinct(t)).cast("double") / n
    f_wc = (n >= 20) & (n <= 1000)
    f_ml = (mean_len >= 3.0) & (mean_len <= 10.0)
    f_sw = n_sw >= 2
    f_al = alpha_ratio >= 0.8
    f_rep = distinct_ratio >= 0.3
    return toked.select(
        "doc_id",
        f_wc.alias("flag_word_count"),
        f_ml.alias("flag_mean_word_len"),
        f_sw.alias("flag_stopword"),
        f_al.alias("flag_alpha"),
        f_rep.alias("flag_repetition"),
        (f_wc & f_ml & f_sw & f_al & f_rep).alias("pass_gopher"),
    )


_O_PAIR_COS = (
    "list_dot_product(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(l.embedding::DOUBLE[], l.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(r.embedding::DOUBLE[], r.embedding::DOUBLE[])))"
)


@q(
    "embedding_semdedup_keep",
    "SemDeDup-style keep-set (Abbas et al. 2023): within each (label, "
    "LSH-bucket) cell, a vector is DROPPED if any smaller-id vector in "
    "the cell has cosine >= 0.95 with it — min-id survivor pruning, the "
    "semantic twin of exact dedup's keep-first. Reuses the blocked "
    "near-dup pair plan (linear cells, no cartesian) and finishes with a "
    "distinct + left_anti join, so the fact table never shuffles on "
    "anything but the pair block keys.",
    oracle=f"""
    WITH b AS (SELECT vec_id, label, embedding,
                      {_o_lsh_bucket(_lsh_planes())} AS bucket
               FROM embeddings),
    losers AS (
      SELECT DISTINCT r.vec_id
      FROM b l JOIN b r
        ON l.label = r.label AND l.bucket = r.bucket
           AND l.vec_id < r.vec_id
      WHERE {o_dround(_O_PAIR_COS, 6)} >= 0.95)
    SELECT e.vec_id, e.label FROM embeddings e
    WHERE e.vec_id NOT IN (SELECT vec_id FROM losers)
    """,
)
def embedding_semdedup_keep(spark, sf_dir):
    pairs = embedding_neardup_pairs(spark, sf_dir)
    losers = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    emb = load(spark, sf_dir, "embeddings")
    return emb.join(losers, "vec_id", "left_anti").select("vec_id", "label")


@q(
    "corpus_dataset_card",
    "Dataset-card summary: per (split, lang) doc and token totals with "
    "mean tokens per doc — the table every training-data release ships. "
    "Split assignment is the same deterministic doc-id hash as "
    "corpus_train_split (a doc never migrates splits as the corpus "
    "grows); one projected scan, one hash aggregate.",
    oracle=f"""
    WITH assigned AS (
      SELECT lang, CAST(len({O_TOKS}) AS BIGINT) AS n_toks,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 1000 < 800 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 1000 < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           {o_dround("CAST(SUM(n_toks) AS DOUBLE) / COUNT(*)", 6)}
             AS avg_tokens
    FROM assigned GROUP BY 1, 2
    """,
)
def corpus_dataset_card(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.sampling import (
        assign_split,
    )

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            F.size(TX.tokens(F.col("text"))).cast("long").alias("__n"),
            assign_split(F.col("doc_id"), 0.8, 0.1).alias("split"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("total_tokens"),
            dround(
                F.sum("__n").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_tokens"),
        )
    )


@q(
    "doc_incremental_dedup",
    "Incremental ingest dedup: treat doc_id % 5 == 0 as today's batch and "
    "the rest as the already-clean corpus; the batch first self-dedups "
    "(min-id per fingerprint, one hash aggregate) then anti-joins the "
    "corpus's fingerprint projection — the periodic-ingest shape where "
    "the corpus side is a narrow 16-byte-key store and documents "
    "themselves never shuffle. Idempotent by construction.",
    oracle=f"""
    WITH newb AS (
      SELECT doc_id, {O_FINGERPRINT} AS fingerprint
      FROM documents WHERE doc_id % 5 = 0),
    self_deduped AS (
      SELECT fingerprint, MIN(doc_id) AS doc_id
      FROM newb GROUP BY fingerprint),
    corpus AS (
      SELECT DISTINCT {O_FINGERPRINT} AS fingerprint
      FROM documents WHERE doc_id % 5 <> 0)
    SELECT s.doc_id, s.fingerprint
    FROM self_deduped s
    WHERE s.fingerprint NOT IN (SELECT fingerprint FROM corpus)
    """,
)
def doc_incremental_dedup(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import (
        dedup_incremental,
    )

    docs = load(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return dedup_incremental(new_batch, corpus)


@q(
    "corpus_merge_state",
    "Driver-grade evidence for the streaming corpus merge sink: runs the "
    "foreachBatch body (streaming/corpus.py merge_batch_into_corpus) LIVE "
    "against a fresh store for two micro-batches — batch 1 = doc_id%3==0, "
    "batch 2 = the full feed (overlapping, as at-least-once delivery "
    "would) — then REPLAYS batch 2 to prove idempotency (a non-zero "
    "third append would surface as extra rows and hash-fail), and "
    "returns the store's post-merge state. First-seen-batch wins; "
    "min-doc_id wins within a batch. The oracle reconstructs the same "
    "state relationally in DuckDB.",
    oracle=f"""
    WITH fps AS (
      SELECT doc_id, lang, fingerprint FROM (
        SELECT doc_id, lang, {O_FINGERPRINT} AS fingerprint FROM documents)
      WHERE fingerprint IS NOT NULL),
    a AS (
      SELECT fingerprint, MIN(doc_id) AS doc_id
      FROM fps WHERE doc_id % 3 = 0 GROUP BY 1),
    b AS (
      SELECT fingerprint, MIN(doc_id) AS doc_id
      FROM fps f
      WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.fingerprint = f.fingerprint)
      GROUP BY 1),
    merged AS (SELECT * FROM a UNION ALL SELECT * FROM b)
    SELECT m.doc_id, f.lang, m.fingerprint
    FROM merged m JOIN fps f ON m.doc_id = f.doc_id
    """,
)
def corpus_merge_state(spark, sf_dir):
    """Batch twin of the streaming merge sink (streaming/corpus.py:96).

    md5 hash family so DuckDB reproduces the fingerprints bit-for-bit;
    production streams keep the xxhash64 default. The store lives in a
    fresh tmpdir per invocation; the result is EAGER (localCheckpoint)
    so the tmpdir is removed before returning — every invocation used
    to leak a store dir (r12: 61 leaked dirs found on the build host
    across the merge-state/export family)."""
    import shutil
    import tempfile

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        merge_batch_into_corpus,
    )

    tmp = tempfile.mkdtemp(prefix="corpus_merge_state_")
    store = tmp + "/store"
    docs = load(spark, sf_dir, "documents")
    try:
        merge_batch_into_corpus(
            docs.filter(F.col("doc_id") % 3 == 0), store, hash_family="md5"
        )
        merge_batch_into_corpus(docs, store, hash_family="md5")
        replayed = merge_batch_into_corpus(docs, store, hash_family="md5")
        if replayed:  # explicit raise: bare assert vanishes under python -O
            raise AssertionError(
                f"replay appended {replayed} rows — not idempotent"
            )
        return (
            spark.read.parquet(store)
            .select("doc_id", "lang", "fingerprint")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@q(
    "corpus_neardup_merge_state",
    "Driver-grade evidence for the NEAR-DUP-aware streaming merge sink "
    "(streaming/corpus.py merge_batch_neardup_into_corpus): runs the "
    "foreachBatch body LIVE against a fresh store for two micro-batches "
    "(batch 1 = doc_id%3==0, batch 2 = the full overlapping feed), then "
    "REPLAYS batch 2 to prove idempotency (a non-zero third append "
    "raises), and returns the store's post-merge state. Per batch: "
    "within-batch min-id exact dedup, fingerprint anti-join vs the "
    "store, MinHash band probe of the store's persisted _bands table + "
    "the batch's own bands, exact Jaccard >= 0.5 verify on candidates "
    "(store always wins; smaller id wins within a batch). The oracle "
    "replays the same two merges relationally — the prefixed LSH band "
    "CTEs let the store and batch band tables coexist for the "
    "cross-table probe.",
    oracle=f"""
    WITH b1 AS (
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 3 = 0),
    f1 AS (SELECT doc_id, text, lang, {O_FINGERPRINT} AS fp FROM b1),
    s1a AS (
      SELECT f.doc_id, f.text, f.lang, f.fp FROM f1 f
      JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM f1 GROUP BY 1) m
        ON m.doc_id = f.doc_id),
    {_o_lsh_ctes(8, 4, table="s1a", prefix="p1")},
    t1 AS (SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM s1a),
    drop1 AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM p1cand c JOIN t1 l ON l.doc_id = c.id_a
                    JOIN t1 r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    store1 AS (
      SELECT * FROM s1a
      WHERE doc_id NOT IN (SELECT doc_id FROM drop1)),
    f2 AS (SELECT doc_id, text, lang, {O_FINGERPRINT} AS fp
           FROM documents),
    s2a AS (
      SELECT f.doc_id, f.text, f.lang, f.fp FROM f2 f
      JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM f2 GROUP BY 1) m
        ON m.doc_id = f.doc_id),
    s2b AS (
      SELECT * FROM s2a
      WHERE fp NOT IN (SELECT fp FROM store1)),
    {_o_lsh_ctes(8, 4, table="store1", prefix="st")},
    {_o_lsh_ctes(8, 4, table="s2b", prefix="bb")},
    cross_cand AS (
      SELECT DISTINCT st.doc_id AS id_a, bb.doc_id AS id_b
      FROM stbands st JOIN bbbands bb
        ON st.band_idx = bb.band_idx AND st.band_val = bb.band_val),
    cand2 AS (
      SELECT id_a, id_b FROM bbcand
      UNION SELECT id_a, id_b FROM cross_cand),
    t2 AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM store1
      UNION ALL
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM s2b),
    drop2 AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand2 c JOIN t2 l ON l.doc_id = c.id_a
                   JOIN t2 r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    surv2 AS (
      SELECT * FROM s2b
      WHERE doc_id NOT IN (SELECT doc_id FROM drop2))
    SELECT doc_id, lang, fp AS fingerprint FROM store1
    UNION ALL SELECT doc_id, lang, fp FROM surv2
    """,
)
def corpus_neardup_merge_state(spark, sf_dir):
    """Live twin of the near-dup merge sink (md5 family so DuckDB
    reproduces fingerprints, signatures, and band values bit-for-bit)."""
    import tempfile

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        bands_table_name,
        merge_batch_neardup_into_corpus,
    )

    import shutil

    tmp = tempfile.mkdtemp(prefix="corpus_neardup_merge_")
    store = tmp + "/store"
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # band_buckets=8: the store is a one-shot temp dir; production sizing
    # (64) would write 8x the files for zero benefit at this scale. The
    # catalog entry for the temp store's bucketed band table is dropped
    # after the result materializes (metadata only — external table),
    # and the result is EAGER so the tmpdir itself is removed too
    # (r12 leak fix).
    try:
        merge_batch_neardup_into_corpus(
            docs.filter(F.col("doc_id") % 3 == 0), store,
            hash_family="md5", band_buckets=8,
        )
        merge_batch_neardup_into_corpus(
            docs, store, hash_family="md5", band_buckets=8
        )
        replayed = merge_batch_neardup_into_corpus(
            docs, store, hash_family="md5", band_buckets=8
        )
        if replayed:  # explicit raise: bare assert vanishes under python -O
            raise AssertionError(
                f"replay appended {replayed} rows — not idempotent"
            )
        return (
            spark.read.parquet(store)
            .select("doc_id", "lang", "fingerprint")
            .localCheckpoint()
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bands_table_name(store)}")
        shutil.rmtree(tmp, ignore_errors=True)


@q(
    "corpus_ingest_history_report",
    "Driver-grade evidence for the merge sinks' per-merge audit rows "
    "(the corpus-store analogue of the reference pipeline's "
    "load_history table, K8): runs the exact-dedup merge LIVE against "
    "a fresh store for two overlapping batches plus a replay, then "
    "returns the _ingest_history side table's COUNT columns — one row "
    "per merge, n_batch decomposing exactly into dropped + appended, "
    "with the replay row showing a full batch dropped and zero "
    "appended (the at-least-once idempotency audit trail an operator "
    "actually reads). Timestamps are excluded (nondeterministic); the "
    "count rows are fully deterministic and the oracle recomputes all "
    "three from the documents relation.",
    oracle=f"""
    WITH f AS (SELECT doc_id, {O_FINGERPRINT} AS fp FROM documents),
    b1 AS (SELECT * FROM f WHERE doc_id % 3 = 0),
    s1 AS (SELECT COUNT(*) AS nb, COUNT(DISTINCT fp) AS ap FROM b1),
    s2 AS (SELECT COUNT(*) AS nb,
                  (SELECT COUNT(DISTINCT fp) FROM f) -
                  (SELECT COUNT(DISTINCT fp) FROM b1) AS ap
           FROM f)
    SELECT CAST(nb AS BIGINT) AS n_batch,
           CAST(nb - ap AS BIGINT) AS n_exact_dropped,
           CAST(0 AS BIGINT) AS n_neardup_dropped,
           CAST(ap AS BIGINT) AS n_appended
    FROM s1
    UNION ALL
    SELECT CAST(nb AS BIGINT), CAST(nb - ap AS BIGINT),
           CAST(0 AS BIGINT), CAST(ap AS BIGINT) FROM s2
    UNION ALL
    SELECT CAST(nb AS BIGINT), CAST(nb AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM s2
    """,
)
def corpus_ingest_history_report(spark, sf_dir):
    """Live twin: three real merges against a temp store (md5 family so
    the fingerprint arithmetic is the oracle's), then the audit table's
    deterministic count columns. The driver's hash gate compares row
    SETS (sorted), so no merge-sequence column is needed — the three
    rows are distinguishable by their counts."""
    import tempfile

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        INGEST_HISTORY_SUBDIR,
        merge_batch_into_corpus,
    )

    import shutil

    tmp = tempfile.mkdtemp(prefix="corpus_ingest_report_")
    store = tmp + "/store"
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    try:
        merge_batch_into_corpus(
            docs.filter(F.col("doc_id") % 3 == 0), store, hash_family="md5"
        )
        merge_batch_into_corpus(docs, store, hash_family="md5")
        merge_batch_into_corpus(docs, store, hash_family="md5")  # replay
        return (
            spark.read.parquet(f"{store}/{INGEST_HISTORY_SUBDIR}")
            .select(
                "n_batch", "n_exact_dropped", "n_neardup_dropped",
                "n_appended",
            )
            .localCheckpoint()  # eager: the tmpdir is removed below
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@q(
    "doc_unigram_logprob",
    "Corpus-trained unigram log-probability score per document — the "
    "perplexity-proxy quality filter (a KenLM-style LM gate without the "
    "model): p(t) = corpus count / total tokens, score = mean ln p over "
    "the doc's tokens. Rare/garbled docs score low. Factored as "
    "mean ln(cnt) - ln(total) so the corpus total comes from a NARROW "
    "no-explode scan (a broadcast 1-row aggregate) instead of a second "
    "pass over the exploded tokens — the token stream is exploded, "
    "shuffled, and aggregated exactly once for the vocab and once for "
    "the doc scores. Determinism: each ln is decimal-rounded at 8 dp "
    "(cross-engine ln agrees far past that; tfidf precedent), the "
    "per-doc mean sums exact decimals, and the final subtraction is a "
    "correctly-rounded IEEE op on identical operands.",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({O_TOKS}) AS token FROM documents),
    vocab AS (
      SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    n AS (SELECT CAST(SUM(len({O_TOKS})) AS BIGINT) AS total
          FROM documents),
    scored AS (
      SELECT t.doc_id, {o_dround("ln(v.cnt)", 8)} AS lc
      FROM tok t JOIN vocab v USING (token))
    SELECT doc_id,
           {o_dround(
               "CAST(SUM(CAST(lc AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)"
               " - " + o_dround("ln((SELECT total FROM n))", 8), 6)}
             AS avg_logprob,
           COUNT(*) AS n_tokens
    FROM scored GROUP BY doc_id
    """,
)
def doc_unigram_logprob(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    n = docs.agg(
        F.sum(F.size(TX.tokens(F.col("text"))).cast("long")).alias("total")
    )
    lc = dround(F.log(F.col("cnt").cast("double")), 8).alias("lc")
    scored = tok.join(vocab, "token").select("doc_id", lc)
    return (
        scored.groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("lc").cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("__mean_lc"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            dround(
                F.col("__mean_lc")
                - dround(F.log(F.col("total").cast("double")), 8),
                6,
            ).alias("avg_logprob"),
            "n_tokens",
        )
    )


@q(
    "doc_bigram_logprob",
    "Corpus-trained CONDITIONAL bigram log-probability per document — "
    "the next step up from doc_unigram_logprob toward a KenLM-style "
    "perplexity gate: score = mean ln p(b|a) over the doc's adjacent "
    "token pairs with add-0.5 smoothing, p(b|a) = (c(ab)+0.5) / "
    "(c(a)+0.5V). Catches garbled WORD ORDER that unigram scoring is "
    "blind to (same bag of tokens, scrambled transitions -> low "
    "score). Factored as ln(c(ab)+.5) - ln(c(a)+.5V) so each side "
    "rounds deterministically before the exact-decimal per-doc mean; "
    "the unigram vocab (bounded word-type table) persists once and "
    "serves the conditional join AND the V count. Docs with < 2 "
    "tokens have no transitions and drop out, mirrored by the join "
    "semantics on both engines.",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({O_TOKS}) AS token FROM documents),
    big AS (
      SELECT doc_id, t.first AS first, t.bigram AS bigram FROM (
        SELECT doc_id, unnest(
          CASE WHEN len({O_TOKS}) >= 2 THEN
            list_transform(range(1, len({O_TOKS})),
              i -> struct_pack(first := {O_TOKS}[i],
                               bigram := {O_TOKS}[i] || ' ' || {O_TOKS}[i+1]))
          ELSE CAST([] AS STRUCT(first VARCHAR, bigram VARCHAR)[]) END
        ) AS t
        FROM documents)),
    uvocab AS (SELECT token, COUNT(*) AS ucnt FROM tok GROUP BY token),
    v AS (SELECT COUNT(*) AS vsize FROM uvocab),
    bvocab AS (SELECT bigram, COUNT(*) AS bcnt FROM big GROUP BY bigram),
    scored AS (
      SELECT b.doc_id,
             {o_dround("ln(bv.bcnt + 0.5)", 8)}
               - {o_dround(
                   "ln(uv.ucnt + 0.5 * (SELECT vsize FROM v))", 8)} AS lp
      FROM big b JOIN bvocab bv USING (bigram)
                 JOIN uvocab uv ON uv.token = b.first)
    SELECT doc_id,
           {o_dround(
               "CAST(SUM(CAST(lp AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)",
               6)} AS avg_bigram_logprob,
           COUNT(*) AS n_bigrams
    FROM scored GROUP BY doc_id
    """,
)
def doc_bigram_logprob(spark, sf_dir):
    from pyspark import StorageLevel

    docs = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TX.tokens(F.col("text")).alias("__t"))
    tok = toked.select("doc_id", F.explode("__t").alias("token"))
    uvocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("ucnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(uvocab)
    v = uvocab.agg(F.count(F.lit(1)).alias("vsize"))
    # bigram structs from the BOUND __t column (HOF layering rule);
    # explode_outer + isNotNull per the inferred-filter trap.
    big = (
        toked.select(
            "doc_id",
            F.explode_outer(
                F.when(
                    F.size("__t") >= 2,
                    F.expr(
                        "transform(sequence(0, size(__t) - 2), "
                        "i -> struct(__t[i] AS first, "
                        "concat(__t[i], ' ', __t[i + 1]) AS bigram))"
                    ),
                )
            ).alias("b"),
        )
        .filter(F.col("b").isNotNull())
        .select("doc_id", F.col("b.first").alias("first"), "b.bigram")
    )
    bvocab = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("bcnt"))
    scored = (
        big.join(bvocab, "bigram")
        .join(uvocab, big["first"] == uvocab["token"])
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            (
                dround(F.log(F.col("bcnt") + F.lit(0.5)), 8)
                - dround(
                    F.log(
                        F.col("ucnt") + F.lit(0.5) * F.col("vsize")
                    ),
                    8,
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        dround(
            F.sum(F.col("lp").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_bigram_logprob"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


# ---------------------------------------------------------------------------
# Round-4 additions: winnow overlap pairs, source KL divergence, embedding
# dimension stats, n-gram novelty
# ---------------------------------------------------------------------------

@q(
    "doc_winnow_overlap_pairs",
    "Substring-granular near-dup pairs from the winnowing sketch (MOSS "
    "copy-detection shape): docs sharing >= 8 winnow fingerprints, scored "
    "by containment = shared / min(|A|,|B|). Complements MinHash-LSH, "
    "which misses a short doc embedded in a long one (Jaccard dilutes; "
    "containment doesn't). Fingerprints seen in > 50 docs are dropped "
    "FIRST (boilerplate grams) — the stop-fingerprint filter is what "
    "keeps the self-join's per-key buckets bounded at 100 TB; both "
    "per-doc sizes ride along as window counts, so the plan is two "
    "window exchanges + one equi-join, no extra size-lookup joins.",
    oracle=f"""
    WITH wf AS (SELECT * FROM ({_o_winnow()}) t),
    d1 AS (
      SELECT doc_id, fingerprint,
             COUNT(*) OVER (PARTITION BY fingerprint) AS df
      FROM wf),
    kept AS (
      SELECT doc_id, fingerprint,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM d1 WHERE df <= {_WINNOW_MAX_DF}),
    pairs AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b,
             COUNT(*) AS shared, MIN(l.n) AS na, MIN(r.n) AS nb
      FROM kept l JOIN kept r
        ON l.fingerprint = r.fingerprint AND l.doc_id < r.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared_fps,
           {o_dround("CAST(shared AS DOUBLE) / least(na, nb)", 6)}
             AS containment
    FROM pairs WHERE shared >= {_WINNOW_MIN_SHARED}
    """,
)
def doc_winnow_overlap_pairs(spark, sf_dir):
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    fp = _winnow_fps(
        load(spark, sf_dir, "documents"),
        hashes=AR.shared_rolling_hashes(spark, sf_dir, _WINNOW_K),
    )
    d1 = fp.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("fingerprint"))
    )
    # Persist the sketch ONCE before the self-join: the two join sides are
    # independent DAG branches, and without a persist each re-evaluates
    # the whole Rabin-Karp + winnow chain from the parquet scan (verified
    # r4: 4 scans, 4 Generates, 0 ReusedExchange — 2x the query's cost,
    # and the sketch IS the dominant cost at 100 TB). The cached relation
    # is ~40 bytes/row (doc_id, fingerprint, n), tiny next to the text it
    # summarizes; MEMORY_AND_DISK spills instead of OOMing. Lifecycle is
    # the curation flagship's bounded registry (at most one alive).
    release_curation_cache()
    kept = (
        d1.filter(F.col("df") <= _WINNOW_MAX_DF)
        .drop("df")
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(kept)
    l, r = kept.alias("l"), kept.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.fingerprint") == F.col("r.fingerprint"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.min("l.n").alias("na"),
            F.min("r.n").alias("nb"),
        )
    )
    return pairs.filter(F.col("shared") >= _WINNOW_MIN_SHARED).select(
        "id_a",
        "id_b",
        F.col("shared").alias("shared_fps"),
        dround(
            F.col("shared").cast("double") / F.least("na", "nb"), 6
        ).alias("containment"),
    )


@q(
    "source_token_kl",
    "Per-source token-distribution drift: KL(P_source || P_corpus) = "
    "sum_t p_s(t) * ln(p_s(t)/p_corpus(t)) — the mixture-weighting / "
    "domain-shift diagnostic for corpus assembly. Factored so the token "
    "stream is exploded and shuffled ONCE into (source, token) counts; "
    "corpus counts, per-source totals and the grand total all derive "
    "from that table by further (much smaller) aggregates, and the two "
    "scalar-ish sides come back as broadcasts. Determinism: each ln is "
    "decimal-rounded at 8 dp, per-source terms sum as exact decimals.",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({O_TOKS}) AS token FROM documents),
    st AS (
      SELECT source, token, COUNT(*) AS cnt_st FROM tok GROUP BY 1, 2),
    ns AS (
      SELECT source, CAST(SUM(cnt_st) AS BIGINT) AS n_s
      FROM st GROUP BY 1),
    ct AS (
      SELECT token, CAST(SUM(cnt_st) AS BIGINT) AS cnt_t
      FROM st GROUP BY 1),
    n AS (SELECT CAST(SUM(n_s) AS BIGINT) AS total FROM ns),
    terms AS (
      SELECT st.source, ns.n_s,
             (CAST(st.cnt_st AS DOUBLE) / CAST(ns.n_s AS DOUBLE)) *
             ({o_dround("ln(st.cnt_st)", 8)}
              + {o_dround("ln((SELECT total FROM n))", 8)}
              - {o_dround("ln(ns.n_s)", 8)}
              - {o_dround("ln(ct.cnt_t)", 8)}) AS term
      FROM st JOIN ct USING (token) JOIN ns USING (source))
    SELECT source, n_s AS n_tokens,
           {o_dround(
               "CAST(SUM(CAST(term AS DECIMAL(28,10))) AS DOUBLE)", 6)}
             AS kl_divergence
    FROM terms GROUP BY source, n_s
    """,
)
def source_token_kl(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode_outer(TX.tokens(F.col("text"))).alias("token")
    ).filter(F.col("token").isNotNull())
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("cnt_st")
    )
    ct = st.groupBy("token").agg(
        F.sum("cnt_st").cast("long").alias("cnt_t")
    )
    # Per-source totals and the grand total from a NARROW no-explode scan
    # (size of the token array): same numbers as summing st, but without
    # re-evaluating the exploded stream — each DataFrame reference
    # re-executes its subtree, so deriving ns/n from st doubles the
    # Generate count (unigram-logprob precedent).
    ns = (
        docs.select(
            "source",
            F.size(TX.tokens(F.col("text"))).cast("long").alias("__n"),
        )
        .groupBy("source")
        .agg(F.sum("__n").cast("long").alias("n_s"))
    )
    n = ns.agg(F.sum("n_s").cast("long").alias("total"))
    lr = (
        dround(F.log(F.col("cnt_st").cast("double")), 8)
        + dround(F.log(F.col("total").cast("double")), 8)
        - dround(F.log(F.col("n_s").cast("double")), 8)
        - dround(F.log(F.col("cnt_t").cast("double")), 8)
    )
    term = (
        F.col("cnt_st").cast("double") / F.col("n_s").cast("double")
    ) * lr
    terms = (
        st.join(ct, "token")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n))
        .select("source", "n_s", term.alias("term"))
    )
    return terms.groupBy("source", "n_s").agg(
        dround(
            F.sum(F.col("term").cast("decimal(28,10)")).cast("double"), 6
        ).alias("kl_divergence")
    ).select(
        "source", F.col("n_s").alias("n_tokens"), "kl_divergence"
    )


@q(
    "embedding_dim_stats",
    "Per-dimension mean and variance over the embedding corpus — the "
    "whitening / feature-selection precompute (and the PCA diagonal): "
    "one posexplode -> one hash aggregate keyed by dimension (64 groups), "
    "variance from exact decimal sum and sum-of-squares in a single "
    "pass (no second scan, no per-group vectors on the driver).",
    oracle=f"""
    WITH ex AS (
      SELECT unnest(list_transform(embedding,
                                   (v, i) -> {{'pos': i, 'v': v}})) AS pv
      FROM embeddings),
    d AS (SELECT CAST(pv.pos AS INT) AS pos, CAST(pv.v AS DOUBLE) AS v
          FROM ex)
    SELECT pos, COUNT(*) AS n,
           {o_dround(
               "CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)",
               6)} AS mean,
           {o_dround(
               "(CAST(SUM(CAST(v * v AS DECIMAL(28,18))) AS DOUBLE)"
               " - CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE)"
               " * CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE)"
               " / COUNT(*)) / COUNT(*)", 8)} AS variance
    FROM d GROUP BY pos
    """,
)
def embedding_dim_stats(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    d = emb.select(F.posexplode("embedding").alias("pos0", "v0")).select(
        (F.col("pos0") + 1).alias("pos"), F.col("v0").cast("double").alias("v")
    )
    sx = F.sum(F.col("v").cast("decimal(18,9)")).cast("double")
    sx2 = F.sum(
        (F.col("v") * F.col("v")).cast("decimal(28,18)")
    ).cast("double")
    cnt = F.count(F.lit(1))
    return d.groupBy("pos").agg(
        cnt.alias("n"),
        dround(sx / cnt, 6).alias("mean"),
        dround((sx2 - sx * sx / cnt) / cnt, 8).alias("variance"),
    )


@q(
    "doc_ngram_novelty",
    "Crawl-novelty score: per document, the fraction of its distinct "
    "3-word shingles whose global FIRST occurrence (min doc_id) is this "
    "document — re-crawled / templated content scores near 0, fresh "
    "content near 1 (the incremental-ingest 'how much is actually new' "
    "metric). One shuffle on the shingle (window min, no join-back), one "
    "per-doc aggregate; at 100 TB the shingle string should be replaced "
    "by its xxhash64 before the exchange (same structure, 8-byte keys).",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s
      FROM (SELECT doc_id, unnest({O_SHINGLES}) AS s FROM documents) t),
    f AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY s) AS first_doc
      FROM sh)
    SELECT doc_id, COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           {o_dround(
               "CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
               " AS DOUBLE) / COUNT(*)", 6)} AS novelty
    FROM f GROUP BY doc_id
    """,
)
def doc_ngram_novelty(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TX.tokens(F.col("text")).alias("__t"))
    sh = (
        toked.select(
            "doc_id",
            F.explode_outer(TX.word_shingles_of(F.col("__t"), 3)).alias("s"),
        )
        .filter(F.col("s").isNotNull())
        .distinct()
    )
    first = F.min("doc_id").over(Window.partitionBy("s"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        sh.withColumn("first_doc", first)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            dround(
                F.sum(
                    F.when(
                        F.col("first_doc") == F.col("doc_id"), 1
                    ).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 additions: DSIR importance weights, cross-source near-dup matrix
# ---------------------------------------------------------------------------

_DSIR_TARGET_LANG = "en"


@q(
    "dsir_importance_weights",
    "DSIR-style data selection score (Xie et al. 2023, 'Data Selection "
    "for Language Models via Importance Resampling'): per-doc log "
    "importance weight = sum over tokens of ln p_target(t) - "
    "ln p_source(t), with target = the English sub-corpus under a "
    "Laplace-smoothed unigram LM (p_tgt = (cnt_tgt+1)/(N_tgt+V)) and "
    "source = the full corpus MLE. High-weight docs resemble the target "
    "domain; resampling by these weights is the standard pretraining "
    "data-mixture tool. Plan: ONE exploded token pass builds a vocab "
    "table carrying BOTH counts (the target count rides along as a "
    "conditional sum), persisted so the scoring join and the "
    "vocab-size aggregate read the same materialization; the scoring "
    "side pre-aggregates to (doc_id, token, cnt) so the vocab join "
    "ships distinct keys (shuffle shrunk by the repetition factor, "
    "Zipf-head skew blunted) and scores as sum(w * cnt); per-source "
    "totals come from a narrow no-explode scan and broadcast. "
    "Determinism: each ln decimal-rounded at 8 dp, per-doc terms sum "
    "as exact decimals (unigram-logprob / source_token_kl precedent).",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({O_TOKS}) AS token FROM documents),
    vocab AS (
      SELECT token, COUNT(*) AS cnt_src,
             CAST(SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1
                           ELSE 0 END) AS BIGINT) AS cnt_tgt
      FROM tok GROUP BY token),
    n AS (
      SELECT CAST(SUM(len({O_TOKS})) AS BIGINT) AS n_src,
             CAST(SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}'
                           THEN len({O_TOKS}) ELSE 0 END) AS BIGINT)
               AS n_tgt
      FROM documents),
    v AS (SELECT COUNT(*) AS vsize FROM vocab),
    terms AS (
      SELECT t.doc_id,
             {o_dround("ln(vb.cnt_tgt + 1.0)", 8)}
           - {o_dround(
               "ln(CAST((SELECT n_tgt FROM n) + (SELECT vsize FROM v)"
               " AS DOUBLE))", 8)}
           - {o_dround("ln(vb.cnt_src)", 8)}
           + {o_dround("ln((SELECT n_src FROM n))", 8)} AS w
      FROM tok t JOIN vocab vb USING (token))
    SELECT doc_id,
           {o_dround(
               "CAST(SUM(CAST(w AS DECIMAL(28,10))) AS DOUBLE)", 6)}
             AS log_importance,
           COUNT(*) AS n_tokens
    FROM terms GROUP BY doc_id
    """,
)
def dsir_importance_weights(spark, sf_dir):
    from pyspark import StorageLevel

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    # The vocab (unigram LM) table is the reusable artifact of this
    # operator — two consumers (the scoring join and the vocab-size
    # aggregate) must read ONE materialization or the exploded token
    # stream is re-aggregated per consumer. Same bounded cache registry
    # as the curation flagship / winnow sketch.
    release_curation_cache()
    vocab = (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("cnt_src"),
            F.sum(
                F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
            ).cast("long").alias("cnt_tgt"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(vocab)
    vs = vocab.agg(F.count(F.lit(1)).cast("long").alias("vsize"))
    ntot = docs.agg(
        F.sum(F.size(TX.tokens(F.col("text"))).cast("long")).alias("n_src"),
        F.sum(
            F.when(
                F.col("lang") == _DSIR_TARGET_LANG,
                F.size(TX.tokens(F.col("text"))),
            ).otherwise(0)
        ).cast("long").alias("n_tgt"),
    )
    w = (
        dround(F.log(F.col("cnt_tgt").cast("double") + 1.0), 8)
        - dround(F.log((F.col("n_tgt") + F.col("vsize")).cast("double")), 8)
        - dround(F.log(F.col("cnt_src").cast("double")), 8)
        + dround(F.log(F.col("n_src").cast("double")), 8)
    )
    # Pre-aggregate the token stream to (doc_id, token, cnt) before the
    # vocab join: one extra hash aggregate (map-side partials shrink it by
    # the per-doc repetition factor) and the join now ships DISTINCT
    # (doc, token) keys — at 100 TB that both shrinks the shuffle and
    # blunts Zipf-head join skew ('the' appears once per doc, not
    # cnt('the') times). Summation stays exact: w is cast to decimal and
    # multiplied by cnt in decimal arithmetic, so sum(w_dec * cnt) ==
    # sum of w_dec repeated cnt times == the oracle's per-token sum.
    tokc = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    scored = (
        tokc.join(vocab, "token")
        .crossJoin(F.broadcast(ntot))
        .crossJoin(F.broadcast(vs))
        .select("doc_id", "cnt", w.alias("w"))
    )
    # decimal(18,10) * decimal(9,0) -> decimal(28,10), exact (|w| < 10^2
    # fits 8 integer digits; per-doc token counts fit 9 digits).
    return scored.groupBy("doc_id").agg(
        dround(
            F.sum(
                F.col("w").cast("decimal(18,10)")
                * F.col("cnt").cast("decimal(9,0)")
            ).cast("double"),
            6,
        ).alias("log_importance"),
        F.sum("cnt").alias("n_tokens"),
    )


@q(
    "neardup_cross_source_matrix",
    "Cross-source near-duplicate leakage matrix: LSH candidates -> "
    "Jaccard >= 0.5 verify -> pair counts per unordered source pair. "
    "The dedup-across-snapshots / train-test-leakage diagnostic a corpus "
    "assembler runs before mixing sources: off-diagonal mass means the "
    "same content arrives through multiple feeds. Scale shape: verified "
    "pairs are bounded by LSH band collisions (never all-pairs), and the "
    "source lookups are two equi-joins against the narrow "
    "(doc_id, source) projection of the corpus.",
    oracle=f"""
    WITH {_o_lsh_ctes(8, 4)},
    t AS (SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM documents),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN t l ON l.doc_id = c.id_a
                  JOIN t r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    srcs AS (SELECT doc_id, source FROM documents)
    SELECT least(sa.source, sb.source) AS source_a,
           greatest(sa.source, sb.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM verified v JOIN srcs sa ON sa.doc_id = v.id_a
                    JOIN srcs sb ON sb.doc_id = v.id_b
    GROUP BY 1, 2
    """,
)
def neardup_cross_source_matrix(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify

    docs = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
    )
    verified = jaccard_verify(
        docs, cand, threshold=0.5,
        toksets=AR.shared_token_sets(spark, sf_dir),
    ).select(
        "id_a", "id_b"
    )
    srcs = docs.select("doc_id", "source")
    j = (
        verified.join(
            srcs.withColumnsRenamed({"doc_id": "id_a", "source": "__sa"}),
            "id_a",
        ).join(
            srcs.withColumnsRenamed({"doc_id": "id_b", "source": "__sb"}),
            "id_b",
        )
    )
    return (
        j.select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


_PASSAGE_MAX_OCC = 50
_PASSAGE_MIN_RUN = 16


def _o_passage(
    table: str = "documents",
    cand: str | None = None,
    with_rolling: bool = True,
    prefix: str = "",
) -> str:
    """CTE chain ending in ``pr`` (id_a, id_b, max_run_grams) — the exact
    shared-passage pairs of ``table``; mirrors
    operators/passages.py exactly (gram positions -> occ in [2, max_occ]
    -> diagonal gaps-and-islands -> max run per pair >= min_run).

    ``cand``: name of a CTE holding (id_a, id_b) candidate pairs — gram
    matching is then routed THROUGH it (the exact_passage_pairs
    ``candidates=`` path) instead of the full gram self-join.
    ``with_rolling=False`` omits the ``c, h`` rolling chain when the
    enclosing WITH already built it (shared-pass composition).
    ``prefix`` renames the whole chain (incl. its rolling head) so two
    verify stages can coexist in one WITH."""
    p = prefix
    head = (
        f"{_o_rolling(_WINNOW_K, table=table, prefix=p)},\n"
        if with_rolling
        else ""
    )
    if cand is None:
        m_cte = f"""{p}m AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b,
             l.pos AS pa, l.pos - r.pos AS diag
      FROM {p}kept l JOIN {p}kept r
        ON l.gh = r.gh AND l.doc_id < r.doc_id)"""
    else:
        m_cte = f"""{p}m AS (
      SELECT cp.id_a, cp.id_b, l.pos AS pa, l.pos - r.pos AS diag
      FROM (SELECT DISTINCT id_a, id_b FROM {cand}) cp
      JOIN {p}kept l ON l.doc_id = cp.id_a
      JOIN {p}kept r ON r.doc_id = cp.id_b AND r.gh = l.gh)"""
    return f"""
    {head}{p}g0 AS (
      SELECT doc_id, t.g['p'] AS pos, t.g['h'] AS gh
      FROM {p}h, unnest(list_transform(range(1, len(hashes) + 1),
               i -> {{'p': i, 'h': hashes[i]}})) AS t(g)),
    {p}gd AS (
      SELECT doc_id, pos, gh,
             COUNT(*) OVER (PARTITION BY gh) AS occ
      FROM {p}g0),
    {p}kept AS (SELECT doc_id, pos, gh FROM {p}gd
             WHERE occ BETWEEN 2 AND {_PASSAGE_MAX_OCC}),
    {m_cte},
    {p}runs AS (
      SELECT id_a, id_b, diag,
             pa - row_number() OVER (
               PARTITION BY id_a, id_b, diag ORDER BY pa) AS island
      FROM {p}m),
    {p}r2 AS (
      SELECT id_a, id_b, COUNT(*) AS run_len
      FROM {p}runs GROUP BY id_a, id_b, diag, island),
    {p}pr AS (
      SELECT id_a, id_b, MAX(run_len) AS max_run_grams
      FROM {p}r2 GROUP BY id_a, id_b
      HAVING MAX(run_len) >= {_PASSAGE_MIN_RUN})"""


@q(
    "doc_exact_passage_pairs",
    "Exact shared-passage pairs (the suffix-array exact-substring dedup "
    "of Lee et al. 2022 'Deduplicating Training Data Makes Language "
    "Models Better', re-expressed relationally): two docs share a "
    "verbatim run of >= 16 consecutive 8-char-gram hashes = an exact "
    "match of >= 23 normalized chars. Positions matching on the same "
    "alignment diagonal (pos_a - pos_b) are grouped into consecutive "
    "runs with the gaps-and-islands trick (pos - row_number per "
    "diagonal), so run detection is one window + one aggregate — no "
    "per-row iteration. Grams occurring > 50 times are dropped first "
    "(boilerplate bound, keeps self-join buckets bounded); the "
    "(doc_id, pos, gram) table is persisted so the Rabin-Karp chain "
    "evaluates once for both join sides. At 100 TB run this as the "
    "verify stage AFTER winnow blocking (candidate pairs only) — "
    "standalone it joins every gram position, which is the honest cost "
    "of exact-match semantics. Complements doc_winnow_overlap_pairs "
    "(sketch containment) with exact passage extent per pair.",
    oracle=f"""
    WITH {_o_passage("documents")}
    SELECT id_a, id_b,
           CAST(max_run_grams AS BIGINT) AS max_run_grams,
           CAST(max_run_grams + {_WINNOW_K - 1} AS BIGINT) AS max_match_chars
    FROM pr
    """,
)
def doc_exact_passage_pairs(spark, sf_dir):
    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.passages import (
        exact_passage_pairs,
        gram_positions,
    )

    # min_occ=2: a gram seen once corpus-wide can never produce a pair,
    # and singletons are the bulk of the table — dropping them before the
    # persist shrinks the cache and both join inputs without changing the
    # result. Persisted so the occurrence-window output evaluates once
    # for both self-join sides (bounded cache registry); the Rabin-Karp
    # arrays come from the session artifact store.
    release_curation_cache()
    kept = gram_positions(
        k=_WINNOW_K, min_occ=2, max_occ=_PASSAGE_MAX_OCC,
        hashes=AR.shared_rolling_hashes(spark, sf_dir, _WINNOW_K),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(kept)
    return exact_passage_pairs(kept, min_run=_PASSAGE_MIN_RUN, k=_WINNOW_K)


# CTE fragment ``wd, wkept, cand`` — winnow-sketch-blocked candidate
# pairs (docs sharing >= _WINNOW_MIN_SHARED stop-bounded fingerprints);
# assumes ``wf`` (doc_id, fingerprint) in scope. Shared by the blocked
# passage composition and the passage recall probe so the blocking the
# probe measures is EXACTLY the blocking the composition runs.
_O_WINNOW_CAND = f"""wd AS (
      SELECT doc_id, fingerprint,
             COUNT(*) OVER (PARTITION BY fingerprint) AS df
      FROM wf),
    wkept AS (SELECT doc_id, fingerprint FROM wd
              WHERE df <= {_WINNOW_MAX_DF}),
    cand AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b
      FROM wkept l JOIN wkept r
        ON l.fingerprint = r.fingerprint AND l.doc_id < r.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_WINNOW_MIN_SHARED})"""


@q(
    "doc_passage_pairs_blocked",
    "The 100 TB composition of the two substring operators: winnow "
    "sketch blocking -> exact passage verify. Candidate pairs come from "
    "doc_winnow_overlap_pairs (docs sharing >= 8 winnow fingerprints, "
    "stop-fingerprint bounded), and exact_passage_pairs(candidates=) "
    "routes the gram-position table THROUGH that pair list — the gram "
    "hash stays in the equi-join key, so per-pair matching is a hash "
    "lookup and the expensive gram-gram join scales with |candidates| x "
    "doc gram length instead of the corpus-wide gram self-join the "
    "standalone doc_exact_passage_pairs pays. Measured at sf0.1: the "
    "gram-match stage materializes 27k rows routed vs 4.98M in the full "
    "self-join (184x); wall-clock is at parity at this SF (3-4s both, "
    "within host noise) because the bounded full join is still cheap "
    "next to the shared fixed costs — the sketch's cost amortizes as "
    "match-row volume grows with corpus duplication density, which is "
    "exactly what 184x quantifies. Winnow guarantees any shared "
    "substring of >= k+w-1 chars yields a shared fingerprint, so pairs "
    "with >= 8 shared fingerprints is a high-recall block for passages "
    "of >= 16 consecutive grams (recall floor measured in "
    "tests/test_llmops.py winnow-containment + candidate-equivalence). "
    "The (dominant, data-bound) Rabin-Karp hash pass runs ONCE: the "
    "winnow sketch is per-window minima of the same hash arrays the "
    "gram table explodes, so the per-doc hash arrays persist and both "
    "tables derive from the cache (the oracle shares the rolling CTE "
    "identically); the sketch and gram tables persist too (each feeds "
    "two join sides).",
    oracle=f"""
    WITH {_o_rolling(_WINNOW_K)},
    {_o_winnow_rows(_WINNOW_W)},
    {_O_WINNOW_CAND},
    {_o_passage(cand="cand", with_rolling=False)}
    SELECT id_a, id_b,
           CAST(max_run_grams AS BIGINT) AS max_run_grams,
           CAST(max_run_grams + {_WINNOW_K - 1} AS BIGINT) AS max_match_chars
    FROM pr
    """,
)
def doc_passage_pairs_blocked(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    release_curation_cache()
    cand, grams = _passage_stack(
        docs, hashes=AR.shared_rolling_hashes(spark, sf_dir, _WINNOW_K)
    )
    from etl_weather_data_pipeline_spark.operators.passages import (
        exact_passage_pairs,
    )

    return exact_passage_pairs(
        grams, min_run=_PASSAGE_MIN_RUN, k=_WINNOW_K, candidates=cand
    )


@q(
    "corpus_decontaminate_eval",
    "PASSAGE-level benchmark decontamination against an eval TABLE — "
    "the GPT-3/LLaMA-style n-gram decontamination pass "
    "(doc_contamination_flags matches a tiny literal phrase set; real "
    "decontamination matches thousands of benchmark DOCUMENTS): a "
    "training doc is contaminated when it shares a verbatim run of >= "
    "16 consecutive 8-gram hashes (>= 23 normalized chars) with any "
    "eval doc. Eval set here = the deterministic doc_id % 37 == 0 "
    "slice (the stand-in benchmark table); everything else is the "
    "training corpus. Composition = the blocked passage machinery "
    "wholesale: ONE shared Rabin-Karp pass feeds sketch + gram table "
    "(_passage_stack), winnow candidates (stop-bounded df <= 50, >= 8 "
    "shared) are filtered to CROSS eval/train pairs only, and the "
    "exact gram-run verify routes through those pairs — never an "
    "all-pairs comparison, and the eval side shrinks the candidate "
    "set to a sliver of the dedup run's. Per-language report: train "
    "docs, contaminated (dropped), clean.",
    oracle=f"""
    WITH {_o_rolling(_WINNOW_K)},
    {_o_winnow_rows(_WINNOW_W)},
    {_O_WINNOW_CAND},
    xcand AS (
      SELECT id_a, id_b FROM cand
      WHERE (id_a % 37 = 0) <> (id_b % 37 = 0)),
    {_o_passage(cand="xcand", with_rolling=False)},
    cont AS (
      SELECT DISTINCT CASE WHEN id_a % 37 = 0 THEN id_b ELSE id_a END
               AS doc_id
      FROM pr),
    train AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % 37 <> 0)
    SELECT t.lang,
           COUNT(*) AS n_train_docs,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clean
    FROM train t LEFT JOIN cont c ON c.doc_id = t.doc_id
    GROUP BY t.lang
    """,
)
def corpus_decontaminate_eval(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.passages import (
        exact_passage_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    release_curation_cache()
    cand, grams = _passage_stack(
        docs, hashes=AR.shared_rolling_hashes(spark, sf_dir, _WINNOW_K)
    )
    is_eval_a = F.col("id_a") % 37 == 0
    is_eval_b = F.col("id_b") % 37 == 0
    xcand = cand.filter(is_eval_a != is_eval_b)
    pairs = exact_passage_pairs(
        grams, min_run=_PASSAGE_MIN_RUN, k=_WINNOW_K, candidates=xcand
    )
    cont = (
        pairs.select(
            F.when(F.col("id_a") % 37 == 0, F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("doc_id")
        )
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    train = docs.filter(F.col("doc_id") % 37 != 0).select(
        "doc_id", "lang"
    )
    return (
        train.join(cont, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.coalesce(F.sum("__c"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            F.count(F.when(F.col("__c").isNull(), 1))
            .cast("long")
            .alias("n_clean"),
        )
    )


def _passage_stack(docs, hashes=None):
    """The shared core of the blocked passage composition: ONE persisted
    Rabin-Karp hash pass feeding both the winnow-candidate sketch and the
    gram-position table. Returns ``(cand, grams)`` — the sketch-blocked
    (id_a, id_b) candidate pairs and the PERSISTED gram table (persisted
    because every consumer joins it at least twice). Caller owns
    release_curation_cache().

    One pass matters: the winnow sketch is per-window minima of the SAME
    hash arrays the gram table explodes, so normalize+hash runs once and
    both tables derive from the cache — without this the composition
    pays the (dominant, data-bound) hash chain twice and can never beat
    the standalone full-gram join.

    ``hashes``: precomputed rolling-hash arrays covering EXACTLY the
    input corpus (the session artifact store, possibly unioned with a
    query-persisted extra slice — the recall probe's planted rows).
    Must already be persisted by the caller; this function then skips
    its own persist, and the blocking df-statistics / occ windows still
    recompute over the given relation (corpus-dependent, never
    memoized)."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from etl_weather_data_pipeline_spark.operators.passages import (
        gram_positions,
        rolling_hashes,
    )

    if hashes is not None:
        hs = hashes
    else:
        hs = rolling_hashes(docs, k=_WINNOW_K).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        _CURATION_PERSISTED.append(hs)
    # Sketch side: winnow fingerprints -> stop-fingerprint bound ->
    # self-join on fingerprint -> pairs sharing >= _WINNOW_MIN_SHARED.
    from etl_weather_data_pipeline_spark.operators.passages import (
        _winnow_arrow_udf,
    )

    fps = hs.select(
        "doc_id",
        F.explode_outer(
            # Arrow window-min twin of TX.winnow_fingerprints_of (r12
            # measured swap; set-identical rows, cross-impl pinned)
            _winnow_arrow_udf(_WINNOW_W)(F.col("__h"))
        ).alias("fingerprint"),
    ).filter(F.col("fingerprint").isNotNull())
    wkept = (
        fps.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("df") <= _WINNOW_MAX_DF)
        .drop("df")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(wkept)
    l, r = wkept.alias("l"), wkept.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.fingerprint") == F.col("r.fingerprint"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _WINNOW_MIN_SHARED)
        .select("id_a", "id_b")
    )
    # Gram side from the same cached hash arrays; persists because it
    # feeds both the l and r sides of the candidate-routed match.
    grams = gram_positions(
        k=_WINNOW_K, min_occ=2, max_occ=_PASSAGE_MAX_OCC, hashes=hs
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(grams)
    return cand, grams


@q(
    "corpus_dedup_funnel",
    "The dedup funnel report every corpus pipeline publishes: how many "
    "documents survive each dedup stage of the cascade exact dedup "
    "(content fingerprint, min-id survivor) -> near-dup removal "
    "(MinHash-LSH candidates, Jaccard >= 0.5 verify, drop the larger "
    "id) -> exact-passage removal (>= 16 consecutive matching gram "
    "hashes, drop the larger id). Stages run coarse-to-fine, each over "
    "the previous survivors, so the expensive passage stage sees the "
    "smallest corpus — the production cascade order. Every stage is the "
    "already-benchmarked bucketed operator (hash-agg, band equi-join, "
    "stop-gram-bounded gram join); survivor sets persist once per stage "
    "via the bounded cache registry because each feeds both its "
    "pair-finder and the next stage's count.",
    oracle=f"""
    WITH s1 AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN (SELECT {O_FINGERPRINT} AS fp, MIN(doc_id) AS doc_id
            FROM documents GROUP BY 1) s
        ON d.doc_id = s.doc_id),
    {_o_lsh_ctes(8, 4, table="s1")},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM s1),
    d2 AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    s2 AS (
      SELECT * FROM s1
      WHERE doc_id NOT IN (SELECT doc_id FROM d2)),
    {_o_passage("s2")},
    d3 AS (SELECT DISTINCT id_b AS doc_id FROM pr),
    s3 AS (
      SELECT * FROM s2
      WHERE doc_id NOT IN (SELECT doc_id FROM d3))
    SELECT '0_input' AS stage, COUNT(*) AS n_docs FROM documents
    UNION ALL SELECT '1_exact', COUNT(*) FROM s1
    UNION ALL SELECT '2_neardup', COUNT(*) FROM s2
    UNION ALL SELECT '3_passage', COUNT(*) FROM s3
    """,
)
def corpus_dedup_funnel(spark, sf_dir):
    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify
    from etl_weather_data_pipeline_spark.operators.passages import (
        exact_passage_pairs,
        gram_positions,
    )

    docs = load(spark, sf_dir, "documents")
    release_curation_cache()
    # Stage 1: exact dedup. The survivor set feeds the LSH signatures,
    # both Jaccard verify sides, and the next stage — persist once.
    # Per-doc artifacts (signatures, token sets, hash arrays) come from
    # the session artifact store semi-joined to each stage's survivor
    # ids — row-local transforms, so filter(artifact) == artifact(
    # filtered input) exactly; the corpus-dependent statistics (band
    # join, df/occ windows) still compute over the survivor relations.
    s1 = (
        dedup_exact(docs)
        .select("doc_id", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(s1)
    cand = minhash_lsh_pairs(
        s1, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir).join(
            s1.select("doc_id"), "doc_id", "left_semi"
        ),
    )
    d2 = (
        jaccard_verify(
            s1, cand, threshold=0.5,
            toksets=AR.shared_token_sets(spark, sf_dir),
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    # Stage 2 survivors feed the gram table and the final counts.
    s2 = s1.join(d2, "doc_id", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _CURATION_PERSISTED.append(s2)
    grams = gram_positions(
        k=_WINNOW_K, min_occ=2, max_occ=_PASSAGE_MAX_OCC,
        hashes=AR.shared_rolling_hashes(spark, sf_dir, _WINNOW_K).join(
            s2.select("doc_id"), "doc_id", "left_semi"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(grams)
    d3 = (
        exact_passage_pairs(grams, min_run=_PASSAGE_MIN_RUN, k=_WINNOW_K)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    s3 = s2.join(d3, "doc_id", "left_anti")

    def stage(label, df):
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(label).alias("stage"), "n_docs"
        )

    return (
        stage("0_input", docs)
        .unionAll(stage("1_exact", s1))
        .unionAll(stage("2_neardup", s2))
        .unionAll(stage("3_passage", s3))
    )


@q(
    "corpus_dedup_funnel_blocked",
    "The dedup funnel with coarse-to-fine carried ALL the way down: "
    "exact dedup -> LSH+Jaccard near-dup removal -> passage removal via "
    "the sketch-BLOCKED composition (winnow candidates >= 8 shared "
    "fingerprints, exact gram-run verify routed through them) instead "
    "of the full gram self-join. This is the production shape of "
    "corpus_dedup_funnel at 100 TB: stage 3's match volume is "
    "candidate-bounded (184x fewer gram-match rows measured standalone "
    "at sf0.1), at the cost of winnow blocking's measured >= 0.9 recall "
    "instead of exactness — stage-3 survivor counts can differ from the "
    "exact funnel's by the blocking misses, which is the documented "
    "trade. One shared Rabin-Karp pass over the stage-2 survivors feeds "
    "both the sketch and the gram table (persisted hash arrays); every "
    "stage persists once via the bounded registry.",
    oracle=f"""
    WITH s1 AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN (SELECT {O_FINGERPRINT} AS fp, MIN(doc_id) AS doc_id
            FROM documents GROUP BY 1) s
        ON d.doc_id = s.doc_id),
    {_o_lsh_ctes(8, 4, table="s1")},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM s1),
    d2 AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    s2 AS (
      SELECT * FROM s1
      WHERE doc_id NOT IN (SELECT doc_id FROM d2)),
    {_o_rolling(_WINNOW_K, table="s2")},
    {_o_winnow_rows(_WINNOW_W)},
    wd AS (
      SELECT doc_id, fingerprint,
             COUNT(*) OVER (PARTITION BY fingerprint) AS df
      FROM wf),
    wkept AS (SELECT doc_id, fingerprint FROM wd
              WHERE df <= {_WINNOW_MAX_DF}),
    wcand AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b
      FROM wkept l JOIN wkept r
        ON l.fingerprint = r.fingerprint AND l.doc_id < r.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}),
    {_o_passage(cand="wcand", with_rolling=False)},
    d3 AS (SELECT DISTINCT id_b AS doc_id FROM pr),
    s3 AS (
      SELECT * FROM s2
      WHERE doc_id NOT IN (SELECT doc_id FROM d3))
    SELECT '0_input' AS stage, COUNT(*) AS n_docs FROM documents
    UNION ALL SELECT '1_exact', COUNT(*) FROM s1
    UNION ALL SELECT '2_neardup', COUNT(*) FROM s2
    UNION ALL SELECT '3_passage', COUNT(*) FROM s3
    """,
)
def corpus_dedup_funnel_blocked(spark, sf_dir):
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from etl_weather_data_pipeline_spark.operators.dedup import jaccard_verify
    from etl_weather_data_pipeline_spark.operators.passages import (
        exact_passage_pairs,
        gram_positions,
        rolling_hashes,
    )

    docs = load(spark, sf_dir, "documents")
    release_curation_cache()
    # Per-doc artifacts from the session store, semi-joined per stage —
    # see corpus_dedup_funnel for the exactness argument.
    s1 = (
        dedup_exact(docs)
        .select("doc_id", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(s1)
    cand = minhash_lsh_pairs(
        s1, num_hashes=8, bands=4,
        signatures=AR.shared_minhash_sigs(spark, sf_dir).join(
            s1.select("doc_id"), "doc_id", "left_semi"
        ),
    )
    d2 = (
        jaccard_verify(
            s1, cand, threshold=0.5,
            toksets=AR.shared_token_sets(spark, sf_dir),
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    s2 = s1.join(d2, "doc_id", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _CURATION_PERSISTED.append(s2)
    # Stage 3, blocked: ONE rolling-hash pass (the artifact store's,
    # filtered to the stage-2 survivors) feeds both the winnow sketch
    # (candidate pairs) and the gram table (exact verify) — the
    # doc_passage_pairs_blocked composition applied inside the cascade.
    hs = AR.shared_rolling_hashes(spark, sf_dir, _WINNOW_K).join(
        s2.select("doc_id"), "doc_id", "left_semi"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(hs)
    from etl_weather_data_pipeline_spark.operators.passages import (
        _winnow_arrow_udf,
    )

    fps = hs.select(
        "doc_id",
        F.explode_outer(
            # Arrow window-min twin of TX.winnow_fingerprints_of (r12
            # measured swap; set-identical rows, cross-impl pinned)
            _winnow_arrow_udf(_WINNOW_W)(F.col("__h"))
        ).alias("fingerprint"),
    ).filter(F.col("fingerprint").isNotNull())
    wkept = (
        fps.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("df") <= _WINNOW_MAX_DF)
        .drop("df")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(wkept)
    wl, wr = wkept.alias("l"), wkept.alias("r")
    wcand = (
        wl.join(
            wr,
            (F.col("l.fingerprint") == F.col("r.fingerprint"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _WINNOW_MIN_SHARED)
        .select("id_a", "id_b")
    )
    grams = gram_positions(
        k=_WINNOW_K, min_occ=2, max_occ=_PASSAGE_MAX_OCC, hashes=hs
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(grams)
    d3 = (
        exact_passage_pairs(
            grams, min_run=_PASSAGE_MIN_RUN, k=_WINNOW_K, candidates=wcand
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    s3 = s2.join(d3, "doc_id", "left_anti")

    def stage(label, df):
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(label).alias("stage"), "n_docs"
        )

    return (
        stage("0_input", docs)
        .unionAll(stage("1_exact", s1))
        .unionAll(stage("2_neardup", s2))
        .unionAll(stage("3_passage", s3))
    )


def incremental_funnel(store, batch, signatures=None, toksets=None):
    """The per-ingest dedup cascade: admit only batch docs that are (1)
    not exact-dups of the store or of a smaller-id batch doc, then (2)
    not near-dups (LSH candidates + Jaccard >= 0.5 verify) of any store
    doc or of a surviving smaller-id batch doc. The store is immutable —
    store-store pairs are never even considered for dropping.

    Returns ``(store_k, b1, b2)``: the persisted store projection, and
    the exact-stage / near-dup-stage batch survivors (doc_id, text).
    store_k and b1 persist via the bounded cache registry (caller's
    action consumes them; the next query releases).

    Scale: within the query the store side's fingerprints and MinHash
    signatures are recomputed from the store relation — self-contained,
    one pass. A production periodic-ingest pipeline amortizes exactly
    these as persisted tables keyed by the store (the store-probing
    pattern of streaming/corpus.py), so each batch pays O(|batch|) hash
    work plus equi-joins against the stores, never a store rescan; the
    joins here are shaped identically (fingerprint anti-join; band
    equi-join bounded by LSH collisions; verified pairs filtered to
    those touching the batch).

    ``signatures``/``toksets``: per-doc artifact tables covering every
    (store ∪ batch) doc with unchanged text (the session artifact
    store) — signatures are semi-joined to the union's ids (the band
    self-join must see EXACTLY the union's rows), toksets pass through
    unfiltered (verify equi-joins pick candidate ids only).
    """
    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.dedup import (
        dedup_incremental,
        jaccard_verify,
    )

    store_k = store.select("doc_id", "text").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _CURATION_PERSISTED.append(store_k)
    surv = dedup_incremental(batch, store_k)
    b1 = (
        batch.select("doc_id", "text")
        .join(surv.select("doc_id"), "doc_id", "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(b1)
    u = store_k.unionByName(b1)
    cand = minhash_lsh_pairs(
        u, num_hashes=8, bands=4,
        signatures=(
            signatures.join(u.select("doc_id"), "doc_id", "left_semi")
            if signatures is not None
            else None
        ),
    )
    ver = jaccard_verify(
        u, cand, threshold=0.5, toksets=toksets
    ).select("id_a", "id_b")
    # One pass over verified pairs: flag which side is new, then each
    # pair drops at most one batch doc — id_b when it is new (store wins,
    # and within-batch the smaller id_a wins), else id_a when it is new
    # (its partner is store). Store docs are never dropped.
    na = b1.select(F.col("doc_id").alias("id_a"), F.lit(True).alias("__na"))
    nb = b1.select(F.col("doc_id").alias("id_b"), F.lit(True).alias("__nb"))
    flagged = ver.join(na, "id_a", "left").join(nb, "id_b", "left")
    dropped = (
        flagged.select(
            F.when(F.col("__nb").isNotNull(), F.col("id_b"))
            .when(F.col("__na").isNotNull(), F.col("id_a"))
            .alias("doc_id")
        )
        .filter(F.col("doc_id").isNotNull())
        .distinct()
    )
    b2 = b1.join(dropped, "doc_id", "left_anti")
    return store_k, b1, b2


@q(
    "corpus_dedup_funnel_incremental",
    "The dedup funnel a PERIODIC-ingest pipeline actually runs: a new "
    "batch (doc_id % 5 = 0 — the daily slice) admitted against an "
    "immutable already-deduped survivor store (exact-dedup of the rest "
    "of the corpus). Stage 1: within-batch exact dedup + fingerprint "
    "anti-join against the store (dedup_incremental — idempotent under "
    "replay). Stage 2: near-dup removal, batch-touching pairs only — "
    "LSH candidates over store+survivors, Jaccard >= 0.5 verify, drop "
    "a batch doc when it matches any store doc (store wins) or a "
    "smaller-id batch survivor; store-store pairs are never dropped. "
    "Report = per-stage admission counts. At 100 TB the store's "
    "fingerprint and signature tables are maintained persistently "
    "(streaming/corpus.py store-probe pattern); the per-batch work is "
    "batch-linear hash passes + equi-joins.",
    oracle=f"""
    WITH batch AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
    store_raw AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
    store AS (
      SELECT d.doc_id, d.text FROM store_raw d
      JOIN (SELECT {O_FINGERPRINT} AS fp, MIN(doc_id) AS doc_id
            FROM store_raw GROUP BY 1) s
        ON d.doc_id = s.doc_id),
    bsurv AS (
      SELECT fp, MIN(doc_id) AS doc_id
      FROM (SELECT doc_id, {O_FINGERPRINT} AS fp FROM batch) t
      GROUP BY fp),
    b1 AS (
      SELECT d.doc_id, d.text FROM batch d
      JOIN bsurv b ON b.doc_id = d.doc_id
      WHERE b.fp NOT IN (SELECT {O_FINGERPRINT} FROM store)),
    u AS (SELECT doc_id, text FROM store
          UNION ALL SELECT doc_id, text FROM b1),
    {_o_lsh_ctes(8, 4, table="u")},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM u),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    newids AS (SELECT doc_id FROM b1),
    dropped AS (
      SELECT id_b AS doc_id FROM ver
      WHERE id_b IN (SELECT doc_id FROM newids)
      UNION
      SELECT id_a FROM ver
      WHERE id_a IN (SELECT doc_id FROM newids)
        AND id_b NOT IN (SELECT doc_id FROM newids)),
    b2 AS (
      SELECT * FROM b1
      WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
    SELECT '0_store' AS stage, COUNT(*) AS n_docs FROM store
    UNION ALL SELECT '1_batch', COUNT(*) FROM batch
    UNION ALL SELECT '2_exact', COUNT(*) FROM b1
    UNION ALL SELECT '3_neardup', COUNT(*) FROM b2
    """,
)
def corpus_dedup_funnel_incremental(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    store_raw = docs.filter(F.col("doc_id") % 5 != 0)
    release_curation_cache()
    store = dedup_exact(store_raw).select("doc_id", "text")
    store_cached, b1, b2 = incremental_funnel(
        store, batch,
        signatures=AR.shared_minhash_sigs(spark, sf_dir),
        toksets=AR.shared_token_sets(spark, sf_dir),
    )

    def stage(label, df):
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(label).alias("stage"), "n_docs"
        )

    return (
        stage("0_store", store_cached)
        .unionAll(stage("1_batch", batch))
        .unionAll(stage("2_exact", b1))
        .unionAll(stage("3_neardup", b2))
    )


@q(
    "corpus_funnel_merge_state",
    "Driver-grade evidence for the FULL-FUNNEL streaming merge "
    "(streaming/corpus.py merge_batch_neardup_into_corpus with "
    "passage_min_run — stage 3 = the blocked passage composition "
    "probing the store's bucketed _winnow fingerprint table): builds a "
    "store with the stage-2-only sink (one batch, doc_id%3==0), then "
    "runs ONE passage-aware merge of the full overlapping feed — which "
    "also exercises the _winnow legacy-store migration — then REPLAYS "
    "it to prove idempotency (a non-zero third append raises), and "
    "returns the store's post-merge state. The oracle replays all "
    "three stages relationally: exact fingerprint anti-join, prefixed "
    "cross-table LSH band probe + Jaccard verify, then winnow "
    "fingerprints for store and batch (prefixed rolling chains), BOTH "
    "stop bounds (store-df>50 on the cross probe; batch-df>50 on the "
    "within-batch join AND the cross probe — exactly the sink's "
    "locality semantics, r8), shared>=8 candidates, and the exact "
    "gram-run verify over the candidate-pruned union (prefixed "
    "passage chain).",
    oracle=f"""
    WITH b1 AS (
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 3 = 0),
    f1 AS (SELECT doc_id, text, lang, {O_FINGERPRINT} AS fp FROM b1),
    s1a AS (
      SELECT f.doc_id, f.text, f.lang, f.fp FROM f1 f
      JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM f1 GROUP BY 1) m
        ON m.doc_id = f.doc_id),
    {_o_lsh_ctes(8, 4, table="s1a", prefix="p1")},
    t1 AS (SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM s1a),
    drop1 AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM p1cand c JOIN t1 l ON l.doc_id = c.id_a
                    JOIN t1 r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    store1 AS (
      SELECT * FROM s1a
      WHERE doc_id NOT IN (SELECT doc_id FROM drop1)),
    f2 AS (SELECT doc_id, text, lang, {O_FINGERPRINT} AS fp
           FROM documents),
    s2a AS (
      SELECT f.doc_id, f.text, f.lang, f.fp FROM f2 f
      JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM f2 GROUP BY 1) m
        ON m.doc_id = f.doc_id),
    s2b AS (
      SELECT * FROM s2a
      WHERE fp NOT IN (SELECT fp FROM store1)),
    {_o_lsh_ctes(8, 4, table="store1", prefix="st")},
    {_o_lsh_ctes(8, 4, table="s2b", prefix="bb")},
    cross_cand AS (
      SELECT DISTINCT st.doc_id AS id_a, bb.doc_id AS id_b
      FROM stbands st JOIN bbbands bb
        ON st.band_idx = bb.band_idx AND st.band_val = bb.band_val),
    cand2 AS (
      SELECT id_a, id_b FROM bbcand
      UNION SELECT id_a, id_b FROM cross_cand),
    t2 AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM store1
      UNION ALL
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM s2b),
    drop2 AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand2 c JOIN t2 l ON l.doc_id = c.id_a
                   JOIN t2 r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    surv2 AS (
      SELECT * FROM s2b
      WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
    {_o_rolling(_WINNOW_K, table="store1", prefix="sw")},
    {_o_winnow_rows(_WINNOW_W, prefix="sw")},
    {_o_rolling(_WINNOW_K, table="surv2", prefix="bw")},
    {_o_winnow_rows(_WINNOW_W, prefix="bw")},
    stop3 AS (
      SELECT fingerprint FROM swwf
      GROUP BY 1 HAVING COUNT(*) > {_WINNOW_MAX_DF}),
    bstop3 AS (
      SELECT fingerprint FROM bwwf
      GROUP BY 1 HAVING COUNT(*) > {_WINNOW_MAX_DF}),
    bwfs AS (
      SELECT * FROM bwwf WHERE fingerprint NOT IN
        (SELECT fingerprint FROM bstop3)),
    within3 AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bwfs l JOIN bwfs r
        ON l.fingerprint = r.fingerprint AND l.doc_id < r.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}),
    vs3 AS (
      SELECT s.doc_id AS id_a, b.doc_id AS id_b
      FROM (SELECT * FROM swwf WHERE fingerprint NOT IN
              (SELECT fingerprint FROM stop3)) s
      JOIN (SELECT * FROM bwfs b2 WHERE b2.fingerprint NOT IN
              (SELECT fingerprint FROM stop3)) b
        ON s.fingerprint = b.fingerprint
      GROUP BY 1, 2 HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}),
    cand3 AS (
      SELECT id_a, id_b FROM within3
      UNION SELECT id_a, id_b FROM vs3),
    texts3 AS (
      SELECT doc_id, text FROM surv2
      UNION ALL
      SELECT doc_id, text FROM store1
      WHERE doc_id IN (SELECT id_a FROM vs3)),
    {_o_passage(table="texts3", cand="cand3", prefix="pg")},
    drop3 AS (SELECT DISTINCT id_b AS doc_id FROM pgpr),
    surv3 AS (
      SELECT * FROM surv2
      WHERE doc_id NOT IN (SELECT doc_id FROM drop3))
    SELECT doc_id, lang, fp AS fingerprint FROM store1
    UNION ALL SELECT doc_id, lang, fp FROM surv3
    """,
)
def corpus_funnel_merge_state(spark, sf_dir):
    """Live twin of the full-funnel streaming merge (md5 family so DuckDB
    reproduces fingerprints, signatures, band values, and the winnow /
    gram arithmetic bit-for-bit)."""
    import tempfile

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        bands_table_name,
        merge_batch_neardup_into_corpus,
        winnow_table_name,
    )

    import shutil

    tmp = tempfile.mkdtemp(prefix="corpus_funnel_merge_")
    store = tmp + "/store"
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    try:
        # store built stage-2-only: the passage-aware merge below then
        # exercises the _winnow legacy-store migration path live
        merge_batch_neardup_into_corpus(
            docs.filter(F.col("doc_id") % 3 == 0), store,
            hash_family="md5", band_buckets=8,
        )
        merge_batch_neardup_into_corpus(
            docs, store, hash_family="md5", band_buckets=8,
            passage_min_run=16,
        )
        replayed = merge_batch_neardup_into_corpus(
            docs, store, hash_family="md5", band_buckets=8,
            passage_min_run=16,
        )
        if replayed:  # explicit raise: bare assert vanishes under python -O
            raise AssertionError(
                f"replay appended {replayed} rows — not idempotent"
            )
        return (
            spark.read.parquet(store)
            .select("doc_id", "lang", "fingerprint")
            .localCheckpoint()  # eager: the tmpdir is removed below
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bands_table_name(store)}")
        spark.sql(f"DROP TABLE IF EXISTS {winnow_table_name(store)}")
        shutil.rmtree(tmp, ignore_errors=True)


@q(
    "corpus_dedup_funnel_attached",
    "The ATTACH path (r11 verdict directive #4): a READ-ONLY batch "
    "funnel (streaming/corpus.py judge_batch_against_store) over a "
    "POPULATED full-funnel store derives every store-side artifact "
    "from the persisted tables — stage 1 probes the store's "
    "fingerprint column, stage 2 the bucketed _bands table, stage 3 "
    "the bucketed _winnow table; the only store text read is the "
    "candidate-pruned verify fetch. Store = full-funnel merge of "
    "doc_id%3==0; judged batch = the full overlapping feed. Exact "
    "cross-checks (hash-fail on any admission drift): per-stage counts "
    "n_batch / n_after_exact / n_after_neardup / n_survivors, each "
    "replayed relationally (batch-1 three-stage curation, then exact "
    "fp anti-join, cross-table LSH band probe + Jaccard verify, winnow "
    "blocking with BOTH df stop bounds, gram-run passage verify). "
    "Invariant booleans: judge_matches_merge (running the merge sink "
    "on the same batch afterwards admits EXACTLY the judge's survivor "
    "ids — the attach path and the production sink share stage code "
    "and may never drift) and judge_wrote_nothing (store + side-table "
    "file listings byte-identical across the judge). At 100 TB this is "
    "the cross-session amortization story: periodic batch re-curation "
    "is O(batch) probes against persisted artifacts, never a "
    "store-wide re-hash.",
    oracle=f"""
    WITH b1 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
    f1 AS (SELECT doc_id, text, {O_FINGERPRINT} AS fp FROM b1),
    s1a AS (
      SELECT f.doc_id, f.text, f.fp FROM f1 f
      JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM f1 GROUP BY 1) m
        ON m.doc_id = f.doc_id),
    {_o_lsh_ctes(8, 4, table="s1a", prefix="p1")},
    t1 AS (SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM s1a),
    drop1 AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM p1cand c JOIN t1 l ON l.doc_id = c.id_a
                    JOIN t1 r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    s1b AS MATERIALIZED (
      SELECT * FROM s1a
      WHERE doc_id NOT IN (SELECT doc_id FROM drop1)),
    {_o_rolling(_WINNOW_K, table="s1b", prefix="w1")},
    {_o_winnow_rows(_WINNOW_W, prefix="w1")},
    bstop1 AS (
      SELECT fingerprint FROM w1wf
      GROUP BY 1 HAVING COUNT(*) > {_WINNOW_MAX_DF}),
    w1fs AS (
      SELECT * FROM w1wf WHERE fingerprint NOT IN
        (SELECT fingerprint FROM bstop1)),
    within1 AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b
      FROM w1fs l JOIN w1fs r
        ON l.fingerprint = r.fingerprint AND l.doc_id < r.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}),
    texts1 AS (SELECT doc_id, text FROM s1b),
    {_o_passage(table="texts1", cand="within1", prefix="q1")},
    dropp1 AS (SELECT DISTINCT id_b AS doc_id FROM q1pr),
    store1 AS MATERIALIZED (
      SELECT * FROM s1b
      WHERE doc_id NOT IN (SELECT doc_id FROM dropp1)),
    f2 AS (SELECT doc_id, text, {O_FINGERPRINT} AS fp FROM documents),
    s2a AS (
      SELECT f.doc_id, f.text, f.fp FROM f2 f
      JOIN (SELECT fp, MIN(doc_id) AS doc_id FROM f2 GROUP BY 1) m
        ON m.doc_id = f.doc_id),
    s2b AS MATERIALIZED (
      SELECT * FROM s2a
      WHERE fp NOT IN (SELECT fp FROM store1)),
    {_o_lsh_ctes(8, 4, table="store1", prefix="st")},
    {_o_lsh_ctes(8, 4, table="s2b", prefix="bb")},
    cross_cand AS (
      SELECT DISTINCT st.doc_id AS id_a, bb.doc_id AS id_b
      FROM stbands st JOIN bbbands bb
        ON st.band_idx = bb.band_idx AND st.band_val = bb.band_val),
    cand2 AS (
      SELECT id_a, id_b FROM bbcand
      UNION SELECT id_a, id_b FROM cross_cand),
    t2 AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM store1
      UNION ALL
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM s2b),
    drop2 AS (
      SELECT DISTINCT c.id_b AS doc_id
      FROM cand2 c JOIN t2 l ON l.doc_id = c.id_a
                   JOIN t2 r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    surv2 AS MATERIALIZED (
      SELECT * FROM s2b
      WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
    {_o_rolling(_WINNOW_K, table="store1", prefix="sw")},
    {_o_winnow_rows(_WINNOW_W, prefix="sw")},
    {_o_rolling(_WINNOW_K, table="surv2", prefix="bw")},
    {_o_winnow_rows(_WINNOW_W, prefix="bw")},
    stop3 AS (
      SELECT fingerprint FROM swwf
      GROUP BY 1 HAVING COUNT(*) > {_WINNOW_MAX_DF}),
    bstop3 AS (
      SELECT fingerprint FROM bwwf
      GROUP BY 1 HAVING COUNT(*) > {_WINNOW_MAX_DF}),
    bwfs AS (
      SELECT * FROM bwwf WHERE fingerprint NOT IN
        (SELECT fingerprint FROM bstop3)),
    within3 AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bwfs l JOIN bwfs r
        ON l.fingerprint = r.fingerprint AND l.doc_id < r.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}),
    vs3 AS (
      SELECT s.doc_id AS id_a, b.doc_id AS id_b
      FROM (SELECT * FROM swwf WHERE fingerprint NOT IN
              (SELECT fingerprint FROM stop3)) s
      JOIN (SELECT * FROM bwfs b2 WHERE b2.fingerprint NOT IN
              (SELECT fingerprint FROM stop3)) b
        ON s.fingerprint = b.fingerprint
      GROUP BY 1, 2 HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}),
    cand3 AS (
      SELECT id_a, id_b FROM within3
      UNION SELECT id_a, id_b FROM vs3),
    texts3 AS (
      SELECT doc_id, text FROM surv2
      UNION ALL
      SELECT doc_id, text FROM store1
      WHERE doc_id IN (SELECT id_a FROM vs3)),
    {_o_passage(table="texts3", cand="cand3", prefix="pg")},
    drop3 AS (SELECT DISTINCT id_b AS doc_id FROM pgpr),
    surv3 AS (
      SELECT * FROM surv2
      WHERE doc_id NOT IN (SELECT doc_id FROM drop3))
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_batch,
           CAST((SELECT COUNT(*) FROM s2b) AS BIGINT) AS n_after_exact,
           CAST((SELECT COUNT(*) FROM surv2) AS BIGINT)
             AS n_after_neardup,
           CAST((SELECT COUNT(*) FROM surv3) AS BIGINT) AS n_survivors,
           TRUE AS judge_matches_merge,
           TRUE AS judge_wrote_nothing
    """,
)
def corpus_dedup_funnel_attached(spark, sf_dir):
    """Live attach-path twin (md5 family so DuckDB reproduces every
    fingerprint, band value, and winnow/gram hash bit-for-bit).
    Reference parity: the reference has no streaming/attach surface;
    this extends its batch curation the way its load-history audit
    extends loads (src/load.py provenance pattern)."""
    import glob
    import tempfile

    from etl_weather_data_pipeline_spark.streaming.corpus import (
        bands_table_name,
        judge_batch_against_store,
        merge_batch_neardup_into_corpus,
        winnow_table_name,
    )

    import shutil

    tmp = tempfile.mkdtemp(prefix="corpus_funnel_attach_")
    store = tmp + "/store"
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    try:
        merge_batch_neardup_into_corpus(
            docs.filter(F.col("doc_id") % 3 == 0), store,
            hash_family="md5", band_buckets=8, passage_min_run=16,
            history=False,
        )

        def state():
            return sorted(
                glob.glob(f"{store}/**/*.parquet", recursive=True)
            )

        before_files = state()
        # ids_before materializes EAGERLY before the merge writes
        # (recache-by-path: a lazy read would re-list post-append)
        ids_before = (
            spark.read.parquet(store).select("doc_id").localCheckpoint()
        )
        rep = judge_batch_against_store(
            docs, store, hash_family="md5", band_buckets=8,
            passage_min_run=16,
        )
        readonly_ok = state() == before_files
        jids = rep["survivors"].select("doc_id")
        n_merged = merge_batch_neardup_into_corpus(
            docs, store, hash_family="md5", band_buckets=8,
            passage_min_run=16, history=False,
        )
        appended = spark.read.parquet(store).select("doc_id").join(
            ids_before, "doc_id", "left_anti"
        )
        n_extra = appended.join(jids, "doc_id", "left_anti").count()
        n_missed = jids.join(appended, "doc_id", "left_anti").count()
        matches = bool(
            n_merged == rep["n_survivors"]
            and n_extra == 0
            and n_missed == 0
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bands_table_name(store)}")
        spark.sql(f"DROP TABLE IF EXISTS {winnow_table_name(store)}")
        shutil.rmtree(tmp, ignore_errors=True)  # r12 leak fix
    return spark.range(1).select(
        F.lit(rep["n_batch"]).cast("long").alias("n_batch"),
        F.lit(rep["n_after_exact"]).cast("long").alias("n_after_exact"),
        F.lit(rep["n_after_neardup"]).cast("long").alias(
            "n_after_neardup"
        ),
        F.lit(rep["n_survivors"]).cast("long").alias("n_survivors"),
        F.lit(matches).alias("judge_matches_merge"),
        F.lit(bool(readonly_ok)).alias("judge_wrote_nothing"),
    )


@q(
    "corpus_attach_judge_semantic",
    "Stage 4 of the ATTACH path (r12 verdict directive #2 — the "
    "semantic-attach judge): judge_batch_against_store with "
    "embedding_col= runs a READ-ONLY re-curation over a populated "
    "store INCLUDING SemDeDup judgment against the store's persisted "
    "_vectors_ivf index — batch vectors assign map-only to the FROZEN "
    "quantizer and compare within-cell against the partition-pruned "
    "store vectors. The store's quantizer comes from the session "
    "centroid memo (plans/artifacts.py shared_kmeans_centroids k=8 "
    "i=3, the OFFLINE-trained production shape, routed via "
    "semantic_bootstrap_centroids — r12 directive #6), shared "
    "bit-identical with ann_ivf_trained_topk. Scenario: docs with "
    "vectors (doc_id = vec_id) merge doc_id%6==0 into a fresh store "
    "with the semantic stage ON; the judged batch is the overlapping "
    "doc_id%2==0 half-feed plus PLANTED semantic twins (every 30th "
    "doc — guaranteed store-resident since 30 divides by 6, "
    "disjoint-token texts so stages 1-2 pass them, embedding scaled "
    "1.001 — cosine ~1 vs the store twin). Exact cross-checks: "
    "n_docs_with_vectors, n_planted, n_batch. Invariant booleans: "
    "judge_matches_merge (running the production sink on the same "
    "batch afterwards admits EXACTLY the judge's survivor ids — all "
    "four stages, shared code may never drift), judge_wrote_nothing "
    "(recursive store file listing byte-identical across the judge, "
    "_vectors_ivf included), planted_recall_floor_ok (>=90% of "
    "planted twins whose target is in the index are semantically "
    "dropped), centroids_from_memo (the store's frozen matrix equals "
    "the memoized Lloyd result bit-for-bit). Clustering internals are "
    "not SQL-replayable; the oracle cross-checks the exact columns. "
    "At 100 TB this closes the last attach gap: periodic semantic "
    "re-curation is O(batch) map-side assigns + partition-pruned "
    "probes against the persisted index, never a store-wide re-embed "
    "or re-cluster.",
    oracle="""
    WITH base AS (
      SELECT d.doc_id FROM documents d
      JOIN embeddings e ON e.vec_id = d.doc_id),
    p AS (SELECT COUNT(*) AS n_planted FROM base WHERE doc_id % 30 = 0)
    SELECT CAST((SELECT COUNT(*) FROM base) AS BIGINT)
             AS n_docs_with_vectors,
           CAST((SELECT n_planted FROM p) AS BIGINT) AS n_planted,
           CAST((SELECT COUNT(*) FROM base WHERE doc_id % 2 = 0)
                + (SELECT n_planted FROM p) AS BIGINT) AS n_batch,
           TRUE AS judge_matches_merge,
           TRUE AS judge_wrote_nothing,
           TRUE AS planted_recall_floor_ok,
           TRUE AS centroids_from_memo
    """,
)
def corpus_attach_judge_semantic(spark, sf_dir):
    """Live semantic-attach twin. Reference parity: the reference has
    no vector/streaming surface; this extends its batch curation the
    way src/load.py's provenance auditing extends loads."""
    import glob
    import os
    import shutil
    import tempfile

    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        VECTORS_IVF_SUBDIR,
        bands_table_name,
        judge_batch_against_store,
        merge_batch_neardup_into_corpus,
    )

    tmp = tempfile.mkdtemp(prefix="corpus_attach_sem_")
    store = tmp + "/store"
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings")
    # Collision guard on EVERY base row, not just the planted targets:
    # a real doc_id >= 1e6 anywhere in the feed would be misread as a
    # planted twin by the id-keyed audit joins (deflating n_dropped /
    # flipping the recall floor) with no diagnostic — so the whole
    # query refuses such data loudly instead.
    base = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        "doc_id",
    ).select(
        F.when(F.col("doc_id") < 1000000, F.col("doc_id"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "corpus_attach_judge_semantic: doc_id >= 1e6 "
                    "collides with the planted-id space; raise the "
                    "offset"
                )
            )
        )
        .alias("doc_id"),
        "text",
        "embedding",
    )
    # planted semantic twins: texts are disjoint-token by construction
    # (the id is embedded in every non-shared token, pairwise Jaccard
    # ~1/15) so stages 1-3 pass them; the 1.001-scaled embedding keeps
    # the direction (cosine ~1) and, away from cell boundaries, the
    # argmin cell — the recall floor (not an all-dropped claim)
    # absorbs boundary flips, exactly like corpus_semdedup_global.
    targets = base.filter(F.col("doc_id") % 30 == 0)
    planted = targets.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("planted"),
            *[
                F.concat(
                    F.lit(f"w{j}x"), F.col("doc_id").cast("string")
                )
                for j in range(7)
            ],
        ).alias("text"),
        F.transform(
            F.col("embedding"),
            lambda x: (x.cast("double") * F.lit(1.001)).cast("float"),
        ).alias("embedding"),
    )
    # judged batch = the %2==0 half-feed (the store slice %6==0 is a
    # subset, so stage-1 overlap is real) + the planted twins; slicing
    # halves the judge's and the equivalence merge's data-dependent
    # cost without touching any invariant (r13: the bench entry was
    # floor x3 + full-feed passes = 27s at sf0.1)
    batch = base.filter(F.col("doc_id") % 2 == 0).unionByName(planted)
    # the memoized offline quantizer (one Lloyd per session, shared
    # bit-identical with ann_ivf_trained_topk — r12 directive #6)
    _, cents = AR.shared_kmeans_centroids(spark, sf_dir, k=8, iterations=3)
    # max_cell_df stays a HARD bound (the standing self-join rule) but
    # is sized so no testdata cell can trip it (embeddings <= 2k rows
    # at bench SF -> cells <= |batch|): a fail-open skip would admit a
    # planted twin unjudged and flip planted_recall_floor_ok scale-
    # dependently. Production sinks keep the tight default (1000).
    cfg = dict(
        band_buckets=8, history=False, embedding_col="embedding",
        semantic_cells=8, semantic_max_cell_df=10**6,
    )
    try:
        merge_batch_neardup_into_corpus(
            base.filter(F.col("doc_id") % 6 == 0), store,
            semantic_bootstrap_centroids=cents, **cfg,
        )
        frozen = AX.read_ivf_centroid_matrix(
            spark, f"{store}/{VECTORS_IVF_SUBDIR}"
        )
        memo_ok = frozen == [[float(x) for x in c] for c in cents]
        # which planted targets actually reached the index (a target
        # dropped by the store build's own stages 2/4 has no indexed
        # vector to witness its twin) — the recall denominator; counted
        # in the fused audit aggregate after the judge below
        indexed = AX.read_ivf_vectors(
            spark, f"{store}/{VECTORS_IVF_SUBDIR}"
        ).select("doc_id")  # the sink indexes under its own id_col

        def state():
            return sorted(
                (p, os.path.getsize(p))
                for p in glob.glob(f"{store}/**/*", recursive=True)
                if os.path.isfile(p)
            )

        before_files = state()
        ids_before = (
            spark.read.parquet(store).select("doc_id").localCheckpoint()
        )
        rep = judge_batch_against_store(
            batch, store, band_buckets=8, embedding_col="embedding",
            semantic_max_cell_df=10**6,
        )
        readonly_ok = state() == before_files
        surv = rep["survivors"].select("doc_id")
        # Fused planted-recall audit — ONE action instead of four
        # (multi-action pipelines pay the per-action driver planning
        # tax even over checkpointed frames; r13 floor profile). Every
        # planted id in surv is targets+1e6 by construction (all batch
        # ids >= 1e6 ARE the planted twins), so counting kept twins
        # through the targets join equals the old surv-side filter
        # count; n_dropped counts twins whose target reached the index
        # (the recall denominator n_targets_indexed) and which the
        # judge dropped — identical to the old anti/semi-join pair.
        audit = (
            targets.select("doc_id")
            .join(
                F.broadcast(
                    indexed.distinct().withColumn("__idx", F.lit(True))
                ),
                "doc_id",
                "left",
            )
            .join(
                F.broadcast(
                    surv.filter(F.col("doc_id") >= 1000000).select(
                        (F.col("doc_id") - 1000000).alias("doc_id"),
                        F.lit(True).alias("__kept"),
                    )
                ),
                "doc_id",
                "left",
            )
            .agg(
                F.count(F.lit(1)).alias("n_planted"),
                F.count("__idx").alias("n_targets_indexed"),
                F.count("__kept").alias("planted_kept"),
                F.sum(
                    (
                        F.col("__idx").isNotNull()
                        & F.col("__kept").isNull()
                    ).cast("long")
                ).alias("n_dropped"),
            )
            .first()
        )
        n_planted = audit["n_planted"]
        n_targets_indexed = audit["n_targets_indexed"]
        planted_kept = audit["planted_kept"]
        n_dropped_planted_with_target = audit["n_dropped"] or 0
        recall_ok = bool(
            n_targets_indexed > 0
            and n_dropped_planted_with_target >= 0.9 * n_targets_indexed
        )
        n_merged = merge_batch_neardup_into_corpus(
            batch, store, semantic_bootstrap_centroids=cents, **cfg
        )
        appended = spark.read.parquet(store).select("doc_id").join(
            ids_before, "doc_id", "left_anti"
        )
        # judge==merge symmetric difference in ONE action: a full-outer
        # join of the appended ids with the judge's survivors — a null
        # flag on either side is a divergence (old shape: two anti-join
        # counts over the same pair of frames).
        # ONE crossJoined action for the post-merge checks (r15,
        # verdict #3): the judge==merge symmetric difference and the
        # base count are independent 1-row aggregates over frames that
        # both exist after the equivalence merge — folding them saves
        # one full per-action planning gap. (The planted-recall audit
        # above CANNOT join this fuse: its `indexed` frame must
        # evaluate BEFORE the second merge appends to the index.)
        em_agg = (
            appended.withColumn("__a", F.lit(True))
            .join(
                surv.withColumn("__s", F.lit(True)),
                "doc_id",
                "full_outer",
            )
            .agg(
                F.sum(F.col("__s").isNull().cast("long")).alias("x"),
                F.sum(F.col("__a").isNull().cast("long")).alias("m"),
            )
        )
        em = em_agg.crossJoin(
            base.agg(F.count(F.lit(1)).alias("__nb"))
        ).first()
        n_extra, n_missed = em["x"] or 0, em["m"] or 0
        matches = bool(
            n_merged == rep["n_survivors"]
            and n_extra == 0
            and n_missed == 0
        )
        n_base = em["__nb"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bands_table_name(store)}")
        shutil.rmtree(tmp, ignore_errors=True)
    assert planted_kept + n_dropped_planted_with_target <= n_planted
    return spark.range(1).select(
        F.lit(n_base).cast("long").alias("n_docs_with_vectors"),
        F.lit(n_planted).cast("long").alias("n_planted"),
        F.lit(rep["n_batch"]).cast("long").alias("n_batch"),
        F.lit(matches).alias("judge_matches_merge"),
        F.lit(bool(readonly_ok)).alias("judge_wrote_nothing"),
        F.lit(recall_ok).alias("planted_recall_floor_ok"),
        F.lit(bool(memo_ok)).alias("centroids_from_memo"),
    )


@q(
    "corpus_store_maintenance",
    "STORE-MAINTENANCE lifecycle (the r13 pre-plan's nominated "
    "debutant): backfill_winnow_fingerprints + "
    "compact_corpus_side_tables over a store with a REAL stage-3 "
    "coverage gap — the operational scenario the backfill exists for: "
    "a full-funnel merge (doc_id%6==0, passage stage ON) creates the "
    "bucketed _winnow table, then a second merge (doc_id%6==3, "
    "passage_min_run=None) appends survivors that get NO fingerprint "
    "rows, so stage-3 passage blocking is silently blind to them. The "
    "probe that proves it: passage-copies of the 10 longest "
    "stage-3-off feed docs (admission-independent choice, so n_probe "
    "is SQL-exact) — full source text verbatim plus more unique "
    "filler tokens than the source has distinct tokens, which pins "
    "token-set Jaccard vs ANY doc under 0.5 (stage-2-immune by "
    "construction) while the verbatim region keeps the winnow sketch "
    "shared. The READ-ONLY attach judge runs three times: before "
    "backfill (blind — gap-doc copies admitted), after an explicit "
    "backfill, and after compaction (which re-runs backfill: 0 rows "
    "at steady state, and rewrites _bands/_winnow through the "
    "bucketed stager to one file per non-empty bucket plus the "
    "ingest history byte-targeted). Invariant booleans: "
    "backfill_appended_rows (>0 — the gap was real), "
    "second_backfill_zero (compaction's embedded backfill found "
    "nothing left), winnow_matches_rebuild (the maintained table "
    "EXACTLY equals winnow_fingerprint_table recomputed from every "
    "store doc — maintenance converges the incremental table to the "
    "from-scratch result; full-outer multiplicity-checked symdiff "
    "== 0), probe_stable_across_compaction (judge survivors and "
    "per-stage counts identical across the side-table rewrite — "
    "compaction may change LAYOUT, never admissions), "
    "blocking_restored_ok (>=90% of copies that were admitted while "
    "blind, whose source is store-resident with >=12 unstopped "
    "fingerprints, are dropped once the gap closes — a floor: the "
    "sketch-tail junction and gram max_occ pathologies absorb like "
    "the other planted-recall floors), side_files_bounded (both "
    "bucketed tables land at <= bucket-count files without growing), "
    "history_compacted (exactly 2 merge audit files -> 1). Exact "
    "cross-checks: n_feed_full / n_feed_stage3_off / n_probe. At "
    "100 TB this is the maintenance story: closing a blocking gap is "
    "one anti-join + append over the gap docs (never a store-wide "
    "re-sketch), and compaction is a zero-shuffle per-bucket rewrite "
    "that the per-batch probe plans never notice.",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 6 = 0)
             AS BIGINT) AS n_feed_full,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 6 = 3)
             AS BIGINT) AS n_feed_stage3_off,
           CAST(LEAST(10, (SELECT COUNT(*) FROM documents
                           WHERE doc_id % 6 = 3)) AS BIGINT) AS n_probe,
           TRUE AS backfill_appended_rows,
           TRUE AS second_backfill_zero,
           TRUE AS winnow_matches_rebuild,
           TRUE AS probe_stable_across_compaction,
           TRUE AS blocking_restored_ok,
           TRUE AS side_files_bounded,
           TRUE AS history_compacted
    """,
)
def corpus_store_maintenance(spark, sf_dir):
    """Live maintenance-lifecycle twin. Reference parity: the reference
    has no streaming/store surface; this extends its batch curation the
    way src/load.py's index DDL + load-history auditing maintain its
    warehouse tables."""
    import shutil
    import tempfile

    from etl_weather_data_pipeline_spark.operators.passages import (
        winnow_fingerprint_table,
    )
    from etl_weather_data_pipeline_spark.session import (
        release_local_checkpoint,
    )
    from etl_weather_data_pipeline_spark.streaming.corpus import (
        backfill_winnow_fingerprints,
        bands_table_name,
        compact_corpus_side_tables,
        judge_batch_against_store,
        merge_batch_neardup_into_corpus,
        winnow_table_name,
    )

    tmp = tempfile.mkdtemp(prefix="corpus_store_maint_")
    store = tmp + "/store"
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    feed_full = docs.filter(F.col("doc_id") % 6 == 0)
    feed_off = docs.filter(F.col("doc_id") % 6 == 3)
    # Eager-checkpointed frames created inside the try (the probe + the
    # three judge reports' survivors) — released explicitly in the
    # finally so repeated driver rounds don't accumulate checkpoint
    # blocks waiting on the ContextCleaner (r13 advice).
    ckpts: list = []
    rebuild = None
    try:
        merge_batch_neardup_into_corpus(
            feed_full, store, band_buckets=8, passage_min_run=16
        )
        merge_batch_neardup_into_corpus(
            feed_off, store, band_buckets=8, passage_min_run=None
        )
        # Probe: passage-copies of the 10 longest stage-3-off docs.
        # Collision guard on the source ids (a real doc_id >= 1e6 would
        # be misread by the id-keyed audit joins — refuse loudly).
        sources = (
            feed_off.orderBy(F.length("text").desc(), "doc_id")
            .limit(10)
            .select(
                F.when(F.col("doc_id") < 1000000, F.col("doc_id"))
                .otherwise(
                    F.raise_error(
                        F.lit(
                            "corpus_store_maintenance: doc_id >= 1e6 "
                            "collides with the planted-id space; "
                            "raise the offset"
                        )
                    )
                )
                .alias("doc_id"),
                "text",
            )
        )
        # filler count = distinct-token count + 10: J(copy, x) <=
        # |toks(src)| / (|toks(src)| + n_fill) < 1/2 vs EVERY doc, so
        # stages 1-2 can never drop a copy; the verbatim source prefix
        # keeps the winnow sketch (only the last w windows can
        # re-select across the text||filler junction).
        n_fill = F.size(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ) + F.lit(10)
        probe = sources.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.col("text"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), n_fill),
                        lambda i: F.concat(
                            F.lit("zq"),
                            i.cast("string"),
                            F.lit("x"),
                            F.col("doc_id").cast("string"),
                        ),
                    ),
                ),
            ).alias("text"),
        ).localCheckpoint()  # eager: three judge consumers + the audit
        ckpts.append(probe)
        jargs = dict(band_buckets=8, passage_min_run=16)
        rep_before = judge_batch_against_store(probe, store, **jargs)
        ckpts.append(rep_before["survivors"])
        backfilled = backfill_winnow_fingerprints(spark, store, n_buckets=8)
        rep_mid = judge_batch_against_store(probe, store, **jargs)
        ckpts.append(rep_mid["survivors"])
        comp = compact_corpus_side_tables(spark, store, band_buckets=8)
        rep_after = judge_batch_against_store(probe, store, **jargs)
        ckpts.append(rep_after["survivors"])
        # --- fused audit: ONE collected action (lifecycle discipline).
        # (a) winnow == from-scratch rebuild, multiplicity-checked;
        # (b) probe spine left-joins every flag, one aggregate.
        wt = spark.table(winnow_table_name(store)).groupBy(
            "doc_id", "fingerprint"
        ).agg(F.count(F.lit(1)).alias("__ct"))
        # Persist: `rebuild` (the full-store re-sketch, this query's most
        # expensive pass) feeds THREE branches of the fused audit (rb /
        # fdf / rich) — unpersisted it re-evaluates per consumer (the
        # standing 2+-consumer rule; r13 advice). A lazy persist adds no
        # driver action, so the 1-action audit pin still holds.
        rebuild = winnow_fingerprint_table(
            spark.read.parquet(store).select("doc_id", "text")
        ).persist()
        rb = rebuild.groupBy("doc_id", "fingerprint").agg(
            F.count(F.lit(1)).alias("__cr")
        )
        wmism = (
            wt.join(rb, ["doc_id", "fingerprint"], "full_outer")
            .agg(
                F.sum(
                    (~F.col("__ct").eqNullSafe(F.col("__cr"))).cast(
                        "long"
                    )
                ).alias("n_winnow_mismatch")
            )
        )
        spine = probe.select(
            "doc_id", (F.col("doc_id") - 1000000).alias("src_id")
        )
        src_keys = F.broadcast(
            spine.select(F.col("src_id").alias("doc_id"))
        )
        resident = (
            spark.read.parquet(store)
            .select("doc_id")
            .join(src_keys, "doc_id", "left_semi")
            .select(
                F.col("doc_id").alias("src_id"),
                F.lit(True).alias("__res"),
            )
        )
        # "rich" = the source keeps >= 12 fingerprints that survive the
        # judge's STORE-side df stop bound (>= min_shared 8 + the w=4
        # junction margin), computed from the post-maintenance table
        # content (== rebuild, the frame the mid/after judges probed)
        fdf = rebuild.groupBy("fingerprint").agg(
            F.count(F.lit(1)).alias("__df")
        )
        rich = (
            rebuild.join(src_keys, "doc_id", "left_semi")
            .join(fdf.filter(F.col("__df") <= _WINNOW_MAX_DF), "fingerprint")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("__nfp"))
            .filter(F.col("__nfp") >= _WINNOW_MIN_SHARED + 4)
            .select(
                F.col("doc_id").alias("src_id"),
                F.lit(True).alias("__rich"),
            )
        )

        def _flag(rep, name):
            return F.broadcast(
                rep["survivors"].select(
                    "doc_id", F.lit(True).alias(name)
                )
            )

        flippable = F.col("__b").isNotNull() & F.col("__res").isNotNull() & F.col(
            "__rich"
        ).isNotNull()
        audit = (
            spine.join(_flag(rep_before, "__b"), "doc_id", "left")
            .join(_flag(rep_mid, "__m"), "doc_id", "left")
            .join(_flag(rep_after, "__a"), "doc_id", "left")
            .join(F.broadcast(resident), "src_id", "left")
            .join(F.broadcast(rich), "src_id", "left")
            .agg(
                F.count(F.lit(1)).alias("n_probe"),
                F.sum(
                    (~F.col("__m").eqNullSafe(F.col("__a"))).cast("long")
                ).alias("n_unstable"),
                F.sum(flippable.cast("long")).alias("n_flippable"),
                F.sum(
                    (flippable & F.col("__a").isNull()).cast("long")
                ).alias("n_flipped"),
            )
        )
        feeds = docs.agg(
            F.sum((F.col("doc_id") % 6 == 0).cast("long")).alias(
                "n_feed_full"
            ),
            F.sum((F.col("doc_id") % 6 == 3).cast("long")).alias(
                "n_feed_stage3_off"
            ),
        )
        row = feeds.crossJoin(wmism).crossJoin(audit).first()
        stable = bool(
            row["n_unstable"] == 0
            and rep_mid["n_batch"] == rep_after["n_batch"]
            and rep_mid["n_after_exact"] == rep_after["n_after_exact"]
            and rep_mid["n_after_neardup"] == rep_after["n_after_neardup"]
            and rep_mid["n_survivors"] == rep_after["n_survivors"]
        )
        restored = bool(
            row["n_flippable"] >= 1
            and (row["n_flipped"] or 0) >= 0.9 * row["n_flippable"]
        )
        files_ok = bool(
            all(
                comp[t]["files_after"] <= 8
                and comp[t]["files_after"] <= comp[t]["files_before"]
                for t in ("bands", "winnow")
            )
        )
        hist_ok = bool(
            comp["ingest_history"]["files_before"] == 2
            and comp["ingest_history"]["files_after"] == 1
        )
    finally:
        if rebuild is not None:
            rebuild.unpersist()
        for f in ckpts:
            release_local_checkpoint(f)
        spark.sql(f"DROP TABLE IF EXISTS {bands_table_name(store)}")
        spark.sql(f"DROP TABLE IF EXISTS {winnow_table_name(store)}")
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.range(1).select(
        F.lit(row["n_feed_full"]).cast("long").alias("n_feed_full"),
        F.lit(row["n_feed_stage3_off"])
        .cast("long")
        .alias("n_feed_stage3_off"),
        F.lit(row["n_probe"]).cast("long").alias("n_probe"),
        F.lit(bool(backfilled >= 1)).alias("backfill_appended_rows"),
        F.lit(bool(comp["winnow"]["backfilled_rows"] == 0)).alias(
            "second_backfill_zero"
        ),
        F.lit(bool(row["n_winnow_mismatch"] == 0)).alias(
            "winnow_matches_rebuild"
        ),
        F.lit(stable).alias("probe_stable_across_compaction"),
        F.lit(restored).alias("blocking_restored_ok"),
        F.lit(files_ok).alias("side_files_bounded"),
        F.lit(hist_ok).alias("history_compacted"),
    )


@q(
    "corpus_crash_recovery_audit",
    "Crash/recovery lifecycle audit — the r15 debutant (pre-built r14): "
    "the staged-rename upsert and the IVF staged swap both promise "
    "crash-state recoverability, and until now those promises were "
    "pytest-only. This query fabricates each documented crash state "
    "byte-for-byte on temp stores built from the documents/embeddings "
    "tables, runs the PRODUCT recovery sweeps "
    "(sinks/writers.recover_staged_crash, "
    "operators/ann_index.recover_ivf_swap), and judges convergence "
    "against uncrashed control runs. Scenario A1 (upsert, died after "
    "staging, before any rename): live tree must read exactly the "
    "pre-crash table (staging siblings never pollute reads), recovery "
    "sweeps the unverifiable staged dir, and re-running the idempotent "
    "batch converges to the clean-run content. Scenario A2 (died "
    "between one partition's two renames, mid-loop): one shard already "
    "new-complete, one absent from live with its old copy in the "
    "trash, the rest untouched — the pre-recovery read must equal "
    "exactly that mixed picture, recovery restores the missing shard "
    "from the trash (old-complete guarantee), and the re-run batch "
    "converges. Scenario B (IVF retrain, died between the swap's two "
    "renames with the driver gone — the in-process self-heal can't "
    "fire): open-time recovery completes the swap (a missing live dir "
    "proves staging finished, so staged wins) and the recovered index "
    "is assignment-identical to the uncrashed retrain, meta included. "
    "Every comparison is a multiplicity-checked full-outer symdiff "
    "folded into ONE crossJoined driver action (the r13 fused-audit "
    "discipline); exact columns (n_base / n_batch / n_index_vectors / "
    "restored_partitions) cross-check DuckDB, recovery verdicts ride "
    "as property booleans. n_index_vectors counts the RECOVERED "
    "index's rows — matching the SQL count over embeddings proves the "
    "completed swap lost no vector. At 100 TB recovery cost is what it "
    "is here: O(touched partitions) filesystem renames, zero data-file "
    "reads, then one idempotent batch re-run.",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 3 = 0)
             AS BIGINT) AS n_base,
           CAST((SELECT COUNT(*) FROM documents
                 WHERE doc_id % 6 = 0 OR doc_id % 3 = 1)
             AS BIGINT) AS n_batch,
           CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id % 2 = 0)
             AS BIGINT) AS n_index_vectors,
           CAST(1 AS BIGINT) AS restored_partitions,
           TRUE AS crash_preserves_reads,
           TRUE AS recovery_converges_to_clean_run,
           TRUE AS midswap_restore_converges,
           TRUE AS index_swap_completed,
           TRUE AS index_matches_uncrashed_retrain,
           TRUE AS sweep_idempotent
    """,
)
def corpus_crash_recovery_audit(spark, sf_dir):
    """Live crash-recovery twin of tests/test_pipeline.py's fabricated
    crash states. Reference parity: src/load.py:371-486 leans on the
    database's own crash safety; the parquet emulation must prove its
    equivalent end-to-end."""
    import os
    import shutil
    import tempfile

    from etl_weather_data_pipeline_spark.operators.ann_index import (
        read_ivf_meta,
        read_ivf_vectors,
        recover_ivf_swap,
        retrain_ivf_index,
        write_ivf_index,
    )
    from etl_weather_data_pipeline_spark.session import (
        release_local_checkpoint,
    )
    from etl_weather_data_pipeline_spark.sinks.writers import (
        merge_upsert,
        recover_staged_crash,
    )

    tmp = tempfile.mkdtemp(prefix="crash_recovery_audit_")
    control = tmp + "/control"
    live_a = tmp + "/live_a"
    live_b = tmp + "/live_b"
    idx_old = tmp + "/idx_old"
    idx_new = tmp + "/idx_new"
    idx_live = tmp + "/idx_live"
    ckpts: list = []

    def _ckpt(df):
        out = df.localCheckpoint()
        ckpts.append(out)
        return out

    try:
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        shard = F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("shard")
        base = _ckpt(
            docs.filter(F.col("doc_id") % 3 == 0).select(
                "doc_id", F.col("text").alias("payload"), shard
            )
        )
        # batch = updates (half the base rows, payload rewritten) +
        # inserts (a disjoint id family); shard = doc_id % 4 keeps the
        # partition column functionally dependent on the merge key
        batch = _ckpt(
            docs.filter(F.col("doc_id") % 6 == 0)
            .select("doc_id", F.upper("text").alias("payload"), shard)
            .unionByName(
                docs.filter(F.col("doc_id") % 3 == 1).select(
                    "doc_id", F.col("text").alias("payload"), shard
                )
            )
        )
        mkw = dict(keys=("doc_id",), partition_by=("shard",))
        merge_upsert(spark, base, control, **mkw)
        shutil.copytree(control, live_a)
        shutil.copytree(control, live_b)
        merge_upsert(spark, batch, control, **mkw)  # the uncrashed run

        # --- scenario A1: died after staging completed, before renames
        staged_a = live_a + ".upsert-tmp-fab"
        os.makedirs(staged_a)
        for s in range(4):
            shutil.copytree(
                f"{control}/shard={s}", f"{staged_a}/shard={s}"
            )
        pre_a = _ckpt(spark.read.parquet(live_a))  # before any mutation
        rep_a1 = recover_staged_crash(live_a)
        merge_upsert(spark, batch, live_a, **mkw)

        # --- scenario A2: died between shard=1's two renames, mid-loop
        # (sorted swap order: shard=0 fully swapped, shard=1 old in
        # trash / new still staged, shard=2,3 not yet reached)
        trash_b = live_b + ".upsert-old-fab"
        staged_b = live_b + ".upsert-tmp-fab"
        os.makedirs(trash_b)
        os.makedirs(staged_b)
        os.rename(f"{live_b}/shard=0", f"{trash_b}/shard=0")
        shutil.copytree(f"{control}/shard=0", f"{live_b}/shard=0")
        os.rename(f"{live_b}/shard=1", f"{trash_b}/shard=1")
        for s in (1, 2, 3):
            shutil.copytree(
                f"{control}/shard={s}", f"{staged_b}/shard={s}"
            )
        pre_b = _ckpt(spark.read.parquet(live_b))
        rep_a2 = recover_staged_crash(live_b)
        merge_upsert(spark, batch, live_b, **mkw)
        rep_a3 = recover_staged_crash(live_b)  # idempotent re-sweep

        # --- scenario B: IVF retrain swap died between its two renames
        emb = load(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        ).filter(F.col("vec_id") % 2 == 0)
        write_ivf_index(emb, idx_old, n_cells=4, iterations=2)
        shutil.copytree(idx_old, idx_new)
        retrain_ivf_index(spark, idx_new, iterations=2)
        shutil.copytree(idx_old, idx_live + ".old-fab00000")
        shutil.copytree(idx_new, idx_live + ".staged-fab0000")
        rep_b = recover_ivf_swap(idx_live)
        rep_b2 = recover_ivf_swap(idx_live)  # idempotent re-sweep

        # --- fused audit: every symdiff is multiplicity-checked
        # (full-outer on grouped counts), all folded into ONE action
        cols = ["doc_id", "payload", "shard"]

        def symdiff(a, b, out):
            ga = a.groupBy(*cols).agg(F.count(F.lit(1)).alias("__ca"))
            gb = b.groupBy(*cols).agg(F.count(F.lit(1)).alias("__cb"))
            return ga.join(gb, cols, "full_outer").agg(
                F.sum(
                    (~F.col("__ca").eqNullSafe(F.col("__cb"))).cast("long")
                ).alias(out)
            )

        ctl = spark.read.parquet(control)
        # A2's documented pre-recovery picture: swapped shard new,
        # missing shard absent, untouched shards old
        expect_b = ctl.filter(F.col("shard") == 0).unionByName(
            base.filter(F.col("shard").isin(2, 3))
        )
        d1 = symdiff(pre_a, base, "a1_pre")
        d2 = symdiff(pre_b, expect_b, "a2_pre")
        d3 = symdiff(spark.read.parquet(live_a), ctl, "a1_final")
        d4 = symdiff(spark.read.parquet(live_b), ctl, "a2_final")
        iv_live = read_ivf_vectors(spark, idx_live).select(
            "vec_id", "cell"
        )
        iv_new = read_ivf_vectors(spark, idx_new).select("vec_id", "cell")
        d5 = (
            iv_live.groupBy("vec_id", "cell")
            .agg(F.count(F.lit(1)).alias("__ca"))
            .join(
                iv_new.groupBy("vec_id", "cell").agg(
                    F.count(F.lit(1)).alias("__cb")
                ),
                ["vec_id", "cell"],
                "full_outer",
            )
            .agg(
                F.sum(
                    (~F.col("__ca").eqNullSafe(F.col("__cb"))).cast("long")
                ).alias("idx_mismatch"),
                F.sum(F.coalesce(F.col("__ca"), F.lit(0))).alias(
                    "n_index_vectors"
                ),
            )
        )
        feeds = docs.agg(
            F.sum((F.col("doc_id") % 3 == 0).cast("long")).alias("n_base"),
            F.sum(
                ((F.col("doc_id") % 6 == 0) | (F.col("doc_id") % 3 == 1))
                .cast("long")
            ).alias("n_batch"),
        )
        row = (
            feeds.crossJoin(d1)
            .crossJoin(d2)
            .crossJoin(d3)
            .crossJoin(d4)
            .crossJoin(d5)
            .first()
        )
        sweeps_ok = bool(
            rep_a1["action"] == "clean"
            and rep_a1["removed_stale_dirs"] == 1
            and rep_a2["action"] == "restored_partitions"
            and rep_a2["restored_partitions"] == 1
            and rep_a3
            == {
                "action": "clean",
                "restored_live": 0,
                "restored_partitions": 0,
                "removed_stale_dirs": 0,
            }
            and rep_b2["action"] == "clean"
            and rep_b2["removed_stale_dirs"] == 0
        )
        swap_ok = bool(
            rep_b["action"] == "completed_swap"
            and rep_b["removed_stale_dirs"] == 1
            and read_ivf_meta(idx_live) == read_ivf_meta(idx_new)
        )
    finally:
        for f in ckpts:
            release_local_checkpoint(f)
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.range(1).select(
        F.lit(row["n_base"]).cast("long").alias("n_base"),
        F.lit(row["n_batch"]).cast("long").alias("n_batch"),
        F.lit(row["n_index_vectors"]).cast("long").alias(
            "n_index_vectors"
        ),
        F.lit(rep_a2["restored_partitions"]).cast("long").alias(
            "restored_partitions"
        ),
        F.lit(bool(row["a1_pre"] == 0 and row["a2_pre"] == 0)).alias(
            "crash_preserves_reads"
        ),
        F.lit(bool(row["a1_final"] == 0)).alias(
            "recovery_converges_to_clean_run"
        ),
        F.lit(bool(row["a2_final"] == 0)).alias(
            "midswap_restore_converges"
        ),
        F.lit(swap_ok).alias("index_swap_completed"),
        F.lit(bool(row["idx_mismatch"] == 0)).alias(
            "index_matches_uncrashed_retrain"
        ),
        F.lit(sweeps_ok).alias("sweep_idempotent"),
    )


@q(
    "dedup_recall_probe",
    "Planted-duplicate recall measurement for the near-dup pipeline — "
    "the calibration report a corpus team publishes alongside its dedup "
    "numbers: perturbed copies of a 10% probe subset are planted "
    "(deterministically drop every 2nd/3rd/7th/50th token), the "
    "standard MinHash-LSH + Jaccard >= 0.5 stack runs over "
    "corpus+planted, and per perturbation strength the report gives how "
    "many planted pairs were truly eligible (exact token-set Jaccard >= "
    "threshold, computed directly on each (original, copy) pair — no "
    "quadratic truth pass) and how many the BLOCKING recovered "
    "(verify is exact on candidates, so misses are always the "
    "blocking's). The measured curve is the finding: light perturbation "
    "(every 50th) recovers ~1.0, aggressive positional drops collapse "
    "recall (0.62 at every-7th, 0.0 at every-2nd at sf0.01) because "
    "banding hashes 3-word SHINGLES — dense positional edits destroy "
    "shingles long before the token SET drifts below threshold. That "
    "sensitivity profile (shingle-LSH targets near-verbatim text, not "
    "bag-of-words similarity) is exactly what the probe exists to "
    "quantify per config. One LSH pass over a 1.4x corpus, map-side "
    "planting, equi-join truth — the probe costs what one dedup run "
    "costs, at any scale.",
    oracle=f"""
    WITH probe AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
    p2 AS (
      SELECT doc_id, t.k, text,
             array_to_string(
               list_filter({O_TOKS}, (x, i) -> i % t.k != 0), ' ')
               AS ptext
      FROM probe, unnest([2, 3, 7, 50]) AS t(k)),
    planted AS (
      SELECT CASE WHEN doc_id < 1000000 THEN doc_id + k * 1000000
                  ELSE error('dedup_recall_probe: doc_id >= 1e6 collides '
                             'with the planted-id space') END AS doc_id,
             ptext AS text FROM p2),
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id, text FROM planted),
    {_o_lsh_ctes(8, 4, table="corpus")},
    toksets AS (
      SELECT doc_id, list_distinct({O_TOKS}) AS toks FROM corpus),
    ver AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN toksets l ON l.doc_id = c.id_a
                  JOIN toksets r ON r.doc_id = c.id_b
      WHERE CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
              / (len(l.toks) + len(r.toks)
                 - len(list_intersect(l.toks, r.toks))) >= 0.5),
    rec AS (
      SELECT CAST((id_b - id_a) // 1000000 AS BIGINT) AS k,
             COUNT(*) AS n_recovered
      FROM ver WHERE id_b >= 1000000 AND id_a = id_b % 1000000
      GROUP BY 1),
    truth AS (
      SELECT k,
             CASE WHEN len(ot) + len(pt) - len(it) > 0 THEN
               CAST(len(it) AS DOUBLE) / (len(ot) + len(pt) - len(it))
             ELSE 0.0 END AS jacc
      FROM (
        SELECT k,
               list_distinct(regexp_split_to_array(trim(text), '\\s+'))
                 AS ot,
               list_distinct(regexp_split_to_array(trim(ptext), '\\s+'))
                 AS pt,
               list_intersect(
                 list_distinct(regexp_split_to_array(trim(text), '\\s+')),
                 list_distinct(regexp_split_to_array(trim(ptext), '\\s+')))
                 AS it
        FROM p2)),
    elig AS (
      SELECT CAST(k AS BIGINT) AS k, COUNT(*) AS n_planted,
             CAST(SUM(CASE WHEN jacc >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_eligible
      FROM truth GROUP BY 1)
    SELECT e.k AS drop_every, e.n_planted, e.n_eligible,
           CAST(coalesce(r.n_recovered, 0) AS BIGINT) AS n_recovered,
           CASE WHEN e.n_eligible > 0 THEN
             {o_dround("CAST(coalesce(r.n_recovered, 0) AS DOUBLE)"
                       " / e.n_eligible", 6)}
           ELSE 0.0 END AS blocking_recall
    FROM elig e LEFT JOIN rec r ON r.k = e.k
    """,
)
def dedup_recall_probe(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.dedup import (
        jaccard_verify,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    probe = docs.filter(F.col("doc_id") % 10 == 0)
    # Plant all strengths in one map-side pass: explode k, drop every
    # k-th token (Spark HOF index is 0-based; the oracle's DuckDB index
    # is 1-based, so (i+1) % k here == i % k there), rebuild the text.
    p2 = probe.select(
        "doc_id",
        F.explode(
            F.array(F.lit(2), F.lit(3), F.lit(7), F.lit(50))
        ).alias("k"),
        "text",
    ).withColumn(
        "ptext",
        F.array_join(
            F.filter(
                TX.tokens(F.col("text")),
                lambda x, i: (i + 1) % F.col("k") != 0,
            ),
            " ",
        ),
    )
    # Planted ids live at doc_id + k*1e6; a real doc_id >= 1e6 would
    # collide with that space and silently corrupt the recall decode
    # (id_b % 1e6). Guard IN the planted-id projection (lazy per-row
    # CASE, zero cost on the happy path) so corpus growth past the
    # offset fails loudly in both engines instead of drifting the curve.
    planted_id = F.when(
        F.col("doc_id") < 1000000, F.col("doc_id") + F.col("k") * 1000000
    ).otherwise(
        F.raise_error(
            F.lit("dedup_recall_probe: doc_id >= 1e6 collides with the "
                  "planted-id space; raise the offset")
        )
    )
    planted = p2.select(
        planted_id.alias("doc_id"),
        F.col("ptext").alias("text"),
    )
    corpus = docs.unionByName(planted)
    # per-doc artifacts: corpus slice from the session artifact store,
    # planted slice (40% of corpus rows) computed fresh from p2 — p2
    # persists because it feeds the planted signatures, the planted
    # token sets, AND the exact-truth pass below
    from pyspark import StorageLevel as _SL

    from etl_weather_data_pipeline_spark.operators.dedup import (
        minhash_signatures as _msig,
    )
    from etl_weather_data_pipeline_spark.operators.dedup import (
        token_sets as _tsets,
    )

    p2 = p2.persist(_SL.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(p2)
    planted_sigs = _msig(planted, num_hashes=8, shingle_k=3)
    sigs = AR.shared_minhash_sigs(spark, sf_dir).unionByName(planted_sigs)
    cand = minhash_lsh_pairs(
        corpus, num_hashes=8, bands=4, signatures=sigs
    )
    toksets = AR.shared_token_sets(spark, sf_dir).unionByName(
        _tsets(planted)
    )
    ver = jaccard_verify(
        corpus, cand, threshold=0.5, toksets=toksets
    ).select("id_a", "id_b")
    rec = (
        ver.filter(
            (F.col("id_b") >= 1000000)
            & (F.col("id_a") == F.col("id_b") % 1000000)
        )
        .groupBy(
            F.expr("CAST((id_b - id_a) DIV 1000000 AS BIGINT)").alias("k")
        )
        .agg(F.count(F.lit(1)).alias("n_recovered"))
    )
    # Exact truth per planted pair — the copy's token set vs the
    # original's, same arithmetic as jaccard_verify (no blocking, no
    # quadratic pass: the pair is known by construction).
    ot = F.array_distinct(TX.tokens(F.col("text")))
    pt = F.array_distinct(TX.tokens(F.col("ptext")))
    truth = p2.select(F.col("k"), ot.alias("__ot"), pt.alias("__pt")).select(
        "k",
        F.size(F.array_intersect(F.col("__ot"), F.col("__pt"))).alias(
            "__inter"
        ),
        (F.size(F.col("__ot")) + F.size(F.col("__pt"))).alias("__tot"),
    )
    jacc = F.when(
        (F.col("__tot") - F.col("__inter")) > 0,
        F.col("__inter").cast("double")
        / (F.col("__tot") - F.col("__inter")),
    ).otherwise(F.lit(0.0))
    elig = (
        truth.select(F.col("k").cast("long").alias("k"), jacc.alias("__j"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_planted"),
            F.sum(F.when(F.col("__j") >= 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_eligible"),
        )
    )
    recall = F.when(
        F.col("n_eligible") > 0,
        dround(
            F.coalesce(F.col("n_recovered"), F.lit(0)).cast("double")
            / F.col("n_eligible"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return elig.join(rec, "k", "left").select(
        F.col("k").alias("drop_every"),
        "n_planted",
        "n_eligible",
        F.coalesce(F.col("n_recovered"), F.lit(0))
        .cast("long")
        .alias("n_recovered"),
        recall.alias("blocking_recall"),
    )


@q(
    "passage_recall_probe",
    "Planted-PASSAGE recall measurement for the blocked substring "
    "pipeline (r6 verdict directive — the stage-3 companion of "
    "dedup_recall_probe): for a 10% probe subset, a splice of the "
    "doc's first 16/32/64/128 raw chars is embedded in an otherwise "
    "dissimilar planted doc (the doc's reversed text — no winnow/gram "
    "overlap beyond chance), the full winnow-candidates -> "
    "exact-passage-verify composition runs over corpus+planted, and "
    "per splice length the report gives truth-eligible pairs (the "
    "EXACT passage operator run with the planted pair as a known "
    "candidate — same gram table, no blocking, no quadratic pass) vs "
    "blocking-recovered pairs (verify is exact on candidates, so "
    "misses are always the sketch blocking's). Measured curve at "
    "sf0.01: 16 raw chars (~13 normalized) is below the 23-char run "
    "floor — ineligible by construction (n_eligible 0); 32 chars sits "
    "at the winnow knee (eligible 43/50, blocking recovers 0.33 — ~19 "
    "grams can yield fewer than the 8 shared fingerprints blocking "
    "demands); 64+ recovers 1.0. At sf0.1 the probe surfaces a SECOND "
    "honest boundary: the synthetic corpus draws from a ~30-word "
    "vocabulary, so at 5000 docs most 8-char grams exceed the "
    "max_occ=50 boilerplate bound and the EXACT operator itself deems "
    "head-splices ineligible (0/0/10/17 of 500) — blocking recovers "
    "1.0 of every eligible pair. That is the stop-gram/corpus-size "
    "interaction a real deployment must re-measure per corpus, which "
    "is the probe's job. ONE shared Rabin-Karp pass over the 1.4x "
    "corpus feeds sketch, gram table, blocked match AND truth match — "
    "the probe costs what one blocked dedup run costs, at any scale.",
    oracle=f"""
    WITH probe AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
    p2 AS (
      SELECT doc_id, t.li,
             CASE t.li WHEN 1 THEN 16 WHEN 2 THEN 32
                       WHEN 3 THEN 64 ELSE 128 END AS sl,
             text
      FROM probe, unnest([1, 2, 3, 4]) AS t(li)),
    planted AS (
      SELECT CASE WHEN doc_id < 1000000 THEN doc_id + li * 1000000
                  ELSE error('passage_recall_probe: doc_id >= 1e6 '
                             'collides with the planted-id space')
             END AS doc_id,
             reverse(text) || ' ' || substr(text, 1, sl) AS text
      FROM p2),
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id, text FROM planted),
    {_o_rolling(_WINNOW_K, table="corpus")},
    {_o_winnow_rows(_WINNOW_W)},
    {_O_WINNOW_CAND},
    {_o_passage(cand="cand", with_rolling=False)},
    ppairs AS (
      SELECT doc_id AS id_a, doc_id + li * 1000000 AS id_b, li FROM p2),
    tm AS (
      SELECT cp.id_a, cp.id_b, l.pos AS pa, l.pos - r.pos AS diag
      FROM (SELECT DISTINCT id_a, id_b FROM ppairs) cp
      JOIN kept l ON l.doc_id = cp.id_a
      JOIN kept r ON r.doc_id = cp.id_b AND r.gh = l.gh),
    truns AS (
      SELECT id_a, id_b, diag,
             pa - row_number() OVER (
               PARTITION BY id_a, id_b, diag ORDER BY pa) AS island
      FROM tm),
    tr2 AS (
      SELECT id_a, id_b, COUNT(*) AS run_len
      FROM truns GROUP BY id_a, id_b, diag, island),
    tpr AS (
      SELECT id_a, id_b FROM tr2
      GROUP BY id_a, id_b HAVING MAX(run_len) >= {_PASSAGE_MIN_RUN}),
    elig AS (
      SELECT p.li, COUNT(*) AS n_planted,
             CAST(SUM(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_eligible
      FROM ppairs p LEFT JOIN tpr t
        ON t.id_a = p.id_a AND t.id_b = p.id_b
      GROUP BY 1),
    rec AS (
      SELECT CAST((id_b - id_a) // 1000000 AS BIGINT) AS li,
             COUNT(*) AS n_recovered
      FROM pr
      WHERE id_b >= 1000000 AND id_a < 1000000
        AND id_a = id_b % 1000000
      GROUP BY 1)
    SELECT CAST(CASE e.li WHEN 1 THEN 16 WHEN 2 THEN 32
                          WHEN 3 THEN 64 ELSE 128 END AS BIGINT)
             AS splice_chars,
           CAST(e.n_planted AS BIGINT) AS n_planted,
           e.n_eligible,
           CAST(coalesce(r.n_recovered, 0) AS BIGINT) AS n_recovered,
           CASE WHEN e.n_eligible > 0 THEN
             {o_dround("CAST(coalesce(r.n_recovered, 0) AS DOUBLE)"
                       " / e.n_eligible", 6)}
           ELSE 0.0 END AS blocking_recall
    FROM elig e LEFT JOIN rec r ON r.li = e.li
    """,
)
def passage_recall_probe(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.passages import (
        exact_passage_pairs,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    probe = docs.filter(F.col("doc_id") % 10 == 0)
    lens = F.array(F.lit(16), F.lit(32), F.lit(64), F.lit(128))
    # constant 4-element array: the explode-filter trap targets expensive
    # array expressions; a literal array re-evaluates for free
    p2 = probe.select(
        "doc_id",
        F.explode(
            F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4))
        ).alias("li"),
        "text",
    ).withColumn("sl", F.element_at(lens, F.col("li")))
    ptext = F.concat(
        F.reverse(F.col("text")),
        F.lit(" "),
        F.col("text").substr(F.lit(1), F.col("sl")),
    )
    # same planted-id collision guard as dedup_recall_probe
    planted_id = F.when(
        F.col("doc_id") < 1000000,
        F.col("doc_id") + F.col("li") * 1000000,
    ).otherwise(
        F.raise_error(
            F.lit("passage_recall_probe: doc_id >= 1e6 collides with "
                  "the planted-id space; raise the offset")
        )
    )
    planted = p2.select(planted_id.alias("doc_id"), ptext.alias("text"))
    corpus = docs.unionByName(planted)
    release_curation_cache()
    # hash arrays: the corpus slice comes from the session artifact
    # store; only the planted 40% is hashed fresh (persisted — it feeds
    # the sketch AND the gram table), and the union is what the stack's
    # corpus-dependent df/occ statistics see — identical semantics to
    # hashing docs ∪ planted in one pass
    from pyspark import StorageLevel as _SL

    from etl_weather_data_pipeline_spark.operators.passages import (
        rolling_hashes as _rh,
    )

    ph = _rh(planted, k=_WINNOW_K).persist(_SL.MEMORY_AND_DISK)
    _CURATION_PERSISTED.append(ph)
    hs = AR.shared_rolling_hashes(spark, sf_dir, _WINNOW_K).unionByName(ph)
    cand, grams = _passage_stack(corpus, hashes=hs)
    blocked = exact_passage_pairs(
        grams, min_run=_PASSAGE_MIN_RUN, k=_WINNOW_K, candidates=cand
    )
    ppairs = p2.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + F.col("li") * 1000000).alias("id_b"),
        "li",
    )
    # truth: the SAME exact-verify over the SAME persisted gram table,
    # with the planted pair as a known candidate — isolates exactly what
    # the sketch blocking loses, at |planted| cost
    truth = exact_passage_pairs(
        grams,
        min_run=_PASSAGE_MIN_RUN,
        k=_WINNOW_K,
        candidates=ppairs.select("id_a", "id_b"),
    )
    elig = (
        ppairs.join(
            truth.select("id_a", "id_b", F.lit(1).alias("__hit")),
            ["id_a", "id_b"],
            "left",
        )
        .groupBy("li")
        .agg(
            F.count(F.lit(1)).alias("n_planted"),
            F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_eligible"),
        )
    )
    rec = (
        blocked.filter(
            (F.col("id_b") >= 1000000)
            & (F.col("id_a") < 1000000)
            & (F.col("id_a") == F.col("id_b") % 1000000)
        )
        .groupBy(
            F.expr("CAST((id_b - id_a) DIV 1000000 AS BIGINT)").alias("li")
        )
        .agg(F.count(F.lit(1)).alias("n_recovered"))
    )
    recall = F.when(
        F.col("n_eligible") > 0,
        dround(
            F.coalesce(F.col("n_recovered"), F.lit(0)).cast("double")
            / F.col("n_eligible"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return elig.join(rec, "li", "left").select(
        F.element_at(lens, F.col("li").cast("int"))
        .cast("long")
        .alias("splice_chars"),
        "n_planted",
        "n_eligible",
        F.coalesce(F.col("n_recovered"), F.lit(0))
        .cast("long")
        .alias("n_recovered"),
        recall.alias("blocking_recall"),
    )


def _cdc_per_doc_fp(docs: DataFrame) -> DataFrame:
    """(doc_id, __fp, __cnt, __chars) per-doc chunk-fingerprint
    pre-aggregate. Map-side collapse: the full chunk text is reduced to
    a 32-char fingerprint + its length IN THE SCAN STAGE, so the
    corpus' raw bytes never cross an exchange (r7 verdict: the old
    window partitioned by md5(chunk) shuffled the whole normalized
    corpus on the skew-prone fingerprint key). Empty docs keep their
    null-chunk row (explode_outer) so downstream aggregates cover every
    doc. Shared with test_plans.py so the exchange-payload pin explains
    exactly the plan the query caches."""
    from etl_weather_data_pipeline_spark.operators.passages import (
        cdc_chunks,
    )

    ch = cdc_chunks(docs, k=_WINNOW_K, divisor=64)
    return (
        ch.select(
            "doc_id",
            F.md5(F.col("chunk")).alias("__fp"),
            F.length(F.col("chunk")).alias("__len"),
        )
        .groupBy("doc_id", "__fp")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("__len").alias("__chars"),
        )
    )


@q(
    "doc_cdc_chunk_dedup",
    "Content-defined-chunking sub-document dedup report (FastCDC/gear "
    "style, the storage-dedup technique, re-expressed relationally): "
    "chunk boundaries fall wherever the Rabin-Karp 8-gram hash is "
    "divisible by 64 (~64-char average chunks whose boundaries move "
    "WITH the content, so an edit re-chunks only its own chunk), "
    "chunks fingerprint by md5, and each doc reports how much of it "
    "is duplicated at chunk granularity ANYWHERE in the corpus. "
    "Complements the other two substring operators: winnow overlap "
    "gives a containment SCORE from a sketch, exact passages give "
    "alignment extents, CDC gives the cheap always-on dedup-ratio "
    "dashboard. Scale shape: the raw chunk text NEVER crosses an "
    "exchange — chunks collapse map-side to (doc_id, md5, length), "
    "pre-aggregate per (doc, fingerprint) [persisted once], the "
    "global occurrence count is a partial-aggregating groupBy on the "
    "fingerprint (map-side combine absorbs boilerplate-chunk skew, "
    "which a window partitioned on the same key cannot), and the "
    "tiny >=2-occurrence set joins back. "
    "operators/passages.py cdc_chunks.",
    oracle=f"""
    WITH {_o_rolling(_WINNOW_K)},
    n AS (
      SELECT doc_id,
             regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS norm
      FROM documents),
    bp AS (
      SELECT doc_id,
             list_filter(range(1, len(hashes) + 1),
                         i -> hashes[i] % 64 = 0) AS bpos
      FROM h),
    cu AS (
      SELECT b.doc_id,
             list_transform(b.bpos, p -> p + {_WINNOW_K - 1}) AS cuts,
             n.norm
      FROM bp b JOIN n USING (doc_id)),
    se AS (
      SELECT doc_id, norm,
             list_prepend(CAST(0 AS BIGINT), cuts) AS starts,
             list_append(cuts, CAST(length(norm) AS BIGINT)) AS ends
      FROM cu),
    ch AS (
      SELECT doc_id,
             list_transform(
               list_filter(range(1, len(starts) + 1),
                           i -> ends[i] > starts[i]),
               i -> substr(norm, CAST(starts[i] + 1 AS INT),
                           CAST(ends[i] - starts[i] AS INT))) AS chunks
      FROM se),
    ex AS (SELECT doc_id, u.chunk FROM ch, unnest(chunks) AS u(chunk)),
    oc AS (
      SELECT doc_id, chunk,
             COUNT(*) OVER (PARTITION BY md5(chunk)) AS occ
      FROM ex),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_chunks,
             SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS n_dup,
             SUM(length(chunk)) AS chunk_chars
      FROM oc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup_chunks,
           CASE WHEN coalesce(a.n_chunks, 0) > 0 THEN
             {o_dround("CAST(a.n_dup AS DOUBLE) / a.n_chunks", 6)}
           ELSE 0.0 END AS dup_chunk_ratio,
           CAST(coalesce(a.chunk_chars, 0) AS BIGINT) AS chunk_chars
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def doc_cdc_chunk_dedup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    per = _cdc_per_doc_fp(docs)
    # (doc, fp) pre-aggregate feeds BOTH the global occurrence count and
    # the per-doc rollup — persist once (two-branch re-eval trap).
    per = per.persist()
    _CURATION_PERSISTED.append(per)
    # Global occurrence per fingerprint: a hash aggregate (partial+final
    # — map-side combine absorbs boilerplate skew that a window on the
    # same key cannot), then only the >=2 set joins back. Within-doc
    # repeats count toward occ, matching the window-over-all-rows
    # semantics of the oracle.
    dups = (
        per.filter(F.col("__fp").isNotNull())
        .groupBy("__fp")
        .agg(F.sum("__cnt").alias("__occ"))
        .filter(F.col("__occ") >= 2)
        .select("__fp", F.lit(1).alias("__dup"))
    )
    joined = per.join(dups, "__fp", "left")
    live = F.col("__fp").isNotNull()
    n_chunks = F.coalesce(F.sum(F.when(live, F.col("__cnt"))), F.lit(0))
    n_dup = F.coalesce(
        F.sum(F.when(live & F.col("__dup").isNotNull(), F.col("__cnt"))),
        F.lit(0),
    )
    return joined.groupBy("doc_id").agg(
        n_chunks.cast("long").alias("n_chunks"),
        n_dup.cast("long").alias("n_dup_chunks"),
        F.when(
            n_chunks > 0,
            dround(n_dup.cast("double") / n_chunks, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_chunk_ratio"),
        F.coalesce(F.sum(F.when(live, F.col("__chars"))), F.lit(0))
        .cast("long")
        .alias("chunk_chars"),
    )


def _o_shingles_k(k: int) -> str:
    """k-word shingle list over ``text`` — mirrors TX.word_shingles_of
    incl. the 0<n<k whole-doc fallback (generalizes the k=3 O_SHINGLES
    literal)."""
    body = " || ' ' || ".join(
        f"{O_TOKS}[i]" if j == 0 else f"{O_TOKS}[i+{j}]" for j in range(k)
    )
    return (
        f"CASE WHEN len({O_TOKS}) >= {k} THEN "
        f"list_transform(range(1, len({O_TOKS}) - {k - 2}), i -> {body}) "
        f"WHEN len({O_TOKS}) > 0 THEN [array_to_string({O_TOKS}, ' ')] "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


@q(
    "source_boilerplate_ngrams",
    "Per-source boilerplate mining: the top-5 3-gram word shingles by "
    "document frequency within each source (df >= 3). This is the "
    "operator that PRODUCES the stop-gram lists the passage/winnow "
    "operators' max_occ / stop-fingerprint bounds assume (CCNet-style "
    "boilerplate detection: headers, footers, license blurbs surface as "
    "high-df shingles per feed). Plan: one shingle explode -> per-doc "
    "distinct -> (source, ngram) hash aggregate (map-side partials) -> "
    "one window rank per source; df counts DOCS (within-doc repeats "
    "dropped before the aggregate), ties broken deterministically by "
    "ngram text.",
    oracle=f"""
    WITH sh AS (
      SELECT source, doc_id,
             unnest(list_distinct({_o_shingles_k(3)})) AS ngram
      FROM documents),
    d AS (
      SELECT source, ngram, COUNT(*) AS df
      FROM sh GROUP BY 1, 2),
    r AS (
      SELECT source, ngram, CAST(df AS BIGINT) AS df,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY df DESC, ngram) AS BIGINT)
               AS rank
      FROM d)
    SELECT source, ngram, df, rank
    FROM r WHERE rank <= 5 AND df >= 3
    """,
)
def source_boilerplate_ngrams(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    # Layered projections (HOF re-eval trap) + explode_outer (plain
    # explode would infer a size()>0 filter that re-evaluates the
    # shingle chain per row — winnow precedent).
    toked = docs.select(
        "doc_id", "source", TX.tokens(F.col("text")).alias("__t")
    )
    shingled = toked.select(
        "doc_id",
        "source",
        F.array_distinct(TX.word_shingles_of(F.col("__t"), 3)).alias(
            "__sh"
        ),
    )
    sh = shingled.select(
        "doc_id", "source", F.explode_outer(F.col("__sh")).alias("ngram")
    ).filter(F.col("ngram").isNotNull())
    d = sh.groupBy("source", "ngram").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("source").orderBy(
        F.col("df").desc(), F.col("ngram")
    )
    return (
        d.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter((F.col("rank") <= 5) & (F.col("df") >= 3))
        .select("source", "ngram", "df", "rank")
    )


# Oracle replay of pack_documents_intact (budget 256, 16 hash groups):
# greedy next-fit-decreasing as a RECURSIVE CTE advancing all groups in
# lockstep — shared by the per-doc assignment query and the packing-
# efficiency report so the two can never drift.
_O_PACK_CTES = f"""base AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  ::BIGINT % 16 AS BIGINT) AS pack_group,
             CAST(len({O_TOKS}) AS BIGINT) AS tc
      FROM documents),
    ordered AS (
      SELECT doc_id, pack_group, tc,
             row_number() OVER (
               PARTITION BY pack_group ORDER BY tc DESC, doc_id) AS rn
      FROM base),
    pack AS (
      SELECT pack_group, doc_id, tc, rn,
             CAST(0 AS BIGINT) AS seq_id, tc AS fill
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.pack_group, o.doc_id, o.tc, o.rn,
             CASE WHEN p.fill + o.tc <= 256
                  THEN p.seq_id ELSE p.seq_id + 1 END,
             CASE WHEN p.fill + o.tc <= 256
                  THEN p.fill + o.tc ELSE o.tc END
      FROM pack p JOIN ordered o
        ON o.pack_group = p.pack_group AND o.rn = p.rn + 1)"""


@q(
    "corpus_pack_intact",
    "Intact-document sequence packing (the SFT constraint: no document "
    "may be split across training sequences, so concat-then-chunk "
    "packing is forbidden). Greedy next-fit-decreasing is a sequential "
    "recurrence — the textbook grouped-applyInPandas custom operator: "
    "docs hash-bucket into 16 deterministic groups, Python packs each "
    "group over (token count desc, id) order, groups run in parallel "
    "and the shuffle carries only (id, token count). The oracle "
    "replays the same recurrence with a RECURSIVE CTE advancing all "
    "groups in lockstep — per-doc assignments must match bit-for-bit "
    "(operators/sampling.py pack_documents_intact).",
    oracle=f"""
    WITH RECURSIVE {_O_PACK_CTES}
    SELECT doc_id, pack_group, seq_id FROM pack
    """,
)
def corpus_pack_intact(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.sampling import (
        pack_documents_intact,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", TX.token_count(F.col("text")).alias("n_tokens")
    )
    return pack_documents_intact(docs, budget=256, n_groups=16)


@q(
    "corpus_pack_stats",
    "Packing-efficiency report over the intact packer's assignments "
    "(r6 verdict directive): per pack group — docs, sequences, total "
    "tokens, waste (unused budget) and mean fill ratio at budget 256. "
    "This is the dashboard that catches a silent next-fit-decreasing "
    "regression: a degraded packer shows up as rising waste/falling "
    "fill long before anyone inspects per-doc assignments. A doc "
    "longer than the budget overflows its own dedicated sequence, so "
    "fill_ratio can legitimately exceed 1 and waste can go negative — "
    "both are honest, not clamped. Plan: the grouped-applyInPandas "
    "packer (shuffle carries only id + token count) joined back to the "
    "persisted narrow (doc_id, n_tokens) projection it consumed — "
    "persisted ONCE via the bounded cache registry because it feeds "
    "both the packer and the join (two-branch re-evaluation trap) — "
    "then one 16-row hash aggregate. Oracle: the shared RECURSIVE "
    "replay aggregated the same way.",
    oracle=f"""
    WITH RECURSIVE {_O_PACK_CTES}
    SELECT pack_group,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(seq_id) + 1 AS BIGINT) AS n_seqs,
           CAST(SUM(tc) AS BIGINT) AS total_tokens,
           CAST((MAX(seq_id) + 1) * 256 - SUM(tc) AS BIGINT)
             AS waste_tokens,
           {o_dround(
               'CAST(SUM(tc) AS DOUBLE) / ((MAX(seq_id) + 1) * 256)', 6)}
             AS fill_ratio
    FROM pack GROUP BY 1
    """,
)
def corpus_pack_stats(spark, sf_dir):
    from pyspark import StorageLevel

    from etl_weather_data_pipeline_spark.operators.sampling import (
        pack_documents_intact,
    )

    release_curation_cache()
    counts = (
        load(spark, sf_dir, "documents")
        .select("doc_id", TX.token_count(F.col("text")).alias("n_tokens"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(counts)
    asg = pack_documents_intact(counts, budget=256, n_groups=16)
    j = asg.join(counts, "doc_id")
    return j.groupBy("pack_group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.max("seq_id") + 1).alias("n_seqs"),
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        ((F.max("seq_id") + 1) * 256 - F.sum(F.col("n_tokens").cast("long")))
        .cast("long")
        .alias("waste_tokens"),
        dround(
            F.sum(F.col("n_tokens").cast("long")).cast("double")
            / ((F.max("seq_id") + 1) * 256),
            6,
        ).alias("fill_ratio"),
    )


@q(
    "corpus_shard_manifest",
    "Per-shard manifest of a deterministic 8-way training-shard export: "
    "shard id from the md5 hash bucket of doc_id (a doc NEVER changes "
    "shard across re-exports, engines, or corpus growth — the property "
    "round-robin and RNG sharding both lack), with row count, token "
    "count, and an order-independent bit_xor content checksum per shard "
    "so a training job can verify a shard without re-reading the "
    "corpus. Map-side shard assignment + one hash aggregate; the "
    "companion sink (sinks/writers.py export_training_shards) writes "
    "the shards themselves with the xxhash64 production family.",
    oracle=f"""
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                ::BIGINT % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(len({O_TOKS})) AS BIGINT) AS n_tokens,
           bit_xor(('0x' || substr(md5(text), 1, 8))::BIGINT)
             AS content_checksum
    FROM documents GROUP BY 1
    """,
)
def corpus_shard_manifest(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.sampling import (
        hash_bucket,
    )

    docs = load(spark, sf_dir, "documents")
    shard = hash_bucket(F.col("doc_id"), 8).cast("long")
    word = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    )
    return docs.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(TX.tokens(F.col("text"))).cast("long")).alias(
            "n_tokens"
        ),
        F.bit_xor(word).alias("content_checksum"),
    )


@q(
    "corpus_training_export",
    "The composed TRAINING-EXPORT flagship — the actual deliverable of "
    "a training-data pipeline, chaining three operators that previously "
    "ran only as separate queries: (1) trained-BPE tokenization "
    "(operators/bpe.py bpe_token_counts under the shared 8-merge "
    "_bpe_state memo — same training run corpus_bpe_merges/apply use), "
    "(2) intact-document sequence packing over the BPE token counts "
    "(operators/sampling.py pack_documents_intact, budget 256, 16 hash "
    "groups), (3) deterministic 8-way shard export with a content "
    "manifest (sinks/writers.py export_training_shards, md5 family, "
    "files_per_shard=2 to exercise the sub-bucketed write layout). "
    "Shards NEST the pack groups (hash_bucket(id,16) % 8 == "
    "hash_bucket(id,8) because 8 divides 16), so every packed sequence "
    "lands wholly inside one shard — verified from disk, not assumed. "
    "EVERYTHING verified is computed FROM THE WRITTEN STORE (read-back "
    "of the shard files + the _manifest table), so the export itself is "
    "what the oracle checks. Exact per-shard cross-checks: n_docs and "
    "n_words (a doc lost/duplicated by pack, write, or manifest "
    "hash-fails). Invariant booleans, per shard: pack_fits_budget "
    "(every multi-doc sequence totals <= budget — next-fit's "
    "feasibility contract; overflow docs sit alone), "
    "shards_align_pack_groups (stored shard == pack_group % 8 == "
    "md5-bucket(doc_id, 8) on every row), manifest_counts_ok + "
    "manifest_checksum_ok (the _manifest row equals a fresh count + "
    "bit_xor(xxhash64(text)) over the read-back rows — the consumer's "
    "shard-verification path), and bpe_total_conserved (the store-wide "
    "BPE token total equals the training loop's final weighted symbol "
    "total, the corpus_bpe_apply conservation invariant carried "
    "through packing AND the parquet round-trip). BPE counts and "
    "packing aren't SQL-replayable, so those surfaces are booleans; "
    "the shard partition itself is md5-exact in both engines.",
    oracle=f"""
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                ::BIGINT % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(COALESCE(SUM(len({O_TOKS})), 0) AS BIGINT) AS n_words,
           TRUE AS pack_fits_budget,
           TRUE AS shards_align_pack_groups,
           TRUE AS manifest_counts_ok,
           TRUE AS manifest_checksum_ok,
           TRUE AS bpe_total_conserved
    FROM documents GROUP BY 1
    """,
)
def corpus_training_export(spark, sf_dir):
    import tempfile

    from pyspark import StorageLevel
    from pyspark.sql import Window

    from etl_weather_data_pipeline_spark.operators.bpe import (
        bpe_token_counts,
    )
    from etl_weather_data_pipeline_spark.operators.sampling import (
        pack_documents_intact,
    )
    from etl_weather_data_pipeline_spark.sinks.writers import (
        export_training_shards,
    )

    budget = 256
    release_curation_cache()
    docs = load(spark, sf_dir, "documents")
    merges, vocab, base_total = _bpe_state(docs, sf_dir)
    final_total = (
        merges[-1].total_symbols_after if merges else base_total
    )
    # LEFT-join the counts back onto every document id with 0-coalesce:
    # bpe_token_counts' explode drops zero-token (empty/whitespace-only)
    # docs, but the oracle counts EVERY document per shard — an inner
    # join here would lose such a doc from packing, export, manifest,
    # and the exact n_docs/n_words cross-check (r10 advice; green until
    # now only because the testdata happens to contain none).
    counts = (
        docs.select("doc_id")
        .join(bpe_token_counts(docs, vocab), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_words"), F.lit(0))
            .cast("long")
            .alias("n_words"),
            F.coalesce(F.col("n_bpe_tokens"), F.lit(0))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CURATION_PERSISTED.append(counts)
    asg = pack_documents_intact(
        counts.select("doc_id", F.col("n_bpe_tokens").alias("n_tokens")),
        budget=budget,
        n_groups=16,
    )
    export_df = (
        docs.select("doc_id", "source", "text")
        .join(counts, "doc_id")
        .join(asg, "doc_id")
    )
    import shutil

    tmp = tempfile.mkdtemp(prefix="corpus_training_export_")
    root = tmp + "/shards"
    # the result is verified FROM the written store, then returned
    # EAGERLY so the store itself can be removed (r12 leak fix)
    store = None
    try:
        export_training_shards(
            export_df,
            root,
            n_shards=8,
            key_col="doc_id",
            hash_family="md5",
            checksum_col="text",
            files_per_shard=2,
        )
        # everything below reads the WRITTEN store — the export is the
        # thing verified, not the plan that produced it
        store = spark.read.parquet(root).persist(StorageLevel.MEMORY_AND_DISK)
        _CURATION_PERSISTED.append(store)
        manifest = spark.read.parquet(f"{root}/_manifest")
        # sequence grain first (pack feasibility), then shard rollup
        seqv = (
            store.groupBy("shard", "pack_group", "seq_id")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.sum("n_bpe_tokens").alias("__tot"),
            )
            .groupBy("shard")
            .agg(
                F.min(
                    (F.col("__n") == 1) | (F.col("__tot") <= budget)
                ).alias("pack_fits_budget")
            )
        )
        per_shard = store.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.min(F.pmod(F.col("pack_group"), F.lit(8)) == F.col("shard"))
            .alias("shards_align_pack_groups"),
            F.sum("n_bpe_tokens").cast("long").alias("__bpe"),
            F.bit_xor(F.xxhash64(F.col("text"))).alias("__ck"),
        )
        g = Window.partitionBy()
        return (
            per_shard.join(seqv, "shard")
            .join(F.broadcast(manifest), "shard")
            .select(
                F.col("shard").cast("long").alias("shard"),
                "n_docs",
                "n_words",
                "pack_fits_budget",
                "shards_align_pack_groups",
                (F.col("n_rows") == F.col("n_docs")).alias(
                    "manifest_counts_ok"
                ),
                (F.col("content_checksum") == F.col("__ck")).alias(
                    "manifest_checksum_ok"
                ),
                (
                    F.sum("__bpe").over(g) == F.lit(final_total)
                ).alias("bpe_total_conserved"),
            )
        ).localCheckpoint()  # eager: the shard dir is removed below
    finally:
        # The store cache reads the tmpdir being removed: drop it from
        # the registry IN the same finally (r12 advice) — a lingering
        # entry could be recomputed (or recache-by-path re-built) from
        # a deleted path long after this query returned.
        if store is not None:
            store.unpersist()
            try:
                _CURATION_PERSISTED.remove(store)
            except ValueError:
                pass  # bounded registry already evicted it
        shutil.rmtree(tmp, ignore_errors=True)


# Shared mixture-rate derivation: ONE source of truth for the planning
# view (corpus_mixture_plan) and the materializer (corpus_epoch_expand),
# on both engines — the SQL CTE chain below and _mixture_rates are
# generated/written together so plan and materialization cannot drift.
_O_MIXTURE_CTES = f"""m AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CAST(len({O_TOKS}) AS BIGINT)) AS BIGINT) AS mass
      FROM documents GROUP BY source),
    s AS (SELECT source, n_docs, mass,
                 {o_dround("sqrt(mass)", 6)} AS sq
          FROM m),
    d AS (SELECT CAST(SUM(CAST(sq AS DECIMAL(18,6))) AS DOUBLE) AS denom,
                 CAST(SUM(mass) AS BIGINT) AS total_mass
          FROM s),
    w AS (SELECT source, n_docs, mass,
                 {o_dround("sq / denom", 6)} AS mix_weight,
                 total_mass
          FROM s, d),
    t AS (SELECT source, n_docs, mass, mix_weight,
                 CAST(FLOOR(mix_weight * total_mass) AS BIGINT)
                   AS target_tokens
          FROM w),
    r AS (SELECT source, n_docs, mass, mix_weight, target_tokens,
                 {o_dround("CAST(target_tokens AS DOUBLE) / mass", 6)}
                   AS sampling_rate
          FROM t)"""


def _mixture_rates(docs):
    """Per-source mixture table (Spark mirror of _O_MIXTURE_CTES' `r`):
    (source, n_docs, mass_tokens, mix_weight, target_tokens,
    sampling_rate). One fact pass; cross-source totals are window sums
    over the #sources-row aggregate (a second .agg() branch would
    re-scan — the two-branch trap)."""
    from pyspark.sql import Window

    m = (
        docs.select(
            "source",
            F.size(TX.tokens(F.col("text"))).cast("long").alias("__n"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("mass_tokens"),
        )
    )
    s = m.select(
        "source",
        "n_docs",
        "mass_tokens",
        dround(F.sqrt(F.col("mass_tokens")), 6).alias("__sq"),
    )
    g = Window.partitionBy()
    w = s.select(
        "source",
        "n_docs",
        "mass_tokens",
        dround(
            F.col("__sq")
            / F.sum(F.col("__sq").cast("decimal(18,6)"))
            .over(g)
            .cast("double"),
            6,
        ).alias("mix_weight"),
        F.sum("mass_tokens").over(g).alias("__tm"),
    )
    t = w.select(
        "source",
        "n_docs",
        "mass_tokens",
        "mix_weight",
        F.floor(F.col("mix_weight") * F.col("__tm"))
        .cast("long")
        .alias("target_tokens"),
    )
    return t.withColumn(
        "sampling_rate",
        dround(
            F.col("target_tokens").cast("double") / F.col("mass_tokens"), 6
        ),
    )


@q(
    "corpus_mixture_plan",
    "Training-mixture planning table (the 'epochs over each dataset' "
    "view from the LLaMA / Gopher data recipes): per-source token mass, "
    "alpha=0.5-smoothed mixture weight w_s = sqrt(mass_s)/SUM(sqrt(mass))"
    " (the same smoothing corpus_temperature_sample applies when it "
    "actually draws docs), the token allocation w_s * total_mass at a "
    "budget of one corpus-mass equivalent, the per-source sampling rate "
    "that allocation implies, and the epoch count (rate > 1 means the "
    "source repeats — head domains shed mass to the tail, so tail "
    "sources oversample). Scale shape: ONE hash aggregate over the fact "
    "table down to #sources rows; every subsequent step is arithmetic "
    "on that tiny side (broadcast of a 1-row global), so the plan costs "
    "a single fact-table pass at any corpus size. Determinism: sqrt is "
    "correctly-rounded IEEE, the cross-source sum of sqrts goes through "
    "exact decimals, and every derived double is decimal-routed before "
    "comparison or floor/ceil. Rate derivation is SHARED with "
    "corpus_epoch_expand (_mixture_rates / _O_MIXTURE_CTES) so the "
    "plan and its materializer cannot drift.",
    oracle=f"""
    WITH {_O_MIXTURE_CTES}
    SELECT source, n_docs, mass AS mass_tokens, mix_weight,
           target_tokens, sampling_rate,
           CAST(CEIL(sampling_rate) AS BIGINT) AS n_epochs,
           sampling_rate > 1.0 AS oversampled
    FROM r
    """,
)
def corpus_mixture_plan(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return _mixture_rates(docs).select(
        "source",
        "n_docs",
        "mass_tokens",
        "mix_weight",
        "target_tokens",
        "sampling_rate",
        F.ceil(F.col("sampling_rate")).cast("long").alias("n_epochs"),
        (F.col("sampling_rate") > F.lit(1.0)).alias("oversampled"),
    )


@q(
    "corpus_epoch_expand",
    "Materialize the planned mixture (corpus_mixture_plan's companion): "
    "each doc repeats floor(rate) times plus one more when its md5 "
    "bucket falls under the fractional remainder — deterministic "
    "oversampling/subsampling per source (a doc's copy count never "
    "changes across runs, engines, or partitionings; rate > 1 sources "
    "repeat whole epochs, rate < 1 sources thin). Per-source report: "
    "docs in, docs out, tokens out, the rate applied. Copy "
    "materialization is a map-side sequence explode of an integer "
    "array (no join builds the copies); the 20-row rate table "
    "broadcasts onto the fact scan — one shuffle total (the final "
    "aggregate). Fully EXACT-oracled end to end.",
    oracle=f"""
    WITH {_O_MIXTURE_CTES},
    rated AS (
      SELECT doc.source, len({O_TOKS}) AS nt, r.n_docs,
             r.sampling_rate AS rate,
             CAST(FLOOR(r.sampling_rate) AS BIGINT)
               + CASE WHEN {_O_BUCKET} / 1000.0
                        < r.sampling_rate - FLOOR(r.sampling_rate)
                      THEN 1 ELSE 0 END AS k
      FROM documents doc JOIN r ON doc.source = r.source),
    expanded AS (
      SELECT source, nt, n_docs, rate
      FROM rated, unnest(range(rated.k)) AS u(i))
    SELECT source,
           CAST(MIN(n_docs) AS BIGINT) AS docs_in,
           COUNT(*) AS docs_out,
           CAST(SUM(nt) AS BIGINT) AS tokens_out,
           MIN(rate) AS rate
    FROM expanded GROUP BY source
    """,
)
def corpus_epoch_expand(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.sampling import (
        hash_bucket,
    )

    docs = load(spark, sf_dir, "documents")
    rates = _mixture_rates(docs).select(
        "source",
        F.col("n_docs").alias("__n_docs"),
        F.col("sampling_rate").alias("__rate"),
    )
    rated = (
        docs.select(
            "source",
            "doc_id",
            F.size(TX.tokens(F.col("text"))).cast("long").alias("__nt"),
        )
        .join(F.broadcast(rates), "source")
        .withColumn(
            "__k",
            F.floor(F.col("__rate")).cast("long")
            + F.when(
                hash_bucket(F.col("doc_id")) / F.lit(1000.0)
                < F.col("__rate") - F.floor(F.col("__rate")),
                1,
            )
            .otherwise(0)
            .cast("long"),
        )
    )
    # copies: cheap integer sequence — inner explode is fine here (the
    # inferred size>0 filter re-evaluates only the sequence expr)
    expanded = rated.select(
        "source",
        "__nt",
        "__n_docs",
        "__rate",
        F.explode(
            F.when(
                F.col("__k") >= 1, F.sequence(F.lit(1), F.col("__k"))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__copy"),
    )
    return expanded.groupBy("source").agg(
        F.min("__n_docs").cast("long").alias("docs_in"),
        F.count(F.lit(1)).alias("docs_out"),
        F.sum("__nt").cast("long").alias("tokens_out"),
        F.min("__rate").alias("rate"),
    )


@q(
    "ann_index_drift_report",
    "Drift/skew audit + retrain for the persisted IVF index (r10 "
    "verdict directive #4 — the FAISS operational reality the frozen "
    "quantizer creates at 100 TB): the index is built with its coarse "
    "quantizer trained on a BIASED early slice (vec_id % 4 == 0 — the "
    "bootstrap-sample drift scenario), the remaining three quarters "
    "arrive through the map-only add path, ivf_cell_stats reports "
    "per-cell population skew + residual energy BEFORE, "
    "retrain_ivf_index warm-starts Lloyd from the frozen centroids and "
    "staged-swap rewrites the store, and the report is re-read from "
    "the SWAPPED store. Exact cross-checks: k and n_vectors (a row "
    "lost or duplicated by the rewrite hash-fails). Invariant "
    "booleans: retrain_preserves_rows; retrain_assign_consistent "
    "(every post-swap row's cell equals the argmin over the RETRAINED "
    "centroids — null-safe recompute); sse_non_increasing (warm-start "
    "Lloyd's monotonicity, measured from the drifted assignment's own "
    "energy); energy_not_worse (total within-cell squared distance "
    "from the swapped store <= the drifted store's AND zero "
    "unmeasurable null-energy rows on either side, so both totals "
    "cover identical row sets — the retrain can "
    "provably never hurt the data it holds); skew_frac_sums_to_one "
    "(the stats report covers every stored row, before and after). "
    "Clustering itself is not SQL-replayable, so those surfaces are "
    "booleans; the oracle cross-checks the exact columns and emits "
    "literal TRUE.",
    oracle="""
    SELECT CAST(8 AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           TRUE AS retrain_preserves_rows,
           TRUE AS retrain_assign_consistent,
           TRUE AS sse_non_increasing,
           TRUE AS energy_not_worse,
           TRUE AS skew_frac_sums_to_one
    FROM embeddings
    """,
)
def ann_index_drift_report(spark, sf_dir):
    import shutil
    import tempfile

    from etl_weather_data_pipeline_spark.operators import ann_index as AX

    tmp = tempfile.mkdtemp(prefix="ann_drift_")
    root = tmp + "/index"
    emb = load(spark, sf_dir, "embeddings")

    def stats(rows):
        n = sum(r["n_vectors"] for r in rows)
        # a null mean_sq_dist marks an unmeasurable (corrupt-cell) row —
        # impossible for a store built through these APIs, but the audit
        # must not crash on the brokenness it exists to surface; the
        # unmeasurable-row count is returned so energy_not_worse can
        # require both totals to cover IDENTICAL row sets (r11 advice:
        # excluding null cells from only one side would let the energy
        # comparison pass vacuously over different subsets)
        energy = sum(
            r["n_vectors"] * r["mean_sq_dist"]
            for r in rows
            if r["mean_sq_dist"] is not None
        )
        unmeasurable = sum(
            r["n_vectors"] for r in rows if r["mean_sq_dist"] is None
        )
        frac = sum(r["cell_frac"] for r in rows)
        return n, energy, frac, unmeasurable

    # every returned value is a DRIVER literal computed before the
    # finally, so removing the temp index is safe (bench runs this
    # min-of-N — leaked index dirs would accumulate per run)
    try:
        AX.write_ivf_index(
            emb.filter(F.col("vec_id") % 4 == 0), root, n_cells=8,
            iterations=2,
        )
        AX.add_to_ivf_index(emb.filter(F.col("vec_id") % 4 != 0), root)
        n_before, e_before, f_before, u_before = stats(
            AX.ivf_cell_stats(spark, root).collect()
        )
        rep = AX.retrain_ivf_index(spark, root, iterations=3)
        # Fused post-retrain audit (r15 verdict directive #6): the
        # after-stats AND the assign-consistency recompute ride ONE
        # scan/action (ivf_cell_stats assign_check=True) — the old
        # shape paid three driver actions here (cell stats, a second
        # centroid collect, a separate full-scan mismatch count), each
        # with its own per-action planning gap.
        after_rows = AX.ivf_cell_stats(
            spark, root, assign_check=True
        ).collect()
        n_after, e_after, f_after, u_after = stats(after_rows)
        n_bad = sum(r["n_bad"] for r in after_rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    sse = rep["sse_history"]
    monotone = all(
        sse[i + 1] <= sse[i] * (1 + 1e-9) + 1e-9
        for i in range(len(sse) - 1)
    )
    return spark.range(1).select(
        F.lit(8).cast("int").alias("k"),
        F.lit(n_after).cast("long").alias("n_vectors"),
        F.lit(bool(n_after == n_before)).alias("retrain_preserves_rows"),
        F.lit(bool(n_bad == 0)).alias("retrain_assign_consistent"),
        F.lit(bool(monotone)).alias("sse_non_increasing"),
        # unmeasurable (null-energy) rows on EITHER side would make the
        # two energy totals cover different row subsets — fold the
        # counts into the boolean so it can never pass vacuously
        F.lit(
            bool(
                e_after <= e_before * (1 + 1e-6) + 1e-6
                and u_before == 0
                and u_after == 0
            )
        ).alias("energy_not_worse"),
        F.lit(
            bool(abs(f_before - 1.0) < 1e-9 and abs(f_after - 1.0) < 1e-9)
        ).alias("skew_frac_sums_to_one"),
    )


@q(
    "corpus_semdedup_global",
    "The batch-periodic corpus-GLOBAL SemDeDup pass (r10 verdict "
    "directive #5 — the audit the streaming stage-4 docstring "
    "promises): per-batch semantic dedup judges only against cells "
    "frozen at bootstrap, so near-dups that straddle a drifted cell "
    "boundary are admitted blind; the periodic pass retrains the "
    "quantizer on the FULL store (warm-start Lloyd + staged swap) and "
    "re-judges every stored vector with MULTI-PROBE blocking (each "
    "vector blocks to its n_probe=2 nearest cells, pairs compared when "
    "probe sets intersect, exact cosine >= 0.95 verifies, per-cell "
    "population stop bound) — returning the missed pairs as a "
    "work-list. Scenario: half the embeddings build the index (frozen "
    "early training), the other half arrives via adds, and known "
    "near-duplicates are planted (vec_id % 10 == 0, scaled by 1.001 — "
    "cosine ~1.0, planted at id + 1e6 with the recall probes' "
    "collision guard). Exact cross-checks: n_base_vectors, n_planted. "
    "Booleans: retrain_preserves_rows, retrain_assign_consistent "
    "(post-swap store invariant), planted_recall_floor_ok (the global "
    "pass recovers >= 90% of planted pairs — at the gate SFs it is "
    "1.0), planted_all_indexed (every planted id reached the index "
    "through the add path). Clustering/audit internals are not "
    "SQL-replayable; the oracle cross-checks the exact columns.",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_base_vectors,
           CAST(SUM(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_planted,
           TRUE AS retrain_preserves_rows,
           TRUE AS retrain_assign_consistent,
           TRUE AS planted_recall_floor_ok,
           TRUE AS planted_all_indexed
    FROM embeddings
    """,
)
def corpus_semdedup_global(spark, sf_dir):
    import shutil
    import tempfile

    from etl_weather_data_pipeline_spark.operators import ann_index as AX
    from etl_weather_data_pipeline_spark.operators.kmeans import (
        argmin_index,
    )

    tmp = tempfile.mkdtemp(prefix="semdedup_global_")
    root = tmp + "/index"
    emb = load(spark, sf_dir, "embeddings")
    planted_id = F.when(
        F.col("vec_id") < 1000000, F.col("vec_id") + 1000000
    ).otherwise(
        F.raise_error(
            F.lit("corpus_semdedup_global: vec_id >= 1e6 collides with "
                  "the planted-id space; raise the offset")
        )
    )
    # element cast back to float: the embeddings table stores
    # array<float>, and a double-promoted planted column would fork the
    # store's parquet schema across cell partitions
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        planted_id.alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x: (x.cast("double") * F.lit(1.001)).cast("float"),
        ).alias("embedding"),
    )
    # every returned value is a DRIVER literal computed before the
    # finally, so removing the temp index is safe (bench min-of-N)
    try:
        AX.write_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 0), root, n_cells=8,
            iterations=2,
        )
        AX.add_to_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), root)
        AX.add_to_ivf_index(planted, root)
        rep = AX.retrain_ivf_index(spark, root, iterations=2)
        pairs = AX.semdedup_global_audit(
            spark, root, threshold=0.95, n_probe=2
        )
        # ONE crossJoined audit action (r15, verdict #3 — the
        # corpus_store_maintenance born-fused shape): the recall count,
        # the base/planted counts, and the post-retrain index
        # consistency counts are three independent 1-row aggregates
        # over frames that all exist NOW (audit pairs checkpoint, the
        # raw embeddings, the post-swap store), so they fold into a
        # single .first() instead of three driver actions each paying
        # the per-action planning gap. The recall term stays a FILTER
        # + count (NOT sum-of-condition): the planted-pair predicate
        # must push below the audit's distinct/self-join — measured
        # r15: the sum-of-condition form kept the full pair join alive
        # and ran the whole entry 1.7x SLOWER; the filter form is the
        # fuse that actually wins (interleaved min-of-4: 9.49 -> 8.46).
        cents = AX.read_ivf_centroid_matrix(spark, root)
        rec_agg = pairs.filter(
            (F.col("id_b") >= 1000000)
            & (F.col("id_a") == F.col("id_b") - 1000000)
        ).agg(F.count(F.lit(1)).alias("n_rec"))
        base_agg = emb.agg(
            F.count(F.lit(1)).alias("n_base"),
            F.sum((F.col("vec_id") % 10 == 0).cast("long")).alias("n_p"),
        )
        idx_agg = AX.read_ivf_vectors(spark, root).agg(
            F.sum(
                (
                    ~F.col("cell").eqNullSafe(
                        argmin_index(F.col("embedding"), cents).cast(
                            "int"
                        )
                    )
                ).cast("long")
            ).alias("n_bad"),
            F.sum((F.col("vec_id") >= 1000000).cast("long")).alias(
                "n_pi"
            ),
        )
        row = base_agg.crossJoin(rec_agg).crossJoin(idx_agg).first()
        n_base, n_planted = row["n_base"], row["n_p"] or 0
        n_rec = row["n_rec"]
        n_bad = row["n_bad"] or 0
        n_planted_indexed = row["n_pi"] or 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.range(1).select(
        F.lit(n_base).cast("long").alias("n_base_vectors"),
        F.lit(n_planted).cast("long").alias("n_planted"),
        F.lit(bool(rep["n_vectors"] == n_base + n_planted)).alias(
            "retrain_preserves_rows"
        ),
        F.lit(bool(n_bad == 0)).alias("retrain_assign_consistent"),
        F.lit(bool(n_planted > 0 and n_rec >= 0.9 * n_planted)).alias(
            "planted_recall_floor_ok"
        ),
        F.lit(bool(n_planted_indexed == n_planted)).alias(
            "planted_all_indexed"
        ),
    )
