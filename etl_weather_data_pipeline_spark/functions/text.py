"""Text-analysis expressions for training-data pipelines.

Tokenization, n-gram shingling, quality scoring, language-ID heuristics and
document fingerprinting — all as native Column expressions (array/string
functions, no Python UDFs) so they vectorize in whole-stage codegen and
scale linearly with the corpus.

Each helper is deliberately expressible in ANSI SQL too (the DuckDB oracle
mirrors them 1:1), so the semantics are engine-independent and testable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny fixed stopword list — enough for ratio features and the
# language-ID heuristic; deliberately deterministic and SQL-mirrorable.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens."""
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_len(text: Column) -> Column:
    """Mean token length in characters (0 for empty text)."""
    n = token_count(text)
    total = F.aggregate(
        tokens(text), F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    """How many tokens are stopwords (exact token match)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_count(text, stopwords).cast("double") / n).otherwise(
        F.lit(0.0)
    )


def distinct_token_ratio(text: Column) -> Column:
    """Vocabulary richness: distinct tokens / tokens (1.0 for empty)."""
    n = token_count(text)
    return F.when(
        n > 0, F.size(F.array_distinct(tokens(text))).cast("double") / n
    ).otherwise(F.lit(1.0))


def quality_bucket(tok_n: Column, sw_ratio: Column, distinct_ratio: Column) -> Column:
    """Coarse document-quality bucket from simple heuristics (generalizes the
    reference's quality_score E19 to text corpora)."""
    return (
        F.when(tok_n < 5, "too_short")
        .when(distinct_ratio < 0.3, "repetitive")
        .when(sw_ratio > 0.6, "boilerplate")
        .otherwise("ok")
    )


def word_shingles_of(toks: Column, k: int = 3) -> Column:
    """k-word shingles from an ALREADY-PROJECTED token-array column.

    ``toks`` must be a bound column attribute (project ``tokens(text)``
    first), not the split expression itself: an outer expression referenced
    inside a higher-order-function lambda re-evaluates PER ELEMENT, so
    shingling directly over ``split(text)`` re-tokenizes the document once
    per shingle — measured ~5x the whole stage's cost on the corpus.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle = lambda i: F.array_join(F.slice(toks, i + 1, k), " ")  # noqa: E731
    return F.when(n >= k, F.transform(idx, shingle)).otherwise(
        F.when(n > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as array<string> ('w1 w2 w3' joined).

    Convenience single-expression form — fine for small inputs, but on a
    hot path project ``tokens(text)`` first and use ``word_shingles_of``
    (see its docstring for the per-element re-tokenization trap).
    """
    return word_shingles_of(tokens(text), k)


def subword_count(text: Column) -> Column:
    """BPE-ish token count without a tokenizer model: split into word /
    punctuation pieces (``[a-z0-9]+|[^a-z0-9\\s]``), each piece contributes
    ceil(len/4) subwords — the ~4-chars-per-BPE-token rule of thumb used
    for corpus budgeting. Pure regexp + array fold, mirrored 1:1 by the
    DuckDB oracle."""
    pieces = F.regexp_extract_all(
        F.lower(text), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0
    )
    return F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.floor((F.length(t) + 3) / 4).cast("long"),
    )


def chars_of(text: Column) -> Column:
    """Character array of a string (empty array for empty/null-ish input).

    Project this ONCE as a bound column before building char n-grams or
    rolling hashes from it — the same per-element re-evaluation trap as
    word_shingles_of applies to any expression referenced inside a
    higher-order-function lambda."""
    return F.when(F.length(text) > 0, F.split(text, "")).otherwise(
        F.array().cast("array<string>")
    )


def char_ngrams_of(chars: Column, n: int = 3) -> Column:
    """Distinct character n-grams from an ALREADY-PROJECTED char-array
    column. Built by slicing the char array (O(1) per position) rather
    than substr on the string (O(pos) UTF-8 scan per call → quadratic).
    Texts shorter than ``n`` yield the whole text as one gram."""
    m = F.size(chars)
    idx = F.sequence(F.lit(1), F.greatest(m - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(chars, i, n), ""))
    return F.array_distinct(
        F.when(m > 0, grams).otherwise(F.array().cast("array<string>"))
    )


# Rabin–Karp parameters: base 31, Mersenne-prime modulus 2^31-1. Products
# stay under 2^63 so plain BIGINT arithmetic is exact in both engines.
ROLL_BASE = 31
ROLL_MOD = 2_147_483_647


def char_codes_of(chars: Column) -> Column:
    """Per-character code points of an already-projected char array."""
    return F.transform(chars, lambda c: F.ascii(c))


def rolling_kgram_hashes_of(codes: Column, k: int = 8) -> Column:
    """Polynomial (Rabin–Karp) hash of every k-char gram, as array<long>.

    ``codes`` must be a bound char-code array column. Hash values equal the
    classic rolling hash h = sum(c_j * B^(k-1-j)) mod M; each gram folds
    its own k codes (element_at on the array is O(1), so the stage is
    O(n·k) per doc and fully map-side). Texts shorter than ``k`` hash the
    whole text; empty texts yield an empty array."""
    n = F.size(codes)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))

    def gram_hash(i: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(k - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: (acc * ROLL_BASE + F.element_at(codes, i + j))
            % ROLL_MOD,
        )

    whole = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_BASE + c) % ROLL_MOD,
    )
    return (
        F.when(n >= k, F.transform(idx, gram_hash))
        .when(n > 0, F.array(whole))
        .otherwise(F.array().cast("array<long>"))
    )


def winnow_fingerprints_of(hashes: Column, w: int = 4) -> Column:
    """Winnowing (MOSS-style) document fingerprints: the distinct set of
    per-window minima over the k-gram hash sequence. Guarantees any shared
    substring of length >= k+w-1 chars produces a shared fingerprint —
    the standard local-similarity sketch for plagiarism/near-dup detection.
    ``hashes`` must be a bound array column (see rolling_kgram_hashes_of)."""
    m = F.size(hashes)
    idx = F.sequence(F.lit(1), F.greatest(m - (w - 1), F.lit(1)))
    wins = F.transform(idx, lambda i: F.array_min(F.slice(hashes, i, w)))
    return F.array_distinct(
        F.when(m > 0, wins).otherwise(F.array().cast("array<long>"))
    )


def fingerprint(text: Column, hash_family: str = "md5") -> Column:
    """Deterministic document fingerprint of the whitespace-normalized,
    lowercased text.

    ``hash_family="md5"`` (default): engine-independent (md5 exists
    everywhere), so the DuckDB oracle reproduces it bit-for-bit.
    ``hash_family="xxhash64"``: the production fast path — one 64-bit
    non-crypto hash, ~an order of magnitude cheaper per byte than md5 and
    an 8-byte shuffle key instead of a 32-char string. Same dedup
    semantics (equality of normalized content); 64-bit collisions are
    ~n²/2⁶⁵ — fine for dedup keys, not for adversarial content.
    """
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    if hash_family == "xxhash64":
        return F.xxhash64(normalized)
    assert hash_family == "md5", hash_family
    return F.md5(normalized)


def minhash_values(text: Column, num_hashes: int = 4, k: int = 3) -> Column:
    """MinHash signature as array<long> of length ``num_hashes``.

    Hash family h_i(s) = int(substr(md5(i//4 || ':' || s), 8*(i%4)+1, 8),
    16) — one md5 split into four 32-bit words (the md5 is the cost; see
    operators/dedup.py minhash_signatures for the measured explode-based
    form used on the hot path, which this family matches exactly).
    md5-based so the DuckDB oracle reproduces it bit-for-bit; at scale
    swap for xxhash64 with the same structure.

    Implementation note: the hash index is captured via a closure
    FACTORY, never the ``lambda s, i=i:`` default-arg idiom —
    ``F.transform`` dispatches on lambda ARITY, so a two-parameter
    lambda is called as (element, index) and ``i`` silently rebinds to
    the element-index Column (TypeError here; silent wrong hashes in
    expressions where ``Column`` operations happen to be valid).
    """
    sh = word_shingles(text, k)

    def word(i):
        return lambda s: F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i // 4}:"), s)),
                8 * (i % 4) + 1,
                8,
            ),
            16,
            10,
        ).cast("long")

    return F.array(
        *[F.array_min(F.transform(sh, word(i))) for i in range(num_hashes)]
    )


def simhash_bits(text: Column, bits: int = 16) -> Column:
    """SimHash over whitespace tokens, ``bits`` wide, returned as a long.

    Per token we take the first bits/4 hex chars of md5(token); each hex
    char contributes 4 bit-votes (+1 if the bit is set, -1 otherwise); a
    final bit is 1 when its vote sum is positive. Pure array/string
    expressions, mirrored exactly by the SQL oracle.
    """
    assert bits % 4 == 0
    toks = tokens(text)
    hexdigits = "0123456789abcdef"

    def bit_vote(bit: int) -> Column:
        hex_pos = bit // 4  # which hex char of the md5 prefix
        bit_in_char = 3 - (bit % 4)  # high bit first within the char
        def vote(t: Column) -> Column:
            ch = F.substring(F.md5(t), hex_pos + 1, 1)
            val = F.instr(F.lit(hexdigits), ch) - 1
            b = F.shiftright(val, bit_in_char) % 2
            return F.when(b == 1, 1).otherwise(-1)
        return F.aggregate(toks, F.lit(0), lambda acc, t: acc + vote(t))

    out = F.lit(0).cast("long")
    for bit in range(bits):
        weight = 1 << (bits - 1 - bit)
        out = out + F.when(bit_vote(bit) > 0, F.lit(weight)).otherwise(F.lit(0)).cast(
            "long"
        )
    return out


def jaccard_tokens(a: Column, b: Column) -> Column:
    """Jaccard similarity of the distinct-token sets of two texts."""
    sa = F.array_distinct(tokens(a))
    sb = F.array_distinct(tokens(b))
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


# PII scrubbing — ASCII-only patterns so Java (Spark), RE2 (DuckDB), and
# Python agree exactly. Production sets are larger; the mechanism (chained
# global regexp_replace, counts via regexp_extract_all) is the same.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONG_DIGITS = r"[0-9]{9,}"


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_long_digit_runs) found in the text."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)),
        F.size(F.regexp_extract_all(text, F.lit(PII_LONG_DIGITS), 0)),
    )


def pii_scrub(text: Column) -> Column:
    """Redact emails then long digit runs (IDs/phone-ish) with typed
    placeholders. Order matters: emails first, or the digit rule would
    chew the local part of numeric addresses."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(out, PII_LONG_DIGITS, "<NUM>")


# Language-ID heuristic: score = stopword hits per language profile, pick the
# argmax. Profiles are tiny fixed lists so the whole thing is a when-chain.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(F.lower(text))
    out = {}
    for lang, words in LANG_PROFILES.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def lang_id(text: Column) -> Column:
    """Predicted language = argmax of profile scores, 'und' when all zero.
    Ties break by profile order (en, es, de, fr) — mirrored in the oracle."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_PROFILES)):
        expr = F.when((scores[lang] == best) & (best > 0), lang).otherwise(expr)
    return expr
