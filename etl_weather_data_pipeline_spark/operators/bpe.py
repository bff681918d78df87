"""Byte-pair-encoding tokenizer training — iterative merge learning as
DataFrame ops (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"; the algorithm behind GPT/LLaMA tokenizers).

The classic formulation works over WORD TYPES, not corpus positions: the
corpus collapses to a (word, count) vocabulary once, and every merge
round counts adjacent symbol pairs weighted by word frequency. That
collapse is what makes this scale — a 100 TB corpus has a bounded set of
word types (tens of millions), so after ONE full-corpus aggregate the
loop runs on a table that fits comfortably in cluster memory, and each
round is a small explode + hash aggregate. The driver holds only the
merge list itself (n_merges rows).

Pair counting matches the reference implementation: adjacent pairs via a
sliding window (overlaps counted), merges applied greedily
left-to-right, ties broken lexicographically for cross-run determinism.
Per round: two driver actions — the pair-selection aggregate's collect,
then the total-symbols count that doubles as the materializer of the
merged vocab's lazy localCheckpoint (the lineage-cut-by-the-measurement
idea from operators/components.py, which gets by with one).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_weather_data_pipeline_spark.functions import text as TX

WORD_END = "</w>"


@dataclass(frozen=True)
class Merge:
    merge_idx: int
    left: str
    right: str
    pair_count: int
    total_symbols_after: int


def _apply_merge(sym, a: str, b: str):
    """Greedy left-to-right replacement of adjacent (a, b) with a+b —
    a codegen'd fold; 'aaa' under (a,a) becomes [aa, a], like the
    reference implementation."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def build_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, sym) vocabulary: the one full-corpus pass. sym is the
    character sequence plus a word-end marker (so 'low' in 'lowest' and
    terminal 'low' learn different merges, as standard BPE does)."""
    words = docs.select(
        F.explode(TX.tokens(F.col(text_col))).alias("__w")
    )
    vocab = words.groupBy("__w").agg(F.count(F.lit(1)).alias("cnt"))
    sym = F.concat(
        TX.chars_of(F.col("__w")), F.array(F.lit(WORD_END))
    )
    return vocab.select(
        F.col("__w").alias("word"), "cnt", sym.alias("sym")
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    round_secs: list[float] | None = None,
) -> tuple[list[Merge], DataFrame, int]:
    """Learn ``n_merges`` BPE merges; returns
    ``(merges, final_vocab, base_total_symbols)``.

    Deterministic: pair selection orders by (count DESC, left, right).
    Each round strictly reduces the weighted symbol count (greedy
    application always merges at least one occurrence of the selected
    pair), which corpus_bpe_merges turns into a driver-checkable
    invariant. Stops early if no adjacent pair remains.

    Realistic-vocab scaling (measured at sf0.1, 64 merges, local[32]):
    the per-round cost curve is FLAT — each round is one pair-count
    aggregate + one checkpoint-materializing count over the previous
    round's localCheckpoint, so lineage never accumulates and the
    vocab table only shrinks; pass ``round_secs`` (an empty list) to
    record per-round wall seconds and see the curve yourself
    (tests/test_llmops.py pins flatness at 64 merges on the gate SF).
    """
    import time

    vocab = build_vocab(docs, text_col).localCheckpoint(eager=True)
    base_total = int(
        vocab.agg(F.sum(F.col("cnt") * F.size("sym")).alias("t")).first()[
            "t"
        ]
    )
    merges: list[Merge] = []
    for i in range(n_merges):
        t0 = time.monotonic()
        pair_arr = F.when(
            F.size("sym") >= 2,
            F.expr(
                "transform(sequence(0, size(sym) - 2), "
                "i -> struct(sym[i] AS l, sym[i + 1] AS r))"
            ),
        ).otherwise(
            F.expr(
                "CAST(array() AS array<struct<l: string, r: string>>)"
            )
        )
        top = (
            vocab.select("cnt", F.explode(pair_arr).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        new_vocab = vocab.select(
            "word", "cnt", _apply_merge(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint(eager=False)
        # One action per round materializes the lazy checkpoint AND
        # measures the post-merge weighted symbol count.
        total_after = int(
            new_vocab.agg(
                F.sum(F.col("cnt") * F.size("sym")).alias("t")
            ).first()["t"]
        )
        merges.append(Merge(i, a, b, n, total_after))
        vocab = new_vocab
        if round_secs is not None:
            round_secs.append(time.monotonic() - t0)
    return merges, vocab, base_total


def bpe_token_counts(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc token counts under a trained BPE segmentation: explode
    words, broadcast-join the (word -> sym) vocabulary, sum segment
    counts. Out-of-vocabulary words (new data after training) fall back
    to character-level length + 1 (each char + the end marker a fresh
    word would start from). Returns (id_col, n_words, n_bpe_tokens).

    Scale shape: the vocab is word-TYPES (bounded), so it broadcasts;
    the fact side never shuffles — one explode, one broadcast join,
    one hash aggregate back to doc grain.
    """
    words = docs.select(
        F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("__w")
    )
    seg = vocab.select(
        F.col("word").alias("__w"), F.size("sym").alias("__n_seg")
    )
    joined = words.join(F.broadcast(seg), "__w", "left")
    per_word = F.coalesce(
        F.col("__n_seg"), F.length("__w") + F.lit(1)
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(per_word).cast("long").alias("n_bpe_tokens"),
    )
