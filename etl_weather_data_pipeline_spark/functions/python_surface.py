"""The full Python-extension surface, demonstrated and contract-tested.

Spark's Python escape hatches, in preference order (see README "Scale
design"): native Column expressions (always first), Arrow-vectorized
``pandas_udf`` (scalar: `vector.cosine_arrow`; grouped-agg: here),
``mapInPandas`` (streaming/multimodal.py), ``applyInPandasWithState``
(streaming/state.py), and Python UDTFs (here). Everything in this module
has a NATIVE twin in the query catalog; tests pin that the two agree, so
these exist as documented alternatives for logic that outgrows Column
expressions — not as the default path. Arrow transfer costs real time;
measure before choosing them (vector.cosine_arrow's docstring shows the
method).
"""

from __future__ import annotations

def chunk_docs_udtf():
    """Python UDTF twin of the native chunker (plans/llmops.py
    doc_chunk_spans): one (chunk_idx, chunk_text, n_chunk_tokens) row per
    overlapping 32-token window, stride 24.

    A UDTF is the right escape hatch when the per-row FAN-OUT logic is
    genuinely imperative (stateful tokenizers, model-driven splitting);
    for pure slicing the native transform/explode plan wins — it stays in
    codegen and costs no Python transfer. Lazily imported + nested so
    cloudpickle ships it by value (module-level UDTFs would need the
    package zip on every executor).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, chunk_text: string, n_chunk_tokens: bigint")
    class ChunkDocs:
        def eval(self, text: str):
            from etl_weather_data_pipeline_spark.plans.llmops import (
                _CHUNK_STRIDE,
                _CHUNK_W,
            )

            if text is None:  # tolerate NULL text like the native twin
                text = ""
            toks = text.strip().split()
            if not toks:
                toks = [""]
            starts = range(0, max(len(toks) - (_CHUNK_W - _CHUNK_STRIDE), 1), _CHUNK_STRIDE)
            for i, s in enumerate(starts):
                piece = toks[s : s + _CHUNK_W]
                yield i, " ".join(piece), len(piece)

    return ChunkDocs


def mean_vector_grouped_agg(dim: int = 64):
    """GROUPED_AGG pandas UDF — the Python UDAF surface: per-group mean
    embedding via one numpy reduction per group.

    Native twin: the posexplode + two-level average in `label_centroids`
    (plans/llmops.py), which is the scale default (codegen, partial aggs,
    no Python). The grouped-agg form trades that for expressiveness —
    use it when the per-group reduction has no Column equivalent
    (trimmed means, quantile sketches over vectors, model updates).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _mean_vec(col):
        m = np.stack(col.to_numpy()).astype(np.float64, copy=False)
        return m.mean(axis=0).tolist()

    _mean_vec.__annotations__ = {"col": pd.Series, "return": list}
    return pandas_udf(_mean_vec, "array<double>")
