"""Language identification (SURVEY.md §2.3 L1).

The reference calls ``langdetect`` per-row
(/root/reference/streaming/quality_engine.py:149-161) — the only true
UDF in the system. We provide two implementations:

1. ``lang_id_heuristic`` — a deterministic, fully native (no-UDF)
   stopword/marker n-gram heuristic: per-language marker-word hit
   counts, CJK-codepoint presence for zh, argmax with a fixed
   tie-break order, confidence = hits / word_count (capped at 1.0).
   This is the production path: it is JVM-side, codegen'd, and
   oracle-checkable in ANSI SQL.

2. ``langdetect_pandas_udf`` — an Arrow-vectorized pandas UDF wrapping
   ``langdetect`` when the library is installed (it is not in this
   image); seeded for determinism. Gated behind an import-try per the
   environment contract.

Returns ('unknown', 0.0) on empty/null text — matching the reference's
exception fallback.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .patterns import LANG_MARKERS, LANG_ZH_CLASS
from .text_features import ws_trim
from .rounding import stable_round

# Fixed evaluation order: ties break toward earlier entries, matching
# the CASE-chain oracle form.
LANG_ORDER = ["en", "es", "fr", "de"]


def _marker_hits(lc: Column, lang: str) -> Column:
    return F.regexp_count(lc, F.lit(LANG_MARKERS[lang]))


def lang_id_struct(c: Column) -> Column:
    """struct<language:string, language_confidence:double> via the
    native marker heuristic. ``c`` is the raw text column."""
    lc = F.lower(F.coalesce(c, F.lit("")))
    zh_hits = F.regexp_count(lc, F.lit(LANG_ZH_CLASS))
    hits = {lang: _marker_hits(lc, lang) for lang in LANG_ORDER}
    words = F.when(F.length(ws_trim(lc)) == 0, F.lit(0)).otherwise(
        F.size(F.split(ws_trim(lc), r"\s+"))
    )

    # argmax with fixed tie-break: en >= all, then es >= rest, ...
    best_lang = F.lit("unknown")
    best_hits = F.lit(0)
    # Build the CASE chain explicitly (mirrors the SQL oracle exactly)
    cond_en = (
        (hits["en"] >= hits["es"])
        & (hits["en"] >= hits["fr"])
        & (hits["en"] >= hits["de"])
        & (hits["en"] > 0)
    )
    cond_es = (hits["es"] >= hits["fr"]) & (hits["es"] >= hits["de"]) & (hits["es"] > 0)
    cond_fr = (hits["fr"] >= hits["de"]) & (hits["fr"] > 0)
    cond_de = hits["de"] > 0

    best_lang = (
        F.when(zh_hits > 0, F.lit("zh"))
        .when(cond_en, F.lit("en"))
        .when(cond_es, F.lit("es"))
        .when(cond_fr, F.lit("fr"))
        .when(cond_de, F.lit("de"))
        .otherwise(F.lit("unknown"))
    )
    best_hits = (
        F.when(zh_hits > 0, zh_hits)
        .when(cond_en, hits["en"])
        .when(cond_es, hits["es"])
        .when(cond_fr, hits["fr"])
        .when(cond_de, hits["de"])
        .otherwise(F.lit(0))
    )
    confidence = (
        F.when((words == 0) | (best_hits == 0), F.lit(0.0))
        .otherwise(
            stable_round(F.least(F.lit(1.0), best_hits.cast("double") / words), 2)
        )
        .cast("double")
    )
    return F.struct(
        best_lang.alias("language"), confidence.alias("language_confidence")
    )


def with_lang_id(df, text_col: str = "text", method: str = "trigram",
                 id_col: str | None = None,
                 max_chars: int | None = None):
    """Add ``language`` / ``language_confidence``. Default L1 is the
    Cavnar-Trenkle-style trigram classifier (lang_trigrams.py) with
    this module's marker heuristic as the zero-score fallback; pass
    method='marker' for the heuristic alone.

    With ``id_col`` (a unique key) the trigram scores run as a
    broadcast-join plan (codegen'd, the fast/scale path); without one
    they run as a per-row expression (interpreted HOF — fine for small
    streams, slow on large tables).

    ``max_chars`` (opt-in) classifies on the text's first N chars —
    bounds per-row cost on long documents; full text is the default
    (see lang_trigrams.with_trigram_lang_id)."""
    t = F.col(text_col)
    if max_chars is not None:
        t = F.substring(t, 1, max_chars)
    if method == "trigram":
        from .lang_trigrams import (
            lang_id_trigram_struct,
            with_trigram_lang_id,
        )

        if id_col is not None:
            return with_trigram_lang_id(
                df, text_col, id_col, max_chars=max_chars
            )
        s = lang_id_trigram_struct(t)
    else:
        s = lang_id_struct(t)
    return df.withColumn("_lid", s).select(
        "*",
        F.col("_lid.language").alias("language"),
        F.col("_lid.language_confidence").alias("language_confidence"),
    ).drop("_lid")


def langdetect_available() -> bool:
    try:
        import langdetect  # noqa: F401

        return True
    except ImportError:
        return False


def langdetect_pandas_udf():
    """Arrow-vectorized langdetect wrapper (seeded). Raises ImportError
    with guidance when langdetect is absent — callers should fall back
    to ``lang_id_struct``."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    try:
        from langdetect import DetectorFactory, detect_langs

        DetectorFactory.seed = 42
    except ImportError as e:  # pragma: no cover - not installed in image
        raise ImportError(
            "langdetect is not installed; use lang_id_struct (native "
            "heuristic) instead"
        ) from e

    out_type = T.StructType(
        [
            T.StructField("language", T.StringType()),
            T.StructField("language_confidence", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _detect(texts: "pd.Series") -> "pd.DataFrame":
        import pandas as pd

        langs, confs = [], []
        for t in texts:
            if not t or not str(t).strip():
                langs.append("unknown")
                confs.append(0.0)
                continue
            try:
                top = detect_langs(str(t))[0]
                langs.append(top.lang)
                confs.append(float(top.prob))
            except Exception:
                langs.append("unknown")
                confs.append(0.0)
        return pd.DataFrame({"language": langs, "language_confidence": confs})

    return _detect
