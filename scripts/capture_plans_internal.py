"""Operator-INTERNAL plan capture for the round-11 rewrites.

Usage: python scripts/capture_plans_internal.py <outdir> <suffix>

Entry-level plans truncate at localCheckpoint boundaries (the final
plan of a checkpointed entry is a Scan ExistingRDD), so the stages the
round-11 optimization rewrote are captured here on the LAZY operator
pipelines directly: the BPE merge application, the unigram-LM scoring
and Viterbi path recovery, and the co-supply edge build. Captured
against $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from yelp_streaming_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        "capture_plans_internal",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators import (
        tokenizer as TK,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    vocab = TK.word_freq_table(docs, "text", "char").select(
        "w", "f", TK._segment(F.col("w"), "char").alias("toks")
    )
    plans = {
        "op_bpe_apply_merge": TK._apply_merge(vocab, "a", "b"),
    }
    words = TK.word_freq_table(docs, "text", "char")
    uvocab = TK.unigram_vocab(words)
    plans["op_unigram_word_stats"] = TK.unigram_word_stats(
        words, uvocab
    )
    plans["op_unigram_viterbi_pieces"] = TK.unigram_viterbi_pieces(
        words, uvocab
    )
    for name, df in plans.items():
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan_str(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
