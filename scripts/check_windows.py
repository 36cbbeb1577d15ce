"""Unpartitioned-window inventory (VERDICT r9 obs #3): the bench log's
repeated "No Partition Defined for Window operation" warnings all come
from the adjudicated BOUNDED-window class — cumulative sums over
<= n_bins bin tables, <= 64x64 sketch register cumsums, strata-sized
allocation ranks, <= k piece-inventory ranks. Those are bounded by
construction and not scale-killers, but in the log they are
indistinguishable from a genuine data-proportional single-partition
exchange. This script makes the distinction checkable: it builds every
BENCHED batch entry's physical plan at sf0.001, finds window specs
with an empty partition clause, and fails if any entry OUTSIDE the
documented allowlist emits one.

KNOWN BLIND SPOT (ADVICE r10): "plans only" holds for lazy entries,
but entries built with EAGER localCheckpoint (the unigram-EM family,
the DSIR quota/pack pair, the maintenance streams) EXECUTE those
stages at plan-build time, and any window UPSTREAM of a checkpoint is
truncated out of the final plan — so this inventory sees only the
post-checkpoint tail of such entries. The checkpointed stages'
windows are instead adjudicated at the SOURCE: every one is a rank
or cumsum over a bounded dictionary table (piece inventories <= k +
alphabet, <= 1024 score bins), the same classes as the allowlist,
and the operator docstrings carry the bound. Entries whose bounded
rank sits wholly upstream of a checkpoint (e.g.
unigram_em_schedule_scores) are allowlisted with that justification
even while plan-invisible, so a refactor that surfaces the window
does not become a new finding.

Usage: python scripts/check_windows.py [sf_dir]   (one JSON line)

Allowlist semantics: every entry listed carries the REASON its
unpartitioned window is bounded. A new entry appearing here is a
finding — either partition the window or justify+add it.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# entry -> why its unpartitioned window is bounded by construction
ALLOWED = {
    # <= 1024-row score-bin tables (ROC_BINS): threshold derivation /
    # confusion sweeps
    "lm_filter_roc": "cumsum over <= 1024 clamped score bins",
    "lm_filter_mix_shift": "per-group cumsum over <= 1024 bins",
    "quality_quota_sample": "threshold cumsum over <= 1024 bins; "
    "largest-remainder rank over strata",
    "dsir_quota_sample": "keep-high cumsum over <= 1024 bins; "
    "largest-remainder rank over strata",
    "dsir_budget_pack": "bin-offset cumsum over <= 1024 score bins "
    "(the decomposed prefix sum's metadata table)",
    "dsir_mixture_pack": "largest-remainder rank over the strata "
    "table (the token prefix sums are all source-partitioned)",
    # strata-sized allocation ranks (largest remainder)
    "stratified_budget_sample": "remainder rank over the strata table",
    "mixture_sample": "remainder rank over the strata table",
    # sketch register tables (fixed register counts)
    "hll_registers": "<= m=64 register cumsum",
    "hll_estimate": "<= m=64 register cumsum",
    "hll_set_ops": "<= m=64 register cumsum",
    "hll_by_type": "per-type register windows, <= m rows each",
    "hll_registers_stream": "<= m=64 register cumsum",
    "quantile_sketch": "<= 256-bucket sketch cumsum",
    "quantile_estimate": "<= 256-bucket sketch cumsum",
    "quantile_by_type": "per-type bucket windows",
    "value_histogram": "<= n_bins histogram cumsum",
    "histogram_median": "<= n_bins histogram cumsum",
    # piece-inventory ranks (alphabet + <= k multigrams)
    "unigram_em_schedule": "usage rank over <= k+alphabet pieces",
    "unigram_em_schedule_scores": "usage rank over <= k+alphabet "
    "pieces (upstream of the eager checkpoint — plan-invisible "
    "today; allowlisted so a refactor surfacing it is not a finding)",
    "unigram_schedule_export_scores": "same bounded usage rank as "
    "unigram_em_schedule_scores (artifact round trip changes "
    "nothing plan-side)",
    # token-budget packing offsets over <= n_buckets bucket rows
    "token_budget_pack": "bucket-offset cumsum over <= 256 buckets",
    "training_corpus": "bucket-offset cumsum over <= 256 buckets",
    # global top-k ranks: the spec is unpartitioned but the constant
    # rank bound compiles to WindowGroupLimit / TakeOrderedAndProject
    # (plan-asserted, tests/test_plans.py:144,325) — never a
    # data-proportional single-partition WindowExec
    "top_customers": "top-k rank -> TakeOrderedAndProject",
    "pps_wor_sample": "bounded weighted-draw rank -> WindowGroupLimit",
    # tiny audit/eval tables
    "dedup_eval_minhash": "rank over the 1-row eval summary",
    "lang_id": "argmax over the <= n_langs score table",
    "lang_id_prefix": "argmax over the <= n_langs score table",
    "constraint_audit": "rank over the constraint catalog",
    "table_stats_profile": "rank over the column-stats table",
    "table_stats_deep": "rank over the column-stats table",
    "cusum_changepoints": "global cumsum over the per-day table "
    "(bounded by distinct days)",
    "frame_sample_plan": "offset cumsum over the media catalog",
}


def main() -> None:
    import bench
    import __spark_entry__ as E
    from yelp_streaming_etl_pipeline_spark.plans import audit as A
    from yelp_streaming_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        "check_windows",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = E.queries()
    hits: dict[str, int] = {}
    for name in bench.HEADLINE:
        try:
            plan = A.physical_plan(qs[name](spark, SF))
        except Exception as exc:  # surface, don't hide
            hits[name] = -1
            print(f"PLAN ERROR {name}: {exc}", file=sys.stderr)
            continue
        specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
        n = sum(
            1 for s in specs if (" ASC" in s) or (" DESC" in s)
        )  # first arg is an ORDER column -> no partition clause
        if n:
            hits[name] = n
    unexpected = sorted(set(hits) - set(ALLOWED))
    stale = sorted(set(ALLOWED) - set(hits))
    print(
        json.dumps(
            {
                "metric": "unpartitioned_window_inventory",
                "entries_with_unpartitioned_windows": hits,
                "unexpected": unexpected,
                "allowlisted_but_clean": stale,
                "ok": not unexpected,
            }
        )
    )
    if unexpected:
        sys.exit(1)


if __name__ == "__main__":
    main()
