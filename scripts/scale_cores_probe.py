"""Core-scaling probe at a scale factor big enough to scale.

The driver's 8-vs-32-core comparison at sf0.1 shows every ~5 s entry
flat (fixed overhead dominates; `shuffle.partitions = cpus` also
shrinks task counts at low core counts). This probe re-asks the
question where it is answerable: the claim-carrying entries on a
10x (docs, rotated-text) / 5x (graph, disjoint-copy) replication,
timed in SEPARATE processes at SPARK_GRAFT_CPUS=32 and =8 with the
same session factory the bench uses.

Usage:
  python scripts/scale_cores_probe.py setup   -> builds /tmp dirs,
                                                 prints their paths
  python scripts/scale_cores_probe.py run <docs_dir> <graph_dir>
        (invoked per core count by the wrapper below)
  python scripts/scale_cores_probe.py all     -> setup + both core
        counts via subprocesses + cleanup; prints one JSON line
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DOCS_PROBES = [
    "exact_substring_removal",
    "bm25_topk_bpe",
    "neardup_minhash",
    "unigram_em_loop",
]
GRAPH_PROBES = ["cosupply_clustering"]
PASSES = 3  # 1 cold + 2 steady; report median of steady


def setup() -> tuple[str, str]:
    from scale_probe_pairs import replicate, replicate_graph

    from yelp_streaming_etl_pipeline_spark.session import get_spark

    spark = get_spark("scale_cores_setup")
    docs_dir = tempfile.mkdtemp(prefix="scalecores_docs_")
    graph_dir = tempfile.mkdtemp(prefix="scalecores_graph_")
    replicate(spark, docs_dir)
    replicate_graph(spark, graph_dir)
    spark.stop()
    return docs_dir, graph_dir


def run(docs_dir: str, graph_dir: str) -> None:
    import __spark_entry__ as E
    from yelp_streaming_etl_pipeline_spark.session import get_spark

    spark = get_spark("scale_cores_run")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = E.queries()
    out: dict = {}
    for name, d in [(n, docs_dir) for n in DOCS_PROBES] + [
        (n, graph_dir) for n in GRAPH_PROBES
    ]:
        ts = []
        for _ in range(PASSES):
            spark.catalog.clearCache()
            for df in E._STAGED_CACHE.values():
                df.unpersist()
            E._STAGED_CACHE.clear()
            t0 = time.perf_counter()
            qs[name](spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(ts[1:]), 3)
    print("RESULT " + json.dumps(out))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "setup":
        print(json.dumps(setup()))
        return
    if mode == "run":
        run(sys.argv[2], sys.argv[3])
        return
    docs_dir, graph_dir = setup()
    results: dict = {}
    try:
        for cpus in ("32", "8"):
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run",
                 docs_dir, graph_dir],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            for ln in p.stdout.splitlines():
                if ln.startswith("RESULT "):
                    results[f"cpus_{cpus}"] = json.loads(ln[7:])
    finally:
        import shutil

        shutil.rmtree(docs_dir, ignore_errors=True)
        shutil.rmtree(graph_dir, ignore_errors=True)
    ratios = {
        n: round(results["cpus_8"][n] / results["cpus_32"][n], 2)
        for n in results.get("cpus_32", {})
        if results.get("cpus_8", {}).get(n)
    }
    print(json.dumps(
        {"metric": "scale_cores_probe", "times": results,
         "ratio_8_over_32": ratios}
    ))


if __name__ == "__main__":
    main()
