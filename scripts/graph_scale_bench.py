"""Scale/scaling evidence for operators/graphops.py: run connected
components and PageRank on a deterministic synthetic graph (xxhash64
edge endpoints — no RNG, resume-safe) at two parallelism levels in
fresh JVMs, print throughput + scaling efficiency, optionally append
to BENCH.md.

Usage: python scripts/graph_scale_bench.py [--edges 2000000] [--update-bench-md]

The graph is power-law-flavored: endpoint ids are xxhash64(i) mod a
skewed bucket layout (half the edges land in a 1%-of-nodes hot core),
so the CC star rounds and the PageRank groupBy see realistic hub skew,
not a uniform random graph.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_leg(cores: int, n_edges: int) -> dict:
    """One measurement in a FRESH JVM (subprocess) so the two legs
    don't share JIT state, caches, or GC history."""
    code = f"""
import time, sys, json
sys.path.insert(0, {REPO!r})
from json_ld_spark.session import get_spark
from json_ld_spark.operators import graphops as g
from pyspark.sql import functions as F

spark = get_spark(cores={cores}, shuffle_partitions={cores * 2},
                  extra_conf={{"spark.driver.memory": "16g"}})
n_edges = {n_edges}
n_nodes = n_edges // 4
hot = max(n_nodes // 100, 1)
# deterministic skewed edges: even i -> hot core, odd i -> uniform
e = (
    spark.range(n_edges)
    .select(
        F.when(F.col("id") % 2 == 0,
               F.pmod(F.xxhash64(F.col("id")), F.lit(hot)))
         .otherwise(F.pmod(F.xxhash64(F.col("id") + 1_000_000_000),
                           F.lit(n_nodes))).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 2_000_000_000),
               F.lit(n_nodes)).alias("dst"),
    )
    .filter(F.col("src") != F.col("dst"))
    .repartition({cores * 2})
    .cache()
)
m = e.count()

t0 = time.time()
cc = g.connected_components(e, max_iter=25)
n_comp = cc.agg(F.countDistinct("component")).first()[0]
cc_sec = time.time() - t0

t0 = time.time()
pr = g.pagerank(e, iters=5)
pr_rows = pr.count()
pr_sec = time.time() - t0

print("RESULT " + json.dumps({{
    "cores": {cores}, "edges": m, "n_components": n_comp,
    "cc_sec": round(cc_sec, 2), "cc_edges_per_sec": round(m / cc_sec, 1),
    "pagerank_sec": round(pr_sec, 2),
    "pagerank_edge_iters_per_sec": round(5 * m / pr_sec, 1),
    "pr_rows": pr_rows,
}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"leg failed (cores={cores}):\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--n-cores", type=int, default=2)
    ap.add_argument("--xn-cores", type=int, default=8)
    ap.add_argument("--update-bench-md", action="store_true")
    args = ap.parse_args()

    legs = {}
    for cores in (args.n_cores, args.xn_cores):
        legs[cores] = _run_leg(cores, args.edges)
        print(json.dumps(legs[cores]))

    n, xn = legs[args.n_cores], legs[args.xn_cores]
    factor = args.xn_cores / args.n_cores
    eff = {
        "cc": xn["cc_edges_per_sec"] / (factor * n["cc_edges_per_sec"]),
        "pagerank": xn["pagerank_edge_iters_per_sec"]
        / (factor * n["pagerank_edge_iters_per_sec"]),
    }
    # correctness cross-check between the two legs: identical graph ->
    # identical component count and rank-vector size
    assert n["n_components"] == xn["n_components"], (n, xn)
    assert n["pr_rows"] == xn["pr_rows"], (n, xn)
    summary = {
        "metric": "graph_ops_scaling",
        "edges": args.edges,
        "n_cores": args.n_cores,
        "xn_cores": args.xn_cores,
        "efficiency": {k: round(v, 3) for k, v in eff.items()},
        "legs": legs,
    }
    print(json.dumps(summary))

    if args.update_bench_md:
        stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S UTC"
        )
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(
                f"\n## Graph-ops scaling run ({stamp})\n\n"
                f"Skewed synthetic graph, {args.edges:,} edges (1%-node hot core"
                f" on half the edges), fresh JVM per leg; CC = Large-Star/"
                f"Small-Star to fixpoint, PageRank = 5 iterations:\n\n"
                f"| op | local[{args.n_cores}] (N) | local[{args.xn_cores}]"
                f" (4N) | efficiency |\n|---|---|---|---|\n"
                f"| connected components | {n['cc_edges_per_sec']:,.0f}"
                f" edges/s | {xn['cc_edges_per_sec']:,.0f} edges/s |"
                f" **{eff['cc']:.3f}** |\n"
                f"| pagerank (5 it) | {n['pagerank_edge_iters_per_sec']:,.0f}"
                f" edge-iters/s | {xn['pagerank_edge_iters_per_sec']:,.0f}"
                f" edge-iters/s | **{eff['pagerank']:.3f}** |\n\n"
                f"Cross-leg correctness: both legs agree on component count"
                f" ({n['n_components']:,}) and rank-vector size"
                f" ({n['pr_rows']:,}).\n"
            )
        print("BENCH.md updated")


if __name__ == "__main__":
    main()
