"""Interleaved A/B of bench.py between two git trees (VERDICT r3 #1).

Attributes the sf0.1 round-3 bench regression (index_build 6.54 s vs
4.14 s, serve_warm_set 1.38 s vs 0.91 s) by running the SAME bench.py
against the round-2 engine (commit 6490451) and HEAD, strictly
alternating A,B,A,B,... on one box, >=5 pairs.  Each run is a fresh
subprocess (fresh JVM) with PYTHONPATH pointing at the tree under
test; the r2 tree is extracted once via ``git archive`` into
``.ab/r2`` (ignored).  Results land in ``.ab/ab_results.json``.

Usage: python scripts/ab_bench.py [pairs] [ref]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def extract(ref: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    tar = subprocess.run(
        ["git", "archive", ref], cwd=REPO, check=True, capture_output=True
    ).stdout
    subprocess.run(["tar", "-x", "-C", dest], input=tar, check=True)


def run_bench(tree: str, cpus: int = 32) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    ref = sys.argv[2] if len(sys.argv) > 2 else "6490451"
    ab_dir = os.path.join(REPO, ".ab")
    r2_tree = os.path.join(ab_dir, "r2")
    if not os.path.exists(os.path.join(r2_tree, "bench.py")):
        extract(ref, r2_tree)
    results: dict = {"ref": ref, "runs": []}
    for i in range(pairs):
        for label, tree in (("r2", r2_tree), ("head", REPO)):
            t0 = time.time()
            try:
                j = run_bench(tree)
                rec = {"side": label, "pair": i, "queries": j["queries"],
                       "total": j["value"], "docs_per_sec": j["docs_per_sec"]}
            except Exception as e:  # keep going; record the failure
                rec = {"side": label, "pair": i, "err": repr(e)[:500]}
            rec["wall"] = round(time.time() - t0, 1)
            results["runs"].append(rec)
            print(json.dumps(rec), flush=True)
            with open(os.path.join(ab_dir, "ab_results.json"), "w") as f:
                json.dump(results, f, indent=1)
    # summary: per-component medians
    import statistics as st

    comps: dict = {}
    for r in results["runs"]:
        if "queries" not in r:
            continue
        for k, v in list(r["queries"].items()) + [("docs_per_sec", r["docs_per_sec"])]:
            comps.setdefault(k, {}).setdefault(r["side"], []).append(v)
    summary = {
        k: {s: round(st.median(vs), 4) for s, vs in sides.items()}
        for k, sides in comps.items()
    }
    results["median"] = summary
    with open(os.path.join(ab_dir, "ab_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
