#!/usr/bin/env python3
"""Interleaved A/B benchmark: HEAD's tree vs a reference git rev.

Host drift has masqueraded as regression twice (r5->r6, r7->r8: uniform
~1.2-1.6x "slowdowns" on bit-identical code). Sequential same-tree
comparisons cannot distinguish drift from code change; this harness can:
it builds BOTH trees, then runs them ALTERNATING in one session
(A B A B ...), so any host-wide drift hits both sides equally and the
paired per-query ratio isolates the code effect.

r13 showed even TWO interleaved rounds leave +/-10% ambiguity (paired
geomeans 0.88 and 1.06 on identical shared-key code): default is now 4
rounds, the per-query ratio is best-of-N over best-of-N (min time each
side — the noise-robust estimator), and the artifact also carries the
per-query PAIRED min/max ratio band plus geomean bounds, so a run whose
band straddles 1.0 is reported as parity rather than read off a single
point estimate (VERDICT r13 What's-wrong #3).

Usage: python3 tools/ab_bench.py [REF=HEAD^] [SF_DIR=/root/testdata/sf0.01]
                                 [ROUNDS=4] [ONLY_FILTER]
Writes target/ab_bench.json: per-query {a, b, ratio, ratio_min, ratio_max}
+ geomean summary with bounds. Ratio > 1 means HEAD is slower than REF.
"""
import json, math, os, shutil, subprocess, sys

REF = sys.argv[1] if len(sys.argv) > 1 else "HEAD^"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
ONLY = sys.argv[4] if len(sys.argv) > 4 else ""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKTREE = "/tmp/ab_bench_ref"

ADD_OPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]


def sh(cmd, cwd=None, env=None):
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        sys.exit(f"command failed: {' '.join(cmd)}")
    return r


def build_ref():
    if os.path.exists(WORKTREE):
        sh(["git", "worktree", "remove", "--force", WORKTREE], cwd=REPO)
    sh(["git", "worktree", "add", "--detach", WORKTREE, REF], cwd=REPO)
    print(f"[ab] compiling REF ({REF}) in {WORKTREE} ...")
    sh(["sbt", "-batch", "compile"], cwd=WORKTREE)


def run_bench(tree, label, out):
    cp = f"{tree}/target/scala-2.13/classes:/opt/spark/jars/*"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=SF,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"),
               SPARK_GRAFT_BENCH_OUT=out)
    if ONLY:
        env["SPARK_GRAFT_ONLY"] = ONLY
    print(f"[ab] bench {label} ...")
    r = subprocess.run(["java"] + ADD_OPENS +
                       ["-cp", cp, "-Xmx8g", "-Dspark.ui.enabled=false",
                        "graft.Bench"],
                       env=env, capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(out):
        print(r.stderr[-3000:])
        sys.exit(f"bench run {label} failed")
    with open(out) as f:
        return json.load(f)["queries"]


def main():
    print(f"[ab] HEAD tree={REPO} vs REF={REF}, sf={SF}, rounds={ROUNDS}")
    sh(["sbt", "-batch", "compile"], cwd=REPO)
    build_ref()
    a_runs, b_runs = [], []
    try:
        # strict interleave: A B A B ... so host drift cancels in the pair
        for i in range(ROUNDS):
            a_runs.append(run_bench(WORKTREE, f"REF#{i+1}",
                                    f"/tmp/ab_a_{i}.json"))
            b_runs.append(run_bench(REPO, f"HEAD#{i+1}",
                                    f"/tmp/ab_b_{i}.json"))
    finally:
        sh(["git", "worktree", "remove", "--force", WORKTREE], cwd=REPO)

    def best(runs, q):
        ts = [r[q] for r in runs if q in r and r[q] >= 0]
        return min(ts) if ts else None

    def geo(xs):
        return math.exp(sum(math.log(x) for x in xs) / len(xs)) \
            if xs else None

    keys = sorted(set().union(*[set(r) for r in a_runs + b_runs]))
    rows, ratios, rmins, rmaxs = {}, [], [], []
    for q in keys:
        a, b = best(a_runs, q), best(b_runs, q)
        # method of record: best-of-N over best-of-N (min time each side)
        ratio = (b / a) if (a and b and a > 0) else None
        # noise band: the per-ROUND paired ratios b_i/a_i — their spread is
        # the run-to-run variance the point estimate hides
        paired = [br[q] / ar[q] for ar, br in zip(a_runs, b_runs)
                  if q in ar and q in br and ar[q] > 0 and br[q] > 0]
        rmin = min(paired) if paired else None
        rmax = max(paired) if paired else None
        rows[q] = {"a": a, "b": b, "ratio": ratio,
                   "ratio_min": rmin, "ratio_max": rmax}
        if ratio:
            ratios.append(ratio)
        if rmin:
            rmins.append(rmin)
        if rmax:
            rmaxs.append(rmax)
    geomean = geo(ratios)
    geomean_lo, geomean_hi = geo(rmins), geo(rmaxs)
    out = {"ref": REF, "sf": SF, "rounds": ROUNDS,
           "n_compared": len(ratios), "geomean_head_over_ref": geomean,
           "geomean_paired_min": geomean_lo,
           "geomean_paired_max": geomean_hi,
           "queries": rows}
    path = os.path.join(REPO, "target", "ab_bench.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    if geomean:
        print(f"[ab] geomean HEAD/REF = {geomean:.3f} over {len(ratios)} "
              f"queries (paired-round band [{geomean_lo:.3f}, "
              f"{geomean_hi:.3f}] — a band straddling 1.0 is parity)")
    else:
        print("[ab] nothing comparable")
    worst = sorted(((v["ratio"], q) for q, v in rows.items() if v["ratio"]),
                   reverse=True)[:8]
    for r, q in worst:
        v = rows[q]
        print(f"[ab]   {q:28s} {r:6.2f}x  paired "
              f"[{v['ratio_min']:.2f}, {v['ratio_max']:.2f}]")
    print(f"[ab] wrote {path}")


if __name__ == "__main__":
    main()
