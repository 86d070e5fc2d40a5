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

Usage: python3 tools/ab_bench.py [--focus] [REF=HEAD^]
                                 [SF_DIR=/root/testdata/sf0.01]
                                 [ROUNDS=4] [ONLY_FILTER]
Writes target/ab_bench.json: per-query {a, b, ratio, ratio_min, ratio_max}
+ geomean summary with bounds. Ratio > 1 means HEAD is slower than REF.

--focus (VERDICT r14 #6): after the main pass, any query whose paired
band EXCLUDES 1.0 is re-run alone at 2x the rounds (min 8) so a real
single-query regression separates from the ~±25% 4-round noise floor;
the focused band replaces the wide one in the artifact (kept under
"coarse_*") and the summary prints which flags survived.
"""
import json, math, os, shutil, subprocess, sys

_args = sys.argv[1:]
FOCUS = "--focus" in _args
_args = [a for a in _args if a != "--focus"]
for a in _args:
    if a.startswith("-"):
        sys.exit(f"ab_bench: unknown flag {a!r} (only --focus is accepted)")
REF = _args[0] if len(_args) > 0 else "HEAD^"
SF = _args[1] if len(_args) > 1 else "/root/testdata/sf0.01"
ROUNDS = int(_args[2]) if len(_args) > 2 else 4
ONLY = _args[3] if len(_args) > 3 else ""

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


def run_bench(tree, label, out, only=None):
    cp = f"{tree}/target/scala-2.13/classes:/opt/spark/jars/*"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=SF,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"),
               SPARK_GRAFT_BENCH_OUT=out)
    only = ONLY if only is None else only
    if only:
        env["SPARK_GRAFT_ONLY"] = only
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


def best(runs, q):
    ts = [r[q] for r in runs if q in r and r[q] >= 0]
    return min(ts) if ts else None


def geo(xs):
    return math.exp(sum(math.log(x) for x in xs) / len(xs)) \
        if xs else None


def interleave(rounds, tag, only=None):
    """Strict A B A B ... so host drift cancels in the pair."""
    a_runs, b_runs = [], []
    for i in range(rounds):
        a_runs.append(run_bench(WORKTREE, f"REF#{tag}{i+1}",
                                f"/tmp/ab_a_{tag}{i}.json", only=only))
        b_runs.append(run_bench(REPO, f"HEAD#{tag}{i+1}",
                                f"/tmp/ab_b_{tag}{i}.json", only=only))
    return a_runs, b_runs


def compare(a_runs, b_runs):
    """Per-query best-of-N ratio + the paired per-round min/max band."""
    keys = sorted(set().union(*[set(r) for r in a_runs + b_runs]))
    rows = {}
    for q in keys:
        a, b = best(a_runs, q), best(b_runs, q)
        # method of record: best-of-N over best-of-N (min time each side)
        ratio = (b / a) if (a and b and a > 0) else None
        # noise band: the per-ROUND paired ratios b_i/a_i — their spread is
        # the run-to-run variance the point estimate hides
        paired = [br[q] / ar[q] for ar, br in zip(a_runs, b_runs)
                  if q in ar and q in br and ar[q] > 0 and br[q] > 0]
        rows[q] = {"a": a, "b": b, "ratio": ratio,
                   "ratio_min": min(paired) if paired else None,
                   "ratio_max": max(paired) if paired else None,
                   "n_paired_rounds": len(paired)}
    return rows


def flagged(rows):
    """Queries whose paired band excludes 1.0 (either direction)."""
    return sorted(q for q, v in rows.items()
                  if v["ratio_min"] is not None
                  and (v["ratio_min"] > 1.0 or v["ratio_max"] < 1.0))


def main():
    print(f"[ab] HEAD tree={REPO} vs REF={REF}, sf={SF}, rounds={ROUNDS}"
          + (" focus=on" if FOCUS else ""))
    sh(["sbt", "-batch", "compile"], cwd=REPO)
    build_ref()
    focus_info = None
    try:
        a_runs, b_runs = interleave(ROUNDS, "")
        rows = compare(a_runs, b_runs)
        if FOCUS:
            flags = flagged(rows)
            if flags:
                frounds = max(8, 2 * ROUNDS)
                print(f"[ab] focus: {len(flags)} queries' bands exclude "
                      f"1.0 — re-running alone at {frounds} rounds: "
                      + ", ".join(flags))
                fa, fb = interleave(frounds, "f", only=",".join(flags))
                frows = compare(fa, fb)
                survivors = flagged({q: v for q, v in frows.items()
                                     if q in flags})
                for q in flags:
                    if q in frows:
                        rows[q] = dict(frows[q],
                                       coarse_ratio=rows[q]["ratio"],
                                       coarse_ratio_min=rows[q]["ratio_min"],
                                       coarse_ratio_max=rows[q]["ratio_max"],
                                       focused=True)
                focus_info = {"rounds": frounds, "flagged": flags,
                              "confirmed": survivors}
                print(f"[ab] focus: {len(survivors)} of {len(flags)} flags "
                      f"survive the {frounds}-round re-run"
                      + (": " + ", ".join(survivors) if survivors else ""))
            else:
                focus_info = {"rounds": 0, "flagged": [], "confirmed": []}
                print("[ab] focus: no query's band excludes 1.0 — "
                      "nothing to re-run")
    finally:
        sh(["git", "worktree", "remove", "--force", WORKTREE], cwd=REPO)

    ratios = [v["ratio"] for v in rows.values() if v["ratio"] is not None]
    # band geomeans cover the PAIRED subset only; carry both set sizes so
    # the band is interpretable next to the point estimate (ADVICE r14)
    paired_set = [v for v in rows.values() if v["ratio_min"] is not None]
    geomean = geo(ratios)
    geomean_lo = geo([v["ratio_min"] for v in paired_set])
    geomean_hi = geo([v["ratio_max"] for v in paired_set])
    out = {"ref": REF, "sf": SF, "rounds": ROUNDS,
           "n_compared": len(ratios), "n_paired": len(paired_set),
           "geomean_head_over_ref": geomean,
           "geomean_paired_min": geomean_lo,
           "geomean_paired_max": geomean_hi,
           "queries": rows}
    if focus_info is not None:
        out["focus"] = focus_info
    path = os.path.join(REPO, "target", "ab_bench.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    def band(v):
        # a query can have a best-of ratio yet no same-round pair (e.g.
        # disjoint per-round timeouts) — never format None (ADVICE r14)
        if v["ratio_min"] is None:
            return "[n/a]"
        return f"[{v['ratio_min']:.2f}, {v['ratio_max']:.2f}]"
    if geomean:
        lo = f"{geomean_lo:.3f}" if geomean_lo is not None else "n/a"
        hi = f"{geomean_hi:.3f}" if geomean_hi is not None else "n/a"
        print(f"[ab] geomean HEAD/REF = {geomean:.3f} over {len(ratios)} "
              f"queries (paired-round band [{lo}, {hi}] over "
              f"{len(paired_set)} paired — a band straddling 1.0 is parity)")
    else:
        print("[ab] nothing comparable")
    worst = sorted(((v["ratio"], q) for q, v in rows.items()
                    if v["ratio"] is not None), reverse=True)[:8]
    for r, q in worst:
        v = rows[q]
        print(f"[ab]   {q:28s} {r:6.2f}x  paired {band(v)}"
              + ("  (focused)" if v.get("focused") else ""))
    print(f"[ab] wrote {path}")


if __name__ == "__main__":
    main()
