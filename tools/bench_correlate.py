#!/usr/bin/env python3
"""Per-query steal attribution across repeated bench sweeps (r18 verdict #5).

Usage: python3 tools/bench_correlate.py <bench_summary.json> [more ...]

The bench artifact's total spread across one binary (21.8-25.8 s in r18)
is attributed to bursty hypervisor steal, but the attribution was
correlational at SWEEP granularity. This tool tests it at SAMPLE
granularity: every (query, sample) across N sweeps contributes a point
(excess_time, steal_jiffies), where excess = sample_sec - global best
for that query. If steal explains the spread, high-excess samples carry
high steal; a query that is slow (>1.5x best AND >80 ms over) in a
ZERO-steal window is evidence of a real variance bug (GC, codegen cache
eviction, allocator) and is listed under `slow_without_steal`.

Outputs a JSON report to stdout: per-sweep totals + steal, the
excess-vs-steal split (how much total excess lies in steal-flagged vs
quiet samples), and the slow-without-steal offenders with their values.
"""
import sys, json

def main():
    sweeps = []
    for p in sys.argv[1:]:
        d = json.load(open(p))
        sweeps.append((p, d))
    if not sweeps:
        print("usage: bench_correlate.py <bench_summary.json> [...]",
              file=sys.stderr)
        sys.exit(2)

    # Global per-query best across every sample of every sweep.
    best = {}
    for _, d in sweeps:
        for q, runs in d["runs"].items():
            for r in runs:
                if q not in best or r < best[q]:
                    best[q] = r

    # Steal-suspect rule mirrors Bench.isSuspect: window lost >25% of
    # whole-VM capacity (sec * cpus * USER_HZ), 50-jiffy floor. cpus is
    # not in the artifact; default 32 (the driver config).
    cpus = int(json.loads(json.dumps(sweeps[0][1])).get("_cpus", 32) or 32)
    def suspect(sec, steal):
        return steal is not None and steal >= 0 and \
            steal > max(50, 0.25 * sec * cpus * 100)

    excess_in_steal = 0.0
    excess_in_quiet = 0.0
    slow_without_steal = []
    per_sweep = []
    for p, d in sweeps:
        total = sum(min(r) for r in d["runs"].values() if r)
        sweep_steal = sum(s for ss in d.get("steals", {}).values()
                          for s in ss if s and s > 0)
        per_sweep.append({"file": p, "total_of_mins": round(total, 3),
                          "steal_jiffies": sweep_steal,
                          "contaminated": d.get("contaminated")})
        for q, runs in d["runs"].items():
            steals = d.get("steals", {}).get(q, [])
            for i, r in enumerate(runs):
                st = steals[i] if i < len(steals) else None
                ex = r - best[q]
                if ex <= 0:
                    continue
                if suspect(r, st):
                    excess_in_steal += ex
                else:
                    excess_in_quiet += ex
                    # Bench's own over-ref rule: >1.5x AND >80ms over.
                    if r > 1.5 * best[q] and ex > 0.080:
                        slow_without_steal.append({
                            "query": q, "file": p, "sample": i,
                            "sec": round(r, 3), "best": round(best[q], 3),
                            "steal_jiffies": st})

    slow_without_steal.sort(key=lambda e: e["sec"] - e["best"], reverse=True)
    report = {
        "sweeps": per_sweep,
        "excess_seconds_in_steal_flagged_samples": round(excess_in_steal, 3),
        "excess_seconds_in_quiet_samples": round(excess_in_quiet, 3),
        "slow_without_steal": slow_without_steal[:40],
        "slow_without_steal_count": len(slow_without_steal),
        "verdict": ("steal explains the spread" if
                    not slow_without_steal else
                    "some excess lands on ZERO-steal windows - see offenders"),
    }
    print(json.dumps(report, indent=1))

if __name__ == "__main__":
    main()
