#!/usr/bin/env python3
"""Wrap a tools/check.py --json report into a committed scale-gate artifact.

Usage: python3 tools/gate_wrap.py <report.json> <out.json> <corpus> [k=v ...]
       [--exclude name=reason ...]

Adds mint provenance (git HEAD), the corpus path, free-form config notes
(k=v pairs), and loud exclusions (queries deliberately NOT run, with the
reason — e.g. a DuckDB-side intractable oracle). Pass/fail/skip tallies
are recomputed from the report.
"""
import sys, json, subprocess

def main():
    args = sys.argv[1:]
    report_p, out_p, corpus = args[0], args[1], args[2]
    notes, exclusions = {}, {}
    mode = None
    for a in args[3:]:
        if a == "--exclude":
            mode = "x"
            continue
        k, _, v = a.partition("=")
        (exclusions if mode == "x" else notes)[k] = v
    rep = json.load(open(report_p))
    n_pass = sum(1 for r in rep.values() if r.get("hash_match"))
    # Split the two skip classes (r20 advice): budget-outs are a
    # COVERAGE loss check.py's docstring promises to surface as
    # documented exclusions, not a missing-table artifact of the
    # corpus layout — folding them into one counter hid the loss from
    # top-level artifact readers.
    missing = sorted(k for k, r in rep.items() if not r.get("hash_match")
                     and str(r.get("err", "")).startswith("table missing"))
    budget_exceeded = sorted(
        k for k, r in rep.items() if not r.get("hash_match")
        and str(r.get("err", "")).startswith("oracle budget exceeded"))
    for k in budget_exceeded:
        exclusions.setdefault(k, rep[k].get("err"))
    n_fail = len(rep) - n_pass - len(missing) - len(budget_exceeded)
    out = {
        "mint_commit": subprocess.run(["git", "rev-parse", "HEAD"],
                                      capture_output=True, text=True).stdout.strip(),
        "corpus": corpus,
        "config": notes,
        "exclusions": exclusions,
        "pass": n_pass,
        "fail": n_fail,
        "skipped_absent_tables": len(missing),
        "budget_exceeded": budget_exceeded,
        "queries": rep,
    }
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{n_pass} pass, {n_fail} fail, {len(missing)} skipped, "
          f"{len(budget_exceeded)} budget-out, "
          f"{len(exclusions)} excluded -> {out_p}")

if __name__ == "__main__":
    main()
