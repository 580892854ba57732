#!/usr/bin/env python3
"""Compact the full fuzz gate report into the committed FUZZ.json.

Usage: python3 tools/fuzz_summarize.py <fullReport.json> <out.json> [mint_commit]

<fullReport.json> is tools/check.py --json output over a graft.tools.Fuzz
dump. The committed artifact records the gate verdict (counts, per-shape
breakdown, every non-passing case by name+reason, a content hash of the
full report) without carrying 1000 per-case rows in git.
"""
import sys, json, hashlib, subprocess

def main():
    full_path, out_path = sys.argv[1], sys.argv[2]
    mint = sys.argv[3] if len(sys.argv) > 3 else subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    full = json.load(open(full_path))
    shapes = {}
    failed = {}
    for name, r in sorted(full.items()):
        shape = name.split("_", 1)[1]
        ok = r.get("hash_match") is True
        s = shapes.setdefault(shape.split("_")[0], {"pass": 0, "fail": 0})
        s["pass" if ok else "fail"] += 1
        if not ok:
            failed[name] = r.get("err") or "mismatch"
    blob = json.dumps(full, sort_keys=True).encode()
    out = {
        "mint_commit": mint,
        "protocol": "graft.tools.Fuzz seeded cases vs DuckDB via tools/check.py; "
                    "both engines read identical parquet inputs; determinism "
                    "rules in Fuzz.scala scaladoc",
        "cases": len(full),
        "pass": sum(s["pass"] for s in shapes.values()),
        "fail": sum(s["fail"] for s in shapes.values()),
        "per_shape": shapes,
        "failed_cases": failed,
        "full_report_md5": hashlib.md5(blob).hexdigest(),
        "suite_goldens": "src/test/resources/fuzz_golden.json (seeds 0-47, "
                         "re-executed by FuzzSuite in sbt test)",
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out['cases']} cases, {out['pass']} pass, {out['fail']} fail -> {out_path}")

if __name__ == "__main__":
    main()
