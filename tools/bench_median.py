#!/usr/bin/env python3
"""Run graft.Bench N times (default 3) and emit the per-query-median
JSON line that BASELINE.md records — the same statistic the judge
compares driver runs against.

Usage: python3 tools/bench_median.py [N] [SF_DIR] [CPUS]
Writes each raw run to /tmp/graft_bench_run{i}.json and prints the
median-combined JSON line on stdout (total = sum of per-query medians).
"""
import json
import statistics
import subprocess
import sys

argv = [a for a in sys.argv[1:] if not a.startswith("--")]
n = int(argv[0]) if len(argv) > 0 else 3
sf = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
cpus = argv[2] if len(argv) > 2 else "32"
# each run executes under a DIFFERENT seeded-shuffled order (the
# BASELINE adjudication protocol): host-noise windows smear across
# unrelated names per run and the per-query median strips them
seeds = (argv[3].split(",") if len(argv) > 3
         else ["101", "202", "303", "404", "505"])[:n]

runs = []
for i in range(n):
    out = subprocess.run(
        ["sbt", "runMain graft.Bench"],
        env={"SPARK_GRAFT_SF_DIR": sf, "SPARK_GRAFT_CPUS": cpus,
             "SPARK_GRAFT_SHUFFLE_ORDER": seeds[i % len(seeds)],
             "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
        capture_output=True, text=True, cwd="/root/repo").stdout
    # since r13 the stdout line is a compact summary; the full
    # per-query map lives in bench_out.json beside the run
    line = next(l for l in out.splitlines() if '"metric"' in l)
    line = line[line.index('{"metric"'):]
    summary = json.loads(line)
    if summary["errors"]:
        sys.exit(f"run {i}: bench reported errors: {summary['errors']}")
    # open the path the summary reports, never a hardcoded file: if
    # Bench's best-effort write failed ("unwritable: ..."), a stale
    # bench_out.json from a previous run would otherwise be silently
    # ingested into the recorded medians (ADVICE r13)
    full_path = summary.get("full", "")
    if not full_path or full_path.startswith("unwritable"):
        sys.exit(f"run {i}: bench full output unavailable: {full_path!r}")
    with open(full_path) as f:
        d = json.load(f)
    with open(f"/tmp/graft_bench_run{i}.json", "w") as f:
        json.dump(d, f)
    print(f"run {i}: total={d['value']:.1f}s", file=sys.stderr)
    runs.append(d["queries"])

med = {q: statistics.median(r[q] for r in runs) for q in runs[0]}
out = {"metric": "total", "value": sum(med.values()), "unit": "sec",
       "queries": dict(sorted(med.items())), "errors": [], "sf": sf}
print(json.dumps(out))

# --record: persist the per-query medians as BASELINE_QUERIES.json —
# the committed parsed copy of the BASELINE.md record that graft.Bench
# reads to requery ratio-outliers (its widened self-adjudication).
# Gated behind the flag so a casual local run can't overwrite the
# accepted record.
if "--record" in sys.argv:
    with open("/root/repo/BASELINE_QUERIES.json", "w") as f:
        json.dump({"sf": sf, "n_queries": len(med),
                   "queries": dict(sorted(med.items()))}, f, indent=1)
    print("wrote /root/repo/BASELINE_QUERIES.json", file=sys.stderr)
