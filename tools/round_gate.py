"""One-command round close-out: run the full verdict-evidence chain
and write a single JSON record (round-4 VERDICT item 7 — the chain was
previously assembled by hand each round).

Chain (each step in its own subprocess so a crash is isolated and the
JSON still records the partial run):

  1. host_health BEFORE            (window must be CLEAN to trust 3-5)
  2. oracle sweep at sf0.001 AND sf0.01 (all registered queries)
  3. bench.py at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  4. north-rule scaling  (bench_scaling.py 200000 2 — the 134M-update
     input; 2v8 is the representative N-vs-4N regime on this host, see
     BENCH/BASELINE.md "8->32 ceiling isolation")
  5. host_health AFTER             (re-check the window didn't degrade)

Writes BENCH/round_gate.json and appends a close-out block to
BENCH/BASELINE.md.  Exit 0 iff every gate passed AND both health
probes were CLEAN.

Usage: python tools/round_gate.py [--skip-scaling] [--skip-bench]
       [--skip-sweeps] [--sf-dir DIR]
Wall-clock budget: ~40 min with everything on (sweeps ~2.5 min each,
bench ~3.5 min at sf0.1, scaling ~15-20 min at the 134M-update input).
Re-runs MERGE into BENCH/round_gate.json: skipped steps keep their
previous record, so a failed step can be re-run alone.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], timeout: int, log_name: str,
         env: dict | None = None) -> dict:
    """Run a step; capture stdout/stderr to BENCH/logs/<log_name>."""
    os.makedirs(f"{ROOT}/BENCH/logs", exist_ok=True)
    log = f"{ROOT}/BENCH/logs/{log_name}"
    t0 = time.time()
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    try:
        with open(log, "w") as fh:
            rc = subprocess.run(cmd, cwd=ROOT, stdout=fh,
                                stderr=subprocess.STDOUT,
                                timeout=timeout, env=full_env).returncode
    except subprocess.TimeoutExpired:
        rc = -9
    out = open(log).read()
    # last JSON line anywhere in the full log (bench/scaling print one;
    # the 2000-char tail alone can truncate the ~3kB bench line)
    json_line = None
    for line in reversed(out.strip().splitlines()):
        if line.startswith("{"):
            try:
                json_line = json.loads(line)
            except json.JSONDecodeError:
                pass
            break
    return {"cmd": " ".join(cmd), "rc": rc, "sec": round(time.time() - t0, 1),
            "log": os.path.relpath(log, ROOT), "tail": out[-2000:],
            "json": json_line}


def main() -> int:
    args = sys.argv[1:]
    skip_scaling = "--skip-scaling" in args
    skip_bench = "--skip-bench" in args
    skip_sweeps = "--skip-sweeps" in args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    py = sys.executable
    rec: dict = {"started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime()),
                 "steps": {}}
    # merge: a re-run with --skip-* keeps the earlier steps' records
    prior = f"{ROOT}/BENCH/round_gate.json"
    if os.path.exists(prior):
        try:
            rec["steps"] = json.load(open(prior)).get("steps", {})
        except json.JSONDecodeError:
            pass

    def step(name, cmd, timeout, env=None):
        print(f"[round_gate] {name}: {' '.join(cmd)}", flush=True)
        r = _run(cmd, timeout, f"gate_{name}.log", env)
        rec["steps"][name] = r
        print(f"[round_gate] {name}: rc={r['rc']} ({r['sec']}s)",
              flush=True)
        return r

    h0 = step("health_before", [py, "tools/host_health.py"], 120)
    if not skip_sweeps:
        step("sweep_sf0.001",
             [py, "tools/compare_oracle.py", "/root/testdata/sf0.001"],
             1800)
        step("sweep_sf0.01",
             [py, "tools/compare_oracle.py", "/root/testdata/sf0.01"],
             1800)
    if not skip_bench:
        step("bench", [py, "bench.py"], 1800,
             env={"SPARK_GRAFT_SF_DIR": sf_dir})
    if not skip_scaling:
        step("scaling", [py, "tools/bench_scaling.py", "200000", "2"],
             2400)
    h1 = step("health_after", [py, "tools/host_health.py"], 120)

    if rec["steps"].get("bench", {}).get("json"):
        rec["bench_json"] = rec["steps"]["bench"]["json"]
    if rec["steps"].get("scaling", {}).get("json"):
        rec["scaling_json"] = rec["steps"]["scaling"]["json"]
    clean = h0["rc"] == 0 and h1["rc"] == 0
    gates_ok = all(r["rc"] == 0 for n, r in rec["steps"].items()
                   if not n.startswith("health"))
    rec["window_clean"] = clean
    rec["gates_ok"] = gates_ok
    rec["ok"] = clean and gates_ok

    with open(f"{ROOT}/BENCH/round_gate.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    with open(f"{ROOT}/BENCH/BASELINE.md", "a") as fh:
        eff = rec.get("scaling_json", {}).get("scaling_efficiency")
        wall = rec.get("bench_json", {}).get("value")
        fh.write(f"\n## round_gate {rec['started_utc']}\n\n"
                 f"window_clean={clean} gates_ok={gates_ok} "
                 f"bench_wall={wall} scaling_eff={eff} "
                 f"(full record: BENCH/round_gate.json)\n")
    print(json.dumps({k: rec[k] for k in
                      ("window_clean", "gates_ok", "ok")} |
                     ({"bench_wall": rec["bench_json"]["value"]}
                      if "bench_json" in rec else {}) |
                     ({"scaling_eff":
                       rec["scaling_json"]["scaling_efficiency"]}
                      if "scaling_json" in rec else {})))
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
