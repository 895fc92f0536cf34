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
       [--sf-dir DIR]
Wall-clock budget: ~25 min with everything on (sweeps ~10 min each at
both sfs combined, bench ~5 min at sf0.1, scaling ~7 min).
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
    return {"cmd": " ".join(cmd), "rc": rc, "sec": round(time.time() - t0, 1),
            "log": os.path.relpath(log, ROOT), "tail": out[-2000:]}


def main() -> int:
    args = sys.argv[1:]
    skip_scaling = "--skip-scaling" in args
    skip_bench = "--skip-bench" in args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    py = sys.executable
    rec: dict = {"started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime()),
                 "steps": {}}

    def step(name, cmd, timeout, env=None):
        print(f"[round_gate] {name}: {' '.join(cmd)}", flush=True)
        r = _run(cmd, timeout, f"gate_{name}.log", env)
        rec["steps"][name] = r
        print(f"[round_gate] {name}: rc={r['rc']} ({r['sec']}s)",
              flush=True)
        return r

    h0 = step("health_before", [py, "tools/host_health.py"], 120)
    step("sweep_sf0.001",
         [py, "tools/compare_oracle.py", "/root/testdata/sf0.001"], 1800)
    step("sweep_sf0.01",
         [py, "tools/compare_oracle.py", "/root/testdata/sf0.01"], 1800)
    if not skip_bench:
        step("bench", [py, "bench.py"], 1800,
             env={"SPARK_GRAFT_SF_DIR": sf_dir})
        # bench.py prints its JSON line last — lift it into the record
        for line in reversed(
                rec["steps"]["bench"]["tail"].strip().splitlines()):
            if line.startswith("{"):
                try:
                    rec["bench_json"] = json.loads(line)
                except json.JSONDecodeError:
                    pass
                break
    if not skip_scaling:
        s = step("scaling", [py, "tools/bench_scaling.py", "200000", "2"],
                 1200)
        for line in s["tail"].strip().splitlines():
            if line.startswith("{"):
                try:
                    rec["scaling_json"] = json.loads(line)
                except json.JSONDecodeError:
                    pass
    h1 = step("health_after", [py, "tools/host_health.py"], 120)

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
