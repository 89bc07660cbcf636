"""Fill missing/stale entries in BENCH_REGIMES.json by running single
regimes via `SBWT_BENCH_REGIME=<name> python bench.py` subprocesses
(same mechanism as SBWT_BENCH_MODE=full, but only for regimes that are
currently null), merging results back into BENCH_REGIMES.json."""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "BENCH_REGIMES.json")

with open(PATH) as f:
    data = json.load(f)

targets = [n for n, r in data["regimes"].items() if "qps" not in r]
print(f"missing regimes: {targets}", flush=True)

for name in targets:
    for attempt in range(3):
        env = dict(os.environ)
        env["SBWT_BENCH_REGIME"] = name
        env.pop("SBWT_BENCH_MODE", None)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True,
        )
        if proc.returncode == 0 and proc.stdout.strip():
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            data["regimes"][name] = {k: r[k] for k in ("qps", "n_reads", "reps")}
            print(f"{name}: {r['qps']/1e6:.1f}M q/s ({time.time()-t0:.0f}s)", flush=True)
            break
        data["regimes"][name] = {"error": proc.stderr[-500:]}
        print(f"{name}: attempt {attempt} failed ({time.time()-t0:.0f}s)\n{proc.stderr[-800:]}", flush=True)
        time.sleep(90)
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1)
print("done", flush=True)
