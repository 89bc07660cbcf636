"""Re-run named bench regimes with the current code and merge the
records (qps, qps_reps, warmup_s, n_reads, reps) into BENCH_REGIMES.json.

Usage: python scratch/rerun_regimes.py turbo3_hit0 turbo3_hit50 ...
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "BENCH_REGIMES.json")

with open(PATH) as f:
    data = json.load(f)

for name in sys.argv[1:]:
    for attempt in range(3):
        env = dict(os.environ)
        env["SBWT_BENCH_REGIME"] = name
        env.pop("SBWT_BENCH_MODE", None)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        if proc.returncode == 0 and proc.stdout.strip():
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            data["regimes"][name] = {
                k: r[k]
                for k in (
                    "qps", "qps_min", "qps_max", "qps_reps", "hit_rate",
                    "warmup_s", "n_reads", "reps", "commit", "date",
                )
                if k in r
            }
            print(f"{name}: {r['qps']/1e6:.1f}M q/s ({time.time()-t0:.0f}s)", flush=True)
            break
        print(
            f"{name}: attempt {attempt} failed ({time.time()-t0:.0f}s)\n"
            f"{proc.stderr[-800:]}",
            flush=True,
        )
        time.sleep(90)
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1)
print("done", flush=True)
