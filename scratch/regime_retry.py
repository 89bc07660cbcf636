"""Retry failed bench regimes one at a time with cool-down pauses
(the axon tunnel faults intermittently under back-to-back heavy runs);
merges successes into BENCH_REGIMES.json."""
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
PATH = os.path.join(REPO, "BENCH_REGIMES.json")

with open(PATH) as f:
    data = json.load(f)

targets = [n for n, r in data["regimes"].items() if "qps" not in r]
extra = [n for n in sys.argv[1:] if n not in targets]
targets += extra
print("retrying:", targets, flush=True)

for name in targets:
    ok = False
    for attempt in range(3):
        env = dict(os.environ)
        env["SBWT_BENCH_REGIME"] = name
        env.pop("SBWT_BENCH_MODE", None)
        env["PYTHONPATH"] = REPO + ":/root/.axon_site"
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        if proc.returncode == 0 and proc.stdout.strip():
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            data["regimes"][name] = {k: r[k] for k in ("qps", "n_reads", "reps")}
            print(f"{name}: {r['qps']/1e6:.1f}M q/s ({time.time()-t0:.0f}s)", flush=True)
            ok = True
            break
        print(f"{name} attempt {attempt}: failed after {time.time()-t0:.0f}s", flush=True)
        time.sleep(120)  # let the tunnel settle
    if not ok:
        data["regimes"][name] = {"error": "tunnel fault after 3 attempts"}
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1)
    time.sleep(60)
print("done", flush=True)
