"""Benchmark: streaming k-mer membership queries/second on one chip.

Workload mirrors the reference's headline path (`sbwt search` on a k=30
plain-matrix index, src/CLI/sbwt_search.cpp:46-65): build an index over a
genome, stream 100bp reads sampled from it (mostly-positive queries, like
example_data/queries.fastq against its source genome), measure k-mer
answers per second on device, excluding I/O.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.json north star): 100M queries/s/chip.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_corpus_codes(genome_mbp: float = 4.0, seed: int = 20260817) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(genome_mbp * 1e6)
    return rng.integers(0, 4, size=n, dtype=np.int8)


def sample_read_codes(
    genome_codes: np.ndarray,
    n_reads: int,
    read_len: int,
    seed: int = 1,
    random_fraction: float = 0.02,
):
    """Vectorized read sampling: [n_reads, read_len] int8 windows of the
    genome; `random_fraction` of reads replaced by random sequence (absent
    k-mers) to exercise the restart path.  0.02 mimics sequencing-error
    rates (the friendly regime); 0.5 / 1.0 are the miss-heavy and
    all-miss regimes the turbo patch pass must survive."""
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(genome_codes) - read_len, size=n_reads)
    codes = genome_codes[starts[:, None] + np.arange(read_len)]
    n_rand = max(1, int(n_reads * random_fraction))
    rand_rows = rng.choice(n_reads, size=n_rand, replace=False)
    codes[rand_rows] = rng.integers(0, 4, size=(n_rand, read_len), dtype=np.int8)
    return codes


def sample_read_codes_device(
    genome_codes: np.ndarray,
    n_reads: int,
    read_len: int,
    seed: int = 1,
    random_fraction: float = 0.02,
):
    """Device-side read sampling: upload the 4 MB genome once and gather
    the [n_reads, read_len] batch ON the chip.  Round 2's mysterious
    '26-minute warmup' was not compile time at all — it was the 400 MB
    host batch crawling through the axon tunnel (~300 KB/s); the XLA
    compile itself caches and finishes in about a minute."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def mk(genome, key):
        k1, k2, k3 = jax.random.split(key, 3)
        starts = jax.random.randint(
            k1, (n_reads,), 0, len(genome_codes) - read_len, dtype=jnp.int32
        )
        codes = genome[starts[:, None] + jnp.arange(read_len, dtype=jnp.int32)[None, :]]
        n_rand = max(1, int(n_reads * random_fraction))
        # rows chosen WITHOUT replacement (a random permutation prefix):
        # sampling with replacement under-delivers the requested fraction
        # badly at high fractions (1 - e^-1 = 63% distinct rows at
        # fraction 1.0), which silently made the miss-heavy regimes
        # ~37% genomic — round 3's hit0/hit50 cells were measured on
        # friendlier batches than their labels claim.
        rand_rows = jax.random.permutation(k2, n_reads)[:n_rand]
        rand_codes = jax.random.randint(
            k3, (n_rand, read_len), 0, 4, dtype=jnp.int8
        )
        return codes.at[rand_rows].set(rand_codes)

    return mk(jnp.asarray(genome_codes), jax.random.PRNGKey(seed))


def main():
    import jax

    # Persistent compile cache: the remote TPU compile of the streaming
    # program is minutes-slow; repeat runs (and the driver's bench run)
    # hit the cache instead.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from sbwt_tpu.models.sbwt import SBWT
    from sbwt_tpu.ops.search import streaming_search, streaming_search_jit
    from sbwt_tpu.utils.dna import encode_query
    from sbwt_tpu.utils.logging import write_log

    from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_search

    k = 30
    read_len = 100
    import os

    # 4M reads default: dependent-gather rate keeps climbing to ~8M lanes;
    # override for lane-scaling experiments with SBWT_BENCH_READS.
    n_reads = int(os.environ.get("SBWT_BENCH_READS", 1 << 22))
    genome_codes = make_corpus_codes()
    write_log(f"bench: building k={k} index over {len(genome_codes)/1e6:.1f} Mbp")
    t0 = time.perf_counter()
    # p=13 >> log4(n): 94% of random seeds are empty and only 0.17% of
    # positions hit a non-singleton seed (vs 2.4% at p=12), so the turbo
    # fast path covers essentially all restarts and the pos0 LF fallback
    # shrinks 4x (21% -> 5.8% of genomic first k-mers)
    sbwt = SBWT.build([genome_codes], k, precalc_k=13)
    build_s = time.perf_counter() - t0
    write_log(
        f"bench: built {sbwt.number_of_kmers()} kmers / {sbwt.number_of_subsets()} subsets "
        f"in {build_s:.1f}s"
    )
    regime = os.environ.get("SBWT_BENCH_REGIME")
    turbo = None
    if regime is None or regime.startswith("turbo"):
        t0 = time.perf_counter()
        # arity-3 successor table: 1 KiB/column (4 GB at this index size),
        # 0.33 dependent gathers per chain answer.  arity 1 ("uni" row
        # tier): 16 B/column, 1 row-gather per answer — the tier that
        # holds >=100M q/s when the big tables cannot fit.
        arity = 1 if (regime or "").startswith("turbo1") else 3
        turbo = build_turbo(sbwt.device_index, arity=arity)
        jax.block_until_ready(turbo.tbl)
        write_log(f"bench: turbo table (arity {arity}) built in {time.perf_counter() - t0:.1f}s")

    lengths = np.full(n_reads, read_len, dtype=np.int32)
    lengths_d = jnp.asarray(lengths)
    queries_per_batch = n_reads * (read_len - k + 1)

    # The timed program reduces the answer matrix to (checksum, hits) on
    # device: keeping the full [n_reads, n_answers] matrix alive across
    # reps would double the HBM footprint (it OOMs at 8M reads), and the
    # scalar fetch forces full completion of every rep
    # (block_until_ready alone is unreliable on this backend).
    @jax.jit
    def run(turbo, index, codes, lengths):
        out = turbo_streaming_search(turbo, index, codes, lengths)
        return jnp.sum(out), jnp.sum((out >= 0).astype(jnp.int64))

    if regime is None:
        codes_d = sample_read_codes_device(genome_codes, n_reads, read_len)
        # compile + warmup
        acc0, hits = run(turbo, sbwt.device_index, codes_d, lengths_d)
        hit = int(hits) / queries_per_batch
        write_log(f"bench: {queries_per_batch} queries/batch, hit rate {hit:.3f}")

        reps = 5
        t0 = time.perf_counter()
        acc = 0
        for _ in range(reps):
            s, _ = run(turbo, sbwt.device_index, codes_d, lengths_d)
            acc += int(s)
        dt = time.perf_counter() - t0
        qps = queries_per_batch * reps / dt

    # ---- unfriendly regimes ---------------------------------------------
    # SBWT_BENCH_MODE=full measures each regime in its OWN subprocess (the
    # axon single-chip tunnel faults when large dissimilar programs run
    # back-to-back in one process; fresh processes + the persistent
    # compile cache sidestep it) and writes BENCH_REGIMES.json.
    # SBWT_BENCH_REGIME=<name> (internal) measures one regime and prints
    # its JSON line.
    if regime:
        frac = {"hit98": 0.02, "hit50": 0.5, "hit0": 1.0}[regime.rsplit("_", 1)[1]]
        if regime.startswith("turbo"):
            # arity 1's table is 16 B/col (64 MB here), leaving HBM room
            # for 8M lanes — the gather rate still climbs there (105.5M
            # vs 101.2M q/s at 4M); arity 3's 4 GB table makes 8M regress
            n_r = (
                max(n_reads, 1 << 23)
                if regime.startswith("turbo1") and "SBWT_BENCH_READS" not in os.environ
                else n_reads
            )
            c = sample_read_codes_device(genome_codes, n_r, read_len, seed=2, random_fraction=frac)
            lengths_r = jnp.asarray(np.full(n_r, read_len, dtype=np.int32))
            fn = lambda cc: run(turbo, sbwt.device_index, cc, lengths_r)
        elif regime.startswith("rrr"):
            # rrr rank decode makes each LF step several times heavier
            # than plain-matrix; a single whole-batch dispatch runs long
            # enough to trip the device watchdog (this cell faulted in
            # every previous round).  Dispatch in 64K-read chunks instead:
            # one compile, several short device ops, same total work.
            n_r = min(n_reads, 1 << 19)
            ch = min(n_r, 1 << 16)
            write_log("bench: re-encoding rrr-matrix variant")
            rrr = sbwt.to_variant("rrr-matrix")
            c = sample_read_codes_device(genome_codes, n_r, read_len, seed=4, random_fraction=frac)

            @jax.jit
            def run_rrr(index, codes, lengths):
                out = streaming_search(index, codes, lengths)
                return jnp.sum(out), jnp.sum((out >= 0).astype(jnp.int64))

            def fn(cc):
                s = h = 0
                for i in range(0, n_r, ch):
                    c_ch = cc[i : i + ch]
                    # slice lengths to the chunk's ACTUAL size: the final
                    # chunk is short when n_r % ch != 0 (e.g. a custom
                    # SBWT_BENCH_READS), and a fixed 64K lengths batch
                    # would shape-mismatch the jitted program
                    s_, h_ = run_rrr(rrr.device_index, c_ch, lengths_d[: c_ch.shape[0]])
                    s += int(s_)
                    h += int(h_)
                return s, h  # python ints: already fetched/completed
        else:  # lf
            n_r = min(n_reads, 1 << 21)
            c = sample_read_codes_device(genome_codes, n_r, read_len, seed=3, random_fraction=frac)
            l_r = lengths_d[:n_r]

            @jax.jit
            def run_lf(index, codes, lengths):
                out = streaming_search(index, codes, lengths)
                return jnp.sum(out), jnp.sum((out >= 0).astype(jnp.int64))

            fn = lambda cc: run_lf(sbwt.device_index, cc, l_r)
        n_q = n_r * (read_len - k + 1)
        t0 = time.perf_counter()
        warm, _ = fn(c)  # compile + warm
        int(warm)  # scalar fetch forces completion (block_until_ready is
        warm_s = time.perf_counter() - t0  # unreliable on this backend)
        reps_r = 3
        rep_qps = []
        for _ in range(reps_r):
            t0 = time.perf_counter()
            s_, _ = fn(c)
            int(s_)
            rep_qps.append(n_q / (time.perf_counter() - t0))
        print(json.dumps({
            "regime": regime, "qps": round(max(rep_qps)),
            "qps_reps": [round(q) for q in rep_qps],
            "warmup_s": round(warm_s, 1), "n_reads": n_r, "reps": reps_r,
        }))
        return

    if os.environ.get("SBWT_BENCH_MODE") == "full":
        import subprocess

        regimes = {"turbo3_hit98": {"qps": round(qps), "reps": reps, "n_reads": n_reads}}
        names = [
            "turbo3_hit50", "turbo3_hit0",
            "turbo1_hit98", "turbo1_hit50", "turbo1_hit0",
            "lf_hit98", "lf_hit50", "lf_hit0", "rrr_lf_hit98",
        ]
        for name in names:
            for attempt in range(3):
                env = dict(os.environ)
                env["SBWT_BENCH_REGIME"] = name
                env.pop("SBWT_BENCH_MODE", None)
                proc = subprocess.run(
                    [sys.executable, __file__], env=env, capture_output=True, text=True
                )
                if proc.returncode == 0 and proc.stdout.strip():
                    r = json.loads(proc.stdout.strip().splitlines()[-1])
                    regimes[name] = {
                        k2: r[k2]
                        for k2 in ("qps", "qps_reps", "warmup_s", "n_reads", "reps")
                        if k2 in r
                    }
                    write_log(f"bench regime {name}: {r['qps']/1e6:.1f}M q/s")
                    break
                regimes[name] = {"error": proc.stderr[-500:]}
                write_log(f"bench regime {name}: attempt {attempt} failed")
                time.sleep(90)  # intermittent tunnel faults; let it settle
        # construction throughput datapoint (host+native; device upload
        # excluded) recorded next to the query numbers
        build_rec = {"index_build_seconds_device_env": round(build_s, 2)}
        bb_env = dict(os.environ)
        bb_env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        bb = subprocess.run(
            [sys.executable, "benchmarks/build_benchmark.py", "--mbp", "16"],
            capture_output=True, text=True, env=bb_env,
        )
        if bb.returncode == 0 and bb.stdout.strip():
            try:
                build_rec.update(json.loads(bb.stdout.strip().splitlines()[-1]))
            except json.JSONDecodeError:
                build_rec["error"] = bb.stdout[-300:]
        else:
            build_rec["error"] = bb.stderr[-300:]
        with open("BENCH_REGIMES.json", "w") as f:
            json.dump(
                {"k": k, "read_len": read_len, "regimes": regimes, "build": build_rec},
                f, indent=1,
            )

    baseline = 100e6  # BASELINE.json: >=100M k-mer queries/s/chip
    print(
        json.dumps(
            {
                "metric": "streaming_kmer_queries_per_sec_per_chip",
                "value": round(qps),
                "unit": "queries/s",
                "vs_baseline": round(qps / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
