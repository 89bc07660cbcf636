"""Round-4 probe 4: why did the redesigned engine collapse to ~25M q/s
in every regime?  Suspect: full-size [B*P] compactions (cumsum + 298M
scatter).  Phases:

  A  compact_indices over 298M (6% mask)
  B  cumsum over 298M int32 alone
  D  jnp.sort of [1M, 71] int32 along axis 1 (per-lane compaction alt)
  P1 pos0 + chain only (hit98 codes)  — the conds, no patch stages
  P2 P1 + classification cond         — still no pooled stages
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops import turbo as T
from sbwt_tpu.ops.search import compact_indices

import bench as benchmod

LOG = open("/root/repo/scratch/r4_probe4.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
B = n_reads
P = read_len - k + 1
total = B * P
genome = benchmod.make_corpus_codes()
log(f"== r4_probe4 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = T.build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
index = sb.device_index
lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))

def timeit(fn, *args, tag="", reps=3):
    t0 = time.perf_counter()
    out = jax.tree.map(lambda x: np.asarray(x).sum(), fn(*args))
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.tree.map(lambda x: np.asarray(x).sum(), fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts)//2]
    log(f"{tag}: median {med*1000:.0f} ms (reps {['%.0f'%(t*1000) for t in ts]}, warm {warm:.0f}s)")
    return out, med

key = jax.random.PRNGKey(0)
mask = jax.random.bernoulli(key, 0.06, (total,))

@jax.jit
def runA(mask):
    work, cnt = compact_indices(mask)
    return jnp.sum(work[:1024]), cnt
_, tA = timeit(runA, mask, tag="A compact_indices 298M (6%)")

@jax.jit
def runB(mask):
    return jnp.cumsum(mask.astype(jnp.int32))[-1]
_, tB = timeit(runB, mask, tag="B cumsum 298M")

keys = jax.random.randint(key, (1 << 20, P), 0, 1000, dtype=jnp.int32)
@jax.jit
def runD(keys):
    return jnp.sum(jnp.sort(keys, axis=1)[:, 0])
_, tD = timeit(runD, keys, tag="D axis-sort [1M, 71]")

codes_hit = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=0.02)
codes_miss = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=1.0)
jax.block_until_ready(codes_miss)

def engine_prefix(turbo, index, codes, with_classify):
    """pos0 + chain (+ classification cond), no pooled stages — a copy of
    the engine's head for phase isolation."""
    from sbwt_tpu.ops.turbo import (
        _walk_rem, _clamp_pow2, _step, _pidx_vwin, _lf_from_seeds, _pack_rem,
        SLOW_SENTINEL,
    )
    B, L = codes.shape
    k, p = turbo.k, turbo.precalc_k
    A = turbo.arity
    P = L - k + 1
    rem = k - p
    cc0 = codes[:, :k].astype(jnp.int32)
    valid0 = jnp.all((cc0 >= 0) & (cc0 < 4), axis=-1)
    cc0 = jnp.clip(cc0, 0) & 3
    weights = jnp.asarray(4 ** np.arange(p, dtype=np.int64), dtype=jnp.int32)
    pidx0 = jnp.sum(cc0[:, :p] * weights, axis=-1)
    seed0 = turbo.precalc[pidx0]
    l0s, r0s = seed0[:, 0], seed0[:, 1]
    dead0 = (l0s < 0) | ~valid0
    slow0 = ~dead0 & (l0s != r0s)
    work0, n_slow0 = compact_indices(slow0)
    c0 = _clamp_pow2(B // 8, 8192, 1 << 18)
    walkable0 = ~dead0 & ~slow0
    w0_list, n_walk0 = compact_indices(walkable0)

    def walk0_full(_):
        col0 = jnp.where(dead0, -1, l0s)
        return _walk_rem(turbo, col0, lambda j: cc0[:, p + j], rem)

    def walk0_compact(_):
        Cw = min(_clamp_pow2(B // 16, 8192, 1 << 19), B)
        def body(i, col0):
            lanes = lax.dynamic_slice(w0_list, (i * Cw,), (Cw,))
            safe = jnp.clip(lanes, 0, B - 1)
            win = cc0[safe]
            col = _walk_rem(turbo, jnp.where(lanes < B, l0s[safe], -1),
                            lambda j: win[:, p + j], rem)
            return col0.at[lanes].set(col, mode="drop")
        n_t = (n_walk0 + Cw - 1) // Cw
        return lax.fori_loop(0, n_t, body, jnp.full((B,), -1, jnp.int32))

    col0 = lax.cond(n_walk0 * 2 > B, walk0_full, walk0_compact, 0)
    ans0 = jnp.where(slow0, -1, col0)
    pw0 = _pack_rem(cc0, 1, k, p).reshape(B, 2)
    def body0(i, a0):
        sel = lax.dynamic_slice(work0, (i * c0,), (c0,))
        selc = jnp.clip(sel, 0, B - 1)
        res = _lf_from_seeds(index, l0s[selc], r0s[selc], pw0[selc], rem)
        return a0.at[sel].set(res, mode="drop")
    ans0 = lax.fori_loop(0, (n_slow0 + c0 - 1) // c0, body0, ans0)

    n_steps = -(-(P - 1) // A)
    pad_cols = n_steps * A - (P - 1)
    def chain_step(col, cs_step):
        cs = [cs_step[i].astype(jnp.int32) for i in range(A)]
        outs = _step(turbo, col, cs, [c >= 0 for c in cs])
        return outs[A - 1], jnp.stack(outs)
    alive0_list, n_alive0 = compact_indices(ans0 >= 0)
    def chain_full(_):
        ext = jnp.concatenate([codes[:, k:], jnp.full((B, pad_cols), -1, codes.dtype)], axis=1)
        xs = ext.T.reshape(n_steps, A, B)
        _, outs = lax.scan(chain_step, ans0, xs)
        rest = outs.reshape(n_steps * A, B)[: P - 1].T
        return jnp.concatenate([ans0[:, None], rest], axis=1)
    def chain_compact(_):
        Cc = min(_clamp_pow2(B // 4, 8192, 1 << 20), B)
        def body(i, a):
            lanes = lax.dynamic_slice(alive0_list, (i * Cc,), (Cc,))
            safe = jnp.clip(lanes, 0, B - 1)
            rows = codes[safe]
            ext = jnp.concatenate([rows[:, k:], jnp.full((Cc, pad_cols), -1, rows.dtype)], axis=1)
            xs = ext.T.reshape(n_steps, A, Cc)
            a0 = jnp.where(lanes < B, ans0[safe], -1)
            _, outs = lax.scan(chain_step, a0, xs)
            rest = outs.reshape(n_steps * A, Cc)[: P - 1].T
            full_rows = jnp.concatenate([a0[:, None], rest], axis=1)
            return a.at[lanes].set(full_rows, mode="drop")
        n_t = (n_alive0 + Cc - 1) // Cc
        init = jnp.concatenate([ans0[:, None], jnp.full((B, P - 1), -1, jnp.int32)], axis=1)
        return lax.fori_loop(0, n_t, body, init)
    ans = lax.cond(n_alive0 * 2 > B, chain_full, chain_compact, 0)

    if not with_classify:
        return jnp.sum(ans)

    unresolved = jnp.concatenate([jnp.zeros((B, 1), dtype=bool), ans[:, :-1] == -1], axis=1)
    dirty = jnp.any(unresolved, axis=1)
    lanes_work, n_dirty = compact_indices(dirty)
    Cn = min(_clamp_pow2(B // 16, 8192, 1 << 19), B)

    def _classify(rows_i32, un, a_rows):
        C_ = rows_i32.shape[0]
        pidx, vwin = _pidx_vwin(turbo, rows_i32, P)
        Pe = (P + 1) // 2
        cpair = (jnp.clip(rows_i32[:, p : p + P : 2], 0) & 3).astype(jnp.int32)
        m = pidx[:, ::2] + cpair * jnp.int32(4**p)
        w = turbo.seed_bits[jnp.clip(m >> 4, 0)]
        b = (w >> (2 * (m & 15)).astype(jnp.uint32)) & jnp.uint32(3)
        live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
        seed_live = live_pair.reshape(C_, 2 * Pe)[:, :P]
        alive = seed_live & vwin
        return jnp.where(un & ~alive, -1,
                         jnp.where(un & alive, jnp.int32(SLOW_SENTINEL), a_rows))

    def classify_full(a):
        return _classify(codes.astype(jnp.int32), unresolved, a)

    def classify_lanes(a):
        def body(i, a):
            lanes = lax.dynamic_slice(lanes_work, (i * Cn,), (Cn,))
            safe = jnp.clip(lanes, 0, B - 1)
            rows = codes[safe].astype(jnp.int32)
            un = unresolved[safe] & (lanes[:, None] < B)
            new_rows = _classify(rows, un, a[safe])
            return a.at[lanes].set(new_rows, mode="drop")
        return lax.fori_loop(0, (n_dirty + Cn - 1) // Cn, body, a)

    ans = lax.cond(n_dirty * 2 > B, classify_full, classify_lanes, ans)
    return jnp.sum(ans)

p1 = jax.jit(lambda t, ix, c: engine_prefix(t, ix, c, False))
_, tP1h = timeit(p1, turbo, index, codes_hit, tag="P1 pos0+chain hit98")
_, tP1m = timeit(p1, turbo, index, codes_miss, tag="P1 pos0+chain hit0")
p2 = jax.jit(lambda t, ix, c: engine_prefix(t, ix, c, True))
_, tP2h = timeit(p2, turbo, index, codes_hit, tag="P2 +classify hit98")
_, tP2m = timeit(p2, turbo, index, codes_miss, tag="P2 +classify hit0")

log(f"summary A={tA*1000:.0f} B={tB*1000:.0f} D={tD*1000:.0f} "
    f"P1h={tP1h*1000:.0f} P1m={tP1m*1000:.0f} P2h={tP2h*1000:.0f} P2m={tP2m*1000:.0f}")
log("== r4_probe4 done ==")
