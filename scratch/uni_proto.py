"""Prototype: unitig-skip chain designs vs arity-1 row chain (perf only).

Candidates (all 16 B/col table [n,4] int32, 64 MB at n=4M -> fast zone):
  P0 scatter:  raw 2D scatter rate (the cost that decides P2/P2b)
  P1 arity1:   position-synced chain, 1 gather/answer, sequential ys
  P2 skip:     variable-advance skip-3 chain, in-loop masked scatters
  P2b skip-ys: variable-advance, ys records + ONE big end scatter
Tables are synthetic (random jumps); content semantics don't matter for
perf, only the gather/scatter patterns and dependency structure.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 1 << 22          # 4M columns
B = 1 << 22          # 4M lanes
P = 71               # answers per lane (100bp reads, k=30)


def make_tbl(n):
    def mk():
        ids = jnp.arange(n, dtype=jnp.uint32)
        s1 = (ids * np.uint32(2654435761)) % np.uint32(n)
        s2 = (ids * np.uint32(2246822519)) % np.uint32(n)
        s3 = (ids * np.uint32(3266489917)) % np.uint32(n)
        # ~3% branch flag in bit 31, ext=3 + random echars in meta
        flag = ((ids * np.uint32(668265263)) % np.uint32(100) < 3).astype(jnp.uint32) << 31
        meta = flag | (jnp.uint32(3) << 28) | ((ids >> 3) & np.uint32(0x3F)) << 22
        return jnp.stack([meta.astype(jnp.int32), s1.astype(jnp.int32),
                          s2.astype(jnp.int32), s3.astype(jnp.int32)], axis=1)
    return jax.jit(mk)()


def bench(fn, args, tag, answers, reps=3):
    # np.asarray (not block_until_ready) per rep: the axon tunnel's
    # block_until_ready returns before device completion — only a host
    # transfer of the result is a true sync.
    f = jax.jit(fn)
    t0 = time.perf_counter()
    s = np.asarray(f(*args))
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{tag:12s}: warm {warm:5.1f}s, min {dt*1e3:8.1f} ms, "
          f"{answers/dt/1e6:8.1f}M answers/s, sum={int(s)}", flush=True)


# ---- P0: raw scatter rate --------------------------------------------------
def p0_scatter(lanes, poss, vals):
    ans = jnp.full((B, P), -2, dtype=jnp.int32)
    # poss: [S, B] positions per round; S rounds of B-element scatters
    def body(i, a):
        return a.at[lanes, poss[i]].set(vals[i], mode="drop")
    return lax.fori_loop(0, poss.shape[0], body, ans).sum()


# ---- P1: arity-1 position-synced chain ------------------------------------
def p1_arity1(tbl, col0, cs):
    # cs: [P-1, B] chars; every step: gather row, select succ by char
    def step(col, c):
        row = tbl[col]
        s = jnp.where(c == 0, row[:, 1], jnp.where(c == 1, row[:, 2], row[:, 3]))
        nxt = jnp.where(s >= 0, s % N, 0)
        return nxt, nxt
    _, ys = lax.scan(step, col0, cs)
    return ys.sum()


# ---- P2: variable-advance skip-3, in-loop scatters -------------------------
def p2_skip(tbl, col0, cw, T):
    lanes = jnp.arange(B, dtype=jnp.int32)
    ans = jnp.full((B, P), -2, dtype=jnp.int32)

    def charat(j):
        # cw: [B, 5] uint32, 2-bit chars; per-lane dynamic extraction
        w = jnp.clip(j >> 4, 0, 4)
        sel = cw[:, 0]
        for t in range(1, 5):
            sel = jnp.where(w == t, cw[:, t], sel)
        return ((sel >> ((j.astype(jnp.uint32) & 15) * 2)) & 3).astype(jnp.int32)

    def body(i, carry):
        col, pos, ans = carry
        row = tbl[jnp.clip(col, 0)]
        meta = row[:, 0].astype(jnp.uint32)
        branch = (meta >> 31) == 1
        e1 = ((meta >> 26) & 3).astype(jnp.int32)
        e2 = ((meta >> 24) & 3).astype(jnp.int32)
        e3 = ((meta >> 22) & 3).astype(jnp.int32)
        c1, c2, c3 = charat(pos), charat(pos + 1), charat(pos + 2)
        alive = col >= 0
        s1, s2, s3 = row[:, 1] % N, row[:, 2] % N, row[:, 3] % N
        bsel = jnp.where(c1 == 0, s1, jnp.where(c1 == 1, s2, s3))
        a1 = jnp.where(branch, bsel, jnp.where(c1 == e1, s1, -1))
        m2 = ~branch & (a1 >= 0) & (c2 == e2)
        m3 = m2 & (c3 == e3)
        adv = jnp.where(alive, jnp.where(branch, 1, 1 + m2 + m3), 3)
        ans = ans.at[lanes, jnp.where(alive, pos + 1, P)].set(a1, mode="drop")
        ans = ans.at[lanes, jnp.where(m2, pos + 2, P)].set(s2, mode="drop")
        ans = ans.at[lanes, jnp.where(m3, pos + 3, P)].set(s3, mode="drop")
        col = jnp.where(alive, jnp.where(m3, s3, jnp.where(m2, s2, a1)), -1)
        pos = jnp.minimum(pos + adv, P - 1)
        return col, pos, ans

    col, pos, ans = lax.fori_loop(0, T, body, (col0, jnp.zeros(B, jnp.int32), ans))
    return ans.sum()


# ---- P2b: variable-advance, ys + one end scatter ---------------------------
def p2b_skip_ys(tbl, col0, cw, T):
    def charat(j):
        w = jnp.clip(j >> 4, 0, 4)
        sel = cw[:, 0]
        for t in range(1, 5):
            sel = jnp.where(w == t, cw[:, t], sel)
        return ((sel >> ((j.astype(jnp.uint32) & 15) * 2)) & 3).astype(jnp.int32)

    def step(carry, _):
        col, pos = carry
        row = tbl[jnp.clip(col, 0)]
        meta = row[:, 0].astype(jnp.uint32)
        branch = (meta >> 31) == 1
        e1 = ((meta >> 26) & 3).astype(jnp.int32)
        e2 = ((meta >> 24) & 3).astype(jnp.int32)
        e3 = ((meta >> 22) & 3).astype(jnp.int32)
        c1, c2, c3 = charat(pos), charat(pos + 1), charat(pos + 2)
        alive = col >= 0
        s1, s2, s3 = row[:, 1] % N, row[:, 2] % N, row[:, 3] % N
        bsel = jnp.where(c1 == 0, s1, jnp.where(c1 == 1, s2, s3))
        a1 = jnp.where(branch, bsel, jnp.where(c1 == e1, s1, -1))
        m2 = ~branch & (a1 >= 0) & (c2 == e2)
        m3 = m2 & (c3 == e3)
        adv = jnp.where(alive, jnp.where(branch, 1, 1 + m2 + m3), 3)
        col2 = jnp.where(alive, jnp.where(m3, s3, jnp.where(m2, s2, a1)), -1)
        pos2 = jnp.minimum(pos + adv, P - 1)
        ys = (jnp.where(alive, pos + 1, P), a1,
              jnp.where(m2, s2, -2), jnp.where(m3, s3, -2))
        return (col2, pos2), ys

    (col, pos), (p1s, a1s, a2s, a3s) = lax.scan(
        step, (col0, jnp.zeros(B, jnp.int32)), None, length=T)
    ans = jnp.full((B, P), -2, dtype=jnp.int32)
    lanes = jnp.arange(B, dtype=jnp.int32)[None, :]
    ans = ans.at[lanes, p1s].set(a1s, mode="drop")
    ans = ans.at[lanes, jnp.where(a2s != -2, p1s + 1, P)].set(a2s, mode="drop")
    ans = ans.at[lanes, jnp.where(a3s != -2, p1s + 2, P)].set(a3s, mode="drop")
    return ans.sum()


if __name__ == "__main__":
    tbl = make_tbl(N)
    key = jax.random.PRNGKey(0)
    col0 = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    cs = jax.random.randint(jax.random.PRNGKey(1), (P - 1, B), 0, 4, dtype=jnp.int32)
    cw = jax.random.bits(jax.random.PRNGKey(2), (B, 5), jnp.uint32)
    S = 24
    poss = jax.random.randint(jax.random.PRNGKey(3), (S, B), 0, P, dtype=jnp.int32)
    vals = jax.random.randint(jax.random.PRNGKey(4), (S, B), 0, N, dtype=jnp.int32)
    lanes = jnp.arange(B, dtype=jnp.int32)
    jax.block_until_ready((tbl, col0, cs, cw, poss, vals))

    bench(p0_scatter, (lanes, poss, vals), "P0 scatter", S * B)
    bench(p1_arity1, (tbl, col0, cs), "P1 arity1", (P - 1) * B)
    T = 30
    bench(lambda t, c, w: p2_skip(t, c, w, T), (tbl, col0, cw), "P2 skip", (P - 1) * B)
    bench(lambda t, c, w: p2b_skip_ys(t, c, w, T), (tbl, col0, cw), "P2b skip-ys", (P - 1) * B)
