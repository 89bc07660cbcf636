"""Round-5 probe 9 (x64 process): are int64 gather indices the wide
chain's cost?  [n,4] row gathers with s32 vs s64 indices vs s64-cast-s32,
and the paired (lo, hi) double row gather."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
from jax import lax

LOG = open("/root/repo/scratch/r5_probe9.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

log(f"== r5_probe9 start {time.strftime('%F %T')} ==")
n = 4_000_000
key = jax.random.PRNGKey(1)
tbl = jax.random.randint(key, (n, 4), 0, n, dtype=jnp.int32)
tbl_hi = jnp.zeros((n, 4), dtype=jnp.int32)
idx32 = jax.random.randint(key, (1 << 23,), 0, n, dtype=jnp.int32)
idx64 = idx32.astype(jnp.int64)
jax.block_until_ready((tbl, tbl_hi, idx32, idx64))
STEPS = 8

def chain32(tbl, idx):
    def body(i, c):
        r = tbl[c]
        s = (r[:, 0] ^ r[:, 1] ^ r[:, 3]) % n
        return jnp.clip(s, 0)
    return lax.fori_loop(0, STEPS, body, idx).sum()

def chain64(tbl, idx):
    def body(i, c):
        r = tbl[c]  # s64 index gather
        s = (r[:, 0] ^ r[:, 1] ^ r[:, 3]).astype(jnp.int64) % n
        return jnp.clip(s, 0)
    return lax.fori_loop(0, STEPS, body, idx).sum()

def chain64cast(tbl, idx):
    def body(i, c):
        r = tbl[c.astype(jnp.int32)]  # cast before the gather
        s = (r[:, 0] ^ r[:, 1] ^ r[:, 3]).astype(jnp.int64) % n
        return jnp.clip(s, 0)
    return lax.fori_loop(0, STEPS, body, idx).sum()

def chain64pair(tbl2, idx):
    tbl, tbl_hi = tbl2
    def body(i, c):
        c32 = c.astype(jnp.int32)
        rlo = tbl[c32]
        rhi = tbl_hi[c32]
        s = (rlo[:, 0] ^ rlo[:, 1] ^ rhi[:, 3]).astype(jnp.int64) % n
        return jnp.clip(s, 0)
    return lax.fori_loop(0, STEPS, body, idx).sum()

for label, fn, args in (
    ("s32 idx [n,4]", chain32, (tbl, idx32)),
    ("s64 idx [n,4]", chain64, (tbl, idx64)),
    ("s64->s32 cast [n,4]", chain64cast, (tbl, idx64)),
    ("s64->s32 paired lo+hi", chain64pair, ((tbl, tbl_hi), idx64)),
):
    f = jax.jit(fn)
    s = f(*args); int(s)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); s = f(*args); int(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    log(f"{label}: {STEPS * (1 << 23) / med / 1e6:.1f}M rows/s ({med*1000:.0f} ms)")
log("== r5_probe9 done ==")
