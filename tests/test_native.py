"""Native C components: reader/encoder, formatter, external-memory sort.

Differential tests against the pure-Python implementations (io/seqio.py,
utils/dna.py, numpy sort), mirroring the reference's EM_sort oracle
strategy (tests/test_EM_sort.hh:110-163: random files across record
counts and RAM budgets, byte-compared against an in-memory sort).
"""
import gzip
import os

import numpy as np
import pytest

from sbwt_tpu import native
from sbwt_tpu.io import seqio
from sbwt_tpu.utils.dna import encode_query

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C toolchain for native components"
)


def _write_fasta(path, seqs, gz=False, linewrap=None):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">seq{i} header stuff\n")
            if linewrap:
                for j in range(0, len(s), linewrap):
                    f.write(s[j : j + linewrap] + "\n")
            else:
                f.write(s + "\n")


def _write_fastq(path, seqs, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")


def _read_all_native(path):
    reads = []
    with native.NativeSequenceReader(path, batch_bases=1 << 14, batch_reads=64) as r:
        for codes, offs in r:
            for i in range(len(offs) - 1):
                reads.append(codes[offs[i] : offs[i + 1]].copy())
    return reads


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("wrap", [None, 10])
def test_native_fasta_reader(tmp_path, gz, wrap):
    rng = np.random.default_rng(1)
    seqs = [
        "".join(rng.choice(list("ACGTacgtNn"), size=int(n)))
        for n in rng.integers(1, 300, size=37)
    ]
    path = str(tmp_path / ("x.fna" + (".gz" if gz else "")))
    _write_fasta(path, seqs, gz, wrap)
    got = _read_all_native(path)
    assert len(got) == len(seqs)
    for g, s in zip(got, seqs):
        np.testing.assert_array_equal(g, encode_query(s))


@pytest.mark.parametrize("gz", [False, True])
def test_native_fastq_reader(tmp_path, gz):
    rng = np.random.default_rng(2)
    seqs = [
        "".join(rng.choice(list("ACGT"), size=int(n)))
        for n in rng.integers(1, 200, size=53)
    ]
    path = str(tmp_path / ("x.fq" + (".gz" if gz else "")))
    _write_fastq(path, seqs, gz)
    got = _read_all_native(path)
    assert len(got) == len(seqs)
    for g, s in zip(got, seqs):
        np.testing.assert_array_equal(g, encode_query(s))


def test_format_ranks_matches_reference_format():
    vals = np.array([3372, -1, 0, 523, 99], dtype=np.int64)
    lens = np.array([3, 2], dtype=np.int64)
    out = native.format_ranks(vals, lens)
    assert out == b"3372 -1 0 \n523 99 \n"


def test_em_sort_random_files(tmp_path):
    rng = np.random.default_rng(3)
    for n, ram in [(0, 1 << 20), (1, 1 << 20), (100000, 1 << 20), (500000, 1 << 21)]:
        arr = rng.integers(0, 2**63, size=n, dtype=np.uint64)
        inp = str(tmp_path / "in.bin")
        outp = str(tmp_path / "out.bin")
        arr.tofile(inp)
        native.em_sort_u64_file(inp, outp, str(tmp_path), ram_bytes=ram, n_threads=3)
        got = np.fromfile(outp, dtype=np.uint64)
        np.testing.assert_array_equal(got, np.sort(arr))


def test_em_sort_write_failure_is_reported(tmp_path):
    """An unwritable temp dir must fail loudly, never truncate a run
    silently (the sorted file feeds index construction — a short run
    would build a *wrong* index).  A nonexistent dir makes the run-file
    fopen fail inside the sort workers, exercising the same error path
    as a full disk, and works even when tests run as root."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 2**63, size=300000, dtype=np.uint64)
    inp = str(tmp_path / "in.bin")
    arr.tofile(inp)
    gone = str(tmp_path / "no_such_dir")
    with pytest.raises(RuntimeError):
        native.em_sort_u64_file(
            inp, str(tmp_path / "out.bin"), gone, ram_bytes=1 << 21, n_threads=2
        )


def test_em_sort_write_failure_is_reported_wide(tmp_path):
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 2**63, size=100000, dtype=np.uint64)
    inp = str(tmp_path / "in.bin")
    arr.tofile(inp)
    gone = str(tmp_path / "no_such_dir_w")
    with pytest.raises(RuntimeError):
        native.em_sort_records_file(
            inp, str(tmp_path / "out.bin"), gone, n_words=2,
            ram_bytes=1 << 21, n_threads=2,
        )


def test_em_dedup_count(tmp_path):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 50, size=10000, dtype=np.uint64)
    arr.sort()
    inp = str(tmp_path / "s.bin")
    outp = str(tmp_path / "d.bin")
    arr.tofile(inp)
    uniq, counts = np.unique(arr, return_counts=True)
    for lo, hi in [(1, 2**62), (150, 2**62), (1, 200), (180, 220)]:
        kept = native.em_dedup_count_u64_file(inp, outp, lo, hi)
        expect = uniq[(counts >= lo) & (counts <= hi)]
        got = np.fromfile(outp, dtype=np.uint64)
        np.testing.assert_array_equal(got, expect)
        assert kept == len(expect)

def test_em_sort_varlen_random_files(tmp_path):
    """Randomized variable-length record sort vs an in-memory oracle,
    mirroring the reference's variable-record EM_sort tests
    (tests/test_EM_sort.hh:110-163)."""
    rng = np.random.default_rng(5)
    cases = [
        (0, 1 << 20),       # empty file
        (1, 1 << 20),       # one record
        (5000, 1 << 20),    # single block
        (200000, 1 << 20),  # multiple runs -> merge pass
    ]
    for n, ram in cases:
        lens = rng.integers(0, 60, size=n)
        recs = [rng.integers(0, 256, size=ln, dtype=np.uint8).tobytes() for ln in lens]
        if n > 10:
            # prefix ties: duplicates and shorter-prefix ordering
            recs[3] = recs[2]
            recs[4] = recs[2][: len(recs[2]) // 2]
        inp = str(tmp_path / "v_in.bin")
        outp = str(tmp_path / "v_out.bin")
        native.write_varlen_records(inp, recs)
        native.em_sort_varlen_file(inp, outp, str(tmp_path), ram_bytes=ram, n_threads=3)
        got = native.read_varlen_records(outp)
        assert got == sorted(recs)


def test_em_sort_varlen_huge_record(tmp_path):
    """A single record larger than the block size must still sort."""
    rng = np.random.default_rng(6)
    recs = [rng.integers(0, 256, size=ln, dtype=np.uint8).tobytes()
            for ln in [200000, 3, 0, 150000, 7]]
    inp = str(tmp_path / "h_in.bin")
    outp = str(tmp_path / "h_out.bin")
    native.write_varlen_records(inp, recs)
    native.em_sort_varlen_file(inp, outp, str(tmp_path), ram_bytes=1 << 17, n_threads=2)
    assert native.read_varlen_records(outp) == sorted(recs)

def test_create_reverse_complement_files(tmp_path):
    """RC file creation for .fna and .fq, like the reference's misc tests
    (tests/test_misc.hh:8-72)."""
    fna = tmp_path / "a.fna"
    fq = tmp_path / "b.fq.gz"
    fna.write_text(">s1\nACGTTGCA\n>s2\nGGGTA\n")
    with gzip.open(fq, "wt") as f:
        f.write("@r1\nAACCGT\n+\nIIIIII\n")
    outs = [str(tmp_path / "a_rc.fna"), str(tmp_path / "b_rc.fq.gz")]
    seqio.create_reverse_complement_files([str(fna), str(fq)], outs)
    assert seqio.read_sequences(outs[0]) == [b"TGCAACGT", b"TACCC"]
    assert seqio.read_sequences(outs[1]) == [b"ACGGTT"]



_FWRITE_SHIM = r"""
/* LD_PRELOAD shim: fwrite starts short-writing after FAIL_AFTER_BYTES
 * total bytes, simulating a disk filling up mid-stream. */
#define _GNU_SOURCE
#include <stdio.h>
#include <stdlib.h>
#include <dlfcn.h>

static size_t (*real_fwrite)(const void *, size_t, size_t, FILE *);
static long long budget = -1;
static long long written = 0;

size_t fwrite(const void *ptr, size_t size, size_t nmemb, FILE *f) {
    if (!real_fwrite) {
        real_fwrite = dlsym(RTLD_NEXT, "fwrite");
        const char *e = getenv("FAIL_AFTER_BYTES");
        budget = e ? atoll(e) : -1;
    }
    if (budget >= 0) {
        long long want = (long long)size * nmemb;
        if (written + want > budget) {
            size_t allowed = budget > written ? (size_t)(budget - written) : 0;
            size_t n = size ? allowed / size : 0;
            written += (long long)n * size;
            if (n) real_fwrite(ptr, size, n, f);
            return n; /* short write */
        }
        written += want;
    }
    return real_fwrite(ptr, size, nmemb, f);
}
"""

_SHORT_WRITE_DRIVER = r"""
import sys
from sbwt_tpu import native

entry, tmp = sys.argv[1], sys.argv[2]
try:
    if entry == "sort_u64":
        native.em_sort_u64_file(f"{tmp}/in.bin", f"{tmp}/out.bin", tmp,
                                ram_bytes=1 << 21, n_threads=2)
    elif entry == "sort_w":
        native.em_sort_records_file(f"{tmp}/in.bin", f"{tmp}/out.bin", tmp,
                                    n_words=2, ram_bytes=1 << 21, n_threads=2)
    elif entry == "dedup_u64":
        native.em_dedup_count_u64_file(f"{tmp}/s.bin", f"{tmp}/out.bin")
    elif entry == "dedup_w":
        native.em_dedup_count_records_file(f"{tmp}/sw.bin", f"{tmp}/out.bin", n_words=2)
    elif entry == "sort_varlen":
        native.em_sort_varlen_file(f"{tmp}/v.bin", f"{tmp}/out.bin", tmp,
                                   ram_bytes=1 << 21, n_threads=2)
    else:
        raise SystemExit(f"unknown entry {entry}")
except RuntimeError:
    print("RAISED")
    raise SystemExit(0)
print("NO ERROR")
raise SystemExit(1)
"""

# (entry, fwrite byte budgets): small budget fails during the spill phase,
# larger budget lets spills succeed and fails inside the merge/output writes
_SHORT_WRITE_CASES = [
    ("sort_u64", (300_000, 2_500_000)),
    ("sort_w", (300_000, 2_500_000)),
    ("dedup_u64", (300_000,)),
    ("dedup_w", (300_000,)),
    ("sort_varlen", (300_000, 2_500_000)),
]


@pytest.mark.parametrize("entry,budgets", _SHORT_WRITE_CASES)
def test_short_write_never_silent(tmp_path, entry, budgets):
    """A disk filling up MID-WRITE (not just an unopenable path) must make
    every sort/dedup entry point raise — a truncated 'sorted' stream with
    rc 0 would construct a *wrong* index downstream.  An LD_PRELOAD shim
    makes fwrite short-write after a byte budget, exercising the fwrite/
    fclose error propagation inside emsort.c (spill workers, k-way merge,
    dedup writers), in a subprocess so the shim can't touch pytest."""
    import subprocess
    import sys

    native.get_lib()  # ensure the .so is built before the shim is active
    shim_src = tmp_path / "fwrite_shim.c"
    shim_so = tmp_path / "fwrite_shim.so"
    shim_src.write_text(_FWRITE_SHIM)
    r = subprocess.run(
        ["cc", "-O2", "-shared", "-fPIC", str(shim_src), "-o", str(shim_so), "-ldl"],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip(f"cannot build shim: {r.stderr.decode()[:200]}")
    driver = tmp_path / "driver.py"
    driver.write_text(_SHORT_WRITE_DRIVER)
    # inputs are written by THIS process (no shim): ~1.6 MB each
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 2**63, size=200000, dtype=np.uint64)
    work = tmp_path / "work"
    work.mkdir()
    arr.tofile(work / "in.bin")
    s = np.sort(arr)
    s.tofile(work / "s.bin")
    np.column_stack([s, s]).astype(np.uint64).tofile(work / "sw.bin")
    with open(work / "v.bin", "wb") as f:
        for i in range(50000):
            payload = bytes([i % 251]) * (i % 37 + 1)
            f.write(len(payload).to_bytes(8, "little") + payload)
    for budget in budgets:
        env = dict(os.environ)
        env["LD_PRELOAD"] = str(shim_so)
        env["FAIL_AFTER_BYTES"] = str(budget)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, str(driver), entry, str(work)],
            capture_output=True, env=env, timeout=120,
        )
        out = r.stdout.decode()
        assert r.returncode == 0 and "RAISED" in out, (
            f"{entry} (budget {budget}): expected RuntimeError under short "
            f"writes; rc={r.returncode} stdout={out!r} "
            f"stderr={r.stderr.decode()[-400:]!r}"
        )


def test_stream_build_codes_native_matches_python(tmp_path):
    """The CLI build's streaming input generator: native reader path and
    pure-Python path must yield identical build-code arrays (lowercase ->
    invalid, per SBWT.hh:426-427)."""
    from sbwt_tpu.io import seqio as sio
    from sbwt_tpu.utils.dna import encode

    rng = np.random.default_rng(13)
    seqs = []
    for _ in range(30):
        s = "".join(rng.choice(list("ACGTacgtN"), p=[0.2, 0.2, 0.2, 0.2, 0.04, 0.04, 0.04, 0.04, 0.04], size=int(rng.integers(10, 200))))
        seqs.append(s)
    fa = str(tmp_path / "mix.fna")
    _write_fasta(fa, seqs)
    got = list(sio.stream_build_codes([fa]))
    want = [encode(s) for s in seqs]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
