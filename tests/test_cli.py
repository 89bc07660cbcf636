"""Golden end-to-end CLI test.

Replicates the reference's end_to_end_build_and_query test
(tests/test_CLI.hh:20-113) byte for byte: the same gzipped multi-file
inputs, k=6, reverse complements, precalc 4; the expected output string is
the hard-coded vector from test_CLI.hh:90 — agreement proves
cross-implementation output parity with the C++ `sbwt` tool.
"""
import gzip

import pytest

from sbwt_tpu.cli import main as cli_main
from sbwt_tpu.io.seqio import SequenceWriter

SEQS1 = ["ACTAGTGTAGCTACAAA", "ATGTGCTGATGCTAGCATTTTTTT"]
SEQS2 = ["GTGTACTAGTGTGTAGTCGAT"]
QUERIES = [
    "GGAGAACTAGTGTAGCTACAAAGAGAG",
    "AGTGTGTAGCAAAATGTGCTGATGCTAGCAAAAAAAA",
    "CTCTACACACTTC",
]
GOLDEN = (
    "-1 -1 -1 -1 -1 74 55 77 22 47 36 70 19 31 8 4 3 -1 -1 -1 -1 -1 \n"
    "57 78 23 47 36 -1 -1 -1 -1 -1 52 -1 -1 39 73 54 15 65 53 38 72 20 46 35 11 -1 -1 -1 -1 2 2 2 \n"
    "-1 -1 26 5 25 66 -1 -1 \n"
)


@pytest.fixture(scope="module")
def index_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    f1 = tmp / "seqs1.fna.gz"
    f2 = tmp / "seqs2.fna.gz"
    with SequenceWriter(str(f1)) as w:
        for s in SEQS1:
            w.write_sequence(s)
    with SequenceWriter(str(f2)) as w:
        for s in SEQS2:
            w.write_sequence(s)
    listfile = tmp / "inputs.txt"
    listfile.write_text(f"{f1}\n{f2}\n")
    index = tmp / "index.sbwt"
    rc = cli_main(
        [
            "build",
            "-i", str(listfile),
            "-o", str(index),
            "-k", "6",
            "--add-reverse-complements",
            "--temp-dir", str(tmp),
            "--precalc-length", "4",
        ]
    )
    assert rc == 0
    return index


def _write_queries(tmp):
    files = {
        "q1.fq": False, "q2.fna": False, "q3.fq.gz": True, "q4.fna.gz": True,
    }
    paths = []
    for name in files:
        path = tmp / name
        with SequenceWriter(str(path)) as w:
            for s in QUERIES:
                w.write_sequence(s)
        paths.append(path)
    return paths


def test_end_to_end_build_and_query(index_file, tmp_path):
    qpaths = _write_queries(tmp_path)
    opaths = [tmp_path / f"o{i}.txt" for i in range(4)]
    qlist = tmp_path / "queries.txt"
    olist = tmp_path / "outputs.txt"
    qlist.write_text("".join(f"{p}\n" for p in qpaths))
    olist.write_text("".join(f"{p}\n" for p in opaths))

    rc = cli_main(["search", "-o", str(olist), "-i", str(index_file), "-q", str(qlist)])
    assert rc == 0
    outputs = [p.read_text() for p in opaths]
    assert outputs[0] == GOLDEN
    assert outputs[1] == GOLDEN
    assert outputs[2] == GOLDEN
    assert outputs[3] == GOLDEN


def test_end_to_end_gzip_output(index_file, tmp_path):
    qpaths = _write_queries(tmp_path)
    opaths = [tmp_path / f"o{i}.txt.gz" for i in range(4)]
    qlist = tmp_path / "queries.txt"
    olist = tmp_path / "outputs.txt"
    qlist.write_text("".join(f"{p}\n" for p in qpaths))
    olist.write_text("".join(f"{p}\n" for p in opaths))

    rc = cli_main(
        ["search", "-o", str(olist), "-i", str(index_file), "-q", str(qlist), "--gzip-output"]
    )
    assert rc == 0
    for p in opaths:
        assert gzip.open(p, "rt").read() == GOLDEN


def test_ascii_export_cli(index_file, tmp_path):
    out = tmp_path / "export.txt"
    rc = cli_main(["ascii-export", "-i", str(index_file), "-o", str(out)])
    assert rc == 0
    text = out.read_text()
    assert text.startswith("version: v0.1\nk: 6\n")
    assert "number_of_sets:" in text


def test_build_variant_cli(index_file, tmp_path):
    out = tmp_path / "variant.sbwt"
    rc = cli_main(
        ["build-variant", "-i", str(index_file), "-o", str(out), "--variant", "plain-split"]
    )
    assert rc == 0
    from sbwt_tpu.io.serialize import load

    v = load(str(out))
    assert v.variant == "plain-split"
    ref = load(str(index_file))
    assert v.number_of_kmers() == ref.number_of_kmers()
    assert v.search(QUERIES[0][5:11]) == ref.search(QUERIES[0][5:11])
