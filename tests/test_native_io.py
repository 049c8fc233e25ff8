"""Native C++ batch reader (io/native.py) vs the pure-Python parser.

The native path must be record-for-record identical to seqio.read_fastx
(itself mirroring the reference's embedded readfq,
/root/reference/midas/run/stream_seqs.py:10-41) across FASTQ/FASTA,
gz/plain, trim/cap options, and awkward buffer boundaries.
"""

import gzip
import os

import numpy as np
import pytest

from midas_tpu.io import batch as iob
from midas_tpu.io.native import load_native
from midas_tpu.testkit import simulate_db, simulate_reads

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="native IO unavailable (no g++/zlib)")


def _both(paths, **kw):
    native = list(iob.load_read_batches(paths, **kw))
    os.environ["MIDAS_TPU_NO_NATIVE_IO"] = "1"
    try:
        python = list(iob.load_read_batches(paths, **kw))
    finally:
        del os.environ["MIDAS_TPU_NO_NATIVE_IO"]
    return native, python


def _assert_equal(native, python):
    assert len(native) == len(python)
    for x, y in zip(native, python):
        assert x.names == y.names
        assert x.n_reads == y.n_reads
        assert np.array_equal(x.codes, y.codes)
        assert np.array_equal(x.quals, y.quals)
        assert np.array_equal(x.lengths, y.lengths)
        assert np.allclose(x.mean_qual, y.mean_qual)


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nio")
    comm = simulate_db(str(tmp / "db"), n_species=2, seed=0)
    fq = str(tmp / "r.fq.gz")
    simulate_reads(comm, fq, n_reads=3000, read_len=100,
                   error_rate=0.01, seed=1)
    return tmp, fq


@pytest.mark.parametrize("kw", [
    {}, {"max_reads": 700}, {"read_length": 100}, {"read_length": 101},
    {"batch_size": 17},
])
def test_fastq_gz_matches_python(sim, kw):
    _, fq = sim
    args = dict(batch_size=256, max_len=128)
    args.update(kw)
    _assert_equal(*_both(fq, **args))


def test_fasta_multiline_and_multifile(sim, tmp_path):
    _, fq = sim
    fa = tmp_path / "mix.fa"
    fa.write_text(">r1 desc ignored\nACGTACGT\nACGT\n"
                  ">r2\nnnnnACGT\n"
                  ">empty\n"
                  ">r3\nACGT\n")
    native, python = _both([str(fa), fq], batch_size=100, max_len=128)
    _assert_equal(native, python)
    assert native[0].names[:3] == ["r1", "r2", "empty"]
    assert native[0].lengths[0] == 12
    # FASTA reads get the phred-40 fill (seqio.qual_to_phred)
    assert native[0].quals[0, 0] == 40
    # N bases encode to the sentinel 4
    assert native[0].codes[1, 0] == 4


def test_truncated_fastq_degrades_to_qualless(tmp_path):
    # readfq yields (name, seq, None) for a final record with missing
    # quals (stream_seqs.py:38-41); both parsers must agree
    p = tmp_path / "trunc.fq"
    p.write_text("@a\nACGT\n+\nIIII\n@b\nACGT\n+\nII")
    native, python = _both(str(p), batch_size=8, max_len=16)
    _assert_equal(native, python)
    assert native[0].n_reads == 2


def test_plain_uncompressed(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@a\nACGT\n+\nIIII\n@b\nGGCC\n+\n!!!!\n")
    native, python = _both(str(p), batch_size=4, max_len=8)
    _assert_equal(native, python)
    assert native[0].quals[1, 0] == 0  # '!' = phred 0


def test_names_buffer_growth(tmp_path):
    # very long read names force the names-overflow retry path
    p = tmp_path / "long.fq"
    with open(p, "w") as f:
        for i in range(600):
            f.write(f"@{'x' * 900}_{i}\nACGT\n+\nIIII\n")
    native, python = _both(str(p), batch_size=512, max_len=8)
    _assert_equal(native, python)
    assert sum(b.n_reads for b in native) == 600


def test_giant_first_name_not_dropped(tmp_path):
    # regression: a first-record name larger than the whole names buffer
    # used to be parsed, then dropped on the grow-and-retry (-2) path
    p = tmp_path / "giant.fq"
    p.write_text(f"@{'y' * 2000}\nACGT\n+\nIIII\n@b\nGGCC\n+\nIIII\n")
    native, python = _both(str(p), batch_size=4, max_len=8)
    _assert_equal(native, python)
    assert sum(b.n_reads for b in native) == 2
    assert native[0].names[0] == "y" * 2000


def test_crlf_input_matches_python(tmp_path):
    # CRLF (Windows) line endings: text-mode Python strips them via
    # universal newlines; the native reader must strip the '\r' too
    p = tmp_path / "crlf.fq"
    p.write_bytes(b"@a\r\nACGT\r\n+\r\nIIII\r\n@b\r\nGGCC\r\n+\r\nJJJJ\r\n")
    native, python = _both(str(p), batch_size=4, max_len=8)
    _assert_equal(native, python)
    assert native[0].lengths[0] == 4
    assert native[0].codes[0, 3] == 3  # 'T', not a '\r' sentinel


def test_no_trailing_newline_keeps_last_base(tmp_path):
    # contract: the full final line is kept (explicit newline strip),
    # unlike readfq's blind line[:-1]
    p = tmp_path / "nonl.fa"
    with open(p, "w") as f:
        f.write(">a\nACGT")  # no trailing newline
    native, python = _both(str(p), batch_size=2, max_len=8)
    _assert_equal(native, python)
    assert native[0].lengths[0] == 4


def test_corrupt_gzip_raises(tmp_path):
    # a damaged .gz must raise, not silently truncate the read set
    good = tmp_path / "good.fq.gz"
    with gzip.open(good, "wt") as f:
        for i in range(200):
            f.write(f"@r{i}\nACGTACGTACGT\n+\nIIIIIIIIIIII\n")
    data = good.read_bytes()
    bad = tmp_path / "bad.fq.gz"
    bad.write_bytes(data[: len(data) // 2] + b"\x00garbage\x00" * 20)
    with pytest.raises(Exception):
        list(iob.load_read_batches(str(bad), batch_size=64, max_len=16))
