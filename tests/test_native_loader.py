"""Native C++ FASTQ loader vs the Python reader."""

import numpy as np
import pytest

from fastquick_tpu.align.seqs import FastqReader, read_batch
from fastquick_tpu.native import get_lib

EXAMPLE = "/root/reference/example/ERR013170_1.filt.fastq.gz.1000.fastq.gz"


@pytest.fixture(scope="module")
def lib():
    l = get_lib()
    if l is None:
        pytest.skip("no native toolchain")
    return l


def test_native_matches_python_reader(lib, tmp_path):
    from fastquick_tpu.align.seqs import NativeFastqReader

    nat = NativeFastqReader(EXAMPLE, None, 0, 0)
    got = nat.read_batch(1000, True)
    nat.close()

    ref_reader = FastqReader(EXAMPLE)
    want = read_batch(ref_reader, None, 1000, 0x03, 0, 1.0, 0)
    ref_reader.close()

    assert len(got) == len(want) == 251
    for g, w in zip(got, want):
        assert g.name == w.name
        assert g.len == w.len
        assert g.full_len == w.full_len
        np.testing.assert_array_equal(g.seq, w.seq)
        np.testing.assert_array_equal(g.rseq, w.rseq)
        np.testing.assert_array_equal(g.qual, w.qual)


def test_native_trimming(lib, tmp_path):
    from fastquick_tpu.align.seqs import NativeFastqReader

    p = tmp_path / "t.fastq"
    # 40bp read with terrible tail quality
    seq = "ACGT" * 10
    qual = "I" * 35 + "#####"
    p.write_text(f"@r1/1\n{seq}\n+\n{qual}\n")
    nat = NativeFastqReader(str(p), None, 15, 0)
    got = nat.read_batch(10, True)
    nat.close()

    ref_reader = FastqReader(str(p))
    want = read_batch(ref_reader, None, 10, 0x03, 15, 1.0, 0)
    assert got[0].len == want[0].len < 40
    assert got[0].name == "r1"


def test_native_filter_matches_python(lib, tmp_path):
    from fastquick_tpu.align.seqs import NativeFastqReader
    from fastquick_tpu.index.kmerfilter import KmerFilterBuilder

    rng = np.random.default_rng(0)
    flank = 260
    contig = "".join("ACGT"[c] for c in rng.integers(0, 4, 2 * flank + 1))
    b = KmerFilterBuilder()
    b.add_seq(contig, ("A", "C"))
    filt = b.finalize()

    p = tmp_path / "f.fastq"
    lines = []
    # read from the contig (kept) and junk (filtered)
    lines.append(f"@match\n{contig[5:141]}\n+\n{'I' * 136}\n")
    junk = "".join("ACGT"[c] for c in rng.integers(0, 4, 136))
    lines.append(f"@junk\n{junk}\n+\n{'I' * 136}\n")
    p.write_text("".join(lines))

    nat = NativeFastqReader(str(p), filt, 0, 3)
    got = nat.read_batch(10, True)
    nat.close()
    assert not got[0].filtered
    assert got[1].filtered
