"""BGZF + tabix tests: files written by utils/bgzf must be valid multi-member
gzip streams (readable by Python's gzip module, like the reference's bgzip
outputs) and the .tbi index must resolve region queries identically to a
plain full-file scan (the reference shells out to htslib's bgzip/tabix,
modules/single_group/4_generate_single_group_bed_files.nf:24-30)."""

import gzip

import numpy as np

from hygeia_tpu.utils.bgzf import BgzfReader, BgzfWriter, compress_file
from hygeia_tpu.utils.tabix import TabixFile, build_index


def test_bgzf_roundtrip_multiblock(tmp_path):
    # >64 KiB of uncompressible-ish text forces multiple BGZF blocks.
    rng = np.random.default_rng(0)
    lines = [
        f"line{i}\t{rng.integers(1 << 30)}\t{'x' * int(rng.integers(5, 80))}"
        for i in range(5000)
    ]
    payload = ("\n".join(lines) + "\n").encode()
    path = tmp_path / "t.txt"
    path.write_bytes(payload)

    gz = compress_file(str(path))
    # Plain gzip readability (multi-member stream).
    assert gzip.open(gz, "rb").read() == payload
    # Block-hopping reader sees the same lines.
    with BgzfReader(gz) as r:
        got = list(r.read_from(0))
    assert got == [ln.encode() for ln in lines]


def test_bgzf_writer_block_boundaries(tmp_path):
    path = tmp_path / "w.gz"
    with BgzfWriter(str(path)) as w:
        v0 = w.tell_virtual()
        w.write(b"a" * 100_000)  # crosses the 0xFF00 block budget
        v1 = w.tell_virtual()
    assert v0 == 0 and v1 > 0
    assert gzip.open(path, "rb").read() == b"a" * 100_000


def test_tabix_query_matches_plain_scan(tmp_path):
    rng = np.random.default_rng(7)
    # Sorted BED records across two chromosomes, incl. long intervals that
    # land in coarser bins.
    recs = []
    for chrom in ("chr1", "chr2"):
        starts = np.sort(rng.choice(2_000_000, size=3000, replace=False))
        for s in starts:
            e = int(s) + int(rng.choice([2, 150, 20_000]))
            recs.append((chrom, int(s), e, f"{chrom}_{s}"))
    bed = tmp_path / "q.bed"
    with open(bed, "w") as f:
        for r in recs:
            f.write("\t".join(map(str, r)) + "\n")
    gz = compress_file(str(bed))
    tbi = build_index(gz)
    assert tbi.endswith(".tbi")

    tf = TabixFile(gz)
    for chrom, beg, end in [
        ("chr1", 0, 10_000),
        ("chr1", 500_000, 501_000),
        ("chr2", 1_999_000, 2_100_000),
        ("chr2", 123_456, 123_457),
        ("chr1", 2_500_000, 2_600_000),  # beyond the last record
    ]:
        got = {ln.split("\t")[3] for ln in tf.query(chrom, beg, end)}
        want = {
            name
            for c, s, e, name in recs
            if c == chrom and s < end and e > beg
        }
        assert got == want, (chrom, beg, end, len(got), len(want))
