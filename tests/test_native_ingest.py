"""Parity tests: native C++ FAST5/HDF5 parser vs the h5py read path.

The native parser (native/fast5_ingest.cpp) re-implements HDF5 reading from
scratch for the detect ingest hot path (ref myDetect.py:547-633 walks files
one at a time through h5py); these tests assert bit-identical results over
the HDF5 feature matrix h5py can produce (object-header v1/v2, chunk
indexing v1-btree / single-chunk / fixed-array, deflate + shuffle filters,
contiguous layout, both strands)."""

import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from nanomod_tpu.io.fast5 import CORRECTED_EVENTS_DTYPE, read_corrected_events
from nanomod_tpu.native.fast5_bind import (native_ingest_available,
                                           read_corrected_batch)

pytestmark = pytest.mark.skipif(not native_ingest_available(),
                                reason="no C++ toolchain")


def _write(path, n, rng, libver=None, compression="gzip", shuffle=False,
           chunks=None, strand="+", chrom="spel"):
    ev = np.zeros(n, dtype=CORRECTED_EVENTS_DTYPE)
    ev["norm_mean"] = rng.normal(0, 1, n)
    ev["norm_stdev"] = rng.random(n)
    ev["start"] = np.arange(n, dtype=np.uint32) * 5
    ev["length"] = rng.integers(1, 30, n)
    ev["base"] = rng.choice([b"A", b"C", b"G", b"T"], n)
    kw = {"libver": libver} if libver else {}
    with h5py.File(path, "w", **kw) as f:
        g = f.create_group("Analyses/NanomoCorrected_000/BaseCalled_template")
        al = g.create_group("Alignment")
        al.attrs["mapped_chrom"] = chrom
        al.attrs["mapped_start"] = 123456789
        al.attrs["mapped_strand"] = strand
        dkw = {}
        if compression:
            dkw["compression"] = compression
        if shuffle:
            dkw["shuffle"] = True
        if chunks:
            dkw["chunks"] = chunks
        g.create_dataset("Events", data=ev, **dkw)


CASES = {
    "earliest_gzip": dict(),
    "v2_headers": dict(libver="latest"),
    "v2_fixed_array": dict(libver="latest", chunks=(64,)),
    "shuffle_filter": dict(shuffle=True),
    "contiguous": dict(compression=None),
    "multichunk_btree": dict(chunks=(37,)),
    "neg_strand": dict(strand="-"),
    "long_chrom": dict(chrom="a_very_long_chromosome_name_abcdef_012345"),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_native_matches_h5py(tmp_path, case):
    rng = np.random.default_rng(hash(case) % 2**32)
    p = str(tmp_path / f"{case}.fast5")
    _write(p, 500, rng, **CASES[case])
    ref = read_corrected_events(p)
    got = read_corrected_batch([p])[0]
    assert got is not None
    assert got.chrom == ref.chrom
    assert got.start == ref.start
    assert got.strand == ref.strand
    np.testing.assert_array_equal(got.norm_mean, ref.norm_mean)
    np.testing.assert_array_equal(got.norm_stdev, ref.norm_stdev)
    np.testing.assert_array_equal(got.ev_start, ref.ev_start)
    np.testing.assert_array_equal(got.ev_length, ref.ev_length)
    np.testing.assert_array_equal(got.base, ref.base)


def test_batch_tolerates_bad_files(tmp_path):
    """Missing files / non-HDF5 files / files without the corrected group
    yield None (matching read_corrected_events, ref myDetect.py:41-45)."""
    rng = np.random.default_rng(0)
    good = str(tmp_path / "good.fast5")
    _write(good, 100, rng)
    garbage = str(tmp_path / "garbage.fast5")
    with open(garbage, "wb") as f:
        f.write(b"\x00" * 100)
    empty = str(tmp_path / "empty.fast5")
    with h5py.File(empty, "w"):
        pass
    missing = str(tmp_path / "missing.fast5")

    res = read_corrected_batch([garbage, good, empty, missing])
    assert res[0] is None
    assert res[1] is not None and len(res[1].norm_mean) == 100
    assert res[2] is None
    assert res[3] is None


def test_detect_ingest_uses_native(tmp_path, monkeypatch):
    """ingest_group produces identical pools via native and h5py paths."""
    import dataclasses
    from nanomod_tpu.config import DetectConfig
    from nanomod_tpu.detect import ingest_group
    rng = np.random.default_rng(5)
    for i in range(6):
        _write(str(tmp_path / f"r{i}.fast5"), 200, rng,
               strand="+-"[i % 2])
    cfg = DetectConfig(wrk_base1=str(tmp_path), wrk_base2=str(tmp_path),
                       out_folder=str(tmp_path), min_lr=0)
    pools_native = ingest_group(str(tmp_path), cfg)
    cfg2 = dataclasses.replace(cfg, native_ingest=False)
    pools_h5py = ingest_group(str(tmp_path), cfg2)
    assert set(pools_native) == set(pools_h5py)
    for k in pools_native:
        np.testing.assert_array_equal(pools_native[k].positions,
                                      pools_h5py[k].positions)
        np.testing.assert_array_equal(pools_native[k].counts,
                                      pools_h5py[k].counts)
        np.testing.assert_array_equal(pools_native[k].values,
                                      pools_h5py[k].values)


def test_native_raw_prepare_matches_python(tmp_path):
    """The C++ raw-read prepare (parse + event extraction + MAD normalize)
    must reproduce the Python specification bit-for-bit."""
    import numpy as np

    from fixtures import make_genome, make_raw_dataset
    from nanomod_tpu.io.fast5 import read_raw_basecall
    from nanomod_tpu.native.prepare_bind import native_prepare_batch
    from nanomod_tpu.signal.events import extract_events
    from nanomod_tpu.signal.normalize import mad_normalize

    chrom, genome = make_genome(length=1200, seed=5)
    rd_dir = str(tmp_path / "reads")
    make_raw_dataset(rd_dir, chrom, genome, n_reads=10, seed=6,
                     read_len=900, error_rate=0.03)
    paths = sorted(os.path.join(rd_dir, f) for f in os.listdir(rd_dir))
    res = native_prepare_batch(paths, "Basecall_1D_000",
                               "BaseCalled_template", 2)
    if res is None:
        pytest.skip("no C++ toolchain")
    for p, r in zip(paths, res):
        raw, err = read_raw_basecall(p)
        assert raw is not None, err
        ev = extract_events(raw)
        span = (int(ev.start[0]), int(ev.start[-1] + ev.length[-1]))
        norm = mad_normalize(raw.raw_signal, span, None)
        assert not isinstance(r, (str, type(None))), (p, r)
        assert r.read_id == raw.read_id
        assert r.seq == ev.seq
        np.testing.assert_array_equal(r.ev_start, ev.start.astype(np.int64))
        np.testing.assert_array_equal(r.ev_length, ev.length.astype(np.int64))
        np.testing.assert_array_equal(r.norm_signal, norm)


def test_native_raw_prepare_error_taxonomy(tmp_path):
    """Broken FAST5s map to the reference's error keys or fall back."""
    from nanomod_tpu.native.prepare_bind import native_prepare_batch

    import h5py
    # missing fastq
    p1 = str(tmp_path / "nofq.fast5")
    with h5py.File(p1, "w") as f:
        f.create_group("UniqueGlobalKey/channel_id").attrs["sampling_rate"] = 4000.0
        g = f.create_group("Raw/Reads/Read_0")
        g.attrs["start_time"] = 0
        g.create_dataset("Signal", data=np.zeros(10, np.int16))
    # not an HDF5 file
    p2 = str(tmp_path / "junk.fast5")
    with open(p2, "wb") as f:
        f.write(b"not hdf5 at all")
    # missing entirely
    p3 = str(tmp_path / "missing.fast5")
    res = native_prepare_batch([p1, p2, p3], "Basecall_1D_000",
                               "BaseCalled_template", 1)
    if res is None:
        pytest.skip("no C++ toolchain")
    assert res[0] == "No Fastq data"
    assert res[1] is None           # unclassified -> python fallback
    assert res[2] == "Cannot open fast5"
