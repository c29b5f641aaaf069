"""Run the REFERENCE implementation itself as a parity oracle.

The reference (/root/reference, WGLab/NanoMod) is Python 2.7 and cannot run
in this image directly — so this helper translates the needed reference
modules with lib2to3 AT TEST TIME into a temp dir (nothing derived from the
reference is ever committed to this repo), stubs its rpy2 surface, pins the
scipy-1.2.1 statistical semantics it was written against (today's scipy
changed mannwhitneyu/ks_2samp defaults), and exposes its detect entry
points.  tests/test_reference_parity.py then byte-compares our engine's
_sign_test.txt against the file written by the reference's own
mfilter_coverage + mtest2 + save_test on identical observations —
grounding BASELINE configs 1/4 in actual reference code rather than an
in-repo re-derivation.
"""

from __future__ import annotations

import os
import sys
import types
import warnings

REF_SCRIPTS = "/root/reference/bin/scripts"


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REF_SCRIPTS, "myDetect.py"))


def _translate(src_path: str, dst_path: str) -> None:
    """Python2 -> Python3 via lib2to3 (print, has_key, dict views, ...)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from lib2to3.refactor import RefactoringTool, get_fixers_from_package
        tool = RefactoringTool(get_fixers_from_package("lib2to3.fixes"))
    with open(src_path) as f:
        src = f.read()
    if not src.endswith("\n"):
        src += "\n"
    tree = tool.refactor_string(src, os.path.basename(src_path))
    with open(dst_path, "w") as f:
        f.write(str(tree))


def _stub_rpy2():
    """The reference imports rpy2 and pkg_resources at module scope;
    detect's statistical path never touches them (plots are gated behind
    mboxplot)."""
    if "pkg_resources" not in sys.modules:
        pr = types.ModuleType("pkg_resources")
        pr.resource_string = lambda *a, **k: b""
        sys.modules["pkg_resources"] = pr
    if "rpy2" in sys.modules:
        return
    rpy2 = types.ModuleType("rpy2")
    robjects = types.ModuleType("rpy2.robjects")
    packages = types.ModuleType("rpy2.robjects.packages")
    robjects.r = None
    robjects.FloatVector = list
    robjects.StrVector = list
    packages.importr = lambda *a, **k: None
    rpy2.robjects = robjects
    robjects.packages = packages
    sys.modules["rpy2"] = rpy2
    sys.modules["rpy2.robjects"] = robjects
    sys.modules["rpy2.robjects.packages"] = packages


def load_reference_detect(tmpdir: str):
    """Translate + import the reference's myDetect (with myCom/myFast5),
    its scipy calls re-pinned to the 1.2.1 semantics the reference was
    developed against (the same replicas that generate the golden
    fixtures, tests/golden/make_golden.py)."""
    moddir = os.path.join(tmpdir, "refmods")
    os.makedirs(moddir, exist_ok=True)
    for name in ("myCom.py", "myFast5.py", "myDetect.py"):
        _translate(os.path.join(REF_SCRIPTS, name),
                   os.path.join(moddir, name))
    _stub_rpy2()
    sys.path.insert(0, moddir)
    try:
        for name in ("myCom", "myFast5", "myDetect"):
            sys.modules.pop(name, None)
        import myDetect  # noqa: F401  (the translated module)
    finally:
        sys.path.remove(moddir)

    # scipy-1.2.1 semantics (today's mannwhitneyu defaults to two-sided
    # exact-capable mode; 1.2.1 was one-sided asymptotic w/ continuity)
    from make_golden_shim import ks_2samp_121, mwu_121_scipy_like
    myDetect.mannwhitneyu = mwu_121_scipy_like
    myDetect.ks_2samp = ks_2samp_121
    return myDetect


def load_reference_annotate(tmpdir: str):
    """Translate + import the reference's resquiggle/annotation module for
    driving its pure-algorithm correction core (fix_repeat_del,
    group_indel, annotate1/find_sp) directly — the alignment/subprocess
    parts are never called."""
    moddir = os.path.join(tmpdir, "refmods_ann")
    os.makedirs(moddir, exist_ok=True)
    for name in ("myCom.py", "myFast5.py", "myRefBaseSignalAnnotation.py"):
        _translate(os.path.join(REF_SCRIPTS, name),
                   os.path.join(moddir, name))
    _stub_rpy2()
    sys.path.insert(0, moddir)
    try:
        for name in ("myCom", "myFast5", "myRefBaseSignalAnnotation"):
            sys.modules.pop(name, None)
        import myRefBaseSignalAnnotation  # noqa: F401
    finally:
        sys.path.remove(moddir)
    return myRefBaseSignalAnnotation


def run_reference_annotate(refmod, refb, readb, ev_start, ev_len, strand,
                           raw, min_num_signal=4, reseg_wind=4):
    """Drive the reference's correction core exactly as handle_record does
    (ref myRefBaseSignalAnnotation.py:631-671): fix_repeat_del ->
    group_indel -> annotate1.

    Inputs are genome-forward (this engine's convention); m_event is
    converted to the reference's READ order ('-' strands negative-index it,
    ref :1098-1105).  base_map_info uses '<U1' (not the reference's 'S1'):
    the translated py3 code compares elements against str literals, and
    py2's bytes==str is py3's str==str.  Returns (annotate_info dict,
    signalnum dict, mutated readbase)."""
    import numpy as np

    n = len(refb)
    base_map_info = np.zeros(
        n, dtype=[("refbase", "<U1"), ("readbase", "<U1")])
    base_map_info["refbase"] = refb
    base_map_info["readbase"] = readb
    g_start = np.asarray(ev_start, np.uint64)
    g_len = np.asarray(ev_len, np.uint64)
    if strand == "-":
        g_start, g_len = g_start[::-1], g_len[::-1]
    # model_state as '<U5' (not the on-disk 'S5'): annotate1 has an ungated
    # debug identity check on model_state[...][2] (ref :782,802) whose
    # py2 bytes==str semantics only survive translation with str elements.
    # Center each k-mer on the event's read-space base so the check passes.
    rb_f = np.asarray(readb)[np.isin(np.asarray(readb),
                                     list("ACGTacgtNn"))]
    if strand == "-":
        comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
        read_bases = [comp.get(b.upper(), "N") for b in rb_f[::-1]]
    else:
        read_bases = list(rb_f)
    m_event = np.zeros(len(g_start), dtype=[
        ("mean", "<f4"), ("stdv", "<f4"), ("start", "<u8"),
        ("length", "<u8"), ("model_state", "<U5")])
    m_event["start"] = g_start
    m_event["length"] = g_len
    m_event["model_state"] = ["NN" + b + "NN" for b in read_bases]

    moptions = {"outLevel": 2, "MinNumSignal": min_num_signal,
                "Resegment_signal_wind": reseg_wind}
    sp_param = {"f5status": ""}
    indel_pos = refmod.fix_repeat_del(base_map_info, moptions, sp_param,
                                      "oracle.fast5")
    group_indel_pos = refmod.group_indel(indel_pos, m_event, base_map_info,
                                         strand, moptions, sp_param)
    ann, signalnum = refmod.annotate1(
        group_indel_pos, m_event, base_map_info, strand,
        np.asarray(raw, np.float64), "oracle.fast5", moptions, sp_param)
    return dict(ann), dict(signalnum), base_map_info["readbase"].copy()


def default_moptions(out_folder: str, file_id: str = "ref", **over):
    """The moptions fields detect's statistical path reads, at the CLI
    defaults (ref bin/NanoMod.py:40-97,344-366)."""
    m = {
        "outLevel": 2,                  # OUTPUT_WARNING: quiet
        "testMethod": "stouffer",
        "neighborPvalues": 2,
        "WeightsDif": 2.0,
        "coverages": [0, 0],            # per-strand caps; 0 = uncapped
        "downsampling": 100,
        "downsampling_quantile": 0.25,
        "MinCoverage": 5,
        "mstd": 0,
        "rankUse": "pv",
        "RegionRankbyST": 0,
        "window": 10,
        "WindOvlp": 0,
        "percentile": 0.1,
        "SaveTest": 1,
        "outFolder": out_folder,
        "FileID": file_id,
        "ds2": ["g1", "g2"],
    }
    m.update(over)
    return m


def feed_observations(moptions, group: str, obs):
    """Fill moptions[group] the way mReadSignalBase accumulates it
    (ref myDetect.py:122-124): obs maps (chrom, strand) -> {pos: (values,
    base)}; values are fed in ascending order (this engine's canonical
    in-position order) so order-sensitive float summations agree."""
    import numpy as np
    from collections import defaultdict

    g = {"norm_mean": defaultdict(dict), "base": defaultdict(dict),
         "basedict": defaultdict(dict)}
    for key, posmap in obs.items():
        for pos, (values, base) in posmap.items():
            g["norm_mean"][key][pos] = [float(v) for v in
                                        np.sort(np.asarray(values))]
            g["base"][key][pos] = base
            g["basedict"][key][pos] = {base: len(values)}
    moptions[group] = g


def run_reference_detect(myDetect, moptions):
    """mfilter_coverage + mtest2 (which calls save_test) on pre-fed
    observations; returns the _sign_test.txt path."""
    os.makedirs(moptions["outFolder"], exist_ok=True)
    myDetect.mfilter_coverage(moptions)
    myDetect.mtest2(moptions)
    return os.path.join(moptions["outFolder"],
                        moptions["FileID"] + "_sign_test.txt")
