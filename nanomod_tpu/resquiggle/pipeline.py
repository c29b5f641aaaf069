"""The Annotate pipeline: raw FAST5 -> indel-corrected per-base annotation.

TPU-native rebuild of ``correctAndAnnotate``
(ref bin/scripts/myRefBaseSignalAnnotation.py:393-460): instead of shelling
out to bwa/minimap2 and walking SAM CIGARs per base in Python, reads are
k-mer seeded (resquiggle/seed.py) and aligned by a batched banded affine DP
on device (resquiggle/banded.py); the indel-correction core
(resquiggle/annotate.py) then reassigns raw-signal segments to reference
bases and the result is written back into each FAST5
(NanomoCorrected_000, io/fast5.py).
"""

from __future__ import annotations

import os
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from nanomod_tpu.config import AnnotateConfig
from nanomod_tpu.io.fast5 import (CORRECTED_EVENTS_DTYPE, iter_fast5_files,
                                  read_raw_basecall, write_corrected_events)
from nanomod_tpu.io.fasta import FastaIndex, complement
from nanomod_tpu.resquiggle import annotate as ann_mod
from nanomod_tpu.resquiggle.annotate import Columns, GenomeEvents
from nanomod_tpu.resquiggle.banded import banded_sw, traceback
from nanomod_tpu.resquiggle.seed import SeedIndex, encode
from nanomod_tpu.signal.events import EventError, extract_events
from nanomod_tpu.signal.normalize import (kmer_shift_scale, load_kmer_model,
                                          mad_normalize)


@dataclass
class PreparedRead:
    path: str
    read_id: str
    fwd_seq: str            # genome-forward-oriented basecall
    chrom: str
    strand: str
    diag: int               # approximate genome start of the fwd read
    events_start: np.ndarray   # read-order raw starts (samples)
    events_length: np.ndarray
    norm_signal: np.ndarray    # normalized raw signal


def _length_bucket(m: int, buckets=(256, 512, 1024, 2048, 4096, 8192, 16384)) -> int:
    for b in buckets:
        if m <= b:
            return b
    return ((m + 16383) // 16384) * 16384


def prepare_read(path: str, cfg: AnnotateConfig, seed_index: SeedIndex,
                 kmer_model) -> Tuple[Optional[PreparedRead], str]:
    """Load + extract events + normalize + seed one read.

    Error keys follow the reference taxonomy
    (ref myRefBaseSignalAnnotation.py:45-48 raiseError call sites).
    """
    raw, err = read_raw_basecall(path, cfg.basecall_1d, cfg.basecall_2strand)
    if raw is None:
        return None, err
    try:
        ev = extract_events(raw)
    except EventError as e:
        return None, e.key

    shift_scale = None
    if kmer_model is not None and raw.events is not None:
        try:
            shift_scale = kmer_shift_scale(
                raw.events["mean"], raw.events["model_state"], kmer_model
            )
        except (KeyError, np.linalg.LinAlgError):
            return None, "Cannot nanopore correction"

    span = (int(ev.start[0]), int(ev.start[-1] + ev.length[-1]))
    if span[1] > len(raw.raw_signal):
        return None, "No Raw_reads/Signal"
    norm = mad_normalize(raw.raw_signal, span, shift_scale)

    hit = seed_index.best_band(ev.seq)
    if hit is None or hit.votes < 3:
        return None, "Not in alignment sam"

    from nanomod_tpu.io.fasta import revcomp
    fwd_seq = ev.seq if hit.strand == "+" else revcomp(ev.seq)
    return PreparedRead(
        path=path, read_id=raw.read_id, fwd_seq=fwd_seq, chrom=hit.chrom,
        strand=hit.strand, diag=hit.diag, events_start=ev.start,
        events_length=ev.length, norm_signal=norm,
    ), ""


def align_batch(reads: List[PreparedRead], fasta: FastaIndex,
                cfg: AnnotateConfig):
    """Banded-DP align a length-bucketed batch; returns per-read traceback
    ops (or None for failed alignments)."""
    if not reads:
        return []
    from nanomod_tpu.platform import pallas_supported
    use_pallas = cfg.use_pallas_dp and pallas_supported()
    w = cfg.band_width
    m = _length_bucket(max(len(r.fwd_seq) for r in reads))
    bsz = len(reads)
    if use_pallas:
        bsz = ((bsz + 7) // 8) * 8         # pallas kernel: 8 reads/program
    read_codes = np.full((bsz, m), 4, np.uint8)
    ref_codes = np.full((bsz, m + w), 5, np.uint8)
    lens = np.zeros(bsz, np.int32)
    win_starts = np.zeros(bsz, np.int64)
    for i, r in enumerate(reads):
        seq = r.fwd_seq
        lens[i] = len(seq)
        read_codes[i, : len(seq)] = encode(seq).astype(np.uint8)
        genome = fasta.get(r.chrom)
        ws = r.diag - w // 2
        win_starts[i] = ws
        lo = max(ws, 0)
        hi = min(ws + m + w, len(genome))
        if hi > lo:
            ref_codes[i, lo - ws: hi - ws] = encode(genome[lo:hi]).astype(np.uint8)

    if use_pallas:
        from nanomod_tpu.resquiggle.banded_pallas import banded_sw_pallas
        tb, best, bi, bk = banded_sw_pallas(
            read_codes, ref_codes, lens,
            match=cfg.match_score, mismatch=cfg.mismatch_score,
            go=cfg.gap_open, ge=cfg.gap_extend,
        )
    else:
        tb, best, bi, bk = banded_sw(
            read_codes, ref_codes, lens,
            match=cfg.match_score, mismatch=cfg.mismatch_score,
            go=cfg.gap_open, ge=cfg.gap_extend,
        )
    tb = np.asarray(tb)
    best = np.asarray(best)
    bi = np.asarray(bi)
    bk = np.asarray(bk)

    from nanomod_tpu.resquiggle.banded import traceback_native
    out = []
    for i, r in enumerate(reads):
        min_score = max(20, int(0.3 * cfg.match_score * lens[i]))
        if best[i] < min_score:
            out.append((None, int(win_starts[i])))
            continue
        ops = None
        if cfg.use_native:
            ops = traceback_native(tb[i], bi[i], bk[i])
        if ops is None:
            ops = traceback(tb[i], bi[i], bk[i], int(lens[i]))
        out.append((ops, int(win_starts[i])))
    return out


def annotate_one(read: PreparedRead, ops, win_start: int, fasta: FastaIndex,
                 cfg: AnnotateConfig) -> Tuple[Optional[dict], str]:
    """Run the indel-correction core for one aligned read; returns the
    payload for write_corrected_events."""
    genome = fasta.get(read.chrom)
    m_total = len(read.fwd_seq)

    # aligned read span in fwd coordinates
    read_idx = [op[1] for op in ops if op[0] in ("M", "I")]
    if not read_idx:
        return None, "Incorrect Alignment"
    r0, r1 = min(read_idx), max(read_idx)
    leftclip = r0
    rightclip = m_total - 1 - r1

    first_m = next(op for op in ops if op[0] == "M")
    first_match_pos = win_start + first_m[2]

    # aligned columns in genome-forward order
    refb = []
    readb = []
    nummismatch = numins = numdel = 0
    for op in ops:
        if op[0] == "M":
            g = win_start + op[2]
            if g < 0 or g >= len(genome):
                return None, "Incorrect Alignment"
            rb = read.fwd_seq[op[1]]
            fb = genome[g]
            refb.append(fb)
            readb.append(rb)
            if rb != fb:
                nummismatch += 1
        elif op[0] == "I":
            refb.append("-")
            readb.append(read.fwd_seq[op[1]])
            numins += 1
        else:
            g = win_start + op[1]
            if g < 0 or g >= len(genome):
                return None, "Incorrect Alignment"
            refb.append(genome[g])
            readb.append("-")
            numdel += 1
    cols = Columns(np.array(refb, dtype="<U1"), np.array(readb, dtype="<U1"))

    # genome-forward event arrays for the aligned region
    n_aligned = r1 - r0 + 1
    if read.strand == "+":
        orig = r0 + np.arange(n_aligned)
    else:
        orig = m_total - 1 - r0 - np.arange(n_aligned)
    events = GenomeEvents(read.events_start[orig].astype(np.int64),
                          read.events_length[orig].astype(np.int64),
                          read.strand)

    ann = None
    if cfg.use_native:
        from nanomod_tpu.native.annotate_bind import native_annotate
        res = native_annotate(
            cols.refbase, cols.readbase, events.start, events.length,
            read.strand, read.norm_signal, cfg.min_num_signal,
            cfg.resegment_signal_wind, cfg.more_signal_perc)
        if res is not None:
            ann, signalnum, new_rb = res
            cols = Columns(cols.refbase, new_rb)
    if ann is None:
        indel_pos = ann_mod.mark_repeat_indels(cols)
        groups = ann_mod.group_indels(indel_pos, events, cols,
                                      cfg.min_num_signal,
                                      cfg.more_signal_perc)
        ann, signalnum = ann_mod.annotate_read(
            cols, events, read.norm_signal, groups,
            cfg.resegment_signal_wind, cfg.min_num_signal,
        )

    # build output events over annotated columns, genome-ascending
    keys = sorted(ann)
    rows = []
    for aim in keys:
        entry = ann[aim]
        if len(entry) < 3:
            continue
        _, mean, std, start, length = entry
        base = cols.refbase[aim] if read.strand == "+" else complement(
            str(cols.refbase[aim]))
        rows.append((mean, std, start, length, base))
    if not rows:
        return None, "Incorrect Alignment"
    if read.strand == "-":
        rows = rows[::-1]
    ev_out = np.array(
        [(m_, s_, st_, ln_, b_.encode() if isinstance(b_, str) else b_)
         for (m_, s_, st_, ln_, b_) in rows],
        dtype=CORRECTED_EVENTS_DTYPE,
    )

    if read.strand == "+":
        read_al = cols.readbase.astype("S1")
        genome_al = cols.refbase.astype("S1")
        clip_s, clip_e = leftclip, rightclip
    else:
        read_al = np.array([complement(str(b)) for b in cols.readbase[::-1]],
                           dtype="S1")
        genome_al = np.array([complement(str(b)) for b in cols.refbase[::-1]],
                             dtype="S1")
        clip_s, clip_e = rightclip, leftclip

    nmatch = len(cols) - nummismatch - numins - numdel
    return {
        "chrom": read.chrom,
        "start": int(first_match_pos),
        "strand": read.strand,
        "events": ev_out,
        "read_alignment": read_al,
        "genome_alignment": genome_al,
        "clipped_start": clip_s,
        "clipped_end": clip_e,
        "num_insertions": numins,
        "num_deletions": numdel,
        "num_matches": nmatch,
        "num_mismatches": nummismatch,
    }, ""


def annotate_files(paths: List[str], cfg: AnnotateConfig,
                   fasta: Optional[FastaIndex] = None,
                   seed_index: Optional[SeedIndex] = None):
    """Annotate a batch of FAST5s in place.

    Returns (n_ok, errors {key: [paths]}, signalnum histogram) — the
    reference's error taxonomy + resegment-window histogram
    (ref :1485-1494).
    """
    fasta = fasta or FastaIndex(cfg.ref_fasta)
    seed_index = seed_index or SeedIndex(fasta.seqs, k=cfg.seed_k)
    kmer_model = (load_kmer_model(cfg.kmer_model_file)
                  if cfg.kmer_model_file and os.path.isfile(cfg.kmer_model_file)
                  else None)

    errors = defaultdict(list)
    signal_hist = defaultdict(int)
    prepared = []
    # the prepare phase is HDF5/numpy bound; h5py releases the GIL during
    # reads, so a thread pool covers the reference's multiprocessing use
    # (ref myRefBaseSignalAnnotation.py:1466-1471)
    from concurrent.futures import ThreadPoolExecutor

    from nanomod_tpu.utils.observe import stage
    workers = max(1, min(cfg.threads, 16))
    with stage("prepare", unit="reads") as s, \
            ThreadPoolExecutor(max_workers=workers) as ex:
        for p, (rd, err) in zip(paths, ex.map(
                lambda q: prepare_read(q, cfg, seed_index, kmer_model), paths)):
            if rd is None:
                errors[err].append(p)
            else:
                prepared.append(rd)
        s.add(len(paths))

    # bucket by length for batched alignment
    buckets: Dict[int, List[PreparedRead]] = defaultdict(list)
    for r in prepared:
        buckets[_length_bucket(len(r.fwd_seq))].append(r)

    n_ok = 0
    for bucket_reads in buckets.values():
        with stage("align_dp", unit="reads") as s:
            results = align_batch(bucket_reads, fasta, cfg)
            s.add(len(bucket_reads))
        with stage("annotate_write", unit="reads") as s:
            for r, (ops, ws) in zip(bucket_reads, results):
                if ops is None:
                    errors["Not in alignment sam"].append(r.path)
                    continue
                payload, err = annotate_one(r, ops, ws, fasta, cfg)
                if payload is None:
                    errors[err].append(r.path)
                    continue
                try:
                    write_corrected_events(r.path, **payload,
                                           basecall_group=cfg.basecall_1d)
                    n_ok += 1
                except OSError:
                    errors["Cannot save data"].append(r.path)
            s.add(len(bucket_reads))
    return n_ok, dict(errors), dict(signal_hist)


def annotate_folder(cfg: AnnotateConfig):
    """correctAndAnnotate_manager (ref :1429-1497): discover FAST5s and
    annotate them in batches, reporting throughput and the reference's
    error-type histogram."""
    import time

    start = time.time()
    paths = list(iter_fast5_files(cfg.wrk_base1, recursive=cfg.recursive))
    print(f"Total f5={len(paths)}")
    if cfg.resume:
        # skip files that already carry NanomoCorrected_000 (the reference
        # always rewrites, ref myRefBaseSignalAnnotation.py:706-714; resume
        # makes interrupted runs restartable without redoing finished work)
        from nanomod_tpu.io.fast5 import has_corrected_group
        n_before = len(paths)
        paths = [p for p in paths if not has_corrected_group(p)]
        print(f"Resume: {n_before - len(paths)} already annotated, "
              f"{len(paths)} to do")
    fasta = FastaIndex(cfg.ref_fasta)
    seed_index = SeedIndex(fasta.seqs, k=cfg.seed_k)
    total_ok = 0
    all_errors = defaultdict(list)
    for lo in range(0, len(paths), cfg.files_per_thread):
        batch = paths[lo: lo + cfg.files_per_thread]
        n_ok, errors, _ = annotate_files(batch, cfg, fasta, seed_index)
        total_ok += n_ok
        for k, v in errors.items():
            all_errors[k].extend(v)
        done = min(lo + cfg.files_per_thread, len(paths))
        dt = time.time() - start
        if cfg.out_level <= 1 and done < len(paths):
            print(f"{done}/{len(paths)} reads, {done / max(dt, 1e-9):.1f} reads/s")
    dt = time.time() - start
    print("Error information for different fast5 files:")
    for k, v in all_errors.items():
        print(f"\t{k} {len(v)}")
    print(f"Total consuming time {dt:.0f} ({total_ok / max(dt, 1e-9):.1f} reads/s)")
    from nanomod_tpu.utils.observe import observer, report
    report(cfg.out_level)
    if cfg.metrics_file:
        observer().to_json(cfg.metrics_file)
    return total_ok, dict(all_errors)
