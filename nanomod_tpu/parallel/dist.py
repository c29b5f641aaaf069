"""Multi-host orchestration.

The reference scales across nodes by shelling qsub jobs at an SGE cluster
and polling qstat (ref bin/scripts/mySimulate.py:344-457).  The TPU-native
equivalent is one SPMD process per host under `jax.distributed`:

  * FAST5 ingest is host-local — each process reads its shard of the file
    list (round-robin, like the reference's per-job folder assignment) and
    builds partial position pools;
  * pools merge across hosts with collectives (values via allgather along
    the capacity axis, counts via sum) before the position-sharded battery;
  * simulation grids ((dataset x parameter) tuples) shard the same way —
    each host sweeps its slice in-process, results concatenate at the end
    (the .output file format is unchanged, so merging is file-level
    concatenation exactly as the reference's qsub merge loop did).

On a single host every helper degenerates to the identity, so the same
driver code runs everywhere.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize wrapper; no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def shard_list(items: Sequence, process_id: Optional[int] = None,
               process_count: Optional[int] = None) -> List:
    """Round-robin shard of a work list for this host (files, grid points)."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pcount == pid]


def merge_pools_across_hosts(pools: Dict):
    """Merge per-host partial pools (accum.pools.PositionPools dicts) into
    identical full pools on every host.

    Single-process: identity.  Multi-process: gathers each (chrom, strand)
    pool's positions/counts/values via multihost allgather and re-packs the
    union (positions may differ per host).
    """
    if jax.process_count() == 1:
        return pools
    from jax.experimental import multihost_utils
    from nanomod_tpu.accum.pools import PositionPools

    # gather the per-host serialized pools (object trees are not supported;
    # go through padded dense arrays keyed by a gathered key union)
    local_keys = sorted(pools)
    all_keys = multihost_utils.process_allgather(
        np.array([f"{c}\t{s}" for c, s in local_keys], dtype=object),
        tiled=True)
    keys = sorted({tuple(k.split("\t")) for k in all_keys.tolist()})

    merged = {}
    for key in keys:
        pp = pools.get(key)
        pos = pp.positions if pp else np.empty(0, np.int64)
        cnt = pp.counts if pp else np.empty(0, np.int32)
        val = pp.values if pp else np.empty((0, 1), np.float32)
        base = pp.base if pp else np.empty(0, "<U1")

        g_pos = multihost_utils.process_allgather(pos, tiled=True)
        g_cnt = multihost_utils.process_allgather(cnt, tiled=True)
        # flatten (position, slot) observations and rebuild with PoolBuilder
        # semantics: group by position
        obs_pos = np.repeat(pos, cnt)
        mask = np.arange(val.shape[1])[None, :] < cnt[:, None]
        obs_val = val[mask]
        obs_base = np.repeat(base, cnt)
        g_obs_pos = multihost_utils.process_allgather(obs_pos, tiled=True)
        g_obs_val = multihost_utils.process_allgather(obs_val, tiled=True)
        g_obs_base = multihost_utils.process_allgather(
            obs_base.astype("S1"), tiled=True)

        order = np.argsort(g_obs_pos, kind="stable")
        p_s = g_obs_pos[order]
        v_s = g_obs_val[order]
        b_s = g_obs_base[order]
        uniq, first_idx, counts = np.unique(p_s, return_index=True,
                                            return_counts=True)
        cap = int(counts.max()) if len(counts) else 1
        row = np.repeat(np.arange(len(uniq)), counts)
        slot = np.arange(len(p_s)) - np.repeat(first_idx, counts)
        values = np.zeros((len(uniq), cap), np.float32)
        values[row, slot] = v_s
        base_out = np.empty(len(uniq), "<U1")
        base_out[:] = b_s[first_idx].astype("<U1")
        merged[key] = PositionPools(
            chrom=key[0], strand=key[1], positions=uniq,
            values=values, counts=counts.astype(np.int32), base=base_out)
    return merged


def distributed_ingest_detect(cfg):
    """Host-sharded detect: each process ingests its file shard, pools merge
    across hosts, then the standard detection path runs (identically on
    every host)."""
    from nanomod_tpu.detect import detect_from_pools, ingest_group
    from nanomod_tpu.io.fast5 import iter_fast5_files

    def ingest_shard(folder):
        from nanomod_tpu.accum.pools import PoolBuilder
        from nanomod_tpu.detect import _read_passes_filters
        from nanomod_tpu.io.fast5 import read_corrected_events

        files = shard_list(list(iter_fast5_files(folder)))
        builder = PoolBuilder()
        for p in files:
            rd = read_corrected_events(p)
            if rd is None or not _read_passes_filters(rd, cfg, None):
                continue
            builder.add_read(rd.chrom, rd.strand, rd.start, rd.norm_mean,
                             rd.base)
        return builder.finalize()

    pools1 = merge_pools_across_hosts(ingest_shard(cfg.wrk_base1))
    pools2 = merge_pools_across_hosts(ingest_shard(cfg.wrk_base2))
    return detect_from_pools(pools1, pools2, cfg)
