"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import pytest

from nanomod_tpu.parallel.mesh import (distributed_detect_step, make_mesh,
                                       shard_pools_over_positions)
from nanomod_tpu.stats import kernels


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8, data=2)


def _pools(p, n, seed=0):
    rng = np.random.default_rng(seed)
    z = np.where(rng.random((p, n)) < 0.8, rng.normal(0, 1, (p, n)), np.inf)
    z = np.sort(z, axis=1).astype(np.float32)  # pads to the end per row
    lab = (rng.random((p, n)) < 0.5).astype(np.float32)
    lab[~np.isfinite(z)] = 0.0
    n1 = np.maximum((lab * np.isfinite(z)).sum(1), 1).astype(np.float32)
    n2 = np.maximum(((1 - lab) * np.isfinite(z)).sum(1), 1).astype(np.float32)
    return z, lab, n1, n2


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 2, "pos": 4}


def test_sharded_battery_matches_single_device(mesh):
    z, lab, n1, n2 = _pools(64, 32)
    d_ref, trs_ref, ties_ref = (np.asarray(x) for x in
                                kernels.pooled_rank_components(z, lab, n1, n2))
    zs, labs, n1s, n2s = shard_pools_over_positions(mesh, z, lab, n1, n2)
    d, trs, ties = (np.asarray(x) for x in
                    kernels.pooled_rank_components(zs, labs, n1s, n2s))
    np.testing.assert_allclose(d, d_ref, rtol=1e-6)
    np.testing.assert_array_equal(trs, trs_ref)


def test_distributed_detect_step(mesh):
    genome_len = 128
    rng = np.random.default_rng(1)
    n_reads, read_len = 8, 32
    read_pos = rng.integers(0, genome_len, (n_reads, read_len)).astype(np.int32)
    read_val = rng.normal(0, 1, (n_reads, read_len)).astype(np.float32)
    read_ok = rng.random((n_reads, read_len)) < 0.9

    z, lab, n1, n2 = _pools(64, 32)
    cnt, s1, s2, d_all, trs, ties = distributed_detect_step(
        mesh, genome_len, read_pos, read_val, read_ok, z, lab, n1, n2)
    cnt = np.asarray(cnt)
    s1 = np.asarray(s1)

    # psum-merged accumulation equals the host-side scatter-add
    cnt_ref = np.zeros(genome_len)
    s1_ref = np.zeros(genome_len)
    for r in range(n_reads):
        for j in range(read_len):
            if read_ok[r, j]:
                cnt_ref[read_pos[r, j]] += 1
                s1_ref[read_pos[r, j]] += read_val[r, j]
    np.testing.assert_allclose(cnt, cnt_ref, rtol=1e-6)
    np.testing.assert_allclose(s1, s1_ref, rtol=1e-5, atol=1e-5)

    # gathered D equals single-device computation
    d_ref, _, _ = (np.asarray(x) for x in
                   kernels.pooled_rank_components(z, lab, n1, n2))
    np.testing.assert_allclose(np.asarray(d_all), d_ref, rtol=1e-6)


def test_shard_list_round_robin():
    from nanomod_tpu.parallel.dist import shard_list
    items = list(range(10))
    shards = [shard_list(items, process_id=i, process_count=3) for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert shards[0] == [0, 3, 6, 9]


def test_merge_pools_single_host_identity():
    from nanomod_tpu.parallel.dist import merge_pools_across_hosts
    from nanomod_tpu.accum.pools import PoolBuilder
    b = PoolBuilder()
    b.add_read("c", "+", 5, np.array([1.0, 2.0], np.float32),
               np.array([b"A", b"C"], "S1"))
    pools = b.finalize()
    assert merge_pools_across_hosts(pools) is pools
