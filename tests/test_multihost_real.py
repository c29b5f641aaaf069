"""Real-backend multi-host test: 2 actual jax.distributed processes on the
CPU backend run the full host-sharded detect (round-robin file shards ->
packed-observation pool merge over the Gloo allgather -> battery -> rank ->
sign_test), and every rank's output must byte-match the single-process run
over the union of files.

This is the production multi-host path end-to-end — the TPU-native
replacement for the reference's qsub fan-out + file merge
(ref bin/scripts/mySimulate.py:344-457).
"""

import os
import socket
import subprocess
import sys

import pytest

from fixtures import make_corrected_dataset, make_genome

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mhreal"))
    chrom, genome = make_genome(length=400, seed=7)
    make_corrected_dataset(os.path.join(root, "control"), chrom, genome,
                           n_reads=24, seed=1)
    make_corrected_dataset(os.path.join(root, "case"), chrom, genome,
                           n_reads=24, seed=2, mod_pos=173, mod_delta=1.0)
    return root


def _single_host_bytes(root):
    from nanomod_tpu.config import DetectConfig, RankConfig
    from nanomod_tpu.detect import run_detect
    cfg = DetectConfig(
        wrk_base1=os.path.join(root, "control"),
        wrk_base2=os.path.join(root, "case"),
        out_folder=os.path.join(root, "out_single"),
        file_id="mh", min_lr=0, rank=RankConfig(window=4),
    )
    run_detect(cfg)
    with open(os.path.join(root, "out_single", "mh_sign_test.txt"), "rb") as f:
        return f.read()


def test_two_process_detect_matches_single_process(dataset):
    root = dataset
    want = _single_host_bytes(root)
    assert len(want) > 1000

    port = _free_port()
    env = dict(os.environ)
    worker = os.path.join(HERE, "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), "2", str(port), root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    for rank in range(2):
        path = os.path.join(root, f"out_r{rank}", "mh_sign_test.txt")
        with open(path, "rb") as f:
            got = f.read()
        assert got == want, f"rank {rank} sign_test differs from single-host"
