"""Worker for tests/test_multihost_real.py: one real jax.distributed
process of an N-process CPU cluster running the full multi-host detect
path (host-sharded ingest -> DCN pool merge -> battery -> sign_test).

Usage: python _multihost_worker.py <rank> <nprocs> <port> <root>

The parent test asserts each rank's out_r<rank>/mh_sign_test.txt is
byte-identical to the single-process run over the union of files.
"""

import os
import sys


def main():
    rank, nprocs, port, root = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=rank)
    assert jax.process_count() == nprocs

    from nanomod_tpu.config import DetectConfig, RankConfig
    from nanomod_tpu.detect import run_detect

    cfg = DetectConfig(
        wrk_base1=os.path.join(root, "control"),
        wrk_base2=os.path.join(root, "case"),
        out_folder=os.path.join(root, f"out_r{rank}"),
        file_id="mh", min_lr=0, rank=RankConfig(window=4),
    )
    run_detect(cfg)
    print(f"rank {rank}: done", flush=True)


if __name__ == "__main__":
    main()
