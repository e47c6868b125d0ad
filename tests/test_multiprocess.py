"""Multi-process (jax.distributed) runtime: the multi-host claim, executed.

Spawns real OS processes that form one global mesh over gloo CPU
collectives and checks train-step numerics against a single-process run —
the analog of the reference's torchrun multi-GPU path
(``vitok/utils.py:44-89``, ``scripts/train_vae.py:512-591``), which is its
most-exercised runtime configuration.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from dryrun_multiprocess import launch  # noqa: E402


def test_two_process_train_step_matches_single_process():
    """2 procs x 4 devices == 1 proc x 8 devices, to fp32 tolerance.

    Covers: jax.distributed.initialize over an explicit coordinator,
    global mesh spanning processes, shard_params building global params
    from per-process host copies, shard_batch assembling the global batch
    from rank-strided local rows, and replicated metrics fetch.
    """
    report = launch(n_processes=2, devices_per_process=4)
    assert report["ok"]
    assert report["processes"] == 2
    assert report["max_loss_rel_err"] < 1e-5
    assert len(report["losses"]) == 3
