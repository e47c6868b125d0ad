"""Multi-PROCESS dryrun: the multi-host claim, actually executed.

The reference's most-exercised runtime path is torchrun multi-process spawn
with env-var rank init (``vitok/utils.py:44-89``,
``scripts/train_vae.py:512-591`` in Na-VAE/vitok-release). Our analog is
``jax.distributed.initialize`` + a global mesh; this script proves it end to
end without pod hardware: it spawns N real OS processes, each pinned to K
virtual CPU devices, forms the N*K-device global mesh over gloo collectives,
runs the fully-sharded (data x fsdp x model) train step for several steps
with rank-strided process-local batches, and asserts the resulting losses,
gradient norms, and a parameter-sum fingerprint match a single-process
N*K-device run of the identical schedule to float32 tolerance.

Usage (launcher, spawns everything itself):
    python scripts/dryrun_multiprocess.py [--processes 2] [--devices 4]

Internal worker/baseline modes are spawned by the launcher; see
``_worker_main``. Also reachable as ``dryrun_multiprocess()`` from
``__graft_entry__``.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

STEPS = 3
VARIANT = "w128_d2_h2-w128_d2_h2/1x16x8"
GLOBAL_BATCH = 8
TOKENS = 16
GRID = (4, 4)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_global_batch(pixels_per_token: int, seed: int = 0):
    """Deterministic global NaFlex batch — identical on every process."""
    rng = np.random.default_rng(seed)
    gr, gc = GRID
    nv = gr * gc
    yy, xx = np.meshgrid(np.arange(gr), np.arange(gc), indexing="ij")
    b, n = GLOBAL_BATCH, TOKENS
    d = {
        "patches": np.zeros((b, n, pixels_per_token), np.float32),
        "patch_mask": np.zeros((b, n), bool),
        "row_idx": np.zeros((b, n), np.int32),
        "col_idx": np.zeros((b, n), np.int32),
        "orig_height": np.full((b,), gr * 16, np.int32),
        "orig_width": np.full((b,), gc * 16, np.int32),
    }
    d["patches"][:, :nv] = rng.standard_normal((b, nv, pixels_per_token))
    d["patch_mask"][:, :nv] = True
    d["row_idx"][:, :nv] = yy.ravel()
    d["col_idx"][:, :nv] = xx.ravel()
    return d


def _run_steps(mesh, local_batch):
    """Init params on the mesh, run STEPS sharded train steps, fingerprint.

    Identical program for the baseline (1 process) and each worker
    (N processes) — the only difference is how many processes back the mesh.
    """
    import jax
    import jax.numpy as jnp

    from vitok_tpu.models import AEConfig, init_params
    from vitok_tpu.parallel import shard_batch, shard_params
    from vitok_tpu.train_lib import (
        LossConfig,
        create_optimizer,
        create_schedule,
        create_train_state,
        make_train_step,
    )

    cfg = AEConfig.from_variant(VARIANT, attn_impl="xla")
    params = shard_params(init_params(cfg, jax.random.key(0)), mesh)
    tx = create_optimizer(create_schedule("cosine", 1e-3, 100, warmup_frac=0.0))
    state = create_train_state(params, tx)
    batch = shard_batch(local_batch, mesh)

    step = make_train_step(
        cfg, tx, LossConfig(ssim_grid=GRID), compute_dtype=jnp.float32,
        donate=False,
    )

    losses, gnorms = [], []
    for i in range(STEPS):
        state, metrics = step(state, batch, jax.random.key(i + 1))
        losses.append(float(metrics["loss/total"]))
        gnorms.append(float(metrics["grad_norm"]))

    @jax.jit
    def fingerprint(p):
        return sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(p)
        )

    return {
        "losses": losses,
        "grad_norms": gnorms,
        "param_sumsq": float(fingerprint(state.params)),
        "devices": len(jax.devices()),
        "process_count": jax.process_index() * 0 + jax.process_count(),
    }


def _worker_main(args) -> None:
    """Run inside a spawned process (worker or single-process baseline)."""
    import jax

    if args.num_processes > 1:
        from vitok_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert jax.process_count() == args.num_processes, (
            f"distributed init failed: process_count={jax.process_count()}"
        )

    from vitok_tpu.models import AEConfig
    from vitok_tpu.parallel import create_mesh

    n = len(jax.devices())
    model = 2 if n % 2 == 0 else 1
    rem = n // model
    fsdp = 2 if rem % 2 == 0 else 1
    mesh = create_mesh({"data": rem // fsdp, "fsdp": fsdp, "model": model})

    cfg = AEConfig.from_variant(VARIANT, attn_impl="xla")
    gbatch = _make_global_batch(cfg.pixels_per_token)
    # Rank-strided local rows — what the data loaders hand each process.
    per = GLOBAL_BATCH // args.num_processes
    lo = args.process_id * per
    local = {k: v[lo : lo + per] for k, v in gbatch.items()}

    result = _run_steps(mesh, local)
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"proc {args.process_id}/{args.num_processes}: {result}")


def launch(n_processes: int = 2, devices_per_process: int = 4) -> dict:
    """Spawn baseline + workers, compare, raise on mismatch. Returns report."""
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    script = os.path.abspath(__file__)
    n_global = n_processes * devices_per_process

    def env_for(n_local_devices: int):
        env = {
            k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"
        }
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_local_devices}"
        )
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        return env

    with tempfile.TemporaryDirectory() as tmp:
        base_out = os.path.join(tmp, "baseline.json")
        base = subprocess.run(
            [sys.executable, script, "--worker", "--process-id", "0",
             "--num-processes", "1", "--port", "0", "--out", base_out],
            cwd=repo, env=env_for(n_global), capture_output=True, text=True,
            timeout=900,
        )
        if base.returncode != 0:
            raise RuntimeError(f"baseline failed:\n{base.stderr[-3000:]}")

        port = _free_port()
        procs, outs = [], []
        for pid in range(n_processes):
            out = os.path.join(tmp, f"worker{pid}.json")
            outs.append(out)
            procs.append(
                subprocess.Popen(
                    [sys.executable, script, "--worker",
                     "--process-id", str(pid),
                     "--num-processes", str(n_processes),
                     "--port", str(port), "--out", out],
                    cwd=repo, env=env_for(devices_per_process),
                    stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                )
            )
        errs = []
        for pid, p in enumerate(procs):
            try:
                _, stderr = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                p.kill()
                _, stderr = p.communicate()
                errs.append(f"worker {pid} timed out")
                continue
            if p.returncode != 0:
                errs.append(f"worker {pid} rc={p.returncode}:\n{stderr[-3000:]}")
        if errs:
            raise RuntimeError("\n".join(errs))

        with open(base_out) as f:
            baseline = json.load(f)
        workers = []
        for out in outs:
            with open(out) as f:
                workers.append(json.load(f))

    assert baseline["devices"] == n_global and baseline["process_count"] == 1
    for w in workers:
        assert w["devices"] == n_global, w
        assert w["process_count"] == n_processes, w
        for key, tol in (
            ("losses", 1e-5), ("grad_norms", 1e-4), ("param_sumsq", 1e-2)
        ):
            a = np.asarray(baseline[key], np.float64)
            b = np.asarray(w[key], np.float64)
            err = float(np.abs(a - b).max())
            rel = err / max(1.0, float(np.abs(a).max()))
            assert rel < tol, (
                f"{key}: multiprocess {b} vs single-process {a} "
                f"(rel err {rel:.2e} > {tol})"
            )

    report = {
        "ok": True,
        "processes": n_processes,
        "devices_per_process": devices_per_process,
        "steps": STEPS,
        "losses": baseline["losses"],
        "max_loss_rel_err": max(
            float(
                np.abs(
                    np.asarray(w["losses"]) - np.asarray(baseline["losses"])
                ).max()
            )
            / max(1.0, abs(baseline["losses"][0]))
            for w in workers
        ),
    }
    print(
        f"dryrun_multiprocess OK: {n_processes} processes x "
        f"{devices_per_process} devices (gloo), losses == single-process "
        f"{baseline['losses']} (rel err {report['max_loss_rel_err']:.1e})"
    )
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--devices", type=int, default=4)
    args = ap.parse_args()
    if args.worker:
        _worker_main(args)
    else:
        launch(args.processes, args.devices)


if __name__ == "__main__":
    main()
