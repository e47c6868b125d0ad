"""TPU pod launch helper — the TPU-native analog of the reference's Modal
cloud layer (``scripts/modal/modal_config.py`` in Na-VAE/vitok-release).

Generates and optionally executes the gcloud commands to create a TPU VM /
queued resource and run the training or eval CLI on every host (jax
multi-host init is automatic on TPU pods).

    python scripts/tpu/launch.py --name vitok-v5e --type v5litepod-8 \
        --zone us-west4-a -- python scripts/train_vae.py --variant Ld2-Ld22/1x16x64 ...
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys

SETUP = (
    "cd ~/vitok-tpu && pip install -e . && "
    "python -m vitok_tpu.native.build || true"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--type", default="v5litepod-8",
                    help="accelerator type, e.g. v5litepod-8, v5litepod-256")
    ap.add_argument("--zone", default="us-west4-a")
    ap.add_argument("--project", default=None)
    ap.add_argument("--version", default="tpu-ubuntu2204-base")
    ap.add_argument("--spot", action="store_true",
                    help="preemptible (PreemptionGuard checkpoints on SIGTERM)")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("command", nargs=argparse.REMAINDER,
                    help="command to run on every host (after --)")
    args = ap.parse_args()

    proj = f" --project={args.project}" if args.project else ""
    spot = " --spot" if args.spot else ""
    create = (
        f"gcloud compute tpus tpu-vm create {args.name}"
        f" --zone={args.zone}{proj} --accelerator-type={args.type}"
        f" --version={args.version}{spot}"
    )
    cmd = " ".join(args.command).lstrip("- ")
    run = (
        f"gcloud compute tpus tpu-vm ssh {args.name} --zone={args.zone}{proj}"
        f" --worker=all --command={shlex.quote(SETUP + ' && ' + cmd)}"
    )
    print("# 1. create the pod slice:")
    print(create)
    print("# 2. run on every host (jax.distributed autoinits):")
    print(run)
    if not args.dry_run and cmd:
        for c in (create, run):
            print(f"\n$ {c}")
            rc = subprocess.call(c, shell=True)
            if rc != 0:
                sys.exit(rc)


if __name__ == "__main__":
    main()
