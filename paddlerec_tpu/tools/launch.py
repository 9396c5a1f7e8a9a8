"""Multi-process launcher — the ``fleetrun`` / run_gpubox.sh analog.

Parity target: the reference launches PS topologies by spawning processes
with role env vars (tools/run_gpubox.sh:10-43, fleetrun --worker_num).
The TPU-era analog spawns N jax processes wired to one coordinator
(`jax.distributed.initialize`); on real pods each host runs one process,
and this launcher simulates that on a single machine for development
(each process gets a CPU device slice via
``xla_force_host_platform_device_count``).

Usage:
    python -m paddlerec_tpu.tools.launch --nproc 2 --devices_per_proc 4 \
        -- python -m paddlerec_tpu.tools.train -m config.yaml
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def launch(nproc: int, devices_per_proc: int, cmd, coordinator_port=12355):
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{coordinator_port}",
            "JAX_NUM_PROCESSES": str(nproc),
            "JAX_PROCESS_ID": str(rank),
            # role env vars kept for reference-compat scripts
            "PADDLE_TRAINER_ID": str(rank),
            "PADDLE_TRAINERS_NUM": str(nproc),
            "TRAINING_ROLE": "TRAINER",
        })
        if devices_per_proc:
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={devices_per_proc}"
            ).strip()
        procs.append(subprocess.Popen(cmd, env=env))
    rc = 0
    for p in procs:
        rc = p.wait() or rc
    return rc


def main(argv=None):
    parser = argparse.ArgumentParser(description="multi-process launcher")
    parser.add_argument("--nproc", type=int, default=1)
    parser.add_argument("--devices_per_proc", type=int, default=0,
                        help="virtual CPU devices per process (dev mode); "
                        "0 = use the real platform")
    parser.add_argument("--coordinator_port", type=int, default=12355)
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="-- command to launch")
    args = parser.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        parser.error("no command given (put it after --)")
    return launch(args.nproc, args.devices_per_proc, cmd,
                  args.coordinator_port)


if __name__ == "__main__":
    sys.exit(main())
