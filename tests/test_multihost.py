"""Multi-host (multi-process) smoke test.

Launches TWO real OS processes, each with 2 virtual CPU devices, connects
them through `jax.distributed.initialize` (the --coordinator/--process_id/
--n_processes wiring in cli/train.py), and trains one epoch data-parallel
over the resulting 4-device global ('data',) mesh — gradients and BN
moments psum across the process boundary.

This is the modern equivalent of the reference's broken DataParallel
vestige (cad_recognition/train.py:204-205); see parallel/distributed.py.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_training(tmp_path):
    from yolat_tpu.data.synthetic import write_dataset

    root = str(tmp_path / "mini")
    write_dataset(root, n_train=4, n_test=2, seed=0, width=600.0,
                  height=400.0, n_rooms=2, symbols_per_room=(1, 1))

    port = _free_port()
    env = dict(os.environ)
    # subprocesses must come up on the CPU backend: drop the axon plugin
    # hook (it overrides JAX_PLATFORMS and hangs when its tunnel is down)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "yolat_tpu.cli.train",
                    "--data_dir", root,
                    "--bbox_sampling_step", "4",
                    "--total_epochs", "1",
                    "--eval_start", "1",
                    "--batch_size", "1",
                    "--n_devices", "4",
                    "--coordinator", f"localhost:{port}",
                    "--process_id", str(pid),
                    "--n_processes", "2",
                    "--root_dir", str(tmp_path / "log"),
                    "--print_freq", "1",
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=REPO,
            )
        )

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    # process 0 evaluated the test split and reported the result line
    assert "best test_value=" in outs[0]
    # the training epoch actually stepped on both processes
    assert "LossMean" in outs[0] and "LossMean" in outs[1]
