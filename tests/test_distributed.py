"""True multi-process distributed tests (jax.distributed over CPU devices).

Launches ``tools/distributed_smoke.py`` as 2 coordinator-connected
subprocesses with 4 virtual CPU devices each (8 global), runs the sharded
rollout, and asserts the metrics match a single-process 8-device run of the
same program — the executable evidence behind the multi-host scaling story
(SURVEY §4; the reference has no distribution whatsoever).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SMOKE = os.path.join(_REPO, "tools", "distributed_smoke.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _proc_env(n_local: int):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop any TPU-plugin sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    return env


def _run_distributed(impl: str, num_processes: int, n_local: int, timeout=420):
    port = _free_port()
    procs = []
    for pid in range(num_processes):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, _SMOKE,
                    "--coordinator", f"localhost:{port}",
                    "--num-processes", str(num_processes),
                    "--process-id", str(pid),
                    "--impl", impl,
                ],
                env=_proc_env(n_local),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=_REPO,
            )
        )
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"process failed:\n{err[-3000:]}"
    return json.loads(outs[0][0].strip().splitlines()[-1])


def _run_single(impl: str, timeout=420):
    """Same program, one process, 8 local devices."""
    out = subprocess.run(
        [
            sys.executable, _SMOKE,
            "--coordinator", f"localhost:{_free_port()}",
            "--num-processes", "1",
            "--process-id", "0",
            "--impl", impl,
        ],
        env=_proc_env(8),
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=_REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize("impl", ["jit", "shard_map"])
def test_two_process_rollout_matches_single_process(impl):
    multi = _run_distributed(impl, num_processes=2, n_local=4)
    single = _run_single(impl)
    assert multi["global_devices"] == 8
    assert single["global_devices"] == 8
    # same global SPMD program over the same 8-device mesh -> same results
    assert multi["episodes"] == single["episodes"]
    assert multi["total_reward"] == pytest.approx(
        single["total_reward"], rel=1e-5
    )
    assert multi["obs_sum"] == pytest.approx(single["obs_sum"], rel=1e-5)


def test_two_process_ppo_train_step_matches_single_process():
    """The FULL sharded PPO train step across process boundaries: rollout,
    GAE, minibatched updates and the induced cross-host gradient collective
    must produce the same replicated params as a single-process run of the
    same 8-device program."""
    multi = _run_distributed("ppo", num_processes=2, n_local=4)
    single = _run_single("ppo")
    assert multi["global_devices"] == 8
    assert single["global_devices"] == 8
    assert multi["loss"] == pytest.approx(single["loss"], rel=1e-4)
    assert multi["mean_reward"] == pytest.approx(
        single["mean_reward"], rel=1e-4
    )
    assert multi["param_checksum"] == pytest.approx(
        single["param_checksum"], rel=1e-5
    )
    assert multi["obs_sum"] == pytest.approx(single["obs_sum"], rel=1e-5)


def test_two_process_sac_train_step_matches_single_process():
    """The FULL sharded SAC train step across process boundaries: env
    collection into per-shard replay rings, local n-step minibatch
    sampling, and the pmean'd gradient updates must produce the same
    replicated params as a single-process run of the same 8-device
    program."""
    multi = _run_distributed("sac", num_processes=2, n_local=4)
    single = _run_single("sac")
    assert multi["global_devices"] == 8
    assert single["global_devices"] == 8
    assert multi["q_loss"] == pytest.approx(single["q_loss"], rel=1e-4)
    assert multi["mean_reward"] == pytest.approx(
        single["mean_reward"], rel=1e-4
    )
    assert multi["alpha"] == pytest.approx(single["alpha"], rel=1e-4)
    assert multi["param_checksum"] == pytest.approx(
        single["param_checksum"], rel=1e-5
    )
    assert multi["obs_sum"] == pytest.approx(single["obs_sum"], rel=1e-5)
    # 10 iters x (64/8) local envs inserted per iter
    assert multi["filled_local"] == single["filled_local"] == 80
