"""Failure detection / elastic recovery: crash-and-resume is lossless.

SURVEY §5 plans "snapshot env-state pytree; multi-host restart via
jax.distributed.initialize re-join".  tools/elastic_train.py implements the
snapshot/restart half; this test executes a real process crash and asserts
the resumed run reaches a final training state BIT-IDENTICAL to an
uninterrupted run (possible because per-update keys are fold_in-derived,
so the randomness stream has no process-lifetime state).
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_REPO, "tools", "elastic_train.py")


def _run(extra, check=True, timeout=420):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, _TOOL, *extra],
        env=env, capture_output=True, text=True, timeout=timeout, cwd=_REPO,
    )
    if check:
        assert out.returncode == 0, out.stderr[-3000:]
    return out


def test_crash_resume_bit_identical(tmp_path):
    _crash_resume_case(tmp_path, [])


def test_crash_resume_bit_identical_sac(tmp_path):
    # same snapshot/restore flow through the SAC TrainState (replay buffer
    # included in the pytree)
    _crash_resume_case(tmp_path, ["--algo", "sac"])


def _crash_resume_case(tmp_path, extra):
    ck_a = str(tmp_path / "uninterrupted")
    ck_b = str(tmp_path / "crashy")
    common = ["--updates", "9", "--every", "3", "--envs", "16", *extra]

    straight = _run(["--ckpt", ck_a, *common])
    ref = json.loads(straight.stdout.strip().splitlines()[-1])

    crashed = _run(
        ["--ckpt", ck_b, *common, "--crash-at", "5"], check=False
    )
    assert crashed.returncode == 1
    assert "simulated crash" in crashed.stderr
    # checkpoint from update 3 survives the crash
    assert json.load(open(ck_b + ".meta.json"))["update"] == 3

    resumed = _run(["--ckpt", ck_b, *common, "--resume"])
    got = json.loads(resumed.stdout.strip().splitlines()[-1])

    assert got["update"] == ref["update"] == 9
    assert got["digest"] == ref["digest"]
