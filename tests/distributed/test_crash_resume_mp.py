"""Multi-process crash-resume drill (round-4 verdict item 5).

The single-process SIGKILL drill (tests/integration/test_entrypoints_cli.py)
proves crash-resume for one process; the reference's Supervisor contract
(SURVEY.md §5.3) is that ANY worker of a distributed job can die and the job
resumes from the latest checkpoint.  This drill proves it in the 2-process
topology the rebuild supports:

phase 1  both workers train with per-step synchronous orbax checkpoints;
         worker 1 SIGKILLs itself immediately after step CRASH_AT's save
         returns (synchronous save ends in a cross-process barrier, so the
         checkpoint is globally committed at that point); worker 0, stuck
         in step CRASH_AT+1's gradient all-reduce against a dead peer, is
         torn down by the launcher — the Supervisor's job-restart model;
phase 2  both workers restart with the SAME entrypoint, auto-restore orbax
         step CRASH_AT, and finish the remaining steps;
oracle   an uninterrupted 2-process run in a fresh checkpoint dir.

Asserts: the committed checkpoint is exactly CRASH_AT (no torn/newer step),
both phase-2 workers resumed from it, and the final params are
BIT-identical to the uninterrupted run's (the f32 state round-trips
losslessly through orbax).
"""

import os
import signal
import subprocess
import sys

import pytest

from learnablepoolingmethods_tpu.data.fixtures import write_frame_level_fixture
from tests.distributed import _mp_worker as W

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
WORKER = os.path.join(REPO, "tests", "distributed", "_mp_worker.py")
N_VIDEOS = 32
CRASH_AT = 3  # worker 1 dies after this step's checkpoint commits


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"]
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch(pid, port, data, cache, out, ckpt_dir, crash, env):
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(port), data, cache, out,
         "resume", ckpt_dir, str(crash)],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _run_pair(data, cache, out, ckpt_dir, crash, env, expect_start):
    port = _free_port()
    procs = [
        _launch(pid, port, data, cache, out, ckpt_dir, crash, env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out_s, err_s = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out_s, err_s))
    for rc, out_s, err_s in outs:
        assert rc == 0, f"rc={rc}\nstdout:\n{out_s}\nstderr:\n{err_s[-4000:]}"
        assert f"resume OK start={expect_start}" in out_s, out_s
    return outs


@pytest.fixture(scope="module")
def crash_resume(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crashmp"))
    data = os.path.join(root, "train0.tfrecord")
    write_frame_level_fixture(
        data, N_VIDEOS, num_classes=W.V, rgb_size=W.RGB, audio_size=W.AUD,
        max_frames=W.MAXF, seed=11,
    )
    cache = os.path.join(root, "cache")
    out_resumed = os.path.join(root, "out_resumed")
    out_oracle = os.path.join(root, "out_oracle")
    ckpt_resumed = os.path.join(root, "ckpt_resumed")
    ckpt_oracle = os.path.join(root, "ckpt_oracle")
    for d in (out_resumed, out_oracle, ckpt_resumed, ckpt_oracle):
        os.makedirs(d)
    env = _env()

    # ---- phase 1: train with per-step checkpoints; worker 1 dies ----------
    port = _free_port()
    p0 = _launch(0, port, data, cache, out_resumed, ckpt_resumed, CRASH_AT, env)
    p1 = _launch(1, port, data, cache, out_resumed, ckpt_resumed, CRASH_AT, env)
    out1, err1 = p1.communicate(timeout=600)
    assert p1.returncode == -signal.SIGKILL, (
        f"worker 1 should die by SIGKILL, rc={p1.returncode}\n{out1}\n{err1[-4000:]}"
    )
    # worker 0 is now wedged in (or erroring out of) step CRASH_AT+1's
    # all-reduce against a dead peer; the launcher tears the job down.
    p0.kill()
    p0.communicate(timeout=60)

    return data, cache, out_resumed, out_oracle, ckpt_resumed, ckpt_oracle, env


def test_committed_checkpoint_is_exactly_crash_step(crash_resume):
    _, _, _, _, ckpt_resumed, _, _ = crash_resume
    steps_dir = os.path.join(ckpt_resumed, "checkpoints")
    steps = sorted(
        int(d) for d in os.listdir(steps_dir) if d.isdigit()
    )
    assert steps, "no checkpoint committed before the crash"
    assert steps[-1] == CRASH_AT, steps
    # no torn half-written newer step either
    leftovers = [d for d in os.listdir(steps_dir) if not d.isdigit()]
    assert not [d for d in leftovers if str(CRASH_AT + 1) in d], leftovers


def test_resume_matches_uninterrupted_run(crash_resume):
    data, cache, out_resumed, out_oracle, ckpt_resumed, ckpt_oracle, env = (
        crash_resume
    )
    # phase 2: restart both workers — they must auto-restore step CRASH_AT
    _run_pair(data, cache, out_resumed, ckpt_resumed, -1, env,
              expect_start=CRASH_AT)
    # oracle: uninterrupted run, fresh checkpoint dir
    _run_pair(data, cache, out_oracle, ckpt_oracle, -1, env, expect_start=0)

    for pid in (0, 1):
        with open(os.path.join(out_resumed, f"params_{pid}.msgpack"), "rb") as f:
            resumed = f.read()
        with open(os.path.join(out_oracle, f"params_{pid}.msgpack"), "rb") as f:
            oracle = f.read()
        assert resumed == oracle, (
            f"worker {pid}: resumed params differ from the uninterrupted run"
        )
