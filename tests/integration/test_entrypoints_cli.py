"""Subprocess smoke of the flag-compatible CLIs: train → resume → eval → inference.

Mirrors the reference user journey (SURVEY.md §3.1–3.3) end-to-end on tiny
synthetic fixtures with the 8-virtual-CPU-device mesh.
"""

import csv
import os
import subprocess
import sys

import pytest

from learnablepoolingmethods_tpu.data import fixtures

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(module, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # sitecustomize latches the axon platform at jax import, so the env var
    # alone is NOT enough (CLAUDE.md) — force the config API before the
    # module runs, exactly like tests/conftest.py and dryrun_multichip do.
    code = (
        "import sys, runpy, jax; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv[0] = {module!r}; "
        f"runpy.run_module({module!r}, run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code, *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,  # 1 shared CPU core; generous when the TPU bench runs too
    )
    assert proc.returncode == 0, f"{module} failed:\n{proc.stderr[-3000:]}"
    return proc.stderr  # absl logs to stderr


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    fixtures.make_learnable_synthetic_video_level(
        str(d / "train.tfrecord"), num_videos=64, num_classes=16,
        rgb_size=8, audio_size=4,
    )
    return d


COMMON = [
    "--model=LogisticModel",
    "--feature_names=mean_rgb,mean_audio",
    "--feature_sizes=8,4",
    "--num_classes=16",
    "--batch_size=16",
]


def test_cli_train_inference_roundtrip(workdir):
    """Two subprocesses only — each python start costs ~60-90 s on this
    1-core host.  Resume and eval CLIs are exercised at the API level in
    test_train_loop.py and were driven manually (see verify logs)."""
    train_dir = str(workdir / "td")
    data = str(workdir / "train.tfrecord")

    # train from scratch — through the grain input path (--use_grain) and a
    # 2(dcn)x2(data)x2(model) mesh, so the DataLoader wiring AND the
    # multi-axis CLI flags are subprocess-tested (VERDICT round-1 item 6)
    log = _run(
        "learnablepoolingmethods_tpu.train", *COMMON,
        f"--train_data_pattern={data}", f"--train_dir={train_dir}",
        "--num_epochs=2", "--start_new_model", "--export_model_steps=0",
        "--save_checkpoint_every_n_steps=4", "--log_every_n_steps=2",
        "--use_grain", "--dcn_parallelism=2", "--model_parallelism=2",
        "--bf16_params",
    )
    assert "training step" in log and "done; final checkpoint" in log

    # inference → Kaggle CSV
    out_csv = str(workdir / "preds.csv")
    _run(
        "learnablepoolingmethods_tpu.inference", *COMMON,
        f"--input_data_pattern={data}", f"--train_dir={train_dir}",
        f"--output_file={out_csv}", "--top_k=3",
    )
    with open(out_csv) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["VideoId", "LabelConfidencePairs"]
    assert len(rows) == 65  # header + 64 videos
    vid, pairs = rows[1]
    parts = pairs.split(" ")
    assert len(parts) == 6  # 3 (index, score) pairs
    assert all(0.0 <= float(parts[i]) <= 1.0 for i in range(1, 6, 2))


def test_cli_crash_resume(workdir):
    """Crash recovery, actually crashed: SIGKILL the train CLI mid-run
    after its first committed checkpoint, restart WITHOUT
    --start_new_model, and require it to restore at a step ≥ the one we
    saw before the kill — the reference's Supervisor managed_session
    auto-restore contract (SURVEY.md §5.3/§5.4, train.py#Trainer.run).
    The existing roundtrip tests exercise save/restore APIs; this is the
    only place the process actually dies uncleanly."""
    import re
    import signal
    import time

    train_dir = str(workdir / "td_crash")
    data = str(workdir / "train.tfrecord")
    args = [
        *COMMON,
        f"--train_data_pattern={data}", f"--train_dir={train_dir}",
        "--start_new_model", "--export_model_steps=0",
        "--num_epochs=200",               # ~800 steps: plenty to die mid-run
        "--save_checkpoint_every_n_steps=2",
        "--log_every_n_steps=5",
    ]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    module = "learnablepoolingmethods_tpu.train"
    code = (
        "import sys, runpy, jax; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv[0] = {module!r}; "
        f"runpy.run_module({module!r}, run_name='__main__')"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code, *args],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    ckpt_root = os.path.join(train_dir, "checkpoints")
    saved_step = None
    deadline = time.time() + 1500  # compile ≈60–90 s on this loaded 1-core host
    try:
        while time.time() < deadline and proc.poll() is None:
            if os.path.isdir(ckpt_root):
                # orbax commits a step via atomic rename → a digit-named dir
                # is a complete checkpoint (saves are synchronous here)
                steps = [int(d) for d in os.listdir(ckpt_root) if d.isdigit()]
                if steps:
                    saved_step = max(steps)
                    break
            time.sleep(0.2)
        assert proc.poll() is None, "train CLI exited before it could be killed"
        assert saved_step is not None, "no checkpoint appeared before the deadline"
        proc.send_signal(signal.SIGKILL)  # no cleanup, no atexit — a real crash
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait(timeout=60)

    # restart without --start_new_model: must auto-restore, then finish the
    # (now tiny) target and exit 0
    log = _run(
        module, *COMMON,
        f"--train_data_pattern={data}", f"--train_dir={train_dir}",
        "--num_epochs=1", "--export_model_steps=0",
        "--save_checkpoint_every_n_steps=1000", "--log_every_n_steps=1",
    )
    m = re.search(r"restored checkpoint at step (\d+)", log)
    assert m, f"no restore line in resume log:\n{log[-2000:]}"
    assert int(m.group(1)) >= saved_step, (m.group(1), saved_step)
    assert "done; final checkpoint" in log
