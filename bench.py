"""North-star benchmark: NetVLAD-256 inference throughput, one chip.

Target (BASELINE.json#north_star): ≥ 20,000 videos/sec/chip on TPU v5e for
the Willow GatedNetVLAD-256 config (300-frame uint8 input, 3862 classes).

Methodology notes (axon TPU tunnel):
- A host↔device sync costs ~30 ms through the relay, so per-call timing with
  one sync per step lies.  The measurement dispatches ITERS steps whose
  inputs are data-dependent on the previous step's output (num_frames +=
  0·sum(prev values)) — the device must execute them serially — then syncs
  once.  Marginal time = (total − one sync floor) / ITERS.
- Weights are jit ARGUMENTS (prepare_fast_params), never closure constants:
  closed-over arrays are inlined into the HLO and blow up the remote-compile
  payload (HTTP 413).

The measured program contains the full inference chain: uint8 frame sampling
→ dequantize → ℓ2-norm → folded input BN → fused-Pallas NetVLAD (rgb 256 +
audio 128) → split hidden FC → folded context gating → vocab-on-lanes MoE →
exact top-20.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync_floor(jax, jnp, reps=5):
    @jax.jit
    def nop(x):
        return jnp.sum(x)

    t = jnp.ones((8, 8))
    float(nop(t))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(nop(t))
        best = min(best, time.perf_counter() - t0)
    return best


def bench(
    batch: int = 512,
    iters: int = 32,
    use_pallas: bool = True,
    int8_hidden: bool = False,
):
    import jax
    import jax.numpy as jnp

    from learnablepoolingmethods_tpu.config import ModelConfig
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.models import create_model
    from learnablepoolingmethods_tpu.ops.fast_infer import (
        build_fast_netvlad_inference,
        prepare_fast_params,
    )

    cfg = ModelConfig(iterations=300, compute_dtype="bfloat16")
    model = create_model("NetVLADModelLF", cfg)

    rng = np.random.default_rng(0)
    init_batch = {
        "features": rng.integers(0, 256, size=(4, 300, 1152), dtype=np.uint8),
        "num_frames": rng.integers(10, 301, size=(4,)).astype(np.int32),
    }
    params, batch_stats = step_lib.init_model_variables(
        model, init_batch, frame_features=True
    )
    fp = jax.device_put(
        prepare_fast_params(
            {"params": params, "batch_stats": batch_stats},
            cfg,
            int8_hidden=int8_hidden,
        )
    )
    predict = jax.jit(
        build_fast_netvlad_inference(cfg, top_k=20, use_pallas=use_pallas)
    )

    features = jax.device_put(
        rng.integers(0, 256, size=(batch, 300, 1152), dtype=np.uint8)
    )
    num_frames = jax.device_put(rng.integers(10, 301, size=(batch,)).astype(np.int32))
    key = jax.random.key(0)

    def chain(iters):
        dep = jnp.zeros((), jnp.int32)
        v = None
        for _ in range(iters):
            v, _ = predict(fp, features, num_frames + dep, key)
            dep = (jnp.sum(v) * 0).astype(jnp.int32)  # device-side serialization
        return float(jnp.sum(v))  # single sync

    chain(1)  # compile + settle
    floor = _sync_floor(jax, jnp)
    # The shared-host environment jitters ±20% between windows; sample more
    # rounds and keep the best sustained one, stopping early once two
    # consecutive rounds fail to improve (device time per round is ~0.2 s —
    # compile dominates the wall clock regardless).
    best = 1e9
    stale = 0
    for _ in range(16):
        t0 = time.perf_counter()
        chain(iters)
        t = time.perf_counter() - t0
        if t < best:
            best, stale = t, 0
        else:
            stale += 1
            # a jittery shared host can put the clean window late; be
            # patient — each round is ~0.2 s of device time
            if stale >= 4 and best < 1e9:
                break
    marginal = (best - floor) / iters
    return batch / marginal, marginal


def main():
    # Fail fast (one JSON error line) instead of hanging the driver if the
    # axon tunnel is unreachable: backend init normally takes seconds; give
    # it 5 minutes, then hard-exit.  The watchdog disarms once devices are
    # enumerated (the remaining work can still be slow, but it is compute,
    # not a dead tunnel).
    import os
    import threading

    armed = threading.Event()

    def _watchdog():
        if not armed.wait(300):
            print(
                json.dumps(
                    {
                        "metric": "netvlad256_inference_videos_per_sec_per_chip",
                        "value": 0.0,
                        "unit": "videos/sec/chip",
                        "vs_baseline": 0.0,
                        "error": "TPU backend init timed out after 300s "
                                 "(axon tunnel unreachable)",
                    }
                ),
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    jax.devices()
    armed.set()

    baseline = 20000.0
    value, step_s = bench()
    print(
        json.dumps(
            {
                "metric": "netvlad256_inference_videos_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "videos/sec/chip",
                "vs_baseline": round(value / baseline, 3),
                "step_ms": round(step_s * 1e3, 2),
                "batch_size": 512,
            }
        )
    )


if __name__ == "__main__":
    main()
