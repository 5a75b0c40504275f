"""Training-throughput benchmark: Willow GatedNetVLAD-256, one chip.

Methodology (see bench.py / CLAUDE.md): the train step donates and returns
the TrainState, so chaining steps through the returned state serializes them
on device with zero host round-trips; one sync at the end, subtract the
~30 ms relay floor.

Usage: python bench_train.py [--batch 256] [--iters 16] [--fused]
       [--bf16_params] [--bf16_momentum]

Prints ONE JSON line {"metric", "value", "unit", "step_ms", ...}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def bench_train(
    batch: int = 256,
    iters: int = 16,
    fused_aggregation: bool = False,
    bf16_params: bool = False,
    bf16_momentum: bool = False,
    use_remat: bool = False,
    model_name: str = "NetVLADModelLF",
    optimizer: str = "AdamOptimizer",
    presample: bool = False,
    fused_adam: bool = False,
    video_level: bool = False,
    grad_accum: int = 1,
):
    import jax
    import jax.numpy as jnp

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.config import ModelConfig, TrainingConfig
    from learnablepoolingmethods_tpu.core import optimizers, step as step_lib
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.models import create_model

    mcfg = ModelConfig(
        iterations=300 if model_name == "NetVLADModelLF" else 30,
        compute_dtype="bfloat16",
        param_dtype="bfloat16" if (bf16_params or fused_adam) else "float32",
        fused_train_aggregation=fused_aggregation,
        presampled=presample,
    )
    tcfg = TrainingConfig(
        batch_size=batch,
        adam_bf16_momentum=bf16_momentum,
        fp32_master=bf16_params and not fused_adam,
        use_remat=use_remat,
        optimizer=optimizer,
        presample_frames=presample,
        fused_adam=fused_adam,
        grad_accum_steps=grad_accum,
    )
    model = create_model(model_name, mcfg)
    rng = np.random.default_rng(0)
    host_batch = {
        "labels": (rng.uniform(size=(batch, 3862)) < 0.002).astype(np.float32),
        "weights": np.ones(batch, np.float32),
    }
    if video_level:
        # video-level tf.Example path: one f32 mean_rgb‖mean_audio vector
        # per video (readers.py#YT8MAggregatedFeatureReader)
        host_batch["features"] = rng.normal(
            scale=0.3, size=(batch, 1152)
        ).astype(np.float32)
    else:
        host_batch["features"] = rng.integers(
            0, 256, size=(batch, 300, 1152), dtype=np.uint8
        )
        host_batch["num_frames"] = rng.integers(
            10, 301, size=(batch,)
        ).astype(np.int32)
    params, batch_stats = step_lib.init_model_variables(
        model,
        {k: v[:4] for k, v in host_batch.items()},
        frame_features=not video_level,
    )
    tx = optimizers.create_optimizer(tcfg)
    state = TrainState.create(params, batch_stats, tx)
    state = jax.device_put(state)
    device_batch = jax.device_put(host_batch)
    key = jax.device_put(jax.random.key(0))

    train_step = jax.jit(
        step_lib.make_train_step(
            model, losses.CrossEntropyLoss(), tcfg, mcfg, not video_level
        ),
        donate_argnums=0,
    )

    def chain(state, n):
        loss = None
        for _ in range(n):
            state, m = train_step(state, device_batch, key)
            loss = m["loss"]
        return state, float(loss)  # one sync

    state, loss0 = chain(state, 1)  # compile + settle
    assert np.isfinite(loss0), loss0

    # sync floor
    @jax.jit
    def nop(x):
        return jnp.sum(x)

    t = jax.device_put(np.ones((8, 8), np.float32))
    float(nop(t))
    floor = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(nop(t))
        floor = min(floor, time.perf_counter() - t0)

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = chain(state, iters)
        best = min(best, time.perf_counter() - t0)
    marginal = (best - floor) / iters
    return batch / marginal, marginal, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--bf16_params", action="store_true")
    ap.add_argument("--bf16_momentum", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--model", default="NetVLADModelLF")
    ap.add_argument("--optimizer", default="AdamOptimizer")
    ap.add_argument("--presample", action="store_true")
    ap.add_argument("--fused_adam", action="store_true")
    ap.add_argument(
        "--grad_accum", type=int, default=1,
        help="microbatches per optimizer step (peak activation memory "
        "scales with batch/accum; effective batches past the B=4096 "
        "activation OOM fit)",
    )
    ap.add_argument(
        "--video_level", action="store_true",
        help="video-level tf.Example features (LogisticModel/MoeModel)",
    )
    args = ap.parse_args()
    eps, step_s, loss = bench_train(
        args.batch,
        args.iters,
        fused_aggregation=args.fused,
        bf16_params=args.bf16_params,
        bf16_momentum=args.bf16_momentum,
        use_remat=args.remat,
        model_name=args.model,
        optimizer=args.optimizer,
        presample=args.presample,
        fused_adam=args.fused_adam,
        video_level=args.video_level,
        grad_accum=args.grad_accum,
    )
    print(
        json.dumps(
            {
                "metric": f"{args.model}_train_examples_per_sec_per_chip",
                "value": round(eps, 1),
                "unit": "examples/sec/chip",
                "step_ms": round(step_s * 1e3, 2),
                "batch_size": args.batch,
                "fused": args.fused,
                "bf16_params": args.bf16_params,
                "bf16_momentum": args.bf16_momentum,
                "optimizer": args.optimizer,
                "grad_accum": args.grad_accum,
                "final_loss": round(loss, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
