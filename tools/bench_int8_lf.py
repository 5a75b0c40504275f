"""e2e spot check: `--int8_hidden` on the NetFV / NetRVLAD fast paths.

The isolated-FC win is already measured (tools/bench_int8_hidden.py: the
[262144,1024]-class weight is HBM-bound at B=256, int8 ~2.8×); this drives
the FULL fast inference path per model at B=256 (where the NetVLAD analog
gained +14.3% e2e) and at B=512 (where it measured neutral) so BASELINE.md
gets real numbers instead of an extrapolation.

Run on the real chip:  python tools/bench_int8_lf.py [batch]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from learnablepoolingmethods_tpu.config import ModelConfig
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.models import create_model
    from learnablepoolingmethods_tpu.ops.fast_lf import (
        build_fast_lf_inference,
        prepare_fast_lf_params,
    )
    from _bench_util import timeit

    batches = [int(a) for a in sys.argv[1:]] or [256, 512]
    F, DIN = 300, 1152
    # iterations=300 matches how every LF BASELINE.md row is measured
    # (bench.py / the round-2 LF captures): sample all 300 frames.
    cfg = ModelConfig(iterations=300, compute_dtype="bfloat16")
    rng = np.random.default_rng(0)

    for name in ("NetFVModelLF", "NetRVLADModelLF"):
        model = create_model(name, cfg)
        feats_small = rng.integers(0, 256, (4, F, DIN), dtype=np.uint8)
        nf_small = rng.integers(10, F + 1, (4,)).astype(np.int32)
        params, bstats = step_lib.init_model_variables(
            model, {"features": feats_small, "num_frames": nf_small}, True
        )
        variables = {
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(bstats),
        }
        fast = jax.jit(build_fast_lf_inference(cfg, name, top_k=20))
        fp16 = jax.device_put(prepare_fast_lf_params(variables, cfg, name))
        fp8 = jax.device_put(
            prepare_fast_lf_params(variables, cfg, name, int8_hidden=True)
        )
        for b in batches:
            feats = jax.device_put(
                jnp.asarray(rng.integers(0, 256, (b, F, DIN), dtype=np.uint8))
            )
            nf = jax.device_put(
                jnp.asarray(rng.integers(10, F + 1, (b,)).astype(np.int32))
            )
            key = jax.random.key(7)
            t = timeit(
                lambda dep: fast(fp16, feats, nf + dep.astype(jnp.int32), key)
            )
            print(f"{name} bf16 @ B={b}: {t*1e3:.2f} ms ({b/t:,.0f} videos/s)")
            t8 = timeit(
                lambda dep: fast(fp8, feats, nf + dep.astype(jnp.int32), key)
            )
            print(
                f"{name} int8 @ B={b}: {t8*1e3:.2f} ms ({b/t8:,.0f} videos/s)"
                f"  [{t/t8:.3f}x]"
            )
            # spot parity: identical rng → same top-k indices, close values
            v16, i16 = fast(fp16, feats, nf, key)
            v8, i8 = fast(fp8, feats, nf, key)
            same = float(jnp.mean((i16[:, 0] == i8[:, 0]).astype(jnp.float32)))
            dv = float(jnp.max(jnp.abs(v16 - v8)))
            print(f"  top-1 agreement {same:.3f}, max |dv| {dv:.2e}")


if __name__ == "__main__":
    main()
