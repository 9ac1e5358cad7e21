"""Probe: does XLA lower int8 convs to the v5e MXU's double-rate path?

v5e peaks at ~394 TOPS int8 vs ~197 TFLOPs bf16. The generator stages (ICN
resnet trunk + VUNet decoder) are conv-compute-bound at ~52 ms of the ~103 ms
scene budget, so int8 convs are the single biggest single-chip lever left —
IF XLA lowers `conv_general_dilated(int8, int8, preferred_element_type=int32)`
onto the double-rate MXU path rather than upcasting.

Times three 30-conv chains at the ICN trunk shape (batch 24, 64^2, 256->256,
3x3): bf16, int8 with STATIC scales (isolates the conv itself), and int8 with
DYNAMIC per-tensor activation scales + requantize between layers (the shape a
real post-training-quantized serving path takes). Timing follows the repo's
readback rule (fresh inputs per iter, one device-reduced scalar read per iter
— see .claude/skills/verify/SKILL.md).

Usage: python tools/probe_int8_conv.py [--iters 8] [--depth 30]
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--ch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    N, R, C, D = args.batch, args.res, args.ch, args.depth
    rng = np.random.RandomState(0)
    w_f = jnp.asarray(rng.randn(D, 3, 3, C, C).astype(np.float32) * 0.05)

    def conv(x, w, pet=None):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )

    @jax.jit
    def chain_bf16(x):
        w = w_f.astype(jnp.bfloat16)
        for i in range(D):
            x = jnp.maximum(conv(x, w[i]), 0.0) * 0.1
        return jnp.sum(x[0, ::16, ::16, 0].astype(jnp.float32))

    wq_static = jnp.clip(jnp.round(w_f / 0.05 * 64.0), -127, 127).astype(jnp.int8)

    @jax.jit
    def chain_int8_static(xq):
        # int8 in/out each layer with a fixed requant multiplier: pure conv cost.
        for i in range(D):
            acc = conv(xq, wq_static[i], pet=jnp.int32)
            xq = jnp.clip(acc >> 9, -127, 127).astype(jnp.int8)
        return jnp.sum(xq[0, ::16, ::16, 0].astype(jnp.float32))

    from future_urban_scene_generation_tpu.models.layers import _int8_conv

    @jax.jit
    def chain_int8_dynamic(x):
        # bf16 tensors between layers; the REAL serving quantizer
        # (layers._int8_conv: dynamic per-input-channel act scales folded into
        # per-output-channel weight scales).
        for i in range(D):
            y = _int8_conv(x, w_f[i].astype(jnp.bfloat16), 1, 1)
            x = (jnp.maximum(y, 0.0) * 0.1).astype(jnp.bfloat16)
        return jnp.sum(x[0, ::16, ::16, 0].astype(jnp.float32))

    flops = D * N * R * R * C * C * 9 * 2
    results = {}
    for name, fn, mk in [
        ("bf16", chain_bf16,
         lambda: jnp.asarray(rng.rand(N, R, R, C).astype(np.float32) * 2 - 1,
                             jnp.bfloat16)),
        ("int8_static", chain_int8_static,
         lambda: jnp.asarray(
             rng.randint(-127, 128, (N, R, R, C)).astype(np.int8))),
        ("int8_dynamic", chain_int8_dynamic,
         lambda: jnp.asarray(rng.rand(N, R, R, C).astype(np.float32) * 2 - 1,
                             jnp.bfloat16)),
    ]:
        try:
            _ = float(fn(mk()))  # compile + warm
            xs = [mk() for _ in range(args.iters)]
            jax.block_until_ready(xs)
            ts = []
            for x in xs:
                t0 = time.perf_counter()
                _ = float(fn(x))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            med = ts[len(ts) // 2]
            results[name] = {
                "ms": round(med * 1e3, 3),
                "tflops": round(flops / med / 1e12, 1),
            }
        except Exception as e:  # lowering failure is a result, not a crash
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
