#!/usr/bin/env python
"""Benchmark the TPU-native Mask R-CNN (VERDICT r2 item 3).

The reference runs torchvision Mask R-CNN once per vehicle per future step
(trajectory_inference.py:115-119, 319-324). This measures jitted
``maskrcnn_infer`` on one chip at the detector's working shape (512, 1024)
— the static-shape analogue of GeneralizedRCNNTransform's resize — with the
honest protocol (fresh input each iteration + device-scalar readback).

    python tools/maskrcnn_bench.py [--dtype float32|bfloat16] [--iters 10]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )

    from future_urban_scene_generation_tpu.models.maskrcnn import (
        MaskRCNN, maskrcnn_infer,
    )

    model = MaskRCNN(compute_dtype=jnp.dtype(args.dtype))
    ih, iw = args.hw
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, jnp.zeros((1, ih, iw, 3)))
    infer = jax.jit(lambda p, x: maskrcnn_infer(p, x, model=model))

    rng = np.random.RandomState(0)
    det = infer(params, jnp.asarray(rng.rand(ih, iw, 3), jnp.float32))
    _ = float(jnp.sum(det.scores))  # warm the program

    inputs = [jnp.asarray(rng.rand(ih, iw, 3), jnp.float32)
              for _ in range(args.iters)]
    jax.block_until_ready(inputs)
    # Serial latency: dispatch -> execute -> read, includes the tunnel RTT.
    times = []
    for x in inputs:
        t0 = time.perf_counter()
        det = infer(params, x)
        _ = float(jnp.sum(det.scores))  # device scalar readback
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    # Pipelined throughput (bench.py protocol): checksum enqueued right behind
    # its own inference, blocked on one iteration later, so the FIFO device
    # queue never drains between frames.
    pt = []
    pending = []
    checksum = 0.0
    for x in inputs:
        t0 = time.perf_counter()
        det = infer(params, x)
        pending.append(jnp.sum(det.scores))
        if len(pending) > 1:
            checksum += float(pending.pop(0))
        pt.append(time.perf_counter() - t0)
    while pending:
        checksum += float(pending.pop(0))
    assert np.isfinite(checksum)
    pt = sorted(pt[1:]) or pt
    med_pipe = pt[len(pt) // 2]
    print(json.dumps({
        "metric": "maskrcnn_infer_ms",
        "value": round(med * 1e3, 2),
        "unit": "ms",
        "pipelined_ms": round(med_pipe * 1e3, 2),
        "pipelined_fps": round(1.0 / med_pipe, 2),
        "input_hw": [ih, iw],
        "dtype": args.dtype,
        "iters": args.iters,
        "spread_ms": [round(times[0] * 1e3, 2), round(times[-1] * 1e3, 2)],
    }))


if __name__ == "__main__":
    main()
