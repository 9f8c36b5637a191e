"""Measure the flash-vs-math crossover for the production LM attention config
(VERDICT r2 weak #1/#3): fwd+bwd WITH a trained rel-pos bias (so the round-3
fused dbias kernel is on the flash path), across sequence lengths.

Sets the empirical basis for `_FLASH_AUTO_MIN_SEQ` in models/transformer.py
and the BASELINE.md flash rows. Fetch-timed with chained iterations (NOTES
measurement rules).

    python examples/bench_flash_crossover.py            # TPU
    python examples/bench_flash_crossover.py --cpu      # interpret-mode smoke
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seqs", type=int, nargs="*",
                    default=[128, 256, 512, 1024, 2048])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim-head", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from audiolm_pytorch_tpu.ops.attention import attend
    from audiolm_pytorch_tpu.ops.pallas.flash_attention import flash_attention

    b, h, d = args.batch, args.heads, args.dim_head
    dtype = jnp.dtype(args.dtype)

    for n in args.seqs:
        key = jax.random.PRNGKey(0)
        kq, kk, kv, kb = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, h, n, d), dtype)
        k = jax.random.normal(kk, (b, 1, n, d), dtype)  # MQA
        v = jax.random.normal(kv, (b, 1, n, d), dtype)
        bias = 0.1 * jax.random.normal(kb, (h, n, n), jnp.float32)

        def loss_flash(q, k, v, bias):
            return jnp.sum(flash_attention(
                q, k, v, bias=bias, causal=True).astype(jnp.float32))

        def loss_math(q, k, v, bias):
            return jnp.sum(attend(
                q, k, v, attn_bias=bias, causal=True).astype(jnp.float32))

        row = {"seq": n}
        for name, fn in (("flash", loss_flash), ("math", loss_math)):
            g = jax.jit(jax.grad(fn, argnums=(0, 1, 2, 3)))
            try:
                grads = g(q, k, v, bias)
                float(jnp.sum(grads[0].astype(jnp.float32)))  # warm
                # min of 3 repeats: the tunnel adds multi-ms jitter spikes,
                # and min is the robust statistic for a deterministic program
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    qq = q
                    for _ in range(args.iters):
                        grads = g(qq, k, v, bias)
                        qq = qq + 0 * grads[0]  # chain
                    float(jnp.sum(grads[0].astype(jnp.float32)))
                    best = min(best,
                               (time.perf_counter() - t0) / args.iters * 1e3)
                row[f"{name}_ms"] = round(best, 3)
            except Exception as e:
                row[f"{name}_ms"] = f"ERR {type(e).__name__}"
        if isinstance(row.get("flash_ms"), float) and \
           isinstance(row.get("math_ms"), float):
            row["speedup"] = round(row["math_ms"] / row["flash_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
