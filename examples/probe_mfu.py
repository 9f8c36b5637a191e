"""MFU probe for the LM train step: bisect the round-4 b8xs512 regression
(26.4% -> 18.0%, VERDICT r4 weak #2) and the seq-2048 flash row. Measures the
same jitted step as bench.py's lm sections, but with switches for the two
round-4 changes touching this path:

  --streams N     hyper-connection residual streams (4 = reference default,
                  1 = plain residual, the round-3 effective configuration)
  --no-relpos     drop the rel-pos bias (isolates toeplitz_expand + dbias)
  --profile DIR   wrap the timed loop in a jax.profiler trace

    python examples/probe_mfu.py --batch 8 --seq 512 --streams 4
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--no-relpos", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--profile", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from audiolm_pytorch_tpu.models.lm import SemanticTransformer
    from audiolm_pytorch_tpu.models.wrappers import SemanticTransformerWrapper
    from audiolm_pytorch_tpu.nn.module import (cast_floats, combine,
                                               partition_trainable, tree_size)

    dim, depth = 1024, 6
    model = SemanticTransformer(dim=dim, depth=depth, heads=8,
                                num_semantic_tokens=500,
                                num_residual_streams=args.streams,
                                rel_pos_bias=not args.no_relpos,
                                key=jax.random.PRNGKey(0))
    wrapper = SemanticTransformerWrapper(transformer=model)
    params, rest = partition_trainable(wrapper)
    tx = optax.adam(1e-4)
    opt_state0 = tx.init(params)
    n_params = tree_size(params)

    ids = jax.random.randint(jax.random.PRNGKey(1), (args.batch, args.seq),
                             0, 500)

    @jax.jit
    def step(params, opt_state, ids, key):
        def loss_fn(p):
            p16 = cast_floats(p, jnp.bfloat16)
            w = combine(p16, rest)
            return w(semantic_token_ids=ids, return_loss=True, train=True,
                     key=key)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    key = jax.random.PRNGKey(2)
    t0 = time.time()
    p, opt_state, loss = step(params, opt_state0, ids, key)
    float(loss)
    print(f"compile+first step: {time.time()-t0:.1f}s", flush=True)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    best = float("inf")
    for _ in range(args.repeats):
        p = params
        opt_state = opt_state0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p, opt_state, loss = step(p, opt_state, ids, key)
        float(jnp.sum(jax.tree_util.tree_leaves(p)[0])) + float(loss)
        best = min(best, time.perf_counter() - t0)
    if args.profile:
        jax.profiler.stop_trace()

    dt = best / args.iters
    tokens = args.batch * args.seq
    flops = 6.0 * n_params * tokens + 12.0 * depth * dim * tokens * args.seq
    peak = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
            "TPU v5p": 459e12, "TPU v6e": 918e12}.get(
                jax.devices()[0].device_kind)
    mfu = flops / dt / peak if peak else float("nan")
    print({"batch": args.batch, "seq": args.seq, "streams": args.streams,
           "relpos": not args.no_relpos, "ms_per_step": round(dt * 1e3, 2),
           "tokens_per_s": round(tokens / dt), "mfu": round(mfu, 4)},
          flush=True)


if __name__ == "__main__":
    main()
