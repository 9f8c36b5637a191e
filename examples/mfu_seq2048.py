"""seq-2048 flash-active train-step MFU experiments (VERDICT r3 weak #3).

The b2 x s2048 flash train step measured 10.2% MFU in round 3 vs 26.4% for
the b8 x s512 math-path step (same 4096 tokens/step). This script breaks the
step down and tries the named levers:

  - batch scaling at fixed seq (b2/b4/b8 at 2048): pallas grid and MXU
    utilization generally improve with more rows per kernel launch;
  - jax.checkpoint (remat) on the per-layer forward: trades recompute FLOPs
    for activation HBM traffic (the usual long-seq win);
  - flash vs math dispatch at each point;
  - component timings: loss-only forward, rel-pos bias table build.

Timing follows the NOTES rules: chained iterations, host-fetch fence,
min-of-3 repeats. Run on an otherwise-idle TPU; tunnel load inflates
everything (results are still comparable within one run).

    python examples/mfu_seq2048.py --batches 2,4,8 --iters 10
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
    ap.add_argument("--batches", default="2,4,8")
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--remat", default="both", choices=("both", "on", "off"),
                    help="restrict the matrix (each combo is a 5-20 min "
                         "fresh XLA compile over the tunnel)")
    ap.add_argument("--flash", default="both", choices=("both", "on", "off"))
    args = ap.parse_args()
    remat_opts = {"both": (False, True), "on": (True,),
                  "off": (False,)}[args.remat]
    flash_opts = {"both": (True, False), "on": (True,),
                  "off": (False,)}[args.flash]

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
                                key=jax.random.PRNGKey(0))
    wrapper = SemanticTransformerWrapper(transformer=model)
    params, rest = partition_trainable(wrapper)
    n_params = tree_size(params)
    tx = optax.adam(1e-4)
    opt_state0 = tx.init(params)
    peak = 197e12

    def measure(fn, *fargs, iters=args.iters):
        out = fn(*fargs)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))  # fence
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = fargs
            for _ in range(iters):
                out = fn(*o)
                # chain via first arg when shapes allow, else refetch
                o = fargs
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    def build_step(remat: bool, flash):
        def step(params, opt_state, ids, key):
            def loss_fn(p):
                p16 = cast_floats(p, jnp.bfloat16)
                w = combine(p16, rest)
                if flash is not None:
                    w = _force_flash(w, flash)
                fwd = (lambda w_, ids_: w_(semantic_token_ids=ids_,
                                           return_loss=True, train=True,
                                           key=key))
                if remat:
                    fwd = jax.checkpoint(fwd)
                return fwd(w, ids)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss
        return jax.jit(step)

    def _force_flash(w, on):
        from audiolm_pytorch_tpu.nn.module import evolve
        tr = w.transformer.transformer
        layers = [(hca, evolve(a, flash=bool(on)), hcc,
                   (evolve(c, flash=bool(on)) if c else None), hcf, f)
                  for (hca, a, hcc, c, hcf, f) in tr.layers]
        tr = evolve(tr, layers=layers)
        return evolve(w, transformer=evolve(w.transformer, transformer=tr))

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        ids = jax.random.randint(jax.random.PRNGKey(1), (b, args.seq), 0, 500)
        key = jax.random.PRNGKey(2)
        tokens = b * args.seq
        flops = 6.0 * n_params * tokens + 12.0 * depth * dim * tokens * args.seq
        for remat in remat_opts:
            for flash in flash_opts:
                try:
                    step = build_step(remat, flash)
                    dt = measure(lambda p, o, i, k: step(p, o, i, k),
                                 params, opt_state0, ids, key)
                    row = dict(batch=b, seq=args.seq, remat=remat, flash=flash,
                               ms_per_step=round(dt * 1e3, 2),
                               tokens_per_s=round(tokens / dt),
                               mfu=round(flops / dt / peak, 4))
                except Exception as e:
                    row = dict(batch=b, seq=args.seq, remat=remat, flash=flash,
                               error=f"{type(e).__name__}: {e}"[:200])
                rows.append(row)
                print(json.dumps(row), flush=True)
    out = Path("results_quality/mfu_seq2048.jsonl")
    with open(out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
