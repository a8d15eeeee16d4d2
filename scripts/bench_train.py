"""Training-throughput benchmark on one chip: tokens/s and MFU.

Runs the REAL sharded train step (make_train_step on a 1x1x1 mesh —
same shard_map path multi-chip uses) on a ~460M-param Llama config that
fits one v5e with AdamW f32 moments, and reports tokens/s + model-flops
utilization against the 197 TF/s bf16 MXU peak.

Flops/token = 6P + 12 * n_layers * dim * L (the standard PaLM MFU
accounting: fwd+bwd weight flops + attention) x3.5/3 is folded in by
using 6P for fwd+bwd and adding the attention term with its own
fwd+bwd factor; remat adds ~1 extra forward (recompute) which MFU
convention EXCLUDES (it measures useful model flops).

Usage: python scripts/bench_train.py [--batch 8] [--seq 2048] [--remat]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--remat", action="store_true", default=True)
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    ap.add_argument("--dim", type=int, default=1536)
    ap.add_argument("--layers", type=int, default=14)
    ap.add_argument("--packed", action="store_true",
                    help="packed-document variant: segment masking + "
                    "per-document rope positions (the flagship packed-SP "
                    "train path, VERDICT r2 item 2)")
    args = ap.parse_args()

    from nnop_tpu.models.llama import LlamaConfig, init_params
    from nnop_tpu.parallel.mesh import make_mesh
    from nnop_tpu.parallel.tp_llama import make_train_step, shard_params

    cfg = LlamaConfig(
        vocab_size=32000,
        dim=args.dim,
        n_layers=args.layers,
        n_heads=args.dim // 128,
        n_kv_heads=max(1, args.dim // 512),
        head_dim=128,
        hidden_dim=int(args.dim * 8 // 3 // 256) * 256,
        rope_base=500000.0,
        max_seq_len=args.seq,
        dtype=jnp.bfloat16,
    )
    params = init_params(jax.random.key(0), cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.0f}M params, dim={cfg.dim} "
          f"layers={cfg.n_layers} hidden={cfg.hidden_dim} "
          f"B={args.batch} L={args.seq} remat={args.remat}",
          file=sys.stderr, flush=True)

    mesh = make_mesh(data=1, model=1, seq=1)
    params = shard_params(params, mesh, cfg)
    step, opt = make_train_step(mesh, cfg, remat=args.remat,
                                packed=args.packed)
    state = opt.init(params)

    B, L = args.batch, args.seq
    tokens = jax.random.randint(jax.random.key(1), (B, L), 0,
                                cfg.vocab_size)
    targets = jnp.roll(tokens, -1, axis=1)
    extra = ()
    if args.packed:
        # 4 synthetic documents per row (the shape dataio.pack_tokens_
        # segmented produces): segment ids + per-document positions
        segs = jnp.repeat(jnp.arange(4, dtype=jnp.int32), L // 4)
        segments = jnp.broadcast_to(segs, (B, L))
        positions = jnp.broadcast_to(
            jnp.tile(jnp.arange(L // 4, dtype=jnp.int32), 4), (B, L)
        )
        extra = (segments, positions)

    # donate params/opt state: without donation the chain holds TWO
    # copies of params + AdamW moments (~9 GB at 445M) and OOMs the chip
    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def chain(n, params, state, tokens, targets, *extra):
        def body(i, carry):
            p, s, acc = carry
            p, s, loss = step(p, s, tokens, targets, *extra)
            return p, s, acc + loss

        return jax.lax.fori_loop(
            0, n, body, (params, state, jnp.float32(0.0))
        )

    print("compiling train chain...", file=sys.stderr, flush=True)
    t0 = time.time()
    params, state, _ = chain(1, params, state, tokens, targets, *extra)
    jax.block_until_ready(params)
    print(f"compiled in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    # marginal timing (NOTES.md methodology: ~40 ms host RTT)
    n1, n2 = 10, 40
    t = {}
    for n in (n1, n2, n1, n2):
        t0 = time.time()
        params, state, loss = chain(n, params, state, tokens, targets,
                                    *extra)
        float(loss)
        t[n] = time.time() - t0
    step_s = (t[n2] - t[n1]) / (n2 - n1)

    tok_s = B * L / step_s
    # packed rows attend only within their document (L/4 here) — count
    # the flops actually performed, not the unpacked L
    l_att = L // 4 if args.packed else L
    flops_tok = 6 * n_params + 12 * cfg.n_layers * cfg.dim * l_att
    tf = tok_s * flops_tok / 1e12
    mfu = tf / 197.0
    tag = "packed " if args.packed else ""
    print(f"train step {tag}{step_s*1e3:.1f} ms = {tok_s:,.0f} tokens/s "
          f"-> {tf:.1f} TF/s model flops = {100*mfu:.1f}% MFU "
          f"(v5e bf16 peak 197)")


if __name__ == "__main__":
    main()
