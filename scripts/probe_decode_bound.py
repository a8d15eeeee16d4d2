"""Decode-step composite bound table (VERDICT r4 item 4: the W8A8
bound-table treatment applied to the 8B decode step).

Marginal-accounts one engine decode step at B=32 / B=64 into:
  matmuls (int8 weight stream) / rope / staging writes / decode
  attention / lm_head+sampling / flush (per-chunk, amortized) /
  chunk glue (fori_loop + token collection) / host dispatch residue
and compares each against its HBM-roofline bound, so "20.3 ms/step" is
either shown to sit on its composite bound or the gap is located.

Components reuse the ENGINE's own building blocks (_layer_qkv /
_attn_out / _layer_mlp / _lm_logits / sample_tokens / decode_attention /
flush_staging), so the ablation sums to the real chunk program's
interior; the full chunk program (make_decode_chunk) and the wall-clock
Engine.step() are measured as cross-checks above it.

Usage: python scripts/probe_decode_bound.py [--batches 32 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM_GBPS = 819.0  # v5e spec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--context", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--engine", action="store_true",
                    help="also measure wall-clock Engine.step() (slow: "
                    "builds + warms a full Engine per batch size)")
    args = ap.parse_args()

    from bench import marginal_time
    from nnop_tpu.models.llama import LlamaConfig, init_quantized_params
    from nnop_tpu.ops.attention_decode import decode_attention
    from nnop_tpu.ops.kv_write import flush_staging
    from nnop_tpu.ops.rms_norm import rms_norm
    from nnop_tpu.ops.rope import RotaryEmbedding, llama_rope
    from nnop_tpu.runtime.engine import (
        STAGE_W, EngineState, _attn_out, _embed_tokens, _layer_mlp,
        _layer_qkv, _lm_logits, fuse_decode_weights, make_decode_chunk,
        sample_tokens,
    )

    cfg = LlamaConfig.llama3_8b(vocab_size=args.vocab)
    print("building random INT8 8B params...", file=sys.stderr, flush=True)
    params = fuse_decode_weights(
        init_quantized_params(jax.random.key(0), cfg, wbits=8))
    jax.block_until_ready(jax.tree.leaves(params)[0])

    # ---- byte accounting for the bounds -----------------------------
    def tree_bytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t)
                   if hasattr(x, "dtype"))

    layer_bytes = tree_bytes(params["layers"])
    head_bytes = tree_bytes(params["lm_head"])
    other_bytes = tree_bytes(params) - layer_bytes - head_bytes
    print(f"weights: layers {layer_bytes/1e9:.2f} GB + lm_head "
          f"{head_bytes/1e9:.2f} GB + other {other_bytes/1e9:.2f} GB",
          flush=True)

    nl, KH, E = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    rope = RotaryEmbedding(cfg.head_dim, cfg.rope_base)

    for B in args.batches:
        S = -(-(args.context + 128) // 32) * 32
        lengths = jnp.full((B,), args.context, jnp.int32)
        state = EngineState(
            k=jnp.zeros((nl, B, KH, S, E), jnp.int8),
            v=jnp.zeros((nl, B, KH, S, E), jnp.int8),
            k_scale=jnp.ones((nl, B, KH, S), jnp.float32) * 0.01,
            v_scale=jnp.ones((nl, B, KH, S), jnp.float32) * 0.01,
            lengths=lengths,
            last_token=jnp.ones((B,), jnp.int32),
            k_stage=jnp.zeros((B, nl, KH, STAGE_W, E), jnp.bfloat16),
            v_stage=jnp.zeros((B, nl, KH, STAGE_W, E), jnp.bfloat16),
        )

        # ---- component single-step (engine building blocks) ---------
        def step1(params, state, last, key, *, do_rope, do_stage, do_attn,
                  do_head, do_sample):
            ks_, vs_ = state.k_stage, state.v_stage
            x = _embed_tokens(params, cfg, last[:, None])
            cos, sin = rope(state.lengths[:, None])
            for li, layer in enumerate(params["layers"]):
                h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
                q, k, v = _layer_qkv(layer, h, cfg)
                if do_rope:
                    q, k = llama_rope(q, k, cos, sin)
                if do_stage:
                    ks_ = jax.lax.dynamic_update_slice(
                        ks_, k.astype(jnp.bfloat16)[:, None],
                        (0, li, 0, 0, 0))
                    vs_ = jax.lax.dynamic_update_slice(
                        vs_, v.astype(jnp.bfloat16)[:, None],
                        (0, li, 0, 0, 0))
                if do_attn:
                    o = decode_attention(
                        q, state.k, state.v, state.lengths,
                        state.k_scale, state.v_scale,
                        k_stage=ks_, v_stage=vs_, staged_n=1, layer=li,
                        block_b=0)
                else:
                    o = q[:, :, :1] + jnp.sum(k + v) * 0
                x = _attn_out(layer, o, x, cfg)
                x = _layer_mlp(layer, x, cfg)
            x = rms_norm(x, params["final_norm"], cfg.rms_eps)
            if do_head:
                logits = _lm_logits(params, cfg, x)[:, 0]
                if do_sample:
                    return sample_tokens(logits, key, 0.0, 0, 1.0, 0.0)
                return jnp.argmax(logits, -1).astype(jnp.int32)
            return jnp.sum(x, axis=(1, 2)).astype(jnp.int32) % cfg.vocab_size

        def timed_step(**flags):
            def body(i, carry):
                last, params, key = carry
                out = step1(params, state, last, key, **flags)
                keep = jnp.where(jnp.sum(out) < -(2 ** 30), 1, 0)
                return (last + keep, params, key)
            return marginal_time(
                body, (jnp.ones((B,), jnp.int32), params,
                       jax.random.PRNGKey(1)))

        rows = [
            ("matmuls", dict(do_rope=False, do_stage=False, do_attn=False,
                             do_head=False, do_sample=False)),
            ("+rope", dict(do_rope=True, do_stage=False, do_attn=False,
                           do_head=False, do_sample=False)),
            ("+staging", dict(do_rope=True, do_stage=True, do_attn=False,
                              do_head=False, do_sample=False)),
            ("+attention", dict(do_rope=True, do_stage=True, do_attn=True,
                                do_head=False, do_sample=False)),
            ("+head+sample", dict(do_rope=True, do_stage=True, do_attn=True,
                                  do_head=True, do_sample=True)),
        ]
        prev, comp = 0.0, {}
        for name, flags in rows:
            t = timed_step(**flags)
            comp[name] = t - prev
            print(f"B={B} {name}: {t*1e3:.2f} ms/step "
                  f"(+{(t-prev)*1e3:.2f})", flush=True)
            prev = t
        t_step = prev

        # ---- flush (per chunk) ---------------------------------------
        def flush_body(i, carry):
            kc, vc, ksc, vsc = flush_staging(
                carry[0], carry[1], carry[2], carry[3],
                state.k_stage, state.v_stage, lengths)
            return (kc, vc, ksc, vsc)
        t_flush = marginal_time(
            flush_body, (state.k, state.v, state.k_scale, state.v_scale))
        print(f"B={B} flush_staging: {t_flush*1e3:.2f} ms/chunk "
              f"({t_flush/args.chunk*1e3:.3f} ms/step amortized)",
              flush=True)

        # ---- the real chunk program ----------------------------------
        chunk_fn = jax.jit(make_decode_chunk(cfg, True, args.chunk))

        def chunk_body(i, carry):
            st, key, params_ = carry  # params in the carry, NOT closed
            key, sub = jax.random.split(key)
            toks, ns = chunk_fn(params_, st, sub)
            st2 = EngineState(
                k=ns.k, v=ns.v, k_scale=ns.k_scale, v_scale=ns.v_scale,
                lengths=lengths + jnp.sum(toks[:1]) * 0,  # keep dep, reset
                last_token=ns.last_token,
                k_stage=ns.k_stage, v_stage=ns.v_stage)
            return (st2, key, params_)
        t_chunk = marginal_time(
            chunk_body, (state, jax.random.PRNGKey(2), params),
            n1=4, n2=12)
        print(f"B={B} chunk program: {t_chunk*1e3:.2f} ms/chunk = "
              f"{t_chunk/args.chunk*1e3:.2f} ms/step "
              f"-> {B*args.chunk/t_chunk:.0f} tok/s", flush=True)

        # ---- bounds table --------------------------------------------
        wb = layer_bytes + head_bytes
        t_w_bound = wb / (HBM_GBPS * 1e9)
        cache_bytes = (2 * nl * B * KH * S * E  # int8 K+V
                       + 2 * nl * B * KH * S * 4  # scales
                       + 2 * B * nl * KH * STAGE_W * E * 2)  # staging
        t_a_bound = cache_bytes / (HBM_GBPS * 1e9)
        glue = t_chunk / args.chunk - t_step - t_flush / args.chunk
        print(
            f"B={B} TABLE ms/step: matmuls {comp['matmuls']*1e3:.2f} "
            f"(weight-stream bound {t_w_bound*1e3:.2f}) | attn "
            f"{comp['+attention']*1e3:.2f} (cache bound "
            f"{t_a_bound*1e3:.2f}) | rope {comp['+rope']*1e3:.2f} | "
            f"staging {comp['+staging']*1e3:.2f} | head+sample "
            f"{comp['+head+sample']*1e3:.2f} | flush/chunk "
            f"{t_flush/args.chunk*1e3:.3f} | glue "
            f"{glue*1e3:.2f} | chunk-prog/step "
            f"{t_chunk/args.chunk*1e3:.2f}", flush=True)

        if args.engine:
            from nnop_tpu.runtime.engine import Engine
            eng = Engine(params, cfg, max_batch=B,
                         max_seq=args.context + 128 + 8,
                         quantized_kv=True, chunk_size=args.chunk,
                         fuse_weights=False)  # params already fused
            eng.warmup(prompt_lengths=(args.context,))
            for _ in range(B):
                eng.submit([7] * args.context, max_new_tokens=120)
            eng.step()
            for _ in range(2):
                eng.step()
            n = 6
            t0 = time.perf_counter()
            for _ in range(n):
                eng.step()
            dt = (time.perf_counter() - t0) / n
            print(f"B={B} Engine.step wall: {dt*1e3:.1f} ms/chunk = "
                  f"{dt/args.chunk*1e3:.2f} ms/step -> "
                  f"{B*args.chunk/dt:.0f} tok/s (host residue "
                  f"{(dt-t_chunk)*1e3:.1f} ms/chunk)", flush=True)


if __name__ == "__main__":
    main()
