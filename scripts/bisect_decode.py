"""Component bisect of the 8B staged decode step (NOTES round-1: ~31 ms
at B=32 had ~13 ms of append + unexplained residual; round 2's staged
path measured 17.4 ms — this script attributes the remainder).

Each variant is the full chunked decode step with pieces REMOVED, timed
by the same marginal-chain methodology; differences between consecutive
rows attribute cost to the removed component.

Usage: python scripts/bisect_decode.py [--batch 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--context", type=int, default=512)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--wbits", type=int, default=8, choices=(4, 8))
    args = ap.parse_args()

    from bench import marginal_time
    from nnop_tpu.models.llama import LlamaConfig, init_quantized_params
    from nnop_tpu.ops.attention_decode import decode_attention
    from nnop_tpu.runtime.engine import (
        STAGE_W, _merge_heads, _mm, _split_heads, fuse_decode_weights,
    )
    from nnop_tpu.ops.rms_norm import rms_norm
    from nnop_tpu.ops.rope import RotaryEmbedding, llama_rope

    cfg = LlamaConfig.llama3_8b(vocab_size=args.vocab)
    params = fuse_decode_weights(
        init_quantized_params(jax.random.key(0), cfg, wbits=args.wbits)
    )
    jax.block_until_ready(jax.tree.leaves(params)[0])

    B, ctx = args.batch, args.context
    S = -(-(args.context + 128) // 32) * 32
    nl, KH, E = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    kc = jnp.zeros((nl, B, KH, S, E), jnp.int8)
    vc = jnp.zeros((nl, B, KH, S, E), jnp.int8)
    ksc = jnp.zeros((nl, B, KH, S), jnp.float32)
    vsc = jnp.zeros((nl, B, KH, S), jnp.float32)
    kst = jnp.zeros((B, nl, KH, STAGE_W, E), jnp.bfloat16)
    vst = jnp.zeros((B, nl, KH, STAGE_W, E), jnp.bfloat16)
    lengths = jnp.full((B,), ctx, jnp.int32)
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    rope = RotaryEmbedding(cfg.head_dim, cfg.rope_base)

    def step(params, x_tok, *, do_attn, do_rope, do_stage, do_head):
        x = params["embed"][x_tok[:, None]]
        cos, sin = rope(lengths[:, None])
        ks_, vs_ = kst, vst
        for li, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
            qkv = _mm(h, layer["wqkv"])
            q = _split_heads(qkv[..., :qd], cfg.n_heads, cfg.head_dim)
            k = _split_heads(
                qkv[..., qd : qd + kvd], cfg.n_kv_heads, cfg.head_dim
            )
            v = _split_heads(
                qkv[..., qd + kvd :], cfg.n_kv_heads, cfg.head_dim
            )
            if do_rope:
                q, k = llama_rope(q, k, cos, sin)
            if do_stage:
                ks_ = jax.lax.dynamic_update_slice(
                    ks_, k.astype(jnp.bfloat16)[:, None], (0, li, 0, 0, 0)
                )
                vs_ = jax.lax.dynamic_update_slice(
                    vs_, v.astype(jnp.bfloat16)[:, None], (0, li, 0, 0, 0)
                )
            if do_attn:
                o = decode_attention(
                    q, kc, vc, lengths, ksc, vsc,
                    k_stage=ks_, v_stage=vs_, staged_n=1, layer=li,
                )
            else:
                o = q[:, :, :1] + jnp.sum(k + v) * 0  # keep deps alive
            x = x + _mm(_merge_heads(o.astype(x.dtype)), layer["wo"])
            h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
            gu = _mm(h, layer["w_gateup"]).astype(jnp.float32)
            gate = jax.nn.silu(gu[..., : cfg.hidden_dim])
            up = gu[..., cfg.hidden_dim :]
            x = x + _mm((gate * up).astype(x.dtype), layer["w_down"])
        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        if do_head:
            logits = _mm(x, params["lm_head"]).astype(jnp.float32)[:, 0]
            return jnp.argmax(logits, -1).astype(jnp.int32)
        return jnp.sum(x, axis=(1, 2)).astype(jnp.int32)

    import functools

    def timed(f):
        # pass params through the chain state: closing over the 4 GB
        # weight tree captures it as jit CONSTANTS (3.97 GB of lowering
        # constants, catastrophic through the remote-compile tunnel)
        def body(i, carry):
            x, params = carry
            out = f(params, x)
            # data-dependent no-op (a literal *0 gets constant-folded and
            # the whole step DCE'd)
            keep = jnp.where(jnp.sum(out) < -(2**30), 1, 0).astype(x.dtype)
            return (x + keep, params)
        return marginal_time(body, (jnp.ones((B,), jnp.int32), params))

    rows = [
        ("matmuls only (no attn/rope/stage/head)",
         dict(do_attn=False, do_rope=False, do_stage=False, do_head=False)),
        ("+ rope",
         dict(do_attn=False, do_rope=True, do_stage=False, do_head=False)),
        ("+ staging writes",
         dict(do_attn=False, do_rope=True, do_stage=True, do_head=False)),
        ("+ attention",
         dict(do_attn=True, do_rope=True, do_stage=True, do_head=False)),
        ("+ lm head (full step)",
         dict(do_attn=True, do_rope=True, do_stage=True, do_head=True)),
    ]
    prev = 0.0
    for name, kw in rows:
        t = timed(functools.partial(step, **kw))
        print(f"{name}: {t*1e3:.2f} ms/step (+{(t-prev)*1e3:.2f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
