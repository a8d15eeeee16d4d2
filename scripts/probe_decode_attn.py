"""Microbench: decode_attention at ENGINE shapes (8B serving geometry).

Round-1/2 bisect attributed ~5.5 ms of the 17.4 ms B=32 decode step to
attention (32 layers), vs a ~2.2 ms KV-stream bound — this probe times
the kernel alone at engine shapes to find where the 2.5x goes
(per-grid-step overhead vs DMA vs VPU), and A/Bs a batched-B grid.

Usage: python scripts/probe_decode_attn.py [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def marginal(fn, args, n1, n2):
    @jax.jit
    def chain(n, *a):
        def body(i, c):
            # thread the carry into the first (float) arg so XLA cannot
            # hoist the loop-invariant call out of the fori_loop
            r = fn(a[0] + (c * 1e-30).astype(a[0].dtype), *a[1:])
            return c + r.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    for n in (n1, n2):
        chain(n, *args).block_until_ready()
    t = {}
    for n in (n1, n2, n1, n2):
        t0 = time.perf_counter()
        float(chain(n, *args))
        t[n] = time.perf_counter() - t0
    return (t[n2] - t[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--max-seq", type=int, default=640)
    args = ap.parse_args()

    from nnop_tpu.ops.attention_decode import decode_attention

    B, KH, QH, E, S = args.batch, 8, 32, 128, args.max_seq
    W = 32
    nl = 2  # stacked like the engine (2 layers keeps the cache args
    # small; per-layer cost is what we measure — layer index 0 vs 1
    # compiles the same kernel shape)
    ks = jax.random.split(jax.random.key(0), 8)
    q = jax.random.normal(ks[0], (B, QH, 1, E), jnp.bfloat16)
    kc = jax.random.randint(ks[1], (nl, B, KH, S, E), -127, 128, jnp.int8)
    vc = jax.random.randint(ks[2], (nl, B, KH, S, E), -127, 128, jnp.int8)
    ksc = jnp.abs(jax.random.normal(ks[3], (nl, B, KH, S), jnp.float32))
    vsc = jnp.abs(jax.random.normal(ks[4], (nl, B, KH, S), jnp.float32))
    kst = jax.random.normal(ks[5], (B, nl, KH, W, E), jnp.bfloat16)
    vst = jax.random.normal(ks[6], (B, nl, KH, W, E), jnp.bfloat16)
    lengths = jnp.full((B,), args.ctx, jnp.int32)
    stn = jnp.asarray(16, jnp.int32)

    bytes_layer = (
        2 * B * KH * S * E  # int8 k+v
        + 2 * 4 * B * KH * S  # scales
        + 2 * 2 * B * KH * W * E  # staging bf16
    )

    # caches are jit ARGUMENTS (closure capture bakes them in as
    # program constants and re-uploads GBs per compile — NOTES.md)
    base_bytes = 2 * B * KH * S * E  # int8 k+v only

    for nb in (1, 8):
        def one_layer(q, kc, vc, ksc, vsc, kst, vst, lengths, stn,
                      _nb=nb):
            return decode_attention(
                q, kc, vc, lengths, ksc, vsc,
                k_stage=kst, v_stage=vst, staged_n=stn, layer=0,
                block_b=_nb,
            )

        t = marginal(one_layer,
                     (q, kc, vc, ksc, vsc, kst, vst, lengths, stn),
                     40, 240)
        gbps = bytes_layer / t / 1e9
        print(f"B={B} S={S} ctx={args.ctx} block_b={nb}: per-layer "
              f"decode_attention {t*1e6:.1f} us, "
              f"{bytes_layer/1e6:.1f} MB -> {gbps:.0f} GB/s "
              f"(a decode step pays 32x this)", flush=True)

    # native int8 MXU dots (no K/V casts): staging + scales, engine mode
    for nb in (1, 8):
        def i8dots(q, kc, vc, ksc, vsc, kst, vst, lengths, stn,
                   _nb=nb):
            return decode_attention(
                q, kc, vc, lengths, ksc, vsc,
                k_stage=kst, v_stage=vst, staged_n=stn, layer=0,
                block_b=_nb, int8_dots=True,
            )

        t = marginal(i8dots,
                     (q, kc, vc, ksc, vsc, kst, vst, lengths, stn),
                     40, 240)
        gbps = bytes_layer / t / 1e9
        print(f"  int8_dots block_b={nb}: {t*1e6:.1f} us -> "
              f"{gbps:.0f} GB/s", flush=True)

    # variants to locate the slow stream
    for nb in (1, 8):
        def no_stage(q, kc, vc, ksc, vsc, lengths, _nb=nb):
            return decode_attention(q, kc, vc, lengths, ksc, vsc,
                                    layer=0, block_b=_nb)

        t = marginal(no_stage, (q, kc, vc, ksc, vsc, lengths), 40, 240)
        bts = base_bytes + 2 * 4 * B * KH * S
        print(f"  no-staging block_b={nb}: {t*1e6:.1f} us -> "
              f"{bts/t/1e9:.0f} GB/s", flush=True)

    kf = kc[:, :, :, :, :].astype(jnp.bfloat16) * 0.01
    vf = vc.astype(jnp.bfloat16) * 0.01
    for nb in (1, 8):
        def fp_plain(q, kf, vf, lengths, _nb=nb):
            return decode_attention(q, kf, vf, lengths, layer=0,
                                    block_b=_nb)

        t = marginal(fp_plain, (q, kf, vf, lengths), 40, 240)
        bts = 2 * base_bytes  # bf16 k+v
        print(f"  bf16 no-scales no-staging block_b={nb}: "
              f"{t*1e6:.1f} us -> {bts/t/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
