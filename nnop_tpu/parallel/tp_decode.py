"""Tensor-parallel SERVING: the staged chunked decode step sharded over
the "model" mesh axis (Megatron layout), so one sequence batch decodes
across all chips of a host/slice.

North-star scope (BASELINE.json: "tokens/s scaling 1 -> 4 hosts" for the
8B INT8 decode). The training-side TP lives in tp_llama.py; this module
shards the INFERENCE state and step:

* wq/wk/wv column-sharded -> each shard computes its local Q/KV heads;
  the KV caches and staging buffers are head-sharded (KH/tp local), so
  the flash-decode kernel and flush_staging run unmodified on local
  shapes inside shard_map.
* wo/w_down row-sharded -> one psum per block over "model" (rides ICI).
* lm_head vocab-sharded -> sampling is distributed: greedy picks the
  global argmax from per-shard (max, index) pairs; temperature sampling
  uses the Gumbel-max trick with per-shard keys (exact categorical
  sample, full logits never materialized).

Per decode step the ONLY cross-chip traffic is 2 psums of (B, 1, d) and
the sampling reduction — the KV stream, weights, and staging writes are
all shard-local, which is what makes near-linear tokens/s scaling
possible on the HBM-bound decode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P
from jax import shard_map

from nnop_tpu.models.llama import LlamaConfig, _merge_heads, _split_heads
from nnop_tpu.ops.attention_decode import decode_attention
from nnop_tpu.ops.rms_norm import rms_norm
from nnop_tpu.ops.rope import RotaryEmbedding, llama_rope
from nnop_tpu.runtime.engine import EngineState, _mm


def decode_param_specs(cfg: LlamaConfig):
    """PartitionSpecs for UNFUSED decode params (Megatron TP layout).
    QTensor leaves shard their `values` like the dense weight and their
    per-output-channel `scale` along the same output axis."""
    layer = {
        "attn_norm": P(),
        "wq": P(None, "model"),
        "wk": P(None, "model"),
        "wv": P(None, "model"),
        "wo": P("model", None),
        "mlp_norm": P(),
        "w_gate": P(None, "model"),
        "w_up": P(None, "model"),
        "w_down": P("model", None),
    }
    if cfg.n_experts is not None:
        # MoE serving: experts sharded over "model" (stacked dim 0),
        # router replicated; contributions summed by the existing psum
        layer.update({
            "w_router": P(),
            "w_gate": P("model", None, None),
            "w_up": P("model", None, None),
            "w_down": P("model", None, None),
        })
    return {
        "embed": P(),
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
        "final_norm": P(),
        "lm_head": P(None, "model"),
    }


def state_specs():
    """PartitionSpecs for EngineState: caches/staging head-sharded."""
    return EngineState(
        k=P(None, None, "model", None, None),
        v=P(None, None, "model", None, None),
        k_scale=P(None, None, "model", None),
        v_scale=P(None, None, "model", None),
        lengths=P(),
        last_token=P(),
        k_stage=P(None, None, "model", None, None),
        v_stage=P(None, None, "model", None, None),
        page_table=None,
    )


def _local_cfg(cfg: LlamaConfig, tp: int) -> LlamaConfig:
    if cfg.n_heads % tp or cfg.n_kv_heads % tp:
        raise ValueError(
            f"n_heads {cfg.n_heads} / n_kv_heads {cfg.n_kv_heads} "
            f"not divisible by tp={tp}"
        )
    import dataclasses

    return dataclasses.replace(
        cfg, n_heads=cfg.n_heads // tp, n_kv_heads=cfg.n_kv_heads // tp
    )


def make_tp_decode_chunk(mesh: Mesh, cfg: LlamaConfig, quantized: bool,
                         chunk: int, temperature: float = 0.0):
    """Returns jitted chunk(params, state, key) -> (tokens (chunk, B),
    state), with params/state sharded per decode_param_specs/state_specs.
    """
    from nnop_tpu.ops.kv_write import flush_staging

    tp = mesh.shape["model"]
    lcfg = _local_cfg(cfg, tp)

    def local_chunk(params, state: EngineState, key):
        B = state.lengths.shape[0]
        rope = RotaryEmbedding(cfg.head_dim, cfg.rope_base, scaling=cfg.rope_scaling)

        def step(i, carry):
            k_stage, v_stage, last, key, toks = carry
            key, sub = jax.random.split(key)
            positions = (state.lengths + i)[:, None]
            x = params["embed"][last[:, None]]
            cos, sin = rope(positions)

            for li, layer in enumerate(params["layers"]):
                h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
                q = _split_heads(
                    _mm(h, layer["wq"]), lcfg.n_heads, cfg.head_dim
                )
                k = _split_heads(
                    _mm(h, layer["wk"]), lcfg.n_kv_heads, cfg.head_dim
                )
                v = _split_heads(
                    _mm(h, layer["wv"]), lcfg.n_kv_heads, cfg.head_dim
                )
                q, k = llama_rope(q, k, cos, sin)
                k_stage = jax.lax.dynamic_update_slice(
                    k_stage, k.astype(jnp.bfloat16)[:, None],
                    (0, li, 0, i, 0),
                )
                v_stage = jax.lax.dynamic_update_slice(
                    v_stage, v.astype(jnp.bfloat16)[:, None],
                    (0, li, 0, i, 0),
                )
                o = decode_attention(
                    q, state.k, state.v, state.lengths,
                    state.k_scale, state.v_scale,
                    k_stage=k_stage, v_stage=v_stage, staged_n=i + 1,
                    layer=li,
                )
                att = _mm(_merge_heads(o.astype(x.dtype)), layer["wo"])
                x = x + jax.lax.psum(att, "model")

                h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
                if cfg.n_experts is not None:
                    from nnop_tpu.models.moe import moe_mlp_local_experts

                    n_local = cfg.n_experts // tp
                    lo = jax.lax.axis_index("model") * n_local
                    down = moe_mlp_local_experts(
                        layer, h[:, 0], cfg, act=jax.nn.silu,
                        lo=lo, n_local=n_local,
                    )[:, None]
                else:
                    gate = jax.nn.silu(
                        _mm(h, layer["w_gate"]).astype(jnp.float32)
                    )
                    up = _mm(h, layer["w_up"]).astype(jnp.float32)
                    down = _mm((gate * up).astype(x.dtype), layer["w_down"])
                x = x + jax.lax.psum(down, "model")

            x = rms_norm(x, params["final_norm"], cfg.rms_eps)
            logits_local = _mm(x, params["lm_head"]).astype(jnp.float32)[
                :, 0
            ]  # (B, V/tp)
            v_local = logits_local.shape[-1]
            shard = jax.lax.axis_index("model")
            if temperature > 0.0:
                # Gumbel-max over the sharded vocab: per-shard keys give
                # i.i.d. gumbels; the global argmax is an exact
                # categorical sample of softmax(logits / T)
                gkey = jax.random.fold_in(sub, shard)
                g = jax.random.gumbel(gkey, logits_local.shape)
                score = logits_local / temperature + g
            else:
                score = logits_local
            loc_max = jnp.max(score, axis=-1)
            loc_idx = (
                shard * v_local + jnp.argmax(score, axis=-1)
            ).astype(jnp.int32)
            all_max = jax.lax.all_gather(loc_max, "model")  # (tp, B)
            all_idx = jax.lax.all_gather(loc_idx, "model")
            win = jnp.argmax(all_max, axis=0)  # (B,)
            nxt = jnp.take_along_axis(all_idx, win[None], axis=0)[0]
            toks = jax.lax.dynamic_update_slice(toks, nxt[None], (i, 0))
            return (k_stage, v_stage, nxt, key, toks)

        toks0 = jnp.zeros((chunk, B), jnp.int32)
        k_stage, v_stage, last, _, toks = jax.lax.fori_loop(
            0, chunk, step,
            (state.k_stage, state.v_stage, state.last_token, key, toks0),
        )
        kc, vc, ksc, vsc = flush_staging(
            state.k, state.v, state.k_scale, state.v_scale,
            k_stage, v_stage, state.lengths,
        )
        active = (state.lengths > 0).astype(jnp.int32)
        new_state = EngineState(
            k=kc, v=vc, k_scale=ksc, v_scale=vsc,
            lengths=state.lengths + chunk * active,
            last_token=last,
            k_stage=k_stage, v_stage=v_stage,
        )
        return toks, new_state

    pspecs = decode_param_specs(cfg)
    sspecs = state_specs()
    if not quantized:
        sspecs = dataclasses_replace_none(sspecs)
    sharded = shard_map(
        local_chunk,
        mesh=mesh,
        in_specs=(pspecs, sspecs, P()),
        out_specs=(P(), sspecs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def dataclasses_replace_none(sspecs: EngineState) -> EngineState:
    """fp-cache states have no scale leaves; drop their specs."""
    import dataclasses

    return dataclasses.replace(sspecs, k_scale=None, v_scale=None)


def shard_decode_params(params, mesh: Mesh, cfg: LlamaConfig):
    """device_put the UNFUSED decode params with TP shardings (QTensor
    leaves shard values along the dense axis, scales along outputs)."""
    from nnop_tpu.ops.quantization import QTensor

    specs = decode_param_specs(cfg)

    def put(x, s):
        if isinstance(x, QTensor):
            vspec = s
            if len(s) == 3:  # stacked experts: scale (E, N) follows dim 0
                sspec = P(s[0])
            else:
                # scale is per-output-channel: shard iff the output axis is
                out_axis = s[1] if len(s) > 1 else None
                sspec = P(out_axis) if s == P(None, "model") else (
                    P() if s == P("model", None) else P(out_axis)
                )
            return QTensor(
                jax.device_put(x.values, NamedSharding(mesh, vspec)),
                jax.device_put(x.scale, NamedSharding(mesh, sspec)),
                x.axis,
            )
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(
        put, params, specs,
        is_leaf=lambda x: isinstance(x, QTensor) or hasattr(x, "shape"),
    )


def shard_decode_state(state: EngineState, mesh: Mesh) -> EngineState:
    sspecs = state_specs()
    import dataclasses

    kw = {}
    for f in dataclasses.fields(EngineState):
        v = getattr(state, f.name)
        s = getattr(sspecs, f.name)
        if v is None or s is None:
            kw[f.name] = v
        else:
            kw[f.name] = jax.device_put(v, NamedSharding(mesh, s))
    return EngineState(**kw)
