"""HF checkpoint loading: synthetic safetensors round-trips for each
family's name map (Llama, Qwen2 bias, Gemma-2 post-norms/tied), plus the
npz checkpoint save/load."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nnop_tpu.models.llama import LlamaConfig, forward, init_params
from nnop_tpu.models.weights import (
    load_checkpoint,
    load_hf_llama,
    save_checkpoint,
)

safetensors = pytest.importorskip("safetensors.numpy")


def _dump_hf(tmp_path, params, cfg):
    """Write params as an HF-style safetensors shard (transposed projs)."""
    # NB: safetensors serializes the array's base buffer — a transposed
    # view would round-trip as a reshape. Always materialize C-order.
    t = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
    }
    if "lm_head" in params:
        t["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params["lm_head"], np.float32).T
        )
    names = {
        "attn_norm": "input_layernorm.weight",
        "wq": "self_attn.q_proj.weight",
        "wk": "self_attn.k_proj.weight",
        "wv": "self_attn.v_proj.weight",
        "wo": "self_attn.o_proj.weight",
        "w_gate": "mlp.gate_proj.weight",
        "w_up": "mlp.up_proj.weight",
        "w_down": "mlp.down_proj.weight",
        "bq": "self_attn.q_proj.bias",
        "bk": "self_attn.k_proj.bias",
        "bv": "self_attn.v_proj.bias",
    }
    if cfg.post_norms:
        names["attn_post_norm"] = "post_attention_layernorm.weight"
        names["mlp_norm"] = "pre_feedforward_layernorm.weight"
        names["mlp_post_norm"] = "post_feedforward_layernorm.weight"
    else:
        names["mlp_norm"] = "post_attention_layernorm.weight"
    for i, layer in enumerate(params["layers"]):
        for ours, arr in layer.items():
            a = np.asarray(arr, np.float32)
            if cfg.n_experts is not None and ours == "w_router":
                t[f"model.layers.{i}.block_sparse_moe.gate.weight"] = (
                    np.ascontiguousarray(a.T)
                )
                continue
            if cfg.n_experts is not None and ours in ("w_gate", "w_up",
                                                      "w_down"):
                hf = {"w_gate": "w1", "w_up": "w3", "w_down": "w2"}[ours]
                for e in range(cfg.n_experts):
                    t[
                        f"model.layers.{i}.block_sparse_moe.experts."
                        f"{e}.{hf}.weight"
                    ] = np.ascontiguousarray(a[e].T)
                continue
            if ours.startswith("w"):
                a = np.ascontiguousarray(a.T)
            t[f"model.layers.{i}.{names[ours]}"] = a
    safetensors.save_file(t, str(tmp_path / "model.safetensors"))


@pytest.mark.parametrize(
    "knobs",
    [
        dict(),
        dict(qkv_bias=True),
        dict(rms_offset=1.0, act="gelu", tie_embeddings=True,
             embed_scale=128.0**0.5, post_norms=True, attn_softcap=20.0,
             final_softcap=15.0),
        dict(n_experts=4, n_experts_per_token=2),
    ],
    ids=["llama", "qwen-bias", "gemma2", "mixtral"],
)
def test_hf_roundtrip(tmp_path, knobs):
    cfg = LlamaConfig.tiny(dtype=jnp.float32, **knobs)
    params = init_params(jax.random.key(0), cfg)
    _dump_hf(tmp_path, params, cfg)
    loaded = load_hf_llama(str(tmp_path), cfg, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.key(1), (1, 16), 0, cfg.vocab_size)
    want = forward(params, tokens, cfg)
    got = forward(loaded, tokens, cfg)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_npz_checkpoint_roundtrip(tmp_path):
    cfg = LlamaConfig.tiny(dtype=jnp.float32, qkv_bias=True)
    params = init_params(jax.random.key(2), cfg)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    loaded = load_checkpoint(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("arch,extra,expect", [
    ("LlamaForCausalLM", {}, {}),
    ("MixtralForCausalLM",
     {"num_local_experts": 8, "num_experts_per_tok": 2},
     {"n_experts": 8, "n_experts_per_token": 2}),
    ("Qwen2ForCausalLM", {}, {"qkv_bias": True}),
    ("Gemma2ForCausalLM",
     {"attn_logit_softcapping": 50.0, "final_logit_softcapping": 30.0,
      "query_pre_attn_scalar": 256, "sliding_window": 4096},
     {"post_norms": True, "attn_softcap": 50.0, "sliding_window": 4096,
      "tie_embeddings": True}),
])
def test_config_from_hf(tmp_path, arch, extra, expect):
    import json

    from nnop_tpu.models.weights import config_from_hf

    hf = dict(
        architectures=[arch], vocab_size=1024, hidden_size=256,
        num_hidden_layers=3, num_attention_heads=8,
        num_key_value_heads=4, intermediate_size=512,
        rope_theta=500000.0, rms_norm_eps=1e-6,
        max_position_embeddings=4096,
    )
    hf.update(extra)
    (tmp_path / "config.json").write_text(json.dumps(hf))
    cfg = config_from_hf(str(tmp_path))
    assert cfg.dim == 256 and cfg.n_layers == 3
    assert cfg.rope_base == 500000.0 and cfg.head_dim == 32
    for k, v in expect.items():
        assert getattr(cfg, k) == v, (k, getattr(cfg, k), v)


def test_config_from_hf_llama31_rope_scaling(tmp_path):
    import json

    from nnop_tpu.models.weights import config_from_hf

    hf = dict(
        architectures=["LlamaForCausalLM"], vocab_size=1024,
        hidden_size=256, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=4, intermediate_size=512,
        rope_scaling=dict(rope_type="llama3", factor=8.0,
                          low_freq_factor=1.0, high_freq_factor=4.0,
                          original_max_position_embeddings=8192),
    )
    (tmp_path / "config.json").write_text(json.dumps(hf))
    cfg = config_from_hf(str(tmp_path))
    assert cfg.rope_scaling == (8.0, 1.0, 4.0, 8192)
