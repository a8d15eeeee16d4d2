"""Weight loading: HuggingFace Llama safetensors -> nnop_tpu param tree,
plus dependency-free checkpoint save/load.

North-star scope (Llama-3-8B end-to-end decode). The environment has no
network egress, so loading requires a local safetensors checkpoint; random
init (models/llama.py) covers everything else.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from nnop_tpu.models.llama import LlamaConfig


def _hf_layer_map(i: int, cfg: LlamaConfig | None = None):
    """HF name map for one decoder layer, family-aware:

    * Llama/Mistral/Qwen: mlp_norm is `post_attention_layernorm` (it
      PRE-cedes the MLP despite the name).
    * Gemma-2 (post_norms): `post_attention_layernorm` is the attention
      POST-norm; the MLP pre/post norms are `pre_feedforward_layernorm` /
      `post_feedforward_layernorm`.
    * Qwen2 (qkv_bias): q/k/v biases ride along.

    Gemma's (1+w) norm convention matches rms_offset=1 with weights
    stored as w — no transform needed on load.
    """
    p = f"model.layers.{i}."
    m = {
        "attn_norm": p + "input_layernorm.weight",
        "wq": p + "self_attn.q_proj.weight",
        "wk": p + "self_attn.k_proj.weight",
        "wv": p + "self_attn.v_proj.weight",
        "wo": p + "self_attn.o_proj.weight",
        "mlp_norm": p + "post_attention_layernorm.weight",
        "w_gate": p + "mlp.gate_proj.weight",
        "w_up": p + "mlp.up_proj.weight",
        "w_down": p + "mlp.down_proj.weight",
    }
    if cfg is not None and cfg.post_norms:
        m["attn_post_norm"] = p + "post_attention_layernorm.weight"
        m["mlp_norm"] = p + "pre_feedforward_layernorm.weight"
        m["mlp_post_norm"] = p + "post_feedforward_layernorm.weight"
    if cfg is not None and cfg.qkv_bias:
        m["bq"] = p + "self_attn.q_proj.bias"
        m["bk"] = p + "self_attn.k_proj.bias"
        m["bv"] = p + "self_attn.v_proj.bias"
    if cfg is not None and cfg.n_experts is not None:
        # Mixtral: the dense MLP names don't exist; handled by stacking
        # block_sparse_moe.experts.* in load_hf_llama.
        for key in ("w_gate", "w_up", "w_down"):
            del m[key]
        m["w_router"] = p + "block_sparse_moe.gate.weight"
    return m


def load_hf_llama(path: str, cfg: LlamaConfig, dtype=None):
    """Load a local HF Llama checkpoint directory (safetensors shards).

    HF stores projection weights as (out_features, in_features); this tree
    uses (in, out), so projections are transposed on load.
    """
    from safetensors import safe_open  # ships with transformers

    dtype = dtype or cfg.dtype
    shards = [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".safetensors")
    ]
    if not shards:
        raise FileNotFoundError(f"no .safetensors files in {path}")

    tensors = {}
    for shard in shards:
        with safe_open(shard, framework="np") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)

    def get(name, transpose=False):
        t = tensors[name]
        if transpose:
            t = t.T
        return jnp.asarray(t).astype(dtype)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "final_norm": get("model.norm.weight"),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = get(
            "lm_head.weight"
            if "lm_head.weight" in tensors
            else "model.embed_tokens.weight",  # tied checkpoint, untied cfg
            transpose=True,
        )
    for i in range(cfg.n_layers):
        m = _hf_layer_map(i, cfg)
        layer = {}
        for ours, theirs in m.items():
            layer[ours] = get(theirs, transpose=ours.startswith("w"))
        if cfg.n_experts is not None:
            # Mixtral experts: w1 = gate (h, d), w3 = up (h, d),
            # w2 = down (d, h) in HF layout; stack transposed to
            # (E, d, h) / (E, h, d) as models/moe.py expects.
            p = f"model.layers.{i}.block_sparse_moe.experts."
            for ours, theirs in (("w_gate", "w1"), ("w_up", "w3"),
                                 ("w_down", "w2")):
                layer[ours] = jnp.stack([
                    get(f"{p}{e}.{theirs}.weight", transpose=True)
                    for e in range(cfg.n_experts)
                ])
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# checkpoint save / load (flat-key npz; no orbax dependency on the hot path)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(path: str, params):
    flat = _flatten(params)
    np.savez(path, **flat)


def load_checkpoint(path: str, like):
    """Load into the structure of `like` (same tree as saved)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        return jnp.asarray(data[prefix[:-1]])

    return rebuild(like)


_HF_ARCH_DEFAULTS = {
    # per-family knobs not expressible in config.json fields alone
    "LlamaForCausalLM": {},
    "MistralForCausalLM": {},
    "MixtralForCausalLM": {},
    "Qwen2ForCausalLM": {"qkv_bias": True},
    "Gemma2ForCausalLM": {"rms_offset": 1.0, "act": "gelu",
                          "post_norms": True, "window_pattern": 2},
    "GemmaForCausalLM": {"rms_offset": 1.0, "act": "gelu"},
}


def config_from_hf(path: str, **overrides) -> LlamaConfig:
    """Build a LlamaConfig from a HF checkpoint directory's config.json.

    Covers the supported families (Llama/3.1, Mistral, Mixtral, Qwen2,
    Gemma/Gemma-2); anything else raises. `overrides` win over both the
    file and the family defaults (e.g. dtype=jnp.float32)."""
    import json

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    arch = (hf.get("architectures") or ["LlamaForCausalLM"])[0]
    if arch not in _HF_ARCH_DEFAULTS:
        raise ValueError(f"unsupported architecture {arch!r}")

    dim = hf["hidden_size"]
    n_heads = hf["num_attention_heads"]
    kw = dict(
        vocab_size=hf["vocab_size"],
        dim=dim,
        n_layers=hf["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=hf.get("num_key_value_heads", n_heads),
        head_dim=hf.get("head_dim", dim // n_heads),
        hidden_dim=hf["intermediate_size"],
        rope_base=hf.get("rope_theta", 10000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-5),
        max_seq_len=hf.get("max_position_embeddings", 8192),
    )
    if hf.get("sliding_window"):
        kw["sliding_window"] = hf["sliding_window"]
    if hf.get("tie_word_embeddings"):
        kw["tie_embeddings"] = True
    rs = hf.get("rope_scaling")
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        kw["rope_scaling"] = (
            rs["factor"], rs["low_freq_factor"], rs["high_freq_factor"],
            rs["original_max_position_embeddings"],
        )
    if arch == "MixtralForCausalLM":
        kw["n_experts"] = hf["num_local_experts"]
        kw["n_experts_per_token"] = hf["num_experts_per_tok"]
        kw["router_aux_coef"] = hf.get("router_aux_loss_coef", 0.01)
    if arch == "Gemma2ForCausalLM":
        kw["attn_softcap"] = hf.get("attn_logit_softcapping", 50.0)
        kw["final_softcap"] = hf.get("final_logit_softcapping", 30.0)
        q = hf.get("query_pre_attn_scalar")
        if q:
            kw["attn_scale"] = q**-0.5
    if arch in ("GemmaForCausalLM", "Gemma2ForCausalLM"):
        kw["embed_scale"] = float(dim) ** 0.5
        kw["tie_embeddings"] = True
    kw.update(_HF_ARCH_DEFAULTS[arch])
    kw.update(overrides)
    return LlamaConfig(**kw)
