"""HF checkpoint -> parameter pytree loader.

The reference loads models through `AutoModelForCausalLM`
(`/root/reference/models/LMClass.py:40-43`); here checkpoints are read
directly from safetensors/torch shards into the framework's stacked-layer
pytree — no torch module tree, no HF model class, and weights land
pre-transposed to the `[in, out]` matmul layout.

Zero-egress note: only local checkpoint directories are supported
(`from_hf_checkpoint("/path/to/Meta-Llama-3-8B")`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .configs import ModelConfig


def config_from_hf(path: str) -> ModelConfig:
    """Translate a HF config.json into a ModelConfig."""
    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    mt = raw.get("model_type", "llama")
    # HF `rope_scaling` (Llama-3.1 "llama3" NTK-by-parts, or "linear");
    # ignoring this silently breaks long-context logits parity.
    rs = raw.get("rope_scaling") or {}
    rs_kind = rs.get("rope_type", rs.get("type"))
    if rs_kind == "default":
        rs_kind = None
    rope_scaling_fields = dict(
        rope_scaling_type=rs_kind,
        rope_scaling_factor=rs.get("factor", 1.0),
        rope_low_freq_factor=rs.get("low_freq_factor", 1.0),
        rope_high_freq_factor=rs.get("high_freq_factor", 4.0),
        rope_original_max_pos=rs.get("original_max_position_embeddings", 8192),
    )
    if mt == "llama":
        return ModelConfig(
            arch="llama",
            **rope_scaling_fields,
            vocab_size=raw["vocab_size"],
            hidden_size=raw["hidden_size"],
            intermediate_size=raw["intermediate_size"],
            num_layers=raw["num_hidden_layers"],
            num_heads=raw["num_attention_heads"],
            num_kv_heads=raw.get("num_key_value_heads", raw["num_attention_heads"]),
            max_position_embeddings=raw.get("max_position_embeddings", 8192),
            rope_theta=raw.get("rope_theta", 10000.0),
            rms_norm_eps=raw.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=raw.get("tie_word_embeddings", False),
        )
    if mt == "mixtral":
        return ModelConfig(
            arch="mixtral",
            vocab_size=raw["vocab_size"],
            hidden_size=raw["hidden_size"],
            intermediate_size=raw["intermediate_size"],
            num_layers=raw["num_hidden_layers"],
            num_heads=raw["num_attention_heads"],
            num_kv_heads=raw.get("num_key_value_heads", raw["num_attention_heads"]),
            max_position_embeddings=raw.get("max_position_embeddings", 32768),
            rope_theta=raw.get("rope_theta", 1e6),
            rms_norm_eps=raw.get("rms_norm_eps", 1e-5),
            num_experts=raw.get("num_local_experts", 8),
            num_experts_per_tok=raw.get("num_experts_per_tok", 2),
            tie_word_embeddings=raw.get("tie_word_embeddings", False),
        )
    if mt in ("falcon", "RefinedWeb", "RefinedWebModel"):
        n_heads = raw.get("num_attention_heads", raw.get("n_head"))
        # HF FalconAttention's precedence: `num_kv_heads` only applies under
        # new_decoder_architecture; otherwise multi_query forces 1 KV head
        # (the config still serializes num_kv_heads == num_attention_heads).
        if raw.get("new_decoder_architecture", False):
            n_kv = raw.get("num_kv_heads") or raw.get("n_head_kv") or n_heads
        elif raw.get("multi_query", True):
            n_kv = 1
        else:
            n_kv = n_heads
        return ModelConfig(
            arch="falcon",
            vocab_size=raw["vocab_size"],
            hidden_size=raw["hidden_size"],
            intermediate_size=4 * raw["hidden_size"],
            num_layers=raw.get("num_hidden_layers", raw.get("n_layer")),
            num_heads=n_heads,
            num_kv_heads=n_kv,
            max_position_embeddings=raw.get("max_position_embeddings", 2048),
            rope_theta=raw.get("rope_theta", 10000.0),
            activation="gelu",
            parallel_block=raw.get("parallel_attn", True),
            tie_word_embeddings=raw.get("tie_word_embeddings", False),
        )
    if mt == "opt":
        return ModelConfig(
            arch="opt",
            vocab_size=raw["vocab_size"],
            hidden_size=raw["hidden_size"],
            intermediate_size=raw["ffn_dim"],
            num_layers=raw["num_hidden_layers"],
            num_heads=raw["num_attention_heads"],
            num_kv_heads=raw["num_attention_heads"],
            max_position_embeddings=raw["max_position_embeddings"],
            activation="relu",
            tie_word_embeddings=raw.get("tie_word_embeddings", True),
            do_layer_norm_before=raw.get("do_layer_norm_before", True),
        )
    raise ValueError(f"unsupported model_type {mt}")


def _load_tensors(path: str) -> Dict[str, np.ndarray]:
    """Read all weight shards (safetensors preferred, torch .bin fallback)."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors import safe_open

        for fname in st_files:
            with safe_open(os.path.join(path, fname), framework="numpy") as f:
                for key in f.keys():
                    tensors[key] = f.get_tensor(key)
        return tensors
    bin_files = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
    if not bin_files:
        raise FileNotFoundError(f"no safetensors/bin shards in {path}")
    import torch

    for fname in bin_files:
        sd = torch.load(os.path.join(path, fname), map_location="cpu", weights_only=True)
        for key, val in sd.items():
            tensors[key] = val.to(torch.float32).numpy()
    return tensors


# HF parameter name templates per arch: ours -> (template, transpose)
_LLAMA_LAYER = {
    "q": ("model.layers.{i}.self_attn.q_proj.weight", True),
    "k": ("model.layers.{i}.self_attn.k_proj.weight", True),
    "v": ("model.layers.{i}.self_attn.v_proj.weight", True),
    "o": ("model.layers.{i}.self_attn.o_proj.weight", True),
    "gate": ("model.layers.{i}.mlp.gate_proj.weight", True),
    "up": ("model.layers.{i}.mlp.up_proj.weight", True),
    "down": ("model.layers.{i}.mlp.down_proj.weight", True),
    "ln1.w": ("model.layers.{i}.input_layernorm.weight", False),
    "ln2.w": ("model.layers.{i}.post_attention_layernorm.weight", False),
}
_OPT_LAYER = {
    "q": ("model.decoder.layers.{i}.self_attn.q_proj.weight", True),
    "k": ("model.decoder.layers.{i}.self_attn.k_proj.weight", True),
    "v": ("model.decoder.layers.{i}.self_attn.v_proj.weight", True),
    "o": ("model.decoder.layers.{i}.self_attn.out_proj.weight", True),
    "fc1": ("model.decoder.layers.{i}.fc1.weight", True),
    "fc2": ("model.decoder.layers.{i}.fc2.weight", True),
    "q.b": ("model.decoder.layers.{i}.self_attn.q_proj.bias", False),
    "k.b": ("model.decoder.layers.{i}.self_attn.k_proj.bias", False),
    "v.b": ("model.decoder.layers.{i}.self_attn.v_proj.bias", False),
    "o.b": ("model.decoder.layers.{i}.self_attn.out_proj.bias", False),
    "fc1.b": ("model.decoder.layers.{i}.fc1.bias", False),
    "fc2.b": ("model.decoder.layers.{i}.fc2.bias", False),
    "ln1.w": ("model.decoder.layers.{i}.self_attn_layer_norm.weight", False),
    "ln1.b": ("model.decoder.layers.{i}.self_attn_layer_norm.bias", False),
    "ln2.w": ("model.decoder.layers.{i}.final_layer_norm.weight", False),
    "ln2.b": ("model.decoder.layers.{i}.final_layer_norm.bias", False),
}


def _split_falcon_qkv(qkv: np.ndarray, cfg: ModelConfig, grouped: bool):
    """Split a fused query_key_value weight [(rows), D] into q/k/v row
    blocks, matching HF Falcon's `_split_heads`
    (`models/int_falcon_layer.py:65-94`):

    - new-decoder-architecture (40B/180B): rows grouped per KV group as
      [q_1..q_{H/Hkv}, k, v] × Hkv;
    - multi-query (7B): contiguous [all H q-heads, k, v];
    - classic MHA (Hkv == H): per-head interleaved [q, k, v] × H.
    """
    hd = cfg.head_dim_
    h, hkv = cfg.num_heads, cfg.num_kv_heads
    d = qkv.shape[1]
    if grouped:
        blocks = qkv.reshape(hkv, h // hkv + 2, hd, d)
        q = blocks[:, :-2].reshape(h * hd, d)
        k = blocks[:, -2].reshape(hkv * hd, d)
        v = blocks[:, -1].reshape(hkv * hd, d)
    elif hkv == 1:
        q = qkv[: h * hd]
        k = qkv[h * hd : (h + 1) * hd]
        v = qkv[(h + 1) * hd :]
    else:  # interleaved per head; hkv == h
        blocks = qkv.reshape(h, 3, hd, d)
        q = blocks[:, 0].reshape(h * hd, d)
        k = blocks[:, 1].reshape(h * hd, d)
        v = blocks[:, 2].reshape(h * hd, d)
    return q, k, v


def _falcon_layers(raw, cfg: ModelConfig, dtype) -> Dict[str, Any]:
    """Falcon shards: split the fused query_key_value projection into the
    framework's separate q/k/v entries. The 40B new-decoder layout (dual
    ln_attn/ln_mlp norms, per-group QKV rows) is detected by key."""
    L = cfg.num_layers
    new_arch = f"transformer.h.0.ln_attn.weight" in raw
    qs, ks, vs, os_, f1, f2 = [], [], [], [], [], []
    ln_w, ln_b, ln2_w, ln2_b = [], [], [], []
    for i in range(L):
        pre = f"transformer.h.{i}"
        qkv = raw[f"{pre}.self_attention.query_key_value.weight"].astype(np.float32)
        q, k, v = _split_falcon_qkv(qkv, cfg, grouped=new_arch)
        qs.append(q.T)
        ks.append(k.T)
        vs.append(v.T)
        os_.append(raw[f"{pre}.self_attention.dense.weight"].astype(np.float32).T)
        f1.append(raw[f"{pre}.mlp.dense_h_to_4h.weight"].astype(np.float32).T)
        f2.append(raw[f"{pre}.mlp.dense_4h_to_h.weight"].astype(np.float32).T)
        ln1_name = "ln_attn" if new_arch else "input_layernorm"
        ln_w.append(raw[f"{pre}.{ln1_name}.weight"].astype(np.float32))
        ln_b.append(raw[f"{pre}.{ln1_name}.bias"].astype(np.float32))
        if new_arch:
            ln2_w.append(raw[f"{pre}.ln_mlp.weight"].astype(np.float32))
            ln2_b.append(raw[f"{pre}.ln_mlp.bias"].astype(np.float32))

    def stk(xs):
        return jnp.asarray(np.stack(xs), dtype)

    out = {
        "q": {"w": stk(qs)},
        "k": {"w": stk(ks)},
        "v": {"w": stk(vs)},
        "o": {"w": stk(os_)},
        "fc1": {"w": stk(f1)},
        "fc2": {"w": stk(f2)},
        "ln1": {"w": stk(ln_w), "b": stk(ln_b)},
    }
    if new_arch:
        out["ln2"] = {"w": stk(ln2_w), "b": stk(ln2_b)}
    return out


def from_hf_checkpoint(
    path: str, cfg: Optional[ModelConfig] = None, dtype=jnp.bfloat16
) -> tuple:
    """Load (params, cfg) from a local HF checkpoint directory."""
    cfg = cfg or config_from_hf(path)
    raw = _load_tensors(path)

    def get(name, transpose=False):
        t = raw[name].astype(np.float32)
        return jnp.asarray(t.T if transpose else t, dtype)

    if cfg.arch == "falcon":
        params = {
            "layers": _falcon_layers(raw, cfg, dtype),
            "embed": get("transformer.word_embeddings.weight"),
            "norm": {"w": get("transformer.ln_f.weight"), "b": get("transformer.ln_f.bias")},
        }
        if "lm_head.weight" in raw and not cfg.tie_word_embeddings:
            params["lm_head"] = get("lm_head.weight", transpose=True)
        return params, cfg

    L = cfg.num_layers
    if cfg.arch == "mixtral":
        # Llama-style trunk + block_sparse_moe: HF stores the router as
        # `gate.weight` [E, D] and per-expert w1/w3/w2 Linears; here the
        # experts stack to [L, E, K, N] (w1=gate, w3=up, w2=down) and the
        # router lands fp at [L, D, E] — the reference excludes it from
        # quantization (`quant/omniquant.py:198-206`).
        layers = {}
        for ours, (tmpl, tr) in _LLAMA_LAYER.items():
            if ours in ("gate", "up", "down"):
                continue
            stacked = jnp.stack([get(tmpl.format(i=i), tr) for i in range(L)])
            if "." in ours:
                top, sub = ours.split(".")
                layers.setdefault(top, {})[sub] = stacked
            else:
                layers.setdefault(ours, {})["w"] = stacked
        E = cfg.num_experts
        moe = "model.layers.{i}.block_sparse_moe"
        layers["router"] = {
            "w": jnp.stack([get(f"{moe}.gate.weight".format(i=i), True) for i in range(L)])
        }
        layers["experts"] = {
            ours: {
                "w": jnp.stack(
                    [
                        jnp.stack(
                            [
                                get(f"{moe}.experts.{{e}}.{hf}.weight".format(i=i, e=e), True)
                                for e in range(E)
                            ]
                        )
                        for i in range(L)
                    ]
                )
            }
            for ours, hf in (("gate", "w1"), ("up", "w3"), ("down", "w2"))
        }
        params = {
            "layers": layers,
            "embed": get("model.embed_tokens.weight"),
            "norm": {"w": get("model.norm.weight")},
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = get("lm_head.weight", transpose=True)
        return params, cfg

    table = _LLAMA_LAYER if cfg.arch == "llama" else _OPT_LAYER

    layers: Dict[str, Any] = {}
    for ours, (tmpl, tr) in table.items():
        stacked = jnp.stack([get(tmpl.format(i=i), tr) for i in range(L)])
        if "." in ours:
            top, sub = ours.split(".")
            layers.setdefault(top, {})[sub] = stacked
        else:
            layers.setdefault(ours, {})["w"] = stacked

    params: Dict[str, Any] = {"layers": layers}
    if cfg.arch == "llama":
        params["embed"] = get("model.embed_tokens.weight")
        params["norm"] = {"w": get("model.norm.weight")}
        if not cfg.tie_word_embeddings:
            params["lm_head"] = get("lm_head.weight", transpose=True)
    else:
        params["embed"] = get("model.decoder.embed_tokens.weight")
        params["pos_embed"] = get("model.decoder.embed_positions.weight")
        ln_key = "model.decoder.final_layer_norm"
        params["norm"] = {"w": get(f"{ln_key}.weight"), "b": get(f"{ln_key}.bias")}
        if not cfg.tie_word_embeddings and "lm_head.weight" in raw:
            params["lm_head"] = get("lm_head.weight", transpose=True)
    return params, cfg


def save_hf_checkpoint(params, cfg: ModelConfig, path: str) -> None:
    """Write an fp param pytree as a HF-format checkpoint directory
    (config.json + model.safetensors with transformers' parameter names) —
    the exact inverse of `from_hf_checkpoint` for the llama/opt families.

    Purpose: round-trip testing of the checkpoint path itself (golden-study
    HF variant) and interop — a model quantize-dequantized here can be
    handed back to the reference's `AutoModelForCausalLM` flow (its
    fake-quant export, `/root/reference/main.py:399-414`)."""
    from safetensors.numpy import save_file

    if cfg.arch not in ("llama", "opt"):
        raise NotImplementedError(f"save_hf_checkpoint: arch {cfg.arch}")
    os.makedirs(path, exist_ok=True)
    if cfg.arch == "llama":
        hf_cfg = {
            "model_type": "llama",
            "architectures": ["LlamaForCausalLM"],
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "max_position_embeddings": cfg.max_position_embeddings,
            "rope_theta": cfg.rope_theta,
            "rms_norm_eps": cfg.rms_norm_eps,
            "tie_word_embeddings": cfg.tie_word_embeddings,
            "torch_dtype": "float32",
        }
        table = _LLAMA_LAYER
        embed_key, norm_key = "model.embed_tokens.weight", "model.norm.weight"
    else:
        hf_cfg = {
            "model_type": "opt",
            "architectures": ["OPTForCausalLM"],
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "ffn_dim": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "max_position_embeddings": cfg.max_position_embeddings,
            "do_layer_norm_before": cfg.do_layer_norm_before,
            "tie_word_embeddings": cfg.tie_word_embeddings,
            "torch_dtype": "float32",
        }
        table = _OPT_LAYER
        embed_key = "model.decoder.embed_tokens.weight"
        norm_key = "model.decoder.final_layer_norm.weight"
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)

    def leaf(entry, ours):
        if "." in ours:
            top, sub = ours.split(".")
            return entry.get(top, {}).get(sub)
        return entry.get(ours, {}).get("w")

    tensors: Dict[str, np.ndarray] = {}
    layers = params["layers"]
    for ours, (tmpl, tr) in table.items():
        stacked = leaf(layers, ours)
        if stacked is None:  # optional biases absent in this model
            continue
        arr = np.asarray(stacked, dtype=np.float32)
        for i in range(cfg.num_layers):
            t = arr[i]
            tensors[tmpl.format(i=i)] = np.ascontiguousarray(t.T if tr else t)
    tensors[embed_key] = np.asarray(params["embed"], np.float32)
    tensors[norm_key] = np.asarray(params["norm"]["w"], np.float32)
    if cfg.arch == "opt":
        tensors["model.decoder.embed_positions.weight"] = np.asarray(
            params["pos_embed"], np.float32
        )
        tensors["model.decoder.final_layer_norm.bias"] = np.asarray(
            params["norm"]["b"], np.float32
        )
    if "lm_head" in params and not cfg.tie_word_embeddings:
        tensors["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params["lm_head"], np.float32).T
        )
    save_file(tensors, os.path.join(path, "model.safetensors"))


def save_checkpoint(params, cfg: ModelConfig, path: str) -> None:
    """Persist a (possibly quantized) param pytree with metadata — the
    framework-native analogue of the reference's `save_pretrained` fake-
    quant export (`main.py:399-414`). Uses jax.numpy savez of flattened
    leaves + a JSON treedef manifest."""
    import dataclasses as dc

    from ..utils.pytree_io import save_pytree_npz

    os.makedirs(path, exist_ok=True)
    save_pytree_npz(os.path.join(path, "params.npz"), params)

    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"config": dc.asdict(cfg)}, f)


def load_checkpoint(path: str, params_like) -> Any:
    """Restore leaves into the structure of `params_like` (same treedef)."""
    from ..utils.pytree_io import load_pytree_npz

    return load_pytree_npz(os.path.join(path, "params.npz"), params_like)


def save_checkpoint_orbax(params, path: str) -> None:
    """Orbax checkpoint of a (possibly quantized) param pytree — the
    production path for sharded/async saves on pods; QuantizedTensor
    leaves serialize like any arrays (registered pytree)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params)


def load_checkpoint_orbax(path: str, params_like):
    """Restore an orbax checkpoint into the structure/shardings of
    `params_like` (abstract values suffice)."""
    import jax
    import orbax.checkpoint as ocp

    template = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, params_like)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)
