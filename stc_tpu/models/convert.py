"""HF -> JAX weight converters.

The reference loads HF checkpoints directly (from_pretrained); we convert the
torch state dicts into the stacked-pytree layout that models/qwen2.py &
models/siglip.py consume.  Torch is CPU-only in this environment and used
solely as a checkpoint reader.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from stc_tpu.models.qwen2 import Qwen2Config


def _np(t) -> np.ndarray:
    """torch tensor / np array -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float().numpy()
    return np.asarray(t, dtype=np.float32)


def convert_qwen2(state: Dict[str, Any], cfg: Qwen2Config,
                  prefix: str = "model.", dtype=jnp.bfloat16):
    """Convert a HF Qwen2ForCausalLM state dict to the stacked pytree.

    state: mapping name -> tensor (torch or numpy).
    prefix: the HF submodule prefix ('model.' for a bare Qwen2ForCausalLM,
    'language_model.model.' inside LLaVA-OneVision).
    """
    L = cfg.num_layers

    def get(name):
        return _np(state[name])

    def stack(fmt, transpose=False):
        mats = [get(fmt.format(i=i)) for i in range(L)]
        out = np.stack(mats)
        if transpose:
            out = out.transpose(0, 2, 1)
        return jnp.asarray(out, dtype)

    lp = {
        "ln1": stack(prefix + "layers.{i}.input_layernorm.weight"),
        "ln2": stack(prefix + "layers.{i}.post_attention_layernorm.weight"),
        "wq": stack(prefix + "layers.{i}.self_attn.q_proj.weight", True),
        "wk": stack(prefix + "layers.{i}.self_attn.k_proj.weight", True),
        "wv": stack(prefix + "layers.{i}.self_attn.v_proj.weight", True),
        "wo": stack(prefix + "layers.{i}.self_attn.o_proj.weight", True),
        "w_gate": stack(prefix + "layers.{i}.mlp.gate_proj.weight", True),
        "w_up": stack(prefix + "layers.{i}.mlp.up_proj.weight", True),
        "w_down": stack(prefix + "layers.{i}.mlp.down_proj.weight", True),
    }
    # qkv biases: present for Qwen2, absent for Llama/Mistral (use zeros)
    for name, wkey in (("q", "wq"), ("k", "wk"), ("v", "wv")):
        bias_name = prefix + f"layers.{{i}}.self_attn.{name}_proj.bias"
        if bias_name.format(i=0) in state:
            lp["b" + name] = stack(bias_name)
        else:
            lp["b" + name] = jnp.zeros(
                (L, lp[wkey].shape[-1]), dtype)
    embed = jnp.asarray(get(prefix + "embed_tokens.weight"), dtype)
    # lm_head sits one level above the decoder ('lm_head.weight' for
    # 'model.*', 'language_model.lm_head.weight' for 'language_model.model.*',
    # top-level again for the newer 'model.language_model.*' layout)
    head_candidates = ["lm_head.weight"]
    if prefix.endswith("model."):
        head_candidates.insert(0, prefix[:-len("model.")] + "lm_head.weight")
    head_key = next((k for k in head_candidates if k in state), None)
    if cfg.tie_embeddings or head_key is None:
        lm_head = embed.T
    else:
        lm_head = jnp.asarray(get(head_key).T, dtype)
    return {
        "embed": embed,
        "layers": lp,
        "norm_f": jnp.asarray(get(prefix + "norm.weight"), dtype),
        "lm_head": lm_head,
    }


def convert_siglip(state: Dict[str, Any], num_layers: int,
                   prefix: str = "vision_tower.vision_model.",
                   dtype=jnp.bfloat16):
    """Convert an HF SiglipVisionModel state dict to the stacked pytree."""
    def get(name):
        return _np(state[prefix + name])

    def stack(fmt, transpose=False):
        mats = [get(fmt.format(i=i)) for i in range(num_layers)]
        out = np.stack(mats)
        if transpose:
            out = out.transpose(0, 2, 1)
        return jnp.asarray(out, dtype)

    patch_w = get("embeddings.patch_embedding.weight")   # (C, 3, P, P)
    C = patch_w.shape[0]
    return {
        "patch_w": jnp.asarray(patch_w.reshape(C, -1).T, dtype),
        "patch_b": jnp.asarray(get("embeddings.patch_embedding.bias"), dtype),
        "pos_embed": jnp.asarray(get("embeddings.position_embedding.weight"),
                                 dtype),
        "layers": {
            "ln1_w": stack("encoder.layers.{i}.layer_norm1.weight"),
            "ln1_b": stack("encoder.layers.{i}.layer_norm1.bias"),
            "wq": stack("encoder.layers.{i}.self_attn.q_proj.weight", True),
            "bq": stack("encoder.layers.{i}.self_attn.q_proj.bias"),
            "wk": stack("encoder.layers.{i}.self_attn.k_proj.weight", True),
            "bk": stack("encoder.layers.{i}.self_attn.k_proj.bias"),
            "wv": stack("encoder.layers.{i}.self_attn.v_proj.weight", True),
            "bv": stack("encoder.layers.{i}.self_attn.v_proj.bias"),
            "wo": stack("encoder.layers.{i}.self_attn.out_proj.weight", True),
            "bo": stack("encoder.layers.{i}.self_attn.out_proj.bias"),
            "ln2_w": stack("encoder.layers.{i}.layer_norm2.weight"),
            "ln2_b": stack("encoder.layers.{i}.layer_norm2.bias"),
            "fc1": stack("encoder.layers.{i}.mlp.fc1.weight", True),
            "fc1_b": stack("encoder.layers.{i}.mlp.fc1.bias"),
            "fc2": stack("encoder.layers.{i}.mlp.fc2.weight", True),
            "fc2_b": stack("encoder.layers.{i}.mlp.fc2.bias"),
        },
        "post_ln_w": jnp.asarray(get("post_layernorm.weight"), dtype),
        "post_ln_b": jnp.asarray(get("post_layernorm.bias"), dtype),
    }


def convert_projector(state: Dict[str, Any],
                      prefix: str = "multi_modal_projector.",
                      dtype=jnp.bfloat16):
    return {
        "w1": jnp.asarray(_np(state[prefix + "linear_1.weight"]).T, dtype),
        "b1": jnp.asarray(_np(state[prefix + "linear_1.bias"]), dtype),
        "w2": jnp.asarray(_np(state[prefix + "linear_2.weight"]).T, dtype),
        "b2": jnp.asarray(_np(state[prefix + "linear_2.bias"]), dtype),
    }


def convert_clip(state: Dict[str, Any], num_layers: int,
                 prefix: str = "vision_model.", dtype=jnp.bfloat16):
    """Convert an HF CLIPVisionModel state dict to the models/clip.py pytree.

    Handles HF's `pre_layrnorm` spelling.  Used by LongVA
    (model.vision_tower.vision_tower.vision_model.*,
    reference model/longva/model/multimodal_encoder/clip_encoder.py),
    Video-LLaVA (video_tower.vision_model.*) and Flash-VStream.
    """
    def get(name):
        return _np(state[prefix + name])

    def stack(fmt, transpose=False):
        mats = [get(fmt.format(i=i)) for i in range(num_layers)]
        out = np.stack(mats)
        if transpose:
            out = out.transpose(0, 2, 1)
        return jnp.asarray(out, dtype)

    pre = ("pre_layrnorm" if prefix + "pre_layrnorm.weight" in state
           else "pre_layernorm")
    patch_w = get("embeddings.patch_embedding.weight")   # (C, 3, P, P)
    C = patch_w.shape[0]
    return {
        "class_embed": jnp.asarray(get("embeddings.class_embedding").reshape(-1),
                                   dtype),
        "patch_w": jnp.asarray(patch_w.reshape(C, -1).T, dtype),
        "pos_embed": jnp.asarray(get("embeddings.position_embedding.weight"),
                                 dtype),
        "pre_ln_w": jnp.asarray(get(pre + ".weight"), dtype),
        "pre_ln_b": jnp.asarray(get(pre + ".bias"), dtype),
        "layers": {
            "ln1_w": stack("encoder.layers.{i}.layer_norm1.weight"),
            "ln1_b": stack("encoder.layers.{i}.layer_norm1.bias"),
            "wq": stack("encoder.layers.{i}.self_attn.q_proj.weight", True),
            "bq": stack("encoder.layers.{i}.self_attn.q_proj.bias"),
            "wk": stack("encoder.layers.{i}.self_attn.k_proj.weight", True),
            "bk": stack("encoder.layers.{i}.self_attn.k_proj.bias"),
            "wv": stack("encoder.layers.{i}.self_attn.v_proj.weight", True),
            "bv": stack("encoder.layers.{i}.self_attn.v_proj.bias"),
            "wo": stack("encoder.layers.{i}.self_attn.out_proj.weight", True),
            "bo": stack("encoder.layers.{i}.self_attn.out_proj.bias"),
            "ln2_w": stack("encoder.layers.{i}.layer_norm2.weight"),
            "ln2_b": stack("encoder.layers.{i}.layer_norm2.bias"),
            "fc1": stack("encoder.layers.{i}.mlp.fc1.weight", True),
            "fc1_b": stack("encoder.layers.{i}.mlp.fc1.bias"),
            "fc2": stack("encoder.layers.{i}.mlp.fc2.weight", True),
            "fc2_b": stack("encoder.layers.{i}.mlp.fc2.bias"),
        },
        "post_ln_w": jnp.asarray(get("post_layernorm.weight"), dtype),
        "post_ln_b": jnp.asarray(get("post_layernorm.bias"), dtype),
    }


def convert_mlp2x(state: Dict[str, Any],
                  prefix: str = "model.mm_projector.", dtype=jnp.bfloat16):
    """mlp2x_gelu projector (LongVA/Flash-VStream mm_projector: a
    Sequential(Linear, GELU, Linear) -> keys 0.* and 2.*)."""
    return {
        "w1": jnp.asarray(_np(state[prefix + "0.weight"]).T, dtype),
        "b1": jnp.asarray(_np(state[prefix + "0.bias"]), dtype),
        "w2": jnp.asarray(_np(state[prefix + "2.weight"]).T, dtype),
        "b2": jnp.asarray(_np(state[prefix + "2.bias"]), dtype),
    }


def find_prefix(state: Dict[str, Any], probe: str, candidates) -> str:
    """First prefix under which `probe` exists (HF key layouts drift across
    transformers versions, e.g. 'language_model.model.' vs
    'model.language_model.')."""
    for c in candidates:
        if c + probe in state:
            return c
    raise KeyError(
        f"none of the prefixes {list(candidates)} holds '{probe}'; sample "
        f"keys: {sorted(state)[:5]}")


def load_hf_state(model_path: str) -> Dict[str, Any]:
    """Read every *.safetensors (preferred) or *.bin shard in a checkpoint
    directory into one flat state dict."""
    import glob
    import os
    state = {}
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if files:
        from safetensors.numpy import load_file
        for f in files:
            state.update(load_file(f))
    else:
        import torch
        for f in sorted(glob.glob(os.path.join(model_path, "*.bin"))):
            state.update(torch.load(f, map_location="cpu"))
    if not state:
        raise FileNotFoundError(
            f"no *.safetensors or *.bin checkpoint shards in {model_path}")
    return state


def read_hf_config(model_path: str):
    """config.json -> attribute-accessible namespace (recursively).

    AutoConfig chokes on out-of-tree model_types (llava_qwen, llava_vstream);
    the raw JSON carries everything the converters need.
    """
    import json
    import os
    import types

    def ns(d):
        if isinstance(d, dict):
            return types.SimpleNamespace(
                **{k: ns(v) for k, v in d.items()})
        return d

    with open(os.path.join(model_path, "config.json")) as f:
        return ns(json.load(f))


def clip_config_from_state(state: Dict[str, Any], prefix: str,
                           num_heads: int):
    """Infer CLIP tower dims from checkpoint shapes (head count is not
    shape-recoverable and must be supplied — 16 for CLIP-L)."""
    import re
    from stc_tpu.models.clip import CLIPConfig
    patch_w = _np(state[prefix + "embeddings.patch_embedding.weight"])
    C, _, P, _ = patch_w.shape
    n_tok = _np(state[prefix + "embeddings.position_embedding.weight"]).shape[0]
    grid = int(round((n_tok - 1) ** 0.5))
    inter = _np(state[prefix + "encoder.layers.0.mlp.fc1.weight"]).shape[0]
    pat = re.compile(re.escape(prefix) + r"encoder\.layers\.(\d+)\.")
    n_layers = 1 + max(int(m.group(1)) for k in state
                       if (m := pat.match(k)))
    return CLIPConfig(hidden_size=C, num_layers=n_layers,
                      num_heads=num_heads, intermediate_size=inter,
                      image_size=grid * P, patch_size=P)


def llama_config_from_hf(hf_config) -> Qwen2Config:
    """Llama/Vicuna text config -> our decoder config (no qkv bias)."""
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads)
    return Qwen2Config(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads", None)
        or hf_config.num_attention_heads,
        head_dim=head_dim,
        intermediate_size=hf_config.intermediate_size,
        rope_base=getattr(hf_config, "rope_theta", 10000.0),
        rms_eps=hf_config.rms_norm_eps,
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        qkv_bias=False,
    )


def clip_config_from_hf(hf_vision_config):
    from stc_tpu.models.clip import CLIPConfig
    return CLIPConfig(
        hidden_size=hf_vision_config.hidden_size,
        num_layers=hf_vision_config.num_hidden_layers,
        num_heads=hf_vision_config.num_attention_heads,
        intermediate_size=hf_vision_config.intermediate_size,
        image_size=hf_vision_config.image_size,
        patch_size=hf_vision_config.patch_size,
    )


def qwen2_config_from_hf(hf_config) -> Qwen2Config:
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads)
    return Qwen2Config(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=hf_config.num_key_value_heads,
        head_dim=head_dim,
        intermediate_size=hf_config.intermediate_size,
        rope_base=hf_config.rope_theta,
        rms_eps=hf_config.rms_norm_eps,
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
    )
