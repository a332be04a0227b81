"""Run the reference's FULL LLaVA-OneVision model loop on torch CPU.

VERDICT round 2 asked for end-to-end answer parity against the reference's
own model code (model/llava_onevision_rekv.py:71-152 QA loop, encode path
model/abstract_rekv.py:38-69) — not just the attention/engine layer.  This
driver loads the reference's `load_model` factory against a tiny on-disk HF
checkpoint so the whole reference stack (SigLIP cacher -> projector ->
pooling -> pruner -> patched LM -> ContextManager retrieval -> greedy
decode with the anti-EOS rule) runs verbatim as a CPU oracle.

The reference targets an old transformers release (tuple-returning decoder
layers, a Qwen2ForCausalLM-style `language_model` with the lm_head inside,
a per-attention `rotary_emb` attribute).  The installed transformers
changed that plumbing, so this driver reconstructs the OLD module
interfaces around the NEW weights.  Every shim below reproduces
version-specific HF plumbing only — no reference *semantics* are altered:

  - logzero stub + torch.distributed.get_rank()->0 (logging only)
  - kv_cache_manager/rope loaded with the same textual CUDA->CPU shim as
    tests/reference_driver.py, but under their canonical module names so
    `model.patch` / `model.attention` import them transparently
  - 'pin_memory': True -> False in llava_onevision_rekv.py (the loader
    hard-codes it; CPU-only torch cannot pin) — perf flag, not semantics
  - fp32 instead of the hard-coded fp16 (CPU matmul speed + comparable
    numerics with the JAX side, which also runs fp32)
  - an old-style Qwen2 LM wrapper (`.model` + `.lm_head` + `.logits`)
  - old-style (tuple in/out) decoder-layer forwards, byte-for-byte the old
    HF layer algebra (ln -> attn -> residual -> ln -> mlp -> residual)
  - `num_heads`/`num_key_value_heads`/`rotary_emb` attributes restored on
    attention modules (renamed/moved upstream)
  - SigLIP cacher layer outputs unwrapped from the old tuple convention
  - a fake processor (tokenizer = fixed id mapping, video_processor =
    (x/255 - 0.5)/0.5 NCHW, the SigLIP normalization both sides use) so no
    tokenizer files are needed and both frameworks see identical ids/pixels
"""

from __future__ import annotations

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import torch

from reference_driver import REF, _install_cuda_shims, _load_shim

_state = {}


# --------------------------------------------------------------------------- #
# Fake processor: fixed text-id mapping + deterministic pixel normalization
# --------------------------------------------------------------------------- #

class FakeTokenizer:
    """Maps known strings to fixed id lists; both frameworks consume the
    same ids, so tokenizer files are unnecessary for model-loop parity."""

    def __init__(self, mapping, eos_token_id=0):
        self.mapping = dict(mapping)
        self.eos_token_id = eos_token_id

    def __call__(self, text, return_tensors=None):
        ids = list(self.mapping[text])
        if return_tensors == "pt":
            return SimpleNamespace(input_ids=torch.as_tensor([ids]))
        return SimpleNamespace(input_ids=ids)

    def decode(self, ids, **kw):
        return ",".join(str(int(i)) for i in ids)


class FakeVideoProcessor:
    """(F, H, W, 3) uint8 -> (1, F, 3, H, W) fp32, (x/255 - 0.5)/0.5 — the
    SigLIP normalization, identical to stc_tpu's Preprocessor at native
    resolution (runtime/vlm.py device preprocessing)."""

    def __call__(self, video, return_tensors="pt"):
        x = np.asarray(video).astype(np.float32) / 255.0
        x = (x - 0.5) / 0.5
        x = torch.from_numpy(x).permute(0, 3, 1, 2)[None]
        return SimpleNamespace(pixel_values_videos=x)


class FakeProcessor:
    def __init__(self, mapping):
        self.tokenizer = FakeTokenizer(mapping)
        self.video_processor = FakeVideoProcessor()


# --------------------------------------------------------------------------- #
# Reference package loading with canonical-name CPU shims
# --------------------------------------------------------------------------- #

def _stub_logzero():
    if "logzero" not in sys.modules:
        import logging
        sys.modules["logzero"] = SimpleNamespace(
            logger=logging.getLogger("logzero"))


def _load_reference_package():
    """Import the reference `model` package with CPU-shimmed attention
    modules injected under their canonical dotted names (so every
    `from .kv_cache_manager import ...` inside the reference resolves to
    the shimmed copy)."""
    if "pkg" in _state:
        return _state["pkg"]
    _stub_logzero()
    _install_cuda_shims()
    if not torch.cuda.is_available():
        # clear_cache() calls these unconditionally (abstract_rekv.py:25-26);
        # CPU-only torch raises instead of no-opping
        torch.cuda.ipc_collect = lambda *a, **k: None
        torch.cuda.empty_cache = lambda *a, **k: None
    if not torch.distributed.is_available() or not \
            torch.distributed.is_initialized():
        torch.distributed.get_rank = lambda *a, **k: 0
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model  # noqa: F401  (namespace package init)

    attn_dir = os.path.join(REF, "model", "attention")
    pkg = types.ModuleType("model.attention")
    pkg.__path__ = [attn_dir]
    pkg.__package__ = "model.attention"
    sys.modules["model.attention"] = pkg
    rope = _load_shim("model.attention.rope",
                      os.path.join(attn_dir, "rope.py"))
    kvm = _load_shim("model.attention.kv_cache_manager",
                     os.path.join(attn_dir, "kv_cache_manager.py"))
    ra = _load_shim("model.attention.rekv_attention",
                    os.path.join(attn_dir, "rekv_attention.py"))
    pkg.RotaryEmbeddingESM = rope.RotaryEmbeddingESM
    pkg.rekv_attention_forward = ra.rekv_attention_forward

    import model.cache  # noqa: F401
    import model.config  # noqa: F401
    import model.prune  # noqa: F401
    import model.custom_siglip  # noqa: F401
    import model.abstract_rekv  # noqa: F401
    import model.patch  # noqa: F401
    # the loader hard-codes pin_memory=True; CPU-only torch cannot pin
    lo = _load_shim_text("model.llava_onevision_rekv",
                         os.path.join(REF, "model/llava_onevision_rekv.py"),
                         [("'pin_memory': True", "'pin_memory': False")])
    _state["pkg"] = SimpleNamespace(rope=rope, kvm=kvm, ra=ra, lo=lo)
    return _state["pkg"]


def _load_shim_text(name, path, extra_replacements):
    import importlib.util
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    src = open(path).read()
    for old, new in extra_replacements:
        assert old in src, (path, old)
        src = src.replace(old, new)
    import importlib.util as iu
    mod = iu.module_from_spec(spec)
    mod.__package__ = "model"
    sys.modules[name] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


# --------------------------------------------------------------------------- #
# Old-HF interface reconstruction around new transformers modules
# --------------------------------------------------------------------------- #

def _old_layer_forward(self, hidden_states, attention_mask=None,
                       position_ids=None, past_key_value=None,
                       output_attentions=False, use_cache=False, **kw):
    """Old Qwen2DecoderLayer.forward, byte-for-byte the pre-refactor layer
    algebra; `self.self_attn.forward` is the reference's patched
    huggingface_forward(rekv_attention_forward) returning (o, None, pkv)."""
    residual = hidden_states
    h = self.input_layernorm(hidden_states)
    o, _, pkv = self.self_attn(
        h, attention_mask=attention_mask, position_ids=position_ids,
        past_key_value=past_key_value, output_attentions=output_attentions,
        use_cache=use_cache)
    h = residual + o
    residual = h
    h2 = self.mlp(self.post_attention_layernorm(h))
    h = residual + h2
    return (h, pkv) if use_cache else (h,)


def _make_old_lm(language_model, lm_head, text_config):
    """Wrap the bare decoder (new-style language_model) in an old-style
    CausalLM shell: `.model`, `.lm_head`, output `.logits`.  Subclasses
    Qwen2ForCausalLM so the reference patch_hf isinstance dispatch works."""
    from transformers import Qwen2ForCausalLM
    from transformers.modeling_outputs import CausalLMOutputWithPast

    class _OldStyleQwen2LM(Qwen2ForCausalLM):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self.model = language_model
            self.lm_head = lm_head
            self.config = text_config

        def forward(self, input_ids=None, inputs_embeds=None,
                    past_key_values=None, use_cache=None, return_dict=True,
                    **kw):
            out = self.model(input_ids=input_ids, inputs_embeds=inputs_embeds,
                             past_key_values=past_key_values,
                             use_cache=use_cache, return_dict=True)
            logits = self.lm_head(out.last_hidden_state)
            return CausalLMOutputWithPast(
                logits=logits, past_key_values=out.past_key_values,
                hidden_states=None)

    return _OldStyleQwen2LM()


def _modernize(m):
    """Restore the old-HF attribute surface the reference code expects."""
    text_cfg = m.config.text_config
    lm = m.model.language_model  # bare decoder (new style)
    for layer in lm.layers:
        sa = layer.self_attn
        if not hasattr(sa, "num_heads"):
            sa.num_heads = text_cfg.num_attention_heads
        if not hasattr(sa, "num_key_value_heads"):
            sa.num_key_value_heads = text_cfg.num_key_value_heads
        if not hasattr(sa, "rotary_emb"):
            sa.rotary_emb = SimpleNamespace(config=text_cfg)
        layer.forward = _old_layer_forward.__get__(layer, type(layer))
    m._lm_compat = _make_old_lm(lm, m.lm_head, text_cfg)
    if not hasattr(m, "apply_pooling"):
        m.apply_pooling = m.model.apply_pooling
    # the reference's SigLIP cacher forwards return old-style tuples; the
    # new SiglipEncoder threads plain tensors between layers
    for layer in m.model.vision_tower.vision_model.encoder.layers:
        sa = layer.self_attn
        if not hasattr(sa, "num_heads"):
            sa.num_heads = m.config.vision_config.num_attention_heads
        ref_fwd = layer.forward

        def unwrapped(hidden_states, attention_mask=None,
                      _f=ref_fwd, **kw):
            return _f(hidden_states, attention_mask)[0]

        layer.forward = unwrapped


def load_reference_llava_ov(model_path: str, text_mapping: dict, *,
                            token_per_frame: int, pooled_tokens: int,
                            n_local: int, topk: int, chunk_size: int = 1,
                            cache_strategy: str = "none",
                            update_token_ratio: float = 0.5,
                            cache_interval: int = 2,
                            encode_chunk_size: int = 1):
    """Drive the reference's own load_model on a tiny checkpoint (CPU).

    text_mapping must contain the reference init-prompt string mapped to
    the init ids (n_init = len).  Returns (model, processor, ref_pkg).
    """
    pkg = _load_reference_package()
    lo = pkg.lo
    from model.config import get_config

    gc = get_config()
    gc.model.token_per_frame = int(token_per_frame)
    gc.model.encode_chunk_size = int(encode_chunk_size)
    gc.cache.strategy = cache_strategy
    gc.cache.update_token_ratio = float(update_token_ratio)
    gc.cache.cache_interval = int(cache_interval)
    # the reference hard-codes the production token geometry (196/frame);
    # point it at the tiny checkpoint's pooled grid instead
    import model.prune as rp
    rp.MODEL_SPECS["llava_ov"].tokens_per_frame = int(pooled_tokens)
    lo.MODEL_SPECS["llava_ov"].tokens_per_frame = int(pooled_tokens)

    RefCls = lo.LlavaOneVision_ReKV

    def _lm_get(self):
        compat = self._modules.get("_lm_compat")
        return compat if compat is not None else self.model.language_model

    def _lm_set(self, v):
        self._modules["_lm_compat"] = v

    RefCls.language_model = property(_lm_get, _lm_set)

    if not hasattr(RefCls, "_orig_from_pretrained"):
        RefCls._orig_from_pretrained = RefCls.from_pretrained.__func__

    def fp32_from_pretrained(cls, *a, **k):
        k["torch_dtype"] = torch.float32
        mdl = cls._orig_from_pretrained(cls, *a, **k)
        _modernize(mdl)
        return mdl

    RefCls.from_pretrained = classmethod(fp32_from_pretrained)
    lo.LlavaOnevisionProcessor = SimpleNamespace(
        from_pretrained=lambda path: FakeProcessor(text_mapping))

    model, processor = lo.load_model(
        model_path, device="cpu", n_local=n_local, topk=topk,
        chunk_size=chunk_size)
    return model, processor, pkg
