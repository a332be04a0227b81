"""Flash-VStream + ReKV backbone.

TPU-native equivalent of reference model/flash_vstream_rekv.py: CLIP-style
tower -> projector -> compress_spatial_features to 64 tokens/frame (8x8
spatial average, flash_vstream_rekv.py:22-27) -> streaming Llama LM.
Defaults n_local=4000, topk=16, block_size=64 (flash_vstream_rekv.py:141-163).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                            SessionConfig)
from stc_tpu.models import clip as cl
from stc_tpu.models import qwen2 as qw
from stc_tpu.models import register_model
from stc_tpu.models.longva import LongVAVision, project_mlp2x
from stc_tpu.models.video_llava import llama7b_config
from stc_tpu.runtime.vlm import VLMSession


@dataclasses.dataclass(frozen=True)
class FlashVStreamConfig:
    vision: cl.CLIPConfig = dataclasses.field(default_factory=cl.CLIPConfig)
    text: qw.Qwen2Config = dataclasses.field(default_factory=llama7b_config)
    spatial_tokens: int = 64  # 8x8 after compression

    @property
    def tokens_per_frame(self) -> int:
        return self.spatial_tokens

    @classmethod
    def tiny(cls):
        return cls(vision=cl.CLIPConfig.tiny(),
                   text=dataclasses.replace(qw.Qwen2Config.tiny(),
                                            qkv_bias=False),
                   spatial_tokens=4)


def default_session_config(cfg: FlashVStreamConfig) -> SessionConfig:
    tpf = cfg.tokens_per_frame
    return SessionConfig(
        rekv=ReKVConfig(n_init=14, n_local=4000, block_size=tpf,
                        exc_block_size=tpf, topk=16, chunk_size=1,
                        max_blocks=256),
        cacher=CacherConfig(strategy="none"),
        pruner=PrunerConfig(strategy="none", token_per_frame=tpf),
    )


def compress_spatial_features(feats: jax.Array, grid: int,
                              out_tokens: int) -> jax.Array:
    """(F, grid*grid, C) -> (F, out_tokens, C) by spatial average pooling
    (reference compress_spatial_features, flash_vstream_rekv.py:22-27)."""
    F_, T, C = feats.shape
    side = int(out_tokens ** 0.5)
    assert side * side == out_tokens
    s = grid // side
    x = feats.reshape(F_, side, s, side, s, C)
    return x.mean(axis=(2, 4)).reshape(F_, out_tokens, C)


class FlashVStreamVision(LongVAVision):
    """CLIP tower + projector + spatial compression (no cacher)."""

    def _post(self, params, feats):
        feats = feats[:, 1:]
        feats = project_mlp2x(params["projector"], feats)
        feats = compress_spatial_features(
            feats, self.cfg.vision.grid, self.cfg.spatial_tokens)
        return feats.reshape(self.batch, -1, feats.shape[-1])

    def cached(self, params, pixels, vstate, pstate):
        return self.full(params, pixels, vstate, pstate)


class FlashVStreamSession(VLMSession):
    def __init__(self, params, cfg: FlashVStreamConfig, scfg=None,
                 state_dtype=jnp.bfloat16, vision_dtype=jnp.float32,
                 batch: int = 1):
        scfg = scfg or default_session_config(cfg)
        super().__init__(params, cfg.text, scfg,
                         FlashVStreamVision(cfg, scfg, vision_dtype,
                                            batch=batch),
                         state_dtype=state_dtype, batch=batch)


def init_random_params(cfg: FlashVStreamConfig, key, dtype=jnp.float32):
    from stc_tpu.models.longva import init_random_params as _init
    return _init(cfg, key, dtype)  # same structure (vision/projector/text)


@register_model("flash_vstream_7b")
def load_flash_vstream(model_path: str, scfg=None, dtype=jnp.bfloat16,
                       batch: int = 1):
    """Convert + assemble from a Flash-VStream (llava_vstream) checkpoint.

    Reference counterpart: model/flash_vstream_rekv.py:126-200.  Same llava
    key layout as LongVA but with a Vicuna/Llama LM (no qkv bias); the
    checkpoint's flash-memory modules are unused by the ReKV path and are
    ignored.
    """
    from stc_tpu.models.convert import (clip_config_from_state, convert_clip,
                                        convert_mlp2x, convert_qwen2,
                                        find_prefix, llama_config_from_hf,
                                        load_hf_state, read_hf_config)
    hf = read_hf_config(model_path)
    tcfg = llama_config_from_hf(hf)
    state = load_hf_state(model_path)
    vpfx = find_prefix(state, "embeddings.class_embedding", (
        "model.vision_tower.vision_tower.vision_model.",
        "vision_tower.vision_tower.vision_model.",
        "model.vision_tower.vision_model.",
    ))
    vheads = (hf.vision_config.num_attention_heads
              if hasattr(hf, "vision_config") else 16)
    vcfg = clip_config_from_state(state, vpfx, num_heads=vheads)
    ppfx = find_prefix(state, "0.weight",
                       ("model.mm_projector.", "mm_projector."))
    params = {
        "vision": convert_clip(state, vcfg.num_layers, vpfx, dtype=dtype),
        "projector": convert_mlp2x(state, ppfx, dtype=dtype),
        "text": convert_qwen2(state, tcfg, prefix="model.", dtype=dtype),
    }
    # 8x8 spatial compression (reference fixed 64); clamped for tiny towers
    cfg = FlashVStreamConfig(vision=vcfg, text=tcfg,
                             spatial_tokens=min(64, vcfg.grid ** 2))
    scfg = scfg or default_session_config(cfg)
    return FlashVStreamSession(params, cfg, scfg, state_dtype=dtype,
                               batch=batch), cfg
