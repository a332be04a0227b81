"""LongVA-7B + ReKV backbone.

TPU-native equivalent of reference model/longva_rekv.py: CLIP-L/14-336 tower
(with the token-level MLP-skip cacher from custom_clip.py) -> mlp2x_gelu
projector -> 2x2 average 2dPool (576 -> 144 tokens/frame,
llava_arch.py:163-177) -> streaming Qwen2 LM.  Defaults n_local=8000,
topk=32, block_size=144 (longva_rekv.py load_model).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                            SessionConfig)
from stc_tpu.models import clip as cl
from stc_tpu.models import qwen2 as qw
from stc_tpu.models import register_model
from stc_tpu.runtime.vlm import VisionPipeline, VLMSession

# OpenAI CLIP preprocessing constants
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class LongVAConfig:
    vision: cl.CLIPConfig = dataclasses.field(default_factory=cl.CLIPConfig)
    text: qw.Qwen2Config = dataclasses.field(default_factory=qw.Qwen2Config)
    pool_stride: int = 2

    @property
    def tokens_per_frame(self) -> int:
        return (self.vision.grid // self.pool_stride) ** 2  # 144

    @classmethod
    def tiny(cls):
        return cls(vision=cl.CLIPConfig.tiny(), text=qw.Qwen2Config.tiny())


def default_session_config(cfg: LongVAConfig) -> SessionConfig:
    tpf = cfg.tokens_per_frame
    return SessionConfig(
        rekv=ReKVConfig(n_init=14, n_local=8000, block_size=tpf,
                        exc_block_size=tpf, topk=32, chunk_size=1,
                        max_blocks=512),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.8,
                            cache_interval=2),
        # LongVA keeps all 144 pooled tokens (no STC pruning in the reference
        # path, longva_rekv.py:29-35)
        pruner=PrunerConfig(strategy="none", token_per_frame=tpf,
                            model_spec="clip"),
    )


def avg_pool_2d(feats: jax.Array, grid: int, stride: int) -> jax.Array:
    """(F, grid*grid, C) -> (F, (grid/s)^2, C) average pooling
    (reference get_2dPool, llava_arch.py:163-177)."""
    F_, T, C = feats.shape
    g2 = grid // stride
    x = feats.reshape(F_, g2, stride, g2, stride, C)
    return x.mean(axis=(2, 4)).reshape(F_, g2 * g2, C)


def project_mlp2x(proj: Dict[str, Any], feats: jax.Array) -> jax.Array:
    """mlp2x_gelu projector (LongVA mm_projector)."""
    h = feats @ proj["w1"] + proj["b1"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ proj["w2"] + proj["b2"]


class LongVAVision(cl.ClipStreamsMixin, VisionPipeline):
    def __init__(self, cfg: LongVAConfig, scfg: SessionConfig,
                 dtype=jnp.float32, batch: int = 1):
        from stc_tpu.runtime.vlm import make_preprocessor
        self.cfg = cfg
        self.scfg = scfg
        self.dtype = dtype
        self.batch = batch
        self._pre = make_preprocessor(cfg.vision.image_size,
                                      CLIP_MEAN, CLIP_STD, dtype,
                                      ingest=scfg.ingest_format)

    def preprocess(self, frames):
        frames = np.asarray(frames)
        if frames.ndim == 5:  # (B, F, H, W, 3) multi-stream, stream-major
            B, F = frames.shape[:2]
            frames = frames.reshape((B * F,) + frames.shape[2:])
        return self._pre.host(frames)

    def device_preprocess(self, pixels):
        return self._pre.device(pixels)

    def trace_key(self):
        return self._pre.src_hw  # yuv420 unpack geometry read at trace time

    def init_state(self):
        return cl.init_clip_cacher(self.cfg.vision, self.dtype,
                                   batch=self.batch), ()

    def _post(self, params, feats):
        feats = feats[:, 1:]  # drop CLS ('patch' select)
        feats = project_mlp2x(params["projector"], feats)
        feats = avg_pool_2d(feats, self.cfg.vision.grid, self.cfg.pool_stride)
        return feats.reshape(self.batch, -1, feats.shape[-1])

    def full(self, params, pixels, vstate, pstate):
        feats, vstate = cl.encode_full(params["vision"], self.cfg.vision,
                                       pixels, vstate, feature_layer=-2,
                                       n_streams=self.batch)
        return self._post(params, feats), vstate, pstate

    def cached(self, params, pixels, vstate, pstate):
        feats, vstate = cl.encode_cached(
            params["vision"], self.cfg.vision, pixels, vstate,
            self.scfg.cacher.update_token_ratio, feature_layer=-2,
            n_streams=self.batch)
        return self._post(params, feats), vstate, pstate


class LongVASession(VLMSession):
    def __init__(self, params, cfg: LongVAConfig, scfg=None,
                 state_dtype=jnp.bfloat16, vision_dtype=jnp.float32,
                 batch: int = 1):
        scfg = scfg or default_session_config(cfg)
        super().__init__(params, cfg.text, scfg,
                         LongVAVision(cfg, scfg, vision_dtype, batch=batch),
                         state_dtype=state_dtype, batch=batch)


def init_random_params(cfg: LongVAConfig, key, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    Cv, E = cfg.vision.hidden_size, cfg.text.hidden_size
    s = 0.02
    return {
        "vision": cl.init_params(cfg.vision, k1, dtype),
        "projector": {
            "w1": (jax.random.normal(k3, (Cv, E)) * s).astype(dtype),
            "b1": jnp.zeros((E,), dtype),
            "w2": (jax.random.normal(k4, (E, E)) * s).astype(dtype),
            "b2": jnp.zeros((E,), dtype),
        },
        "text": qw.init_params(cfg.text, k2, dtype),
    }


@register_model("longva_7b")
def load_longva_7b(model_path: str, scfg=None, dtype=jnp.bfloat16,
                   batch: int = 1):
    """Convert + assemble from a LongVA (llava_qwen) checkpoint directory.

    Reference counterpart: model/longva/model/builder.py:27
    load_pretrained_model + longva_rekv.py load_model.  Key layout:
    model.layers.* (Qwen2 w/ bias), model.vision_tower.vision_tower.
    vision_model.* (CLIP-L), model.mm_projector.{0,2}.* (mlp2x_gelu),
    lm_head.weight.
    """
    from stc_tpu.models.convert import (clip_config_from_state, convert_clip,
                                        convert_mlp2x, convert_qwen2,
                                        find_prefix, load_hf_state,
                                        qwen2_config_from_hf, read_hf_config)
    hf = read_hf_config(model_path)
    tcfg = qwen2_config_from_hf(hf)  # llava_qwen config carries LM dims
    state = load_hf_state(model_path)
    vpfx = find_prefix(state, "embeddings.class_embedding", (
        "model.vision_tower.vision_tower.vision_model.",
        "vision_tower.vision_tower.vision_model.",
        "model.vision_tower.vision_model.",
    ))
    vheads = (hf.vision_config.num_attention_heads
              if hasattr(hf, "vision_config") else 16)  # CLIP-L
    vcfg = clip_config_from_state(state, vpfx, num_heads=vheads)
    ppfx = find_prefix(state, "0.weight",
                       ("model.mm_projector.", "mm_projector."))
    params = {
        "vision": convert_clip(state, vcfg.num_layers, vpfx, dtype=dtype),
        "projector": convert_mlp2x(state, ppfx, dtype=dtype),
        "text": convert_qwen2(state, tcfg, prefix="model.", dtype=dtype),
    }
    cfg = LongVAConfig(vision=vcfg, text=tcfg)
    scfg = scfg or default_session_config(cfg)
    return LongVASession(params, cfg, scfg, state_dtype=dtype,
                         batch=batch), cfg
