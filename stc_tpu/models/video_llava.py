"""Video-LLaVA-7B + ReKV backbone.

TPU-native equivalent of reference model/video_llava_rekv.py: LanguageBind
video tower (CLIP-L/14-224-style per-frame encoding, 256 patches + CLS = 257
tokens/frame, CLS KEPT — video_llava_rekv.py:119) -> projector -> streaming
Vicuna (Llama) LM.  No STC cacher/pruner in the reference path; topk=8,
block_size=257, 8-frame encode chunks (video_llava_rekv.py:41,117-129).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                            SessionConfig)
from stc_tpu.models import clip as cl
from stc_tpu.models import qwen2 as qw
from stc_tpu.models import register_model
from stc_tpu.models.longva import CLIP_MEAN, CLIP_STD
from stc_tpu.runtime.vlm import VisionPipeline, VLMSession


def llama7b_config(vocab_size: int = 32000) -> qw.Qwen2Config:
    """Vicuna-7B dims; Llama has no qkv biases (zeros in our layout)."""
    return qw.Qwen2Config(
        vocab_size=vocab_size, hidden_size=4096, num_layers=32,
        num_heads=32, num_kv_heads=32, head_dim=128,
        intermediate_size=11008, rope_base=10000.0, qkv_bias=False)


@dataclasses.dataclass(frozen=True)
class VideoLlavaConfig:
    vision: cl.CLIPConfig = dataclasses.field(
        default_factory=lambda: cl.CLIPConfig(image_size=224))
    text: qw.Qwen2Config = dataclasses.field(default_factory=llama7b_config)

    @property
    def tokens_per_frame(self) -> int:
        return self.vision.num_tokens  # 257 (CLS kept)

    @classmethod
    def tiny(cls):
        return cls(vision=cl.CLIPConfig.tiny(),
                   text=dataclasses.replace(qw.Qwen2Config.tiny(),
                                            qkv_bias=False))


def default_session_config(cfg: VideoLlavaConfig,
                           n_local: int = 8000) -> SessionConfig:
    tpf = cfg.tokens_per_frame
    return SessionConfig(
        rekv=ReKVConfig(n_init=14, n_local=n_local, block_size=tpf,
                        exc_block_size=tpf, topk=8, chunk_size=1,
                        max_blocks=128),
        cacher=CacherConfig(strategy="none"),
        pruner=PrunerConfig(strategy="none", token_per_frame=tpf),
        encode_chunk_frames=8,
    )


class VideoLlavaVision(cl.ClipStreamsMixin, VisionPipeline):
    def __init__(self, cfg: VideoLlavaConfig, scfg: SessionConfig,
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
        # CLS token is kept (257 tokens/frame)
        p = params["projector"]
        h = feats @ p["w1"] + p["b1"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ p["w2"] + p["b2"]
        return h.reshape(self.batch, -1, h.shape[-1])

    def full(self, params, pixels, vstate, pstate):
        feats, vstate = cl.encode_full(params["vision"], self.cfg.vision,
                                       pixels, vstate, feature_layer=-2,
                                       n_streams=self.batch)
        return self._post(params, feats), vstate, pstate

    cached = full  # no cacher in the reference video_llava path


class VideoLlavaSession(VLMSession):
    def __init__(self, params, cfg: VideoLlavaConfig, scfg=None,
                 state_dtype=jnp.bfloat16, vision_dtype=jnp.float32,
                 batch: int = 1):
        scfg = scfg or default_session_config(cfg)
        super().__init__(params, cfg.text, scfg,
                         VideoLlavaVision(cfg, scfg, vision_dtype,
                                          batch=batch),
                         state_dtype=state_dtype, batch=batch)


def init_random_params(cfg: VideoLlavaConfig, key, dtype=jnp.float32):
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


@register_model("video_llava_7b")
def load_video_llava_7b(model_path: str, scfg=None, dtype=jnp.bfloat16,
                        batch: int = 1):
    """Convert + assemble from a Video-LLaVA-hf checkpoint directory.

    Reference counterpart: model/video_llava_rekv.py:100-140 (HF
    VideoLlavaForConditionalGeneration).  Key layout: language_model.model.*
    (Vicuna/Llama, no qkv bias), video_tower.vision_model.* (LanguageBind
    CLIP-style), multi_modal_projector.linear_{1,2}.*.
    """
    from stc_tpu.models.convert import (clip_config_from_state, convert_clip,
                                        convert_projector, convert_qwen2,
                                        find_prefix, llama_config_from_hf,
                                        load_hf_state, read_hf_config)
    hf = read_hf_config(model_path)
    tcfg = llama_config_from_hf(hf.text_config)
    state = load_hf_state(model_path)
    lpfx = find_prefix(state, "layers.0.self_attn.q_proj.weight", (
        "language_model.model.", "model.language_model.model.",
        "model.language_model."))
    vpfx = find_prefix(state, "embeddings.class_embedding", (
        "video_tower.vision_model.", "model.video_tower.vision_model.",
        "video_tower.video_tower.vision_model."))
    ppfx = find_prefix(state, "linear_1.weight", (
        "multi_modal_projector.", "model.multi_modal_projector."))
    vcfg = clip_config_from_state(
        state, vpfx, num_heads=hf.vision_config.num_attention_heads
        if hasattr(hf, "vision_config") else 16)
    params = {
        "vision": convert_clip(state, vcfg.num_layers, vpfx, dtype=dtype),
        "projector": convert_projector(state, prefix=ppfx, dtype=dtype),
        "text": convert_qwen2(state, tcfg, prefix=lpfx, dtype=dtype),
    }
    cfg = VideoLlavaConfig(vision=vcfg, text=tcfg)
    scfg = scfg or default_session_config(cfg)
    return VideoLlavaSession(params, cfg, scfg, state_dtype=dtype,
                             batch=batch), cfg
