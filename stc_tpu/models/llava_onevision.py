"""LLaVA-OneVision + ReKV — the flagship backbone.

TPU-native equivalent of reference model/llava_onevision_rekv.py: SigLIP
tower (with STC-Cacher) -> multimodal projector -> bilinear 2x pooling ->
STC-Pruner -> streaming Qwen2 LM, exposed through the StreamingSession API.

The vision pipeline is packaged as a FrameEncoder whose two chunk paths
(full / selective-recompute) are jitted once each; chunk scheduling
(chunk_idx % cache_interval) stays host-side, mirroring the reference's
STC_CACHE.new_instance-per-chunk loop (abstract_rekv.py:55-69).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stc_tpu.compress.pruner import init_pruner_state, stc_prune
from stc_tpu.config import SessionConfig
from stc_tpu.models import register_model
from stc_tpu.models import qwen2 as qw
from stc_tpu.models import siglip as sg
from stc_tpu.runtime.session import StreamingSession
from stc_tpu.runtime.vlm import VisionPipeline, VLMSession

# SigLIP image preprocessing constants (HF SiglipImageProcessor defaults)
IMAGE_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
IMAGE_STD = np.array([0.5, 0.5, 0.5], np.float32)


@dataclasses.dataclass(frozen=True)
class LlavaOVConfig:
    vision: sg.SiglipConfig = dataclasses.field(default_factory=sg.SiglipConfig)
    text: qw.Qwen2Config = dataclasses.field(default_factory=qw.Qwen2Config)

    @property
    def pooled_grid(self) -> int:
        return math.ceil(self.vision.grid / 2)

    @property
    def tokens_per_frame(self) -> int:
        """Visual tokens per frame entering the pruner (196 for llava_ov)."""
        return self.pooled_grid ** 2

    @classmethod
    def tiny(cls):
        return cls(vision=sg.SiglipConfig.tiny(), text=qw.Qwen2Config.tiny())


def apply_pooling(feats: jax.Array, grid: int) -> jax.Array:
    """(F, grid*grid, E) -> (F, ceil(grid/2)^2, E) bilinear 2x downsample.

    Matches HF LlavaOnevision apply_pooling (functional interpolate, bilinear,
    align_corners=False == half-pixel centers, no antialias).
    """
    F, T, E = feats.shape
    out = math.ceil(grid / 2)
    x = feats.reshape(F, grid, grid, E)
    x = jax.image.resize(x, (F, out, out, E), method="bilinear",
                         antialias=False)
    return x.reshape(F, out * out, E)


def project(proj: Dict[str, Any], feats: jax.Array) -> jax.Array:
    h = feats @ proj["w1"] + proj["b1"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ proj["w2"] + proj["b2"]


class FrameEncoder:
    """frames -> pruned per-frame features (1, F*keep, E_text).

    Owns the cacher + pruner state (reset per video, reference
    streamingbench model/rekv.py:43 resets past_memory_mean_token).
    """

    def __init__(self, params: Dict[str, Any], cfg: LlavaOVConfig,
                 scfg: SessionConfig, dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.scfg = scfg
        self.dtype = dtype
        vc = cfg.vision

        def _post(feats, pruner_state):
            feats = project(self.params["projector"], feats)
            feats = apply_pooling(feats, vc.grid)
            if not scfg.pruner.enabled:  # reference 'full_tokens' strategy
                F_, T, E = feats.shape
                return feats.reshape(1, F_ * T, E), None, pruner_state
            pruned, idx, pruner_state = stc_prune(
                feats[None], pruner_state,
                keep_per_frame=scfg.pruner.token_per_frame,
                channel_keep_ratio=scfg.pruner.channel_keep_ratio)
            B, F_, K, E = pruned.shape
            return pruned.reshape(1, F_ * K, E), idx, pruner_state

        def _full(params, pixels, cacher, pruner_state):
            feats, cacher = sg.encode_full(params["vision"], vc, pixels,
                                           cacher)
            out, idx, pruner_state = _post(feats, pruner_state)
            return out, idx, cacher, pruner_state

        def _cached(params, pixels, cacher, pruner_state):
            feats = sg.encode_cached(params["vision"], vc, pixels, cacher,
                                     scfg.cacher.update_token_ratio,
                                     sim_source=scfg.cacher.sim_source,
                                     gather_impl=scfg.cacher.gather_impl,
                                     k_proxy_rank=scfg.cacher.k_proxy_rank)
            out, idx, pruner_state = _post(feats, pruner_state)
            return out, idx, cacher, pruner_state

        self._full = jax.jit(_full, donate_argnames=("cacher",))
        self._cached = jax.jit(_cached)
        self.reset()

    def reset(self):
        vc = self.cfg.vision
        self.chunk_idx = 0
        self.cacher = sg.init_cacher_state(vc, 1, self.dtype)
        self.pruner_state = init_pruner_state(
            1, int(self.params["projector"]["w2"].shape[1]
                   * self.scfg.pruner.channel_keep_ratio), jnp.float32)
        self.last_kept_idx = None

    def preprocess(self, frames: np.ndarray) -> jax.Array:
        """(F, H, W, 3) uint8 -> (F, 3, S, S) normalized float."""
        vc = self.cfg.vision
        x = frames.astype(np.float32) / 255.0
        x = jnp.asarray(x)
        if x.shape[1] != vc.image_size or x.shape[2] != vc.image_size:
            x = jax.image.resize(
                x, (x.shape[0], vc.image_size, vc.image_size, 3), "bilinear")
        x = (x - IMAGE_MEAN) / IMAGE_STD
        return x.transpose(0, 3, 1, 2).astype(self.dtype)

    def __call__(self, frames) -> jax.Array:
        frames = np.asarray(frames)
        if frames.dtype == np.uint8 or frames.ndim == 4 and frames.shape[-1] == 3:
            pixels = self.preprocess(frames)
        else:
            pixels = jnp.asarray(frames, self.dtype)
        use_cache = (self.scfg.cacher.enabled
                     and self.chunk_idx % self.scfg.cacher.cache_interval != 0)
        if use_cache:
            out, idx, _, self.pruner_state = self._cached(
                self.params, pixels, self.cacher, self.pruner_state)
        else:
            out, idx, self.cacher, self.pruner_state = self._full(
                self.params, pixels, cacher=self.cacher,
                pruner_state=self.pruner_state)
        self.chunk_idx += 1
        self.last_kept_idx = idx
        return out


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

class LlavaOVVision(VisionPipeline):
    """llava-ov vision strategy: SigLIP(+STC-Cacher) -> projector -> 2x
    bilinear pooling -> STC-Pruner.  Supports B parallel streams (frames are
    stream-major on the tower's batch axis; cacher refs + pruner memory are
    per stream)."""

    def __init__(self, cfg: LlavaOVConfig, scfg: SessionConfig,
                 dtype=jnp.float32, batch: int = 1):
        from stc_tpu.runtime.vlm import make_preprocessor
        self.cfg = cfg
        self.scfg = scfg
        self.dtype = dtype
        self.batch = batch
        self._pre1 = make_preprocessor(cfg.vision.image_size,
                                       IMAGE_MEAN, IMAGE_STD, dtype,
                                       ingest=scfg.ingest_format)

    def preprocess(self, frames):
        frames = np.asarray(frames)
        if frames.ndim == 5:  # (B, F, H, W, 3) multi-stream
            B, F = frames.shape[:2]
            frames = frames.reshape((B * F,) + frames.shape[2:])
        return self._pre1.host(frames)

    def device_preprocess(self, pixels):
        return self._pre1.device(pixels)

    def trace_key(self):
        return self._pre1.src_hw  # yuv420 unpack geometry read at trace time

    def init_state(self):
        return (sg.init_cacher_state(self.cfg.vision, self.batch, self.dtype),
                init_pruner_state(
                    self.batch, int(self.cfg.text.hidden_size
                                    * self.scfg.pruner.channel_keep_ratio)))

    def select_streams(self, vstate, pstate, old_vstate, old_pstate, mask):
        """Ragged ingest: inactive streams keep their OLD cacher references
        (L, B, T, C — stream axis 1) and pruner memory (B, ... — axis 0)."""
        import jax

        def sel(axis):
            def f(n, o):
                shape = [1] * n.ndim
                shape[axis] = mask.shape[0]
                return jnp.where(mask.reshape(shape), n, o)
            return f

        return (jax.tree.map(sel(1), vstate, old_vstate),
                jax.tree.map(sel(0), pstate, old_pstate))

    def stream_axes(self):
        return (1, 0)  # cacher refs (L, B, T, C); pruner memory (B, ...)

    def _post(self, params, feats, pstate):
        B = self.batch
        feats = project(params["projector"], feats)
        feats = apply_pooling(feats, self.cfg.vision.grid)
        BF, T, E = feats.shape
        feats = feats.reshape(B, BF // B, T, E)
        if self.scfg.pruner.enabled:
            pruned, _, pstate = stc_prune(
                feats, pstate,
                keep_per_frame=self.scfg.pruner.token_per_frame,
                channel_keep_ratio=self.scfg.pruner.channel_keep_ratio)
            _, F_, K, E = pruned.shape
            return pruned.reshape(B, F_ * K, E), pstate
        return feats.reshape(B, -1, E), pstate

    def full(self, params, pixels, vstate, pstate):
        feats, vstate = sg.encode_full(params["vision"], self.cfg.vision,
                                       pixels, vstate, n_streams=self.batch)
        flat, pstate = self._post(params, feats, pstate)
        return flat, vstate, pstate

    def cached(self, params, pixels, vstate, pstate):
        feats = sg.encode_cached(params["vision"], self.cfg.vision, pixels,
                                 vstate, self.scfg.cacher.update_token_ratio,
                                 sim_source=self.scfg.cacher.sim_source,
                                 n_streams=self.batch,
                                 gather_impl=self.scfg.cacher.gather_impl,
                                 k_proxy_rank=self.scfg.cacher.k_proxy_rank)
        flat, pstate = self._post(params, feats, pstate)
        return flat, vstate, pstate


class LlavaOVSession(VLMSession):
    def __init__(self, params: Dict[str, Any], cfg: LlavaOVConfig,
                 scfg: SessionConfig, state_dtype=jnp.bfloat16,
                 vision_dtype=jnp.float32, batch: int = 1, mesh=None):
        self.ovcfg = cfg
        super().__init__(params, cfg.text, scfg,
                         LlavaOVVision(cfg, scfg, vision_dtype, batch=batch),
                         state_dtype=state_dtype, batch=batch, mesh=mesh)


def build_session(params: Dict[str, Any], cfg: LlavaOVConfig,
                  scfg: SessionConfig, state_dtype=jnp.bfloat16,
                  vision_dtype=jnp.float32, batch: int = 1,
                  mesh=None) -> StreamingSession:
    """mesh: optional Mesh with a 'pp' axis — pipeline-parallel LM (weights,
    KV pages, and QA decode cache shard by layer; see runtime/session.py)."""
    return LlavaOVSession(params, cfg, scfg, state_dtype=state_dtype,
                          vision_dtype=vision_dtype, batch=batch, mesh=mesh)


def init_random_params(cfg: LlavaOVConfig, key, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    E = cfg.text.hidden_size
    Cv = cfg.vision.hidden_size
    s = 0.02
    return {
        "vision": sg.init_params(cfg.vision, k1, dtype),
        "projector": {
            "w1": (jax.random.normal(k3, (Cv, E)) * s).astype(dtype),
            "b1": jnp.zeros((E,), dtype),
            "w2": (jax.random.normal(k4, (E, E)) * s).astype(dtype),
            "b2": jnp.zeros((E,), dtype),
        },
        "text": qw.init_params(cfg.text, k2, dtype),
    }


@register_model("llava_ov_7b")
def load_llava_ov_7b(model_path: str, scfg: Optional[SessionConfig] = None,
                     dtype=jnp.bfloat16, batch: int = 1):
    """Convert + assemble from an HF checkpoint directory.

    Requires local HF weights (this environment has no network egress);
    reference counterpart: llava_onevision_rekv.load_model.
    """
    from stc_tpu.models.convert import (convert_projector, convert_qwen2,
                                        convert_siglip, find_prefix,
                                        qwen2_config_from_hf, read_hf_config)
    hf = read_hf_config(model_path)
    tcfg = qwen2_config_from_hf(hf.text_config)
    vcfg = sg.SiglipConfig(
        hidden_size=hf.vision_config.hidden_size,
        num_layers=hf.vision_config.num_hidden_layers,
        num_heads=hf.vision_config.num_attention_heads,
        intermediate_size=hf.vision_config.intermediate_size,
        image_size=hf.vision_config.image_size,
        patch_size=hf.vision_config.patch_size,
    )
    cfg = LlavaOVConfig(vision=vcfg, text=tcfg)
    state = _load_hf_state(model_path)
    # HF key layouts drift across transformers versions ('model.'-nested in
    # newer releases); probe for the actual prefixes
    vpfx = find_prefix(state, "embeddings.patch_embedding.weight", (
        "vision_tower.vision_model.", "model.vision_tower.vision_model."))
    ppfx = find_prefix(state, "linear_1.weight", (
        "multi_modal_projector.", "model.multi_modal_projector."))
    lpfx = find_prefix(state, "layers.0.self_attn.q_proj.weight", (
        "language_model.model.", "model.language_model.model.",
        "model.language_model."))
    params = {
        "vision": convert_siglip(state, vcfg.num_layers, prefix=vpfx,
                                 dtype=dtype),
        "projector": convert_projector(state, prefix=ppfx, dtype=dtype),
        "text": convert_qwen2(state, tcfg, prefix=lpfx, dtype=dtype),
    }
    scfg = scfg or SessionConfig.from_env()
    return build_session(params, cfg, scfg, state_dtype=dtype,
                         batch=batch), cfg


def _load_hf_state(model_path: str):
    from stc_tpu.models.convert import load_hf_state
    return load_hf_state(model_path)
