"""Unified typed configuration.

The reference scattered knobs across three mechanisms (argparse, a stubbed
GlobalConfig singleton, and ~12 env vars — see reference model/config.py:8-71 and
SURVEY.md §5).  Here everything lives in explicit frozen dataclasses that are
hashable, so they can be passed as static args to jitted functions.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ReKVConfig:
    """Streaming retrieval KV-cache hyperparameters.

    Mirrors the per-backbone dict passed to patch_hf in the reference
    (model/llava_onevision_rekv.py:166-176), plus static capacities required
    by the TPU's static-shape compilation model.
    """

    n_init: int = 14              # init-prompt tokens kept resident forever
    n_local: int = 15000          # sliding local attention window
    block_size: int = 60          # tokens per global KV block (== pruned tokens/frame)
    exc_block_size: int = 60      # encode chunk granularity (== block_size by default)
    topk: int = 64                # retrieved blocks per question
    chunk_size: int = 1           # retrieval scoring chunk grouping
    max_blocks: int = 1024        # static capacity of the HBM page store (frames)
    max_rep_blocks: int = 0       # rep-key capacity (0 => 4*max_blocks so
                                  # host-tier streams have headroom); set to
                                  # the stream length for longer sessions
    max_new_tokens: int = 128     # decode budget per question
    max_prompt_tokens: int = 512  # static prompt-prefill capacity for QA
    # --- ablation paths (reference selectable strategies) ---
    # block retrieval scorer: 'mean_dot' (default _calc_block_topk) | 'aks'
    # (aks_calc_block_topk) | 'dpc_knn' (dpc_knn_calc_block_topk) | 'l2norm'
    # (l2norm_calc_block_topk), kv_cache_manager.py:934-1412
    retrieval_scorer: str = "mean_dot"
    # retrieved-KV compression before QA attention (PRUNE_RETIREVED_KV +
    # retrieved_KV_COMPRESSION_STRATEGY, rekv_attention.py:54-263/338-347):
    # 'none' | 'filter_tokens_simple' | 'filter_tokens_random' |
    # 'filter_tokens_magnitude' | 'filter_tokens_euclidean_distance' |
    # 'filter_tokens_inverse_cosine' | 'filter_tokens_percentile' |
    # 'filter_tokens_top_half'
    retrieved_kv_compression: str = "none"
    # local-window KV compression at append time (the reference's
    # off-by-default USE_KV_COMPRESSION hook, kv_cache_manager.py:2315-2321
    # -> select_top_half_kv :2190-2247): 'none' | 'select_top_half' — per
    # appended page keep the ceil(S/2) tokens with the largest head/dim-mean
    # attention output; window attention masks the rest (per-page keep
    # masks).  Global pages and retrieval stay FULL-KV, as in the reference
    # (only local_k/v are compressed there).  Kept tokens retain their TRUE
    # stream positions here (the reference renumbers the compacted buffer —
    # documented deviation; the unified page store keeps positions absolute).
    # Encode attention uses the XLA path when enabled (the paged Pallas
    # kernel does not read keep masks).
    window_kv_compression: str = "none"
    # decode/QA-path attention backend: 'jnp' (XLA; default — each
    # pallas_call costs ~1.1 ms fixed on this relayed platform,
    # PLATFORM_NOTES.md) | 'pallas' (fused flash kernel,
    # ops/decode_attention.py; re-tune on real hardware) |
    # 'pallas_interpret' (tests)
    decode_attn_backend: str = "jnp"
    # DEVICE-side KV page quantization: 'none' | 'int8' | 'int4' — the page
    # store itself (block_k/block_v) holds quantized pages with
    # per-(page, head, dim) fp32 scales.  int8: halves page-store HBM (2x
    # retrievable history at equal memory), halves the window-read bandwidth
    # of every encode append (dequant IN-KERNEL in the paged Pallas kernel),
    # and makes host-tier eviction D2H traffic int8 end to end (the host
    # tier then stores the same pages — host_kv_quant is implied).  int4:
    # split-plane packed two-nibbles-per-byte pages — QUARTER the page
    # bytes (4x retrievable history at equal HBM, quarter-width window
    # reads, quarter-size eviction/refetch traffic) at coarser 15-level
    # quantization; the paged Pallas kernel unpacks nibbles in VMEM.  Either
    # way rep keys are built from the pre-quantization keys, so retrieval
    # SCORING is exact and only attention values carry the quantization
    # error (~0.4% int8, ~7% int4 worst-case per value).
    # The reference has no device-side equivalent (its pages are fp16).
    kv_quant: str = "none"
    # host-tier page compression: 'int8' (default; pages cross the
    # host<->device link and sit in host RAM as int8 with per-page/dim
    # scales — half the bytes, ~0.4% worst-case KV error on refetched pages
    # only, bounded by tests/test_host_tier.py; cold host-hit QA ~1.7x
    # faster on a ~40 MB/s link) | 'int4' (packed split-plane nibbles:
    # QUARTER the transfer/RAM bytes at ~7% worst-case per-element error on
    # refetched pages — the regime the int4 device store already validates
    # end to end) | 'none' (bit-exact host round trips — the
    # reference-faithful tier; its CPU offload is always fp16-exact).
    # Retrieval SCORING is identical in all modes (rep keys never leave the
    # device); only attention over refetched evicted pages sees the error.
    host_kv_quant: str = "int8"
    # Prompt-lookup speculative decoding for the QA decode loop (beyond
    # reference — its decode is a per-token python loop).  Each while_loop
    # round drafts spec_decode_draft tokens by matching the last
    # spec_decode_ngram committed tokens against the question+prompt+
    # generated history and verifies all drafts in ONE decode_step (the
    # weight read is the per-round cost, so K accepted drafts ≈ K tokens for
    # one token's HBM traffic).  EXACT greedy by construction: a draft is
    # committed only when it equals the model's own greedy choice.  0 = off.
    spec_decode_draft: int = 0
    spec_decode_ngram: int = 3
    # Cross-question lookup history: keep up to this many recent
    # question+answer tokens PER STREAM as an extra draft source (sessions
    # answer many questions over one video; option formats and phrasing
    # repeat, so prior answers are high-acceptance draft material).  Output
    # is still bit-identical to greedy — drafts only ever commit when they
    # match the model's own choice.  0 = draft from the current
    # question+prompt only.
    spec_history_tokens: int = 0

    def __post_init__(self):
        assert self.exc_block_size <= self.n_local
        assert self.topk % self.chunk_size == 0
        assert self.retrieval_scorer in ("mean_dot", "aks", "dpc_knn",
                                         "l2norm"), self.retrieval_scorer
        assert self.decode_attn_backend in ("jnp", "pallas",
                                            "pallas_interpret")
        # consumers compare == 'int8'; a typo (e.g. via STC_HOST_KV_QUANT)
        # must fail fast, not silently disable compression
        assert self.host_kv_quant in ("none", "int8", "int4"), \
            self.host_kv_quant
        assert self.kv_quant in ("none", "int8", "int4"), self.kv_quant
        assert self.window_kv_compression in ("none", "select_top_half"), \
            self.window_kv_compression
        assert self.spec_decode_draft >= 0 and self.spec_decode_ngram >= 1
        assert self.spec_history_tokens >= 0

    @property
    def rep_cap(self) -> int:
        """Retrievable-history capacity in blocks.  Rep keys cost Hkv*D per
        block (~1/block_size of the page bytes), so the default gives the
        host tier 4x the device store before the session's fail-fast."""
        return self.max_rep_blocks or 4 * self.max_blocks

    @property
    def local_cap(self) -> int:
        """Ring-buffer capacity for the local window (static)."""
        return _round_up(self.n_local + max(self.exc_block_size, self.n_init), 128)

    @property
    def retrieve_len(self) -> int:
        """Length of the retrieval buffer: init tokens + topk blocks."""
        return self.n_init + self.topk * self.block_size

    @property
    def retrieved_keep_per_block(self) -> int:
        """Tokens kept per retrieved block after retrieved-KV compression
        (the reference filter_tokens_* strategies keep half per frame)."""
        if self.retrieved_kv_compression == "none":
            return self.block_size
        return self.block_size // 2

    @property
    def decode_cap(self) -> int:
        """Static capacity of the per-question decode KV cache (speculative
        rounds transiently write up to spec_decode_draft rows past the last
        committed token before the cursor rewind)."""
        return _round_up(
            self.retrieve_len + self.max_prompt_tokens + self.max_new_tokens
            + (self.spec_decode_draft + 1 if self.spec_decode_draft else 0),
            128
        )

    @property
    def rope_max_pos(self) -> int:
        """Largest relative position any attention call can see."""
        return max(self.n_local + self.exc_block_size, self.decode_cap) + 2


@dataclasses.dataclass(frozen=True)
class CacherConfig:
    """STC-Cacher (ViT selective recompute) knobs.

    Reference: model/config.py CacheConfig + model/custom_siglip.py defaults.
    """

    strategy: str = "cacher"          # 'none' | 'cacher'
    update_token_ratio: float = 0.25  # fraction of ViT tokens recomputed on cached chunks
    cache_interval: int = 2           # full recompute every Nth chunk
    sim_source: str = "key"           # 'key' | 'value' similarity gating
                                      # (reference custom_siglip variants)
    # row gather/scatter implementation inside the cached layer:
    # 'index' (advanced-index gather/scatter), 'onehot' (0/1-matrix matmuls
    # — bit-equal, rides the MXU instead of the ~20 GB/s gather path), or
    # 'auto' (onehot on accelerators, index on CPU)
    gather_impl: str = "auto"
    # K-projection proxy rank (0 = off, reference-exact).  When > 0 and
    # sim_source == 'key', the cached layer skips the full fresh-K
    # projection (its single largest matmul): staleness is ranked on
    # rank-r JL sketches of fresh vs reference K, fresh K is projected only
    # at the selected rows, and attention logits decompose against the
    # shared reference K plus a (U x U) correction at the updated columns
    # (models/siglip.py:_layer_cached).  Non-selected tokens attend through
    # their reference keys — the same staleness contract the cacher already
    # applies to V/attn/MLP.  Beyond-reference knob; 64-128 ranks the same
    # tokens as the exact cosine in practice (test_vision.py).
    k_proxy_rank: int = 0

    @property
    def enabled(self) -> bool:
        return self.strategy == "cacher"


@dataclasses.dataclass(frozen=True)
class PrunerConfig:
    """STC-Pruner (post-projector token pruning) knobs.

    Reference: model/config.py ModelConfig + model/prune.py MODEL_SPECS.
    """

    strategy: str = "stc"        # 'stc' | 'none'
    token_per_frame: int = 60    # tokens kept per frame after pruning
    channel_keep_ratio: float = 0.5
    model_spec: str = "llava_ov"  # selects tokens-per-frame-in + index layout

    @property
    def enabled(self) -> bool:
        return self.strategy == "stc"


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Per-backbone visual token layout (reference model/prune.py:15-19)."""

    tokens_per_frame: int
    index_mapper_type: str  # 'flat' | 'grid_13x13'


MODEL_SPECS = {
    "llava_ov": ModelSpec(tokens_per_frame=196, index_mapper_type="flat"),
    "llava_vid": ModelSpec(tokens_per_frame=169, index_mapper_type="grid_13x13"),
    "clip": ModelSpec(tokens_per_frame=144, index_mapper_type="flat"),
}


@dataclasses.dataclass(frozen=True)
class SessionConfig:
    """Top-level streaming-session configuration."""

    rekv: ReKVConfig = dataclasses.field(default_factory=ReKVConfig)
    cacher: CacherConfig = dataclasses.field(default_factory=CacherConfig)
    pruner: PrunerConfig = dataclasses.field(default_factory=PrunerConfig)
    encode_chunk_frames: int = 1  # frames per encode chunk
    # LM weight storage: 'none' (input dtype) | 'int8' (per-output-channel
    # weight-only quantization, models/qwen2.py quantize_params_int8 —
    # halves the weights-read floor and fits full-depth 7B on a 16 GB chip)
    # | 'int8_g<N>' (sub-channel: per-group-of-N-input-rows scales — bounds
    # the blast radius of outlier input channels, recovering most of the
    # int8 logit drift at ~1/N extra scale bytes; N must divide every
    # contraction dim, 128 divides all llava-ov shapes)
    weights_quant: str = "none"
    # Pixel-session ingest format: 'rgb' ((B, n, H, W, 3) uint8 frames
    # cross the link raw) | 'yuv420' (packed planar BT.601 4:2:0 planes at
    # HALF the bytes/frame; the chroma upsample + RGB matrix run ON DEVICE
    # inside the fused vision jit).  Video codecs store 4:2:0, so a decoder
    # hands the planes over for free — 'yuv420' removes the host-side
    # chroma upsample AND halves the dominant transfer on link-bound hosts.
    # RGB sources are packed host-side (native/rgb_to_yuv420, C++ or
    # bit-identical numpy).
    ingest_format: str = "rgb"

    def __post_init__(self):
        assert (self.weights_quant in ("none", "int8")
                or (self.weights_quant.startswith("int8_g")
                    and self.weights_quant[6:].isdigit()
                    and int(self.weights_quant[6:]) > 0)), self.weights_quant
        assert self.ingest_format in ("rgb", "yuv420"), self.ingest_format

    @property
    def weights_quant_group(self) -> int:
        """Sub-channel group size (input rows per scale); 0 = per-channel."""
        if self.weights_quant.startswith("int8_g"):
            return int(self.weights_quant[6:])
        return 0

    @classmethod
    def from_env(cls) -> "SessionConfig":
        """Single env-var entry point (replaces the reference's scattered getenv)."""
        cacher = CacherConfig(
            strategy=os.getenv("STC_CACHE_STRATEGY", "cacher"),
            update_token_ratio=float(os.getenv("STC_UPDATE_TOKEN_RATIO", "0.25")),
            cache_interval=int(os.getenv("STC_CACHE_INTERVAL", "2")),
            gather_impl=os.getenv("STC_GATHER_IMPL", "auto"),
            k_proxy_rank=int(os.getenv("STC_K_PROXY_RANK", "0")),
        )
        pruner = PrunerConfig(
            strategy=os.getenv("STC_PRUNE_STRATEGY", "stc"),
            token_per_frame=int(os.getenv("STC_TOKEN_PER_FRAME", "60")),
        )
        tpf = pruner.token_per_frame if pruner.enabled else MODEL_SPECS[
            pruner.model_spec
        ].tokens_per_frame
        # frames ingested per dispatch; exc_block_size covers the whole chunk
        # so each chunk is ONE attention call (multi-page append)
        chunk_frames = int(os.getenv("STC_CHUNK_FRAMES", "1"))
        rekv = ReKVConfig(
            n_local=int(os.getenv("STC_N_LOCAL", "15000")),
            topk=int(os.getenv("STC_TOPK", "64")),
            chunk_size=int(os.getenv("STC_CHUNK_SIZE", "1")),
            block_size=tpf,
            exc_block_size=tpf * chunk_frames,
            max_blocks=int(os.getenv("STC_MAX_BLOCKS", "1024")),
            # rep capacity bounds the retrievable stream length (frames);
            # the session raises before silently exceeding it
            max_rep_blocks=int(os.getenv("STC_MAX_REP_BLOCKS", "0")),
            retrieval_scorer=os.getenv("STC_RETRIEVAL_SCORER", "mean_dot"),
            retrieved_kv_compression=os.getenv(
                "STC_RETRIEVED_KV_COMPRESSION", "none"),
            window_kv_compression=os.getenv(
                "STC_WINDOW_KV_COMPRESSION", "none"),
            decode_attn_backend=os.getenv("STC_DECODE_ATTN_BACKEND", "jnp"),
            kv_quant=os.getenv("STC_KV_QUANT", "none"),
            host_kv_quant=os.getenv("STC_HOST_KV_QUANT", "int8"),
            spec_decode_draft=int(os.getenv("STC_SPEC_DECODE_DRAFT", "0")),
            spec_decode_ngram=int(os.getenv("STC_SPEC_DECODE_NGRAM", "3")),
            spec_history_tokens=int(os.getenv("STC_SPEC_HISTORY", "0")),
        )
        return cls(rekv=rekv, cacher=cacher, pruner=pruner,
                   encode_chunk_frames=chunk_frames,
                   weights_quant=os.getenv("STC_WEIGHTS_QUANT", "none"),
                   ingest_format=os.getenv("STC_INGEST_FORMAT", "rgb"))
