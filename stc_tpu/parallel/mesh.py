"""Device meshes for multi-chip streaming inference.

The reference's only parallelism was replicated-model data-parallel eval via
torchrun+gloo (SURVEY.md §2.5).  Here the engine itself is shardable:

  dp — independent streams (batch axis of StreamKV / embeds)
  sp — sequence(temporal) parallel over a chunk's FRAME axis on the vision
       side (frames are independent through tower/projector/pooling; the
       pruned tokens all-gather over ICI at the LM boundary — see
       parallel/sharding.shard_vision_sp and tests/test_sp.py)
  tp — tensor parallel over attention heads + MLP hidden (Megatron layout);
       the KV block store shards by kv-head over tp, so retrieval gathers ride
       ICI and the per-chip HBM footprint of the store divides by tp.
  pp — pipeline parallel over the stacked LM layer axis (GPipe-style
       token-microbatch schedule, parallel/pipeline.py; built as its own
       mesh by pp callers).

ep does not apply: no supported backbone is a mixture-of-experts (the
reference's four model families are all dense, SURVEY.md §2.2).

Sharding is expressed with NamedSharding specs on the param/state pytrees and
propagated by GSPMD through the jitted step functions — no collective is
hand-written in the model code (the one exception: the pp schedule's
ppermute, which is the point of pp).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(dp: int, tp: int, sp: int = 1, devices=None) -> Mesh:
    """dp x tp mesh, or dp x sp x tp when sp > 1 (axis order keeps tp
    innermost = most-contiguous devices, where its collectives are
    densest)."""
    if devices is None:
        devices = jax.devices()
    n = dp * sp * tp
    assert len(devices) >= n, (len(devices), dp, sp, tp)
    if sp == 1:
        return Mesh(np.asarray(devices[:n]).reshape(dp, tp),
                    axis_names=("dp", "tp"))
    return Mesh(np.asarray(devices[:n]).reshape(dp, sp, tp),
                axis_names=("dp", "sp", "tp"))
