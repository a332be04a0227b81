"""Device meshes for multi-chip streaming inference.

The reference's only parallelism was replicated-model data-parallel eval via
torchrun+gloo (SURVEY.md §2.5).  Here the engine itself is shardable:

  dp — independent streams (batch axis of StreamKV / embeds)
  tp — tensor parallel over attention heads + MLP hidden (Megatron layout);
       the KV block store shards by kv-head over tp, so retrieval gathers ride
       ICI and the per-chip HBM footprint of the store divides by tp.

Sharding is expressed with NamedSharding specs on the param/state pytrees and
propagated by GSPMD through the jitted step functions — no collective is
hand-written in the model code.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(dp: int, tp: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * tp, (len(devices), dp, tp)
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
