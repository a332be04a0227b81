"""Batched offline eval: B videos per chip through one ragged session.

Contract: run_eval(stream_batch=B) produces rows IDENTICAL to the
sequential solver — same answers, same order — while evaluating B samples
concurrently (the reference parallelizes eval only by replicating the
model one process per worker).
"""

import json
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                            SessionConfig)
from stc_tpu.eval.runner import run_eval
from stc_tpu.eval.solvers import BaseVQA
from stc_tpu.models import llava_onevision as lo
from stc_tpu.runtime.adapter import ChatTemplate, SessionAdapter


class HashTok:
    """Deterministic text -> ids; decode -> comma string (no HF files)."""
    eos_token_id = 0

    def __call__(self, text):
        ids = [1 + (b % 200) for b in text.encode()][:20] or [9]
        return SimpleNamespace(input_ids=ids)

    def decode(self, ids, **kw):
        return ",".join(str(int(i)) for i in ids)


TOK = HashTok()
N_INIT = len(TOK(ChatTemplate.init_prompt).input_ids)

ANNO = [
    {"video_id": "v0", "video_path": "v0", "conversations": [
        {"question": "what happened first",
         "choices": ["red", "blue", "green"], "answer": "blue"},
        {"question": "describe the scene", "answer": "stuff"},
    ]},
    {"video_id": "v1", "video_path": "v1", "conversations": [
        {"question": "pick one", "choices": ["cat", "dog"], "answer": "dog"},
    ]},
    {"video_id": "v2", "video_path": "v2", "conversations": [
        {"question": "anything moving", "answer": "maybe"},
        {"question": "color of the sky",
         "choices": ["grey", "blue"], "answer": "blue"},
        {"question": "last object", "choices": ["car", "bike", "bus"],
         "answer": "bus"},
    ]},
    {"video_id": "v3", "video_path": "v3", "conversations": [
        {"question": "open it up", "answer": "ok"},
    ]},
    {"video_id": "v4", "video_path": "v4", "conversations": [
        {"question": "short clip question",
         "choices": ["x", "y"], "answer": "x"},
    ]},
]
LENS = {"v0": 4, "v1": 2, "v2": 5, "v3": 3, "v4": 1}


def loader(path, fps):
    rng = np.random.default_rng(int(path[1:]) + 100)
    return rng.integers(0, 256, size=(LENS[path], 56, 56, 3), dtype=np.uint8)


def make_model(params, cfg, batch):
    tpf = 3
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=N_INIT, n_local=256, block_size=tpf,
                        exc_block_size=tpf, topk=4, max_blocks=128,
                        max_prompt_tokens=32, max_new_tokens=8),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                            cache_interval=2),
        pruner=PrunerConfig(strategy="stc", token_per_frame=tpf),
    )
    sess = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32,
                            batch=batch)
    return SessionAdapter(sess, HashTok(), stop_token_ids=[0])


def test_batched_eval_rows_match_sequential(tmp_path, monkeypatch):
    monkeypatch.setattr(BaseVQA, "open_max_new", 8)  # keep the test fast
    cfg = lo.LlavaOVConfig.tiny()
    params = lo.init_random_params(cfg, jax.random.key(21))
    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(ANNO))

    seq_rows, _ = run_eval("mlvu", make_model(params, cfg, 1),
                           str(tmp_path / "seq"), anno_path=str(anno_path),
                           rank=0, world=1, frame_loader=loader)
    bat_rows, _ = run_eval("mlvu", make_model(params, cfg, 3),
                           str(tmp_path / "bat"), anno_path=str(anno_path),
                           rank=0, world=1, frame_loader=loader,
                           stream_batch=3)
    assert bat_rows == seq_rows
    assert len(bat_rows) == sum(len(s["conversations"]) for s in ANNO)


def test_batched_eval_rejects_stream_protocol(tmp_path):
    cfg = lo.LlavaOVConfig.tiny()
    params = lo.init_random_params(cfg, jax.random.key(21))
    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(ANNO[:1]))
    with pytest.raises(AssertionError, match="offline-protocol"):
        run_eval("rvs_ego", make_model(params, cfg, 2),
                 str(tmp_path / "x"), anno_path=str(anno_path),
                 rank=0, world=1, frame_loader=loader, stream_batch=2)


RES = {"v0": (56, 56), "v1": (48, 64), "v2": (56, 56), "v3": (48, 64),
       "v4": (40, 40)}


def loader_mixed_res(path, fps):
    rng = np.random.default_rng(int(path[1:]) + 300)
    h, w = RES[path]
    return rng.integers(0, 256, size=(LENS[path], h, w, 3), dtype=np.uint8)


def test_batched_eval_mixed_resolutions(tmp_path, monkeypatch):
    """Videos keep native resolution until the on-device resize (like the
    sequential path); ticks group by (H, W) and rows still match exactly."""
    monkeypatch.setattr(BaseVQA, "open_max_new", 8)
    cfg = lo.LlavaOVConfig.tiny()
    params = lo.init_random_params(cfg, jax.random.key(22))
    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(ANNO))

    seq_rows, _ = run_eval("mlvu", make_model(params, cfg, 1),
                           str(tmp_path / "seq"), anno_path=str(anno_path),
                           rank=0, world=1, frame_loader=loader_mixed_res)
    bat_rows, _ = run_eval("mlvu", make_model(params, cfg, 3),
                           str(tmp_path / "bat"), anno_path=str(anno_path),
                           rank=0, world=1, frame_loader=loader_mixed_res,
                           stream_batch=3)
    assert bat_rows == seq_rows


def test_batched_eval_isolates_loader_failures(tmp_path, monkeypatch):
    """One unreadable video costs one error row; the rest of its group
    still evaluates and matches the sequential rows."""
    monkeypatch.setattr(BaseVQA, "open_max_new", 8)

    def flaky(path, fps):
        if path == "v1":
            raise IOError("corrupt container")
        return loader(path, fps)

    cfg = lo.LlavaOVConfig.tiny()
    params = lo.init_random_params(cfg, jax.random.key(23))
    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(ANNO[:3]))

    bat_rows, _ = run_eval("mlvu", make_model(params, cfg, 3),
                           str(tmp_path / "bat"), anno_path=str(anno_path),
                           rank=0, world=1, frame_loader=flaky,
                           stream_batch=3)
    errs = [r for r in bat_rows if "error" in r]
    assert len(errs) == 1 and errs[0]["video_id"] == "v1"
    seq_rows, _ = run_eval("mlvu", make_model(params, cfg, 1),
                           str(tmp_path / "seq"),
                           anno_path=str(anno_path), rank=0, world=1,
                           frame_loader=loader)
    ok = [r for r in bat_rows if "error" not in r]
    want = [r for r in seq_rows if r["video_id"] != "v1"]
    assert ok == want


def test_batched_eval_guards(tmp_path):
    """Capacity (unequal long videos) and batch-mismatch fail fast with
    actionable messages."""
    from stc_tpu.eval.solvers import BatchedOfflineVQA
    cfg = lo.LlavaOVConfig.tiny()
    params = lo.init_random_params(cfg, jax.random.key(24))
    model = make_model(params, cfg, 2)

    def long_loader(path, fps):
        n = {"v0": 200, "v1": 3}[path]
        rng = np.random.default_rng(0)
        return rng.integers(0, 256, size=(n, 56, 56, 3), dtype=np.uint8)

    solver = BatchedOfflineVQA(model, 0.5, long_loader)
    with pytest.raises(RuntimeError, match="max_blocks"):
        solver.run_batch(ANNO[:2])

    anno_path = tmp_path / "anno.json"
    anno_path.write_text(json.dumps(ANNO[:2]))
    with pytest.raises(AssertionError, match="batch="):
        run_eval("mlvu", model, str(tmp_path / "x"),
                 anno_path=str(anno_path), rank=0, world=1,
                 frame_loader=loader, stream_batch=4)
