#!/usr/bin/env python
"""Offline / streaming VQA evaluation CLI.

TPU-native equivalent of `torchrun -m model.video_qa.run_distributed`
(reference run_distributed.py:139-171 — same knob surface, one process per
JAX host; launch one process per data shard with RANK/WORLD env or a process
manager).

Example:
  python scripts/run_eval.py --dataset mlvu --model llava_ov_7b \
      --model_path /ckpts/llava-onevision-qwen2-7b-ov-hf \
      --save_dir results/mlvu --sample_fps 0.5
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--model", default="llava_ov_7b")
    p.add_argument("--model_path", default=None)
    p.add_argument("--save_dir", default="results/eval")
    p.add_argument("--anno_path", default=None)
    p.add_argument("--sample_fps", type=float, default=0.5)
    p.add_argument("--max_samples", type=int, default=None)
    # ReKV knobs (reference run_distributed.py arg surface)
    p.add_argument("--n_local", type=int, default=None)
    p.add_argument("--retrieve_size", type=int, default=None, help="topk")
    p.add_argument("--retrieve_chunk_size", type=int, default=None)
    p.add_argument("--cache_strategy", default=None,
                   choices=[None, "none", "cacher"])
    p.add_argument("--update_token_ratio", type=float, default=None)
    p.add_argument("--token_per_frame", type=int, default=None)
    p.add_argument("--prune_strategy", default=None,
                   choices=[None, "stc", "none", "full_tokens"])
    p.add_argument("--ingest", default=None, choices=["rgb", "yuv420"],
                   help="pixel ingest format: yuv420 halves the "
                        "host->device bytes/frame (packed 4:2:0 planes; "
                        "device-side chroma upsample)")
    p.add_argument("--spec_decode", type=int, default=None,
                   help="prompt-lookup speculative decode draft length "
                   "(answers are bit-identical to greedy; latency only)")
    p.add_argument("--stream_batch", type=int, default=1,
                   help="videos evaluated CONCURRENTLY per chip (one "
                   "batched session, ragged multi-stream; rows identical "
                   "to sequential). Offline-protocol datasets only.")
    p.add_argument("--rank", type=int, default=None)
    p.add_argument("--world", type=int, default=None)
    return p.parse_args()


def apply_knobs(args):
    """CLI knobs -> env consumed by SessionConfig.from_env (one config
    entry point, unlike the reference's stubbed initialize_from_args)."""
    env = {
        "STC_N_LOCAL": args.n_local,
        "STC_TOPK": args.retrieve_size,
        "STC_CHUNK_SIZE": args.retrieve_chunk_size,
        "STC_CACHE_STRATEGY": args.cache_strategy,
        "STC_UPDATE_TOKEN_RATIO": args.update_token_ratio,
        "STC_TOKEN_PER_FRAME": args.token_per_frame,
        "STC_PRUNE_STRATEGY": {"full_tokens": "none"}.get(
            args.prune_strategy, args.prune_strategy),
        "STC_SPEC_DECODE_DRAFT": args.spec_decode,
        "STC_INGEST_FORMAT": args.ingest,
    }
    for k, v in env.items():
        if v is not None:
            os.environ[k] = str(v)


def main():
    args = parse_args()
    apply_knobs(args)

    from stc_tpu.eval.runner import merge_and_score, run_eval
    from stc_tpu.models import MODEL_REGISTRY
    import stc_tpu.models.llava_onevision  # noqa: F401 (register)
    import stc_tpu.models.longva  # noqa: F401
    import stc_tpu.models.video_llava  # noqa: F401
    import stc_tpu.models.flash_vstream  # noqa: F401
    from stc_tpu.runtime.adapter import SessionAdapter

    session, cfg = MODEL_REGISTRY[args.model](args.model_path,
                                              batch=args.stream_batch)
    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.model_path)
    model = SessionAdapter(session, tokenizer)

    rank = args.rank if args.rank is not None else int(
        os.environ.get("RANK", "0"))
    world = args.world if args.world is not None else int(
        os.environ.get("WORLD_SIZE", "1"))

    run_eval(args.dataset, model, args.save_dir, anno_path=args.anno_path,
             sample_fps=args.sample_fps, rank=rank, world=world,
             max_samples=args.max_samples, stream_batch=args.stream_batch)
    if rank == 0:
        out = merge_and_score(args.save_dir, args.dataset)
        print(json.dumps({k: v for k, v in out.items() if k != "rows"}))


if __name__ == "__main__":
    main()
