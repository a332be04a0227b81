"""StreamingBench real-time protocol harness.

Equivalent of reference streamingbench/src/benchmark/StreamingBench.py +
model/rekv.py: per question, clip the video to [0, timestamp], run a FRESH
session (clear cache -> init prompt -> encode prefix -> QA), and dump
incrementally so reruns skip answered questions.

Video clipping uses ffmpeg when a clip cache dir is configured (reference
utils/video_execution.py); a frame_loader hook allows running the protocol on
pre-decoded arrays (tests / preprocessed shards).
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Callable, List, Optional

from stc_tpu.eval.solvers import load_video_frames

MCQA_TEMPLATE = (
    "{}\n{}\nKeep your response concise. "
    "Respond only with the letter of the correct option (e.g. A, B)."
)


def parse_timestamp(ts: str) -> int:
    """'hh:mm:ss' -> seconds."""
    return sum(int(x) * 60 ** i for i, x in enumerate(reversed(ts.split(":"))))


def split_video(video_path: str, start_s: int, end_s: int,
                cache_dir: str) -> str:
    """ffmpeg-clip [start, end] with a deterministic cache (reference
    video_execution.py:29-40)."""
    os.makedirs(cache_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(video_path))[0]
    out = os.path.join(cache_dir, f"{base}_{start_s}_{end_s}.mp4")
    if not os.path.exists(out):
        subprocess.run(
            ["ffmpeg", "-y", "-i", video_path, "-ss", str(start_s),
             "-to", str(end_s), "-c:v", "libx264", "-an", out],
            check=True, capture_output=True)
    return out


class StreamingBenchEval:
    def __init__(self, model, model_key: str, *, sample_fps: float = 1.0,
                 clip_cache_dir: str = "tmp_clips",
                 frame_loader: Optional[Callable] = None,
                 context_seconds: Optional[int] = None):
        self.model = model
        self.model_key = model_key
        self.sample_fps = sample_fps
        self.clip_cache_dir = clip_cache_dir
        self.frame_loader = frame_loader
        self.context_seconds = context_seconds  # None = from video start

    def _load_prefix(self, video_path: str, t_end: int):
        t_start = (0 if self.context_seconds is None
                   else max(0, t_end - self.context_seconds))
        if self.frame_loader is not None:
            return self.frame_loader(video_path, t_start, t_end,
                                     self.sample_fps)
        clip = split_video(video_path, t_start, t_end, self.clip_cache_dir)
        return load_video_frames(clip, self.sample_fps)

    def run(self, data: List[dict], output_path: str) -> List[dict]:
        """data: [{questions: [{time_stamp, question, options, answer,
        task_type, ...}], video_path}] — answers written into the question
        dicts under self.model_key, dumped after every question."""
        for entry in data:
            for q in entry["questions"]:
                if q.get(self.model_key):   # rerun-resume (reference :37-38)
                    continue
                t_end = parse_timestamp(q["time_stamp"])
                frames = self._load_prefix(entry["video_path"], t_end)

                question_text = "{}\n{}".format(
                    q["question"],
                    "\n".join(q.get("options", [])))
                prompt_body = MCQA_TEMPLATE.format(
                    q["question"], "\n".join(q.get("options", [])))

                self.model.clear_cache()
                self.model.encode_init_prompt()
                self.model.encode_video(frames)
                pred = self.model.question_answering(
                    {"question": question_text,
                     "prompt": self.model.get_prompt(prompt_body, mc=True)},
                    max_new_tokens=16)
                q[self.model_key] = pred.strip()[:1] if pred else ""

                with open(output_path, "w") as f:
                    json.dump(data, f, indent=2)
        return data
