"""Real video-decode plumbing: encode an actual mp4, clip it, decode it,
and drive the StreamingBench protocol on it (VERDICT round 2 missing #4:
split_video/load_video_frames had never executed on a real container).

The clip is synthesized in-test (each second gets a distinct solid color,
so temporal alignment of the clipper + sampler is checkable); codecs come
from OpenCV (ffmpeg-binary-free fallback paths, reference
utils/video_execution.py:6-48 / video_qa/base_refactored.py:27-33)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stc_tpu.eval.solvers import load_video_frames
from stc_tpu.eval.streamingbench import StreamingBenchEval, split_video

FPS = 8
SECONDS = 6
W = H = 32


def second_color(s):
    """Distinct RGB per second of video."""
    return np.array([40 * s + 10, 255 - 40 * s, 128], np.uint8)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H))
    if not wr.isOpened():
        pytest.skip("no mp4 encoder available in this OpenCV build")
    for s in range(SECONDS):
        frame = np.broadcast_to(second_color(s), (H, W, 3)).copy()
        for _ in range(FPS):
            wr.write(frame[:, :, ::-1])  # BGR
    wr.release()
    assert os.path.getsize(path) > 0
    return path


def dominant_second(frame):
    """Map a decoded (lossy) frame back to the second it encodes."""
    mean = frame.reshape(-1, 3).mean(axis=0)
    return int(np.argmin([np.abs(mean - second_color(s).astype(float)).sum()
                          for s in range(SECONDS)]))


def test_decode_full_video_at_1fps(video_path):
    frames = load_video_frames(video_path, sample_fps=1.0)
    assert frames.shape[1:] == (H, W, 3)
    assert SECONDS <= len(frames) <= SECONDS + 1
    # 1 fps sampling must walk the seconds in order
    assert [dominant_second(f) for f in frames[:SECONDS]] == list(
        range(SECONDS))


def test_split_video_clips_time_range(video_path, tmp_path):
    clip = split_video(video_path, 2, 5, str(tmp_path / "cache"))
    assert os.path.exists(clip)
    frames = load_video_frames(clip, sample_fps=1.0)
    secs = [dominant_second(f) for f in frames]
    assert secs[0] == 2 and secs[-1] in (4, 5), secs
    # deterministic cache: second call returns the same file, no re-encode
    mtime = os.path.getmtime(clip)
    assert split_video(video_path, 2, 5, str(tmp_path / "cache")) == clip
    assert os.path.getmtime(clip) == mtime


def test_streamingbench_protocol_on_real_video(video_path, tmp_path):
    """The full per-question loop — timestamp parse -> clip -> decode ->
    session encode -> QA -> incremental dump — on an actual mp4."""
    from test_eval import FakeModel
    model = FakeModel(answer="B")
    ev = StreamingBenchEval(model, "m", sample_fps=1.0,
                            clip_cache_dir=str(tmp_path / "clips"))
    data = [{"video_path": video_path, "questions": [
        {"time_stamp": "00:00:03", "question": "color?",
         "options": ["A. red", "B. blue"], "answer": "B", "task_type": "t"},
        {"time_stamp": "00:00:05", "question": "later color?",
         "options": ["A. red", "B. blue"], "answer": "B", "task_type": "t"},
    ]}]
    out = str(tmp_path / "out.json")
    ev.run(data, out)
    assert all(q["m"] == "B" for q in data[0]["questions"])
    # the model saw the decoded prefix frames (3 then 5 seconds at 1 fps)
    videos = [c for c in model.calls if c.startswith("video:")]
    n1, n2 = (int(v.split(":")[1]) for v in videos)
    assert 2 <= n1 <= 4 and 4 <= n2 <= 6 and n2 > n1
    assert os.path.exists(out)
