"""Model registry (TPU equivalent of reference video_qa/utils/model_utils.py).

Backbones register a loader name -> builder; the session runtime only sees the
4-method streaming API.
"""

MODEL_REGISTRY = {}


def register_model(name):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco
