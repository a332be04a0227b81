from stc_tpu.eval.datasets import DATASETS, DatasetConfig
from stc_tpu.eval.scorers import (
    multiple_choice_accuracy,
    streamingbench_score,
    ovobench_score,
)
