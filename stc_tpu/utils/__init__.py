from stc_tpu.utils.metrics import StreamingStats, Timer
