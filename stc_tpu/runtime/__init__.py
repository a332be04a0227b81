from stc_tpu.runtime.session import StreamingSession
