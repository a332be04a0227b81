from stc_tpu.ops.rope import rope_cos_sin, apply_rope, apply_rope_one_angle
from stc_tpu.ops.attention import multi_stage_attention, AttnStage
