from stc_tpu.compress.pruner import PrunerState, init_pruner_state, stc_prune
