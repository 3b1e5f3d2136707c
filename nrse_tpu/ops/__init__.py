from nrse_tpu.ops.rel_pos_bias import relative_position_buckets, compute_position_bias
from nrse_tpu.ops.attention import gated_bias_attention
from nrse_tpu.ops.asp_pooling import attentive_stats_pool, frame_lengths_from_mask, frame_mask_from_wav_mask

__all__ = [
    "relative_position_buckets",
    "compute_position_bias",
    "gated_bias_attention",
    "attentive_stats_pool",
    "frame_lengths_from_mask",
    "frame_mask_from_wav_mask",
]
