from korean_f5_tts_tpu.utils.misc import (
    default,
    exists,
    lens_to_mask,
    mask_from_frac_lengths,
    mask_from_start_end_indices,
    maybe_masked_mean,
    seed_everything,
)
from korean_f5_tts_tpu.utils.timesteps import get_epss_timesteps, sway_warp

__all__ = [
    "default",
    "exists",
    "lens_to_mask",
    "mask_from_frac_lengths",
    "mask_from_start_end_indices",
    "maybe_masked_mean",
    "seed_everything",
    "get_epss_timesteps",
    "sway_warp",
]
