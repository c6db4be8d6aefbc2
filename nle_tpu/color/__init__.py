from nle_tpu.color.lab import bgr_to_lab_u8, lab_to_bgr_u8, luminance_channel
from nle_tpu.color.bilateral import bilateral_filter_u8

__all__ = [
    "bgr_to_lab_u8",
    "lab_to_bgr_u8",
    "luminance_channel",
    "bilateral_filter_u8",
]
