"""Framework utilities: padding, normalization, timers, json io."""

from bde2vid_tpu.utils.padding import optimal_crop_size, CropParameters
from bde2vid_tpu.utils.norm import (
    legacy_norm,
    robust_norm,
    quick_norm,
    abs_norm,
    robust_1_99,
)
from bde2vid_tpu.utils.timers import Timer, CudaTimer, timer_summary
from bde2vid_tpu.utils.config import Config, read_json, write_json
from bde2vid_tpu.utils.flow_viz import flow2rgb
from bde2vid_tpu.utils.compile_cache import enable_compilation_cache
from bde2vid_tpu.utils.profiling import model_cost_summary

__all__ = [
    "optimal_crop_size",
    "CropParameters",
    "legacy_norm",
    "robust_norm",
    "quick_norm",
    "abs_norm",
    "robust_1_99",
    "Timer",
    "CudaTimer",
    "timer_summary",
    "Config",
    "read_json",
    "write_json",
    "flow2rgb",
    "enable_compilation_cache",
    "model_cost_summary",
]
