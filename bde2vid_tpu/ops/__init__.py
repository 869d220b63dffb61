"""Pallas TPU kernels for the hot ops."""

from bde2vid_tpu.ops.window_attn_pallas import fused_window_attention

__all__ = ["fused_window_attention"]
