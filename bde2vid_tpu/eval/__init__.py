"""Evaluation driver: the reference eval_models_seq.py surface, TPU-native."""

from bde2vid_tpu.eval.driver import evaluate_sequence, evaluate_all, EvalConfig
from bde2vid_tpu.eval.tables import generate_table

__all__ = ["evaluate_sequence", "evaluate_all", "EvalConfig", "generate_table"]
