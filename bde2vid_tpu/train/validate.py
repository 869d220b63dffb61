"""Held-out validation for the training loop.

The reference has no training loop, so it has no validation protocol either;
its quality signal is the post-hoc eval sweep (eval_models_seq.py). For long
training runs that is too late — a quality regression is invisible until a
separate eval pass. This hook scores MSE/SSIM on a FIXED set of held-out
windows every N steps with the eval stack's metric math
(metrics/basic — skimage-exact SSIM at the eval driver's float
``data_range=2.0``), tracks the best checkpoint by MSE, and appends one json
line per validation to ``val_log.jsonl``.

Design notes:
- the val model is built in EVAL mode (train=False): droppath off, BN/IN
  reading running stats — validation measures the network the eval CLI
  would run, not the stochastic training-mode twin;
- val windows come from the same deterministic window sampler as training
  (``iterate_training_windows`` with a fixed private seed and NO
  pause/noise/rotation augmentation), assembled once at startup and kept on
  device — a validation pass is pure jitted compute, no h5 reads;
- ONE jitted program serves every validation call (params are an argument).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


class Validator:
    """Callable ``validator(params) -> {"mse": float, "ssim": float}`` plus
    best-checkpoint tracking (``update_best``)."""

    def __init__(
        self,
        model_name: str,
        model_cfg: Dict,
        val_dir: str,
        *,
        seq_len: int,
        num_bins: int,
        windows: int = 4,
        multiple: int = 1,
        crop_size=None,
        bf16: bool = False,
        seed: int = 20240 + 613,
    ):
        import jax
        import jax.numpy as jnp

        from bde2vid_tpu.models import build_model
        from bde2vid_tpu.train.__main__ import iterate_training_windows

        cfg = dict(model_cfg)
        cfg.pop("remat", None)  # per-step remat is a backward-pass lever only
        self.model_name, self.model_cfg = model_name, dict(model_cfg)
        model = build_model(
            model_name, cfg, train=False,
            dtype=jnp.bfloat16 if bf16 else jnp.float32,
        )
        is_seq = bool(getattr(model, "is_sequence_model", False))

        it = iterate_training_windows(
            val_dir, seq_len, num_bins, {}, batch=1, seed=seed,
            multiple=multiple, crop_size=crop_size,
        )
        self.batches: List = []
        for _ in range(int(windows)):
            voxels, gts, _ = next(it)
            self.batches.append((voxels, gts))

        from bde2vid_tpu.metrics.basic import mse, structural_similarity

        def metrics(params, voxels, gts):
            if is_seq:
                out, _ = model.apply(params, voxels)
                preds = out["image"]
            else:
                n, h, w = voxels.shape[1], voxels.shape[2], voxels.shape[3]

                def step(carry, voxel):
                    out, new_state = model.apply(params, voxel, carry)
                    return new_state, out["image"]

                _, preds = jax.lax.scan(
                    step, model.initial_state(n, h, w), voxels
                )
            p = preds.astype(jnp.float32).reshape((-1,) + preds.shape[2:])
            g = gts.astype(jnp.float32).reshape((-1,) + gts.shape[2:])
            # per-step mean like the eval driver's per-frame accumulation;
            # ssim at the eval chain's float data_range=2.0
            m = jnp.mean(jax.vmap(mse)(p, g))
            s = structural_similarity(p, g)
            return m, s

        self._fn = jax.jit(metrics)
        self.best_mse: Optional[float] = None
        self.best_step: Optional[int] = None

    def __call__(self, params) -> Dict[str, float]:
        ms, ss = [], []
        for voxels, gts in self.batches:
            m, s = self._fn(params, voxels, gts)
            ms.append(float(m))
            ss.append(float(s))
        return {"mse": float(np.mean(ms)), "ssim": float(np.mean(ss))}

    def update_best(self, mse_value: float, step: int) -> bool:
        """Record ``mse_value``; True when it beats the best so far."""
        if self.best_mse is None or mse_value < self.best_mse:
            self.best_mse, self.best_step = float(mse_value), int(step)
            return True
        return False

    def log_and_track(self, out_dir: str, step: int, params) -> Dict[str, float]:
        """One full validation round: score, append ``val_log.jsonl``, and
        refresh ``best.msgpack`` when MSE improved. Returns the metrics
        (with ``best`` flag)."""
        vals = self(params)
        improved = self.update_best(vals["mse"], step)
        rec = {"step": int(step), "time": time.time(), **vals,
               "best": bool(improved)}
        with open(os.path.join(out_dir, "val_log.jsonl"), "a") as fp:
            fp.write(json.dumps(rec) + "\n")
        if improved:
            from bde2vid_tpu.train import save_checkpoint

            save_checkpoint(
                os.path.join(out_dir, "best.msgpack"), params,
                self.model_name, self.model_cfg,
            )
        return rec
