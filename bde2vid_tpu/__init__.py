"""bde2vid_tpu — a TPU-native event-camera video reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of gaopinghai/BDE2VID
(event streams -> voxel grids -> recurrent/transformer/spiking reconstruction
models -> MSE/SSIM/LPIPS evaluation), designed TPU-first:

- event rasterization as fused XLA/Pallas scatter kernels on device
  (reference: events_contrast_maximization/utils/event_utils.py)
- recurrent models as pure ``(carry, x) -> (carry, y)`` cells threaded through
  ``lax.scan`` (reference hides state in module attributes)
- bidirectional sequence models as two scans + vmapped window attention
  (reference: model/BDE2VID/bde2vid_cross_scale_propogation_V5.py)
- data parallelism via ``jax.sharding.Mesh`` + ``jax.jit`` sharding constraints
  (the reference is single-GPU only)

Layout:
    events/   event IO (HDF5 schema) + voxelization ops (+ NumPy oracle)
    data/     host-side dataset pipeline (windowing, transforms, prefetch)
    nn/       neural net building blocks (conv, recurrent cells, attention,
              SPADE, spiking neurons, deformable conv)
    models/   the five model families on a common functional protocol
    metrics/  MSE / SSIM / LPIPS in JAX
    losses/   training losses (L1 / perceptual / VIP / temporal consistency)
    eval/     evaluation driver, result tables, checkpoint conversion
    train/    training step, optimizers
    parallel/ mesh construction and sharding policies
    utils/    padding (Croper), normalization, timers, config
"""

__version__ = "0.1.0"
