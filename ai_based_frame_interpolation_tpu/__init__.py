"""ai_based_frame_interpolation_tpu — a TPU-native frame-interpolation framework.

A ground-up JAX/Flax/XLA/Pallas rebuild of the capabilities of the reference
project ``daultanigaurav/AI-BASED-FRAME-INTERPOLATION`` (a PyTorch U-Net frame
interpolator with training, inference/video, evaluation, serving, CLI and a
web frontend), re-designed TPU-first:

- NHWC layouts, bf16 compute / f32 params, static shapes for XLA.
- Bilinear ``align_corners=True`` resampling implemented as constant-matrix
  matmuls that tile onto the MXU (``ops/resize.py``).
- SSIM/PSNR as on-device, jit-fused ops (``ops/ssim.py``, ``ops/psnr.py``).
- Data-parallel training via ``jax.sharding.Mesh`` + jit with sharded batch
  (``parallel/``), XLA collectives over ICI — no NCCL/MPI.
- A warm, jitted inference engine with device-resident recursive midpoint
  interpolation for 2x/4x video upsampling (``infer/engine.py``).
- Orbax checkpointing with a ``.pth`` importer for parity testing
  (``train/checkpoint.py``).

Reference parity map: see SURVEY.md at the repo root; each module's docstring
cites the reference files (``file:line`` into ``/root/reference``) whose
capability it re-implements.
"""

__version__ = "0.1.0"

# Short alias used throughout docs/tests: `import ai_based_frame_interpolation_tpu as fi`
