"""Single dataclass-based configuration for the whole framework.

The reference scatters constants across five argparse entry points and
hard-coded literals (reference ``model/train.py:137-165``, ``model/inference.py:11``,
``api/app.py:33-40``). Here every knob lives in one typed config tree with CLI
overrides layered on top (``cli.py``); the reference's CLI flag names remain
the compatibility surface.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class ModelConfig:
    """U-Net architecture knobs.

    Defaults reproduce the reference's deployed configuration
    (``model/unet.py:97-112`` instantiated with ``bilinear=True`` at
    ``model/train.py:299`` / ``model/inference.py:77``): 2 grayscale input
    channels, 1 output channel, widths 64..1024 with a factor-2 decoder,
    17,262,401 parameters.

    ``in_frames * channels`` is the actual input channel count: the model
    consumes ``in_frames`` frames concatenated on the channel axis.
    RGB mode (the README-advertised 6-in/3-out variant, reference
    ``README.md:180-182``) is ``channels=3``.
    """

    arch: str = "unet"          # "unet" (reference parity) | "tower" (siamese
                                # encoder + fusion decoder; per-frame feature
                                # reuse in video streams) | "flow" (learned
                                # motion field + warp + blend; arbitrary-time
                                # by construction — models/flow.py)
    channels: int = 1           # channels per frame: 1 = grayscale parity, 3 = RGB
    in_frames: int = 2          # frames concatenated on the channel axis
    base_width: int = 64        # width of the first encoder stage
    depth: int = 4              # number of down/up levels (64 -> 64*2^depth)
    bilinear: bool = True       # bilinear decoder (True) vs transposed conv (False)
    # decoder upsample sampling grid: "align_corners" reproduces the
    # reference's nn.Upsample(align_corners=True) exactly (required for .pth
    # weight parity); "half_pixel" is the TPU-native shift-invariant variant
    # (torch align_corners=False semantics) — no gathers/transposed copies
    # in the decoder, measurably faster at s2d resolutions. A training-time
    # choice: checkpoints record it.
    upsample: str = "align_corners"
    time_conditioned: bool = False  # append a constant-t channel => arbitrary-time interpolation
    # space-to-depth stem: losslessly rearrange r x r pixel blocks into
    # channels so the whole U-Net runs at (H/r, W/r) with r^2 x channels.
    # 1 = off (exact reference-architecture parity). 2 = the high-res speed
    # variant: ~4x less HBM traffic per level — the 1080p path is
    # bandwidth-bound (see CLAUDE.md perf notes).
    space_to_depth: int = 1
    # predict the correction to the linear midpoint instead of the frame
    # itself: out = (f1+f2)/2 + unet(...). Identity-at-init => much faster
    # convergence on interpolation; off by default for reference parity.
    residual: bool = False
    # width of the full-resolution refinement head appended after the
    # space-to-depth U-Net (0 = off). Recovers the sub-pixel detail the
    # s2d output head loses, at a tiny fraction of full-res U-Net cost.
    refine_width: int = 0
    # separable refinement conv2 (depthwise 3x3 + pointwise 1x1) instead
    # of the dense 3x3: ~w/9x fewer FLOPs in the head's dominant matmul.
    # Training-time architecture choice (checkpoints record it).
    refine_depthwise: bool = False
    # spatial rearrange factor AT WHICH the refinement head runs: 1 = full
    # resolution (maximum sub-pixel detail), space_to_depth = fully in s2d
    # layout (fastest — XLA pads thin-channel full-res tensors heavily in
    # the lane dim, so coarser heads touch far fewer padded bytes),
    # intermediate divisors of space_to_depth trade between the two.
    # Measured on the fixture (s2d=2, width 64): factor 1 -> SSIM 0.901,
    # factor 2 -> 0.868.
    refine_factor: int = 1
    # tower family only: project each fused (concatenated) skip back to
    # encoder width with a 1x1 conv before the decoder consumes it. The
    # plain concat doubles every decoder width — at high resolution the
    # decoder is bandwidth-bound, so halving its widths roughly halves its
    # HBM traffic; the 1x1 projections are MXU-cheap.
    slim_decoder: bool = False
    # flow family only: run the motion backbone at 1/flow_scale resolution
    # (average-pool the input frames flow_scale x flow_scale, predict the
    # field there, bilinearly upsample it and scale the displacements back
    # to pixels). Motion fields are smooth, so this is the flow-family
    # analog of the U-Net family's space_to_depth speed lever: backbone
    # cost drops ~flow_scale^2 while the full-resolution warp + blend (+
    # optional refine head) keeps sub-pixel output detail. 1 = off.
    flow_scale: int = 1
    # flow family only: predict TWO independent motion fields (frame1->frame2
    # AND frame2->frame1) instead of one field and its negation. The sampler
    # combines them Super-SloMo-style (Jiang et al., CVPR'18 eq. 4):
    #   F_t<-0 = -(1-t)*t*F01 + t^2 * F10
    #   F_t<-1 = (1-t)^2 *F01 - t*(1-t)*F10
    # With F10 = -F01 these reduce exactly to the single-field sampler, so
    # this is a strict generalization: it lets the two warp sources disagree
    # near occlusions and under non-symmetric motion. Costs 2 extra backbone
    # output channels (nothing at inference beyond the same two warps).
    flow_bidir: bool = False
    # flow family only: number of residual field-refinement stages after
    # the backbone (coarse-to-fine in the RIFE/IFRNet spirit). Each stage
    # warps both frames to the midpoint with the current field, feeds
    # [f1, f2, g0, g1, flow, mask] through a small 3-conv full-resolution
    # net, and adds a residual to the field and the mask logit (the
    # residual conv is zero-initialized, so stage k starts as identity and
    # training only uses it where the coarse field is wrong — occlusions,
    # motion boundaries). The refined field is time-independent, so the
    # one-backbone-pass-per-pair amortization over sample times survives.
    # Inference cost per stage: two extra warps + a thin conv stack. 0 = off.
    flow_cascade: int = 0
    # flow family only: backward_warp strategy (ops/warp.py).
    # "gather4" = four 1-element corner gathers; "patch" = ONE gather of
    # 2x2 slices (4x fewer gather descriptors) — those two are numerically
    # identical. "shifts" = gather-free separable shift-select warp, the
    # TPU-fast path (per-element gathers measured ~110 ms/frame at 1080p;
    # shifts is pure fused vector work): displacements are clamped to
    # +-max_flow px per axis and the x-shift samples at the source row
    # (second-order deviation from the exact 2-D warp; the family trains
    # through the warp, so the field adapts). gather4/patch <-> each other
    # are checkpoint-safe; switching to/from "shifts" is best paired with
    # (re)training, though fields within +-max_flow transfer closely.
    # DEFAULT = "shifts" by A/B measurement: trained-through shifts is
    # quality-EQUAL on the scenes harness (SSIM 0.9351 mf32 / 0.9345 mf8
    # vs 0.9343 gather4) and ~50x faster per 1080p warp on the TPU
    # (2.2 ms vs 111 ms marginal). Checkpoints store their own value, so
    # models trained before the flip keep gather4 semantics on load.
    # "pyramid" = the shifts warp with each 1-D pass split into a strided
    # integer coarse level + a small-bound fine level: the full +-max_flow
    # range at ~O(sqrt(max_flow)) shifted copies per axis instead of
    # O(max_flow). Same trained-through semantics as "shifts" with extra
    # second-order deviation confined to coarse-quantization boundaries
    # of the field (ops/warp.py:_warp_axis_pyramid).
    warp_impl: str = "shifts"
    # "shifts"/"pyramid": per-axis displacement bound in pixels. shifts
    # cost is linear in the bound (2*max_flow + 2 shifted copies per axis
    # per warp); pyramid is ~2*sqrt(2*max_flow) copies.
    max_flow: int = 32

    @property
    def in_channels(self) -> int:
        r2 = self.space_to_depth ** 2
        return (self.in_frames * self.channels * r2 +
                (1 if self.time_conditioned else 0))

    @property
    def out_channels(self) -> int:
        return self.channels * self.space_to_depth ** 2

    @property
    def pad_multiple(self) -> int:
        return max(self.space_to_depth, self.flow_scale) * 2 ** self.depth


@dataclass(frozen=True)
class LossConfig:
    """Combined loss = mse_weight * MSE + ssim_weight * (1 - SSIM).

    Matches reference ``model/train.py:75-87`` (0.5/0.5) and its SSIM loss
    (11x11 Gaussian, sigma 1.5, ``model/train.py:18-73``).
    """

    mse_weight: float = 0.5
    ssim_weight: float = 0.5
    ssim_window: int = 11
    ssim_sigma: float = 1.5
    # flow family only: edge-aware first-order smoothness of the predicted
    # motion field (the standard unsupervised-flow regularizer — penalize
    # |d flow| except across image edges, weighted exp(-edge_scale*|d I|)).
    # 0 = off. Train-time only; validation loss stays the plain combined
    # loss so arms remain comparable.
    flow_smooth_weight: float = 0.0
    flow_smooth_edge: float = 10.0
    # flow family only: endpoint photometric supervision of the motion
    # field itself — L1 between each frame and its full warp from the
    # OTHER frame (warp(f1, F01) vs f0 and warp(f0, F10) vs f1; with the
    # single-field sampler F10 = -F01). The triplet loss only constrains
    # the two half-warps at the midpoint; this grounds the field at both
    # endpoints, where the ground truth is free. 0 = off. Train-time only.
    flow_photo_weight: float = 0.0
    # any family: illumination-robust structure term — soft census
    # transform distance between prediction and ground truth
    # (ops/census.py; UnFlow eq. 5 formulation). 0 = off. Train-time only;
    # validation loss stays the plain combined loss so arms compare.
    census_weight: float = 0.0
    census_window: int = 7


@dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters (reference ``model/train.py:153-316``)."""

    epochs: int = 100
    batch_size: int = 8          # per-step GLOBAL batch (sharded over the mesh)
    learning_rate: float = 1e-4  # reference hardcodes 1e-4 at train.py:160
    val_split: float = 0.2
    plateau_factor: float = 0.5   # ReduceLROnPlateau(factor=0.5, patience=10), train.py:163-165
    plateau_patience: int = 10
    seed: int = 0
    # exponential moving average of the weights (0 = off). When on, the EMA
    # weights are what validation scores and what exports for inference —
    # a classic variance-reduction trick the reference lacks; 0.999 is a
    # good default at >=1k steps (time constant 1/(1-decay) steps).
    ema_decay: float = 0.0
    # label-consistent train-time augmentation (data/loader.py): horizontal
    # / vertical flips and temporal swap (f0<->f1 leaves the midpoint
    # unchanged). Off by default for reference-contract parity.
    augment: bool = False
    # sequential microbatches per optimizer step (1 = off). The global
    # batch splits into grad_accum microbatches inside one jitted step
    # (lax.scan): same effective batch, ~grad_accum x lower peak activation
    # memory — for training at resolutions/batches a chip can't hold.
    # batch_size must divide evenly.
    grad_accum: int = 1
    # epochs between "latest" (resume-point) checkpoint writes; 1 = every
    # epoch (reference-style safety). The best-val checkpoint — what exports
    # for inference — always saves on improvement regardless. A latest save
    # fetches the FULL train state (params + optimizer + EMA) device->host,
    # which dominates epoch wall time on transfer-limited hosts.
    save_every: int = 1
    loss: LossConfig = field(default_factory=LossConfig)
    checkpoint_dir: str = "checkpoints"
    resume: bool = False          # true mid-training resume (reference never reloads optimizer state)
    log_every: int = 10
    nan_guard: bool = True        # per-step NaN detection


@dataclass(frozen=True)
class DataConfig:
    """Triplet dataset layout (reference ``model/train.py:89-151``)."""

    data_dir: str = "data/train"
    height: int = 256
    width: int = 256
    prefetch: int = 2            # device prefetch depth
    num_workers: int = 4         # host decode threads
    shuffle_buffer: int = 2048


@dataclass(frozen=True)
class VideoConfig:
    """Streaming video interpolation pipeline (implements what reference
    ``main.py:118-129`` only advertises)."""

    factor: int = 2              # 2x or 4x (recursive midpoint bisection)
    batch_pairs: int = 8         # frame pairs per device batch
    fps: Optional[float] = None  # None = scale source fps by factor
    codec: str = "mp4v"


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for SPMD execution.

    The reference is strictly single-device (SURVEY.md §2.3). Here the batch
    axis is sharded over a 1-D ``data`` mesh axis; gradients are combined by
    XLA-inserted collectives over ICI. ``data_axis=-1`` means "all devices".
    """

    data_axis: int = -1          # -1 => use every visible device for data parallelism
    axis_name: str = "data"


@dataclass(frozen=True)
class ServeConfig:
    """HTTP serving (reference ``api/app.py``: POST /interpolate, GET /, /health)."""

    host: str = "0.0.0.0"
    port: int = 8000
    model_path: str = "checkpoints"
    max_upload_bytes: int = 50 * 1024 * 1024   # 50 MB cap, api/app.py:36
    max_intermediate: int = 10                 # 1..10, api/app.py:140-141
    # per-request deadline (same 300 s contract as the reference's
    # subprocess timeout, api/app.py:100). Enforced: admission to the video
    # queue waits at most the remaining budget (503 on expiry) and the
    # streaming video pipeline aborts between batches once the deadline
    # passes (504).
    request_timeout_s: float = 300.0
    # video-job backpressure: at most this many /interpolate-video requests
    # in flight (1 running + the rest waiting); beyond it the server answers
    # 503 with Retry-After instead of queueing unboundedly.
    max_video_queue: int = 3
    # multipart file parts larger than this spool to disk instead of RAM
    # (uploads stream from the socket to a per-request temp dir).
    spool_threshold_bytes: int = 1024 * 1024
    # continuous request batching (serve/batcher.py): concurrent requests
    # that arrive while the device is busy are fused into one batched
    # dispatch when it frees. max_batch bounds the fused batch;
    # batch_window_ms adds an optional straggler wait before each dispatch
    # (0 = zero-added-latency continuous batching only).
    max_batch: int = 8
    batch_window_ms: float = 0.0


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    video: VideoConfig = field(default_factory=VideoConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    serve: ServeConfig = field(default_factory=ServeConfig)


def replace(cfg, **kwargs):
    """Functional update helper (frozen dataclasses)."""
    return dataclasses.replace(cfg, **kwargs)
