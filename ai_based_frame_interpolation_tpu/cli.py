"""CLI: train / infer / video / serve / eval / info.

The compatibility surface of the reference's entry points (``main.py:19-74``,
``model/train.py:252-258``, ``model/inference.py:205-214``) with every
advertised flag actually honored (the reference silently drops
``--batch-size``/``--lr`` and its infer/video subcommands import a class that
does not exist — SURVEY.md §8.2/§8.5). Installed as both ``fi-tpu`` and the
reference's ``frame-interpolation`` console script.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

from .config import ModelConfig, ServeConfig, TrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fi-tpu",
        description="TPU-native AI frame interpolation (JAX/Flax/XLA)")
    sub = p.add_subparsers(dest="command", required=True)

    def add_model_flags(sp):
        sp.add_argument("--model", default="checkpoints",
                        help="orbax checkpoint dir or reference .pth file")
        sp.add_argument("--channels", type=int, default=None, choices=(1, 3),
                        help="1=grayscale (reference parity), 3=RGB; "
                             "default: from checkpoint, else 1")
        sp.add_argument("--dtype", default="bfloat16",
                        choices=("bfloat16", "float32"),
                        help="compute dtype on device")
        sp.add_argument("--s2d", type=int, default=None, choices=(1, 2, 4, 8),
                        help="space-to-depth stem (1=reference parity; "
                             "2/4=high-res speed variants; default: from "
                             "checkpoint, else 1)")
        sp.add_argument("--refine-width", type=int, default=None,
                        help="refinement head width for s2d models "
                             "(recommended: 64 — nearly free vs 16)")
        sp.add_argument("--refine-factor", type=int, default=None,
                        help="rearrange factor the refine head runs at "
                             "(1=full res, s2d=fastest; default from "
                             "checkpoint, else 1)")
        sp.add_argument("--arch", default=None,
                        choices=("unet", "tower", "flow"),
                        help="model family (default: from checkpoint, else "
                             "unet = reference parity)")
        sp.add_argument("--upsample", default=None,
                        choices=("align_corners", "half_pixel"),
                        help="decoder upsample grid (default: from "
                             "checkpoint; align_corners = reference parity, "
                             "half_pixel = TPU-native, faster at s2d)")
        sp.add_argument("--refine-depthwise", action="store_true",
                        help="separable refine conv2 (matches a checkpoint "
                             "trained with --refine-depthwise)")
        sp.add_argument("--base-width", type=int, default=None,
                        help="first-stage width (default: from checkpoint, "
                             "else 64 = reference parity)")
        sp.add_argument("--flow-scale", type=int, default=None,
                        help="flow family: motion backbone runs at "
                             "1/flow_scale resolution (field upsampled; "
                             "default: from checkpoint, else 1)")
        sp.add_argument("--warp-impl", default=None,
                        choices=("gather4", "patch", "shifts", "pyramid"),
                        help="flow family: backward-warp strategy. "
                             "gather4/patch are numerically identical "
                             "(checkpoint-safe to flip); shifts is the "
                             "gather-free TPU-fast path (displacements "
                             "clamped to +-max_flow px); pyramid = shifts "
                             "with a strided coarse level (full +-max_flow "
                             "range at ~sqrt cost)")
        sp.add_argument("--max-flow", type=int, default=None,
                        help="shifts/pyramid warp: per-axis displacement "
                             "bound in pixels (default 32)")
        sp.add_argument("--core-pack", type=int, default=1,
                        help="unet family, inference only: fold g batch "
                             "items into channels and run grouped convs — "
                             "removes XLA's 128-lane HBM padding on thin "
                             "activations; identical math. Batches not "
                             "divisible by g fall back transparently")
        sp.add_argument("--core-impl", default="xla",
                        choices=("xla", "auto", "pallas"),
                        help="U-Net core lowering: xla (default — fastest "
                             "at throughput batches), auto = the "
                             "transposed-layout Pallas core when eligible "
                             "(a latency option: +3-5%% at batch 1-32 on "
                             "1080p/4K, identical math to 1 uint8 LSB; "
                             "docs/PERF.md round-4 verdict)")

    t = sub.add_parser("train", help="train the interpolation model")
    t.add_argument("--data-dir", default="data/train")
    t.add_argument("--epochs", type=int, default=100)
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--lr", type=float, default=1e-4,
                   help="initial learning rate (reference hardcodes 1e-4)")
    t.add_argument("--val-split", type=float, default=0.2)
    t.add_argument("--height", type=int, default=256)
    t.add_argument("--width", type=int, default=256)
    t.add_argument("--channels", type=int, default=1, choices=(1, 3))
    t.add_argument("--s2d", type=int, default=1, choices=(1, 2, 4, 8),
                   help="space-to-depth stem (1=reference parity)")
    t.add_argument("--arch", default="unet",
                   choices=("unet", "tower", "flow"),
                   help="model family: unet (reference parity) | tower "
                        "(siamese encoder; video streams reuse per-frame "
                        "features) | flow (motion-compensated: learned "
                        "flow + warp + blend; native arbitrary-time, one "
                        "backbone pass per pair at any factor; requires "
                        "--s2d 1, recommended --base-width 32)")
    t.add_argument("--residual", action="store_true",
                   help="predict the correction to the linear midpoint "
                        "(faster convergence; changes the learned function)")
    t.add_argument("--refine-width", type=int, default=0,
                   help="refinement head width for s2d models")
    t.add_argument("--refine-factor", type=int, default=1,
                   help="rearrange factor the refine head runs at "
                        "(1=full resolution, s2d=fastest)")
    t.add_argument("--upsample", default="align_corners",
                   choices=("align_corners", "half_pixel"),
                   help="decoder upsample grid: align_corners = reference "
                        "parity semantics; half_pixel = TPU-native (no "
                        "decoder gathers; faster at s2d resolutions)")
    t.add_argument("--refine-depthwise", action="store_true",
                   help="separable refine conv2 (depthwise+pointwise): "
                        "much cheaper head at 1080p")
    t.add_argument("--base-width", type=int, default=64,
                   help="first-stage width (64 = reference parity; the "
                        "1080p core is HBM-bound on the width-64 top "
                        "level, so narrower trains may run ~proportionally "
                        "faster)")
    t.add_argument("--flow-smooth", type=float, default=0.0,
                   help="flow family only: edge-aware smoothness weight on "
                        "the predicted motion field (0 = off; try 0.01-0.1)")
    t.add_argument("--flow-scale", type=int, default=1,
                   help="flow family only: run the motion backbone at "
                        "1/flow_scale resolution (average-pooled inputs, "
                        "bilinearly upsampled field) — the flow analog of "
                        "--s2d: ~flow_scale^2 cheaper backbone, full-res "
                        "warp/blend output")
    t.add_argument("--flow-photo", type=float, default=0.0,
                   help="flow family only: endpoint photometric field "
                        "supervision weight — L1 between each frame and "
                        "its full warp from the other frame (0 = off; "
                        "try 0.05-0.2)")
    t.add_argument("--census", type=float, default=0.0,
                   help="illumination-robust census-transform loss weight "
                        "(any family; soft census descriptor Hamming "
                        "distance, ops/census.py). 0 = off — on clean "
                        "content it costs -0.003/-0.007 SSIM at w=0.5/1.0; "
                        "on exposure-flicker content 0.5 WINS +0.007 SSIM "
                        "(docs/QUALITY.md sections 6 and 8) — use 0.5 for "
                        "footage with lighting flicker / rolling exposure")
    t.add_argument("--census-window", type=int, default=7,
                   help="census descriptor window (odd; default 7)")
    t.add_argument("--flow-cascade", type=int, default=0,
                   help="flow family: residual field-refinement stages "
                        "after the backbone (each = 2 midpoint warps + a "
                        "thin full-res conv stack emitting flow/mask "
                        "residuals, zero-initialized; RIFE-style "
                        "coarse-to-fine). 0 = off")
    t.add_argument("--flow-bidir", action="store_true",
                   help="flow family only: predict two independent motion "
                        "fields (f1->f2 and f2->f1, Super-SloMo-style "
                        "time-t warp synthesis) instead of one field and "
                        "its negation — helps occlusions / non-symmetric "
                        "motion")
    t.add_argument("--warp-impl", default="shifts",
                   choices=("gather4", "patch", "shifts", "pyramid"),
                   help="flow family only: backward-warp strategy the model "
                        "trains through. shifts (default) = gather-free "
                        "TPU-fast path (displacements clamped to "
                        "+-max_flow px, quality-equal by A/B); pyramid = "
                        "shifts with a strided coarse level (full range at "
                        "~sqrt cost); gather4 = exact bilinear warp")
    t.add_argument("--max-flow", type=int, default=32,
                   help="shifts/pyramid warp: per-axis displacement bound "
                        "in pixels (shifts cost is linear in the bound, "
                        "pyramid ~sqrt)")
    t.add_argument("--checkpoint-dir", default="checkpoints")
    t.add_argument("--ema-decay", type=float, default=0.0,
                   help="exponential moving average of the weights "
                        "(0 = off; try 0.999). The EMA weights are what "
                        "validation scores and what exports for inference")
    t.add_argument("--augment", action="store_true",
                   help="label-consistent train augmentation: random "
                        "horizontal/vertical flips and temporal swap")
    t.add_argument("--grad-accum", type=int, default=1,
                   help="sequential microbatches per optimizer step: same "
                        "effective batch, ~N x lower activation memory "
                        "(for resolutions/batches one chip can't hold); "
                        "batch size must divide evenly")
    t.add_argument("--save-every", type=int, default=1,
                   help="epochs between resume-point ('latest') checkpoint "
                        "writes (best-val always saves); raise on hosts "
                        "where the device->host state fetch is slow")
    t.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint (true resume: "
                        "optimizer state, epoch, LR schedule)")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--num-devices", type=int, default=-1,
                   help="devices in the data-parallel mesh (-1 = all)")
    t.add_argument("--num-workers", type=int, default=4)
    t.add_argument("--device", default=None,
                   help="accepted for reference compatibility; device "
                        "selection is automatic (mesh over all chips)")

    i = sub.add_parser("infer", help="interpolate between two frames")
    i.add_argument("--frame1", required=True)
    i.add_argument("--frame2", required=True)
    add_model_flags(i)
    i.add_argument("--output", default="interpolated_frame.png")
    i.add_argument("--num-intermediate", type=int, default=1)
    i.add_argument("--fps", type=int, default=30)
    i.add_argument("--save-comparison", action="store_true",
                   help="also write a linear-blend comparison video")
    i.add_argument("--height", type=int, default=256)
    i.add_argument("--width", type=int, default=256)
    i.add_argument("--device", default=None, help="compat flag (ignored)")

    v = sub.add_parser("video", help="interpolate a video file to 2x/4x/8x fps")
    v.add_argument("--input", required=True)
    v.add_argument("--output", required=True)
    add_model_flags(v)
    v.add_argument("--factor", type=int, default=2,
                   help="frame-rate multiplier (any integer >= 2; exact for "
                        "flow/time-conditioned models and for powers of two "
                        "on bisection models, nearest-dyadic otherwise)")
    v.add_argument("--target-fps", type=float, default=None,
                   help="retime to an arbitrary output fps instead of an "
                        "integer factor (24->60 etc.; fractional rates, "
                        "originals pass through losslessly). Requires an "
                        "exact-time model: --arch flow or time-conditioned")
    v.add_argument("--fps", type=float, default=None,
                   help="output fps (default: input fps * factor)")
    v.add_argument("--batch-pairs", type=int, default=8)
    v.add_argument("--device", default=None, help="compat flag (ignored)")

    e = sub.add_parser("eval", help="evaluate vs linear + optical-flow baselines")
    e.add_argument("--test-dir", required=True)
    add_model_flags(e)
    e.add_argument("--output-dir", default="evaluation_results")
    e.add_argument("--batch-size", type=int, default=8)
    e.add_argument("--height", type=int, default=256)
    e.add_argument("--width", type=int, default=256)
    e.add_argument("--max-triplets", type=int, default=None)
    e.add_argument("--save-frames", action="store_true")
    e.add_argument("--device", default=None, help="compat flag (ignored)")

    s = sub.add_parser("serve", help="start the HTTP API")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8000)
    add_model_flags(s)
    s.add_argument("--height", type=int, default=256)
    s.add_argument("--width", type=int, default=256)
    s.add_argument("--no-warmup", action="store_true")

    n = sub.add_parser("info", help="model / checkpoint information")
    add_model_flags(n)

    d = sub.add_parser("demo", help="generate fixtures and smoke-run every "
                                    "component (reference demo_simple.py)")
    d.add_argument("--output-dir", default="test_data")
    d.add_argument("--size", type=int, default=128)

    ds = sub.add_parser("dataset", help="generate a procedural training "
                                        "dataset (textured panning scenes "
                                        "with multiple moving sprites)")
    ds.add_argument("--output-dir", default="data/train")
    ds.add_argument("--videos", type=int, default=64)
    ds.add_argument("--frames", type=int, default=16)
    ds.add_argument("--size", type=int, default=256)
    ds.add_argument("--channels", type=int, default=1, choices=(1, 3))
    ds.add_argument("--sprites", type=int, default=4)
    ds.add_argument("--seed", type=int, default=0)
    ds.add_argument("--max-speed", type=float, default=6.0,
                    help="sprite speed bound in px/frame (fast tiers "
                         ">= ~16 exceed the shifts-warp --max-flow bound "
                         "at training time)")
    ds.add_argument("--motion", default="linear", choices=("linear", "hard"),
                    help="'linear' = constant velocities (the standard "
                         "harness tier); 'hard' adds camera rotation/zoom, "
                         "sprite acceleration and orbits — curved "
                         "trajectories + occlusions")
    ds.add_argument("--flicker", type=float, default=0.0,
                    help="per-frame exposure flicker amplitude (0 = off; "
                         "0.1-0.2 = fluorescent/auto-exposure flicker with "
                         "a 2.5-5 frame period — the illumination-"
                         "robustness tier that motivates --census)")

    c = sub.add_parser("convert", help="convert checkpoints between the "
                                       "reference .pth format and orbax")
    c.add_argument("--input", required=True, help=".pth file or orbax dir")
    c.add_argument("--output", required=True, help="orbax dir or .pth file")
    c.add_argument("--channels", type=int, default=1, choices=(1, 3))
    c.add_argument("--bilinear", action="store_true", default=None)

    return p


def _load_engine(args, allow_random: bool = False):
    import jax.numpy as jnp

    from .infer.engine import InterpolationEngine

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = None
    if args.channels or getattr(args, "s2d", None) or \
            getattr(args, "refine_width", None) or getattr(args, "arch", None):
        cfg = ModelConfig(arch=getattr(args, "arch", None) or "unet",
                          channels=args.channels or 1,
                          space_to_depth=getattr(args, "s2d", None) or 1,
                          refine_width=getattr(args, "refine_width", None) or 0,
                          refine_factor=getattr(args, "refine_factor", None)
                          or 1,
                          upsample=getattr(args, "upsample", None)
                          or "align_corners",
                          refine_depthwise=getattr(args, "refine_depthwise",
                                                   False),
                          base_width=getattr(args, "base_width", None) or 64,
                          flow_scale=getattr(args, "flow_scale", None) or 1,
                          warp_impl=getattr(args, "warp_impl", None)
                          or "shifts",
                          max_flow=getattr(args, "max_flow", None) or 32)
    core_pack = getattr(args, "core_pack", 1) or 1
    core_impl = getattr(args, "core_impl", None) or "xla"
    if os.path.exists(args.model) or args.model.endswith((".pth", ".pt")):
        eng = InterpolationEngine.from_checkpoint(args.model, cfg,
                                                  compute_dtype=dtype,
                                                  core_pack=core_pack)
        eng.core_impl = core_impl
        return eng
    if allow_random:
        print(f"warning: no checkpoint at '{args.model}', using random "
              "weights (plumbing/demo mode)")
        eng = InterpolationEngine.random_init(cfg or ModelConfig(),
                                              compute_dtype=dtype,
                                              core_pack=core_pack)
        eng.core_impl = core_impl
        return eng
    raise SystemExit(f"error: checkpoint not found: {args.model}")


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------

def cmd_train(args) -> int:
    import jax
    import jax.numpy as jnp

    from .data.loader import TripletLoader
    from .data.triplets import scan_triplets, split_triplets
    from .models import build_model
    from .models.unet import count_parameters
    from .parallel.mesh import make_mesh, maybe_init_distributed
    from .train.checkpoint import Checkpointer, save_variables
    from .train.loop import History, create_train_state, train_model

    maybe_init_distributed()
    mesh = make_mesh(None if args.num_devices in (-1, None)
                     else args.num_devices)
    n_dev = int(mesh.devices.size)
    batch = args.batch_size
    if batch % n_dev:
        batch = ((batch + n_dev - 1) // n_dev) * n_dev
        print(f"note: batch size rounded up to {batch} "
              f"(divisible by {n_dev} devices)")

    triplets = scan_triplets(args.data_dir)
    if len(triplets) < 2:
        raise SystemExit(f"error: not enough triplets in {args.data_dir} "
                         f"(found {len(triplets)}; need frame_*.png videos "
                         "with >= 3 frames)")
    train_t, val_t = split_triplets(triplets, args.val_split, args.seed)
    if batch > len(train_t):
        # the train loader drops the remainder for static jit shapes, so a
        # batch larger than the train set would yield ZERO steps per epoch
        clamped = (len(train_t) // n_dev) * n_dev
        if clamped == 0:
            raise SystemExit(
                f"error: only {len(train_t)} train triplets for {n_dev} "
                "devices; add data or reduce --num-devices/--val-split")
        print(f"note: batch size clamped to {clamped} "
              f"(only {len(train_t)} train triplets; drop-remainder "
              "batching would otherwise yield zero steps/epoch)")
        batch = clamped
    print(f"dataset: {len(triplets)} triplets "
          f"({len(train_t)} train / {len(val_t)} val), "
          f"{n_dev}-device mesh, global batch {batch}")

    kw = dict(batch_size=batch, height=args.height, width=args.width,
              grayscale=args.channels == 1, num_workers=args.num_workers,
              mesh=mesh)
    train_loader = TripletLoader(train_t, seed=args.seed + 1,
                                 augment=args.augment, **kw)
    val_loader = TripletLoader(val_t, shuffle=False, drop_remainder=False, **kw)

    mcfg = ModelConfig(arch=args.arch, channels=args.channels,
                       space_to_depth=args.s2d, residual=args.residual,
                       refine_width=args.refine_width,
                       refine_factor=args.refine_factor,
                       upsample=args.upsample,
                       refine_depthwise=args.refine_depthwise,
                       base_width=args.base_width,
                       flow_scale=args.flow_scale,
                       flow_bidir=args.flow_bidir,
                       flow_cascade=args.flow_cascade,
                       warp_impl=args.warp_impl,
                       max_flow=args.max_flow)
    if args.flow_bidir and args.arch != "flow":
        raise SystemExit("error: --flow-bidir requires --arch flow")
    if args.flow_cascade and args.arch != "flow":
        raise SystemExit("error: --flow-cascade requires --arch flow")
    if args.flow_smooth > 0 and args.arch != "flow":
        raise SystemExit("error: --flow-smooth regularizes the flow "
                         "family's motion field; it requires --arch flow")
    if args.flow_photo > 0 and args.arch != "flow":
        raise SystemExit("error: --flow-photo supervises the flow "
                         "family's motion field; it requires --arch flow")
    if args.grad_accum < 1 or batch % args.grad_accum:
        raise SystemExit(f"error: --grad-accum must divide the batch size "
                         f"evenly (batch {batch}, accum {args.grad_accum})")
    from .config import LossConfig
    tcfg = TrainConfig(epochs=args.epochs, batch_size=batch,
                       learning_rate=args.lr, val_split=args.val_split,
                       seed=args.seed, checkpoint_dir=args.checkpoint_dir,
                       ema_decay=args.ema_decay, augment=args.augment,
                       save_every=args.save_every,
                       grad_accum=args.grad_accum,
                       loss=LossConfig(flow_smooth_weight=args.flow_smooth,
                                       flow_photo_weight=args.flow_photo,
                                       census_weight=args.census,
                                       census_window=args.census_window))
    model = build_model(mcfg)
    c = mcfg.channels
    f = jnp.zeros((1, args.height, args.width, c), jnp.float32)
    variables = jax.jit(lambda a, b: model.init(
        jax.random.key(args.seed), a, b, train=False))(f, f)
    print(f"model: {count_parameters(variables):,} parameters")

    ckpt = Checkpointer(args.checkpoint_dir)
    start_epoch, state, history = 0, None, None
    if args.resume and ckpt.has_checkpoint("latest"):
        state0 = create_train_state(model, variables, tcfg)
        state, start_epoch, hist_dict = ckpt.restore(state0, which="latest")
        if hist_dict:
            history = History(**hist_dict)
        print(f"resumed from epoch {start_epoch}")

    state, history = train_model(model, variables, train_loader, val_loader,
                                 tcfg, mesh=mesh, checkpointer=ckpt,
                                 start_epoch=start_epoch, state=state,
                                 history=history)
    # export best weights as inference variables + model config (EMA weights
    # when enabled — they are what validation ranked)
    best_state, _, _ = ckpt.restore(create_train_state(model, variables, tcfg),
                                    which="best")
    export_params = (best_state.ema_params
                     if tcfg.ema_decay > 0 and best_state.ema_params != ()
                     else best_state.params)
    save_variables(args.checkpoint_dir,
                   {"params": export_params,
                    "batch_stats": best_state.batch_stats}, mcfg)
    print(f"checkpoints in {args.checkpoint_dir}/ "
          "(best exported for inference)")
    return 0


def cmd_infer(args) -> int:
    from .data.video import VideoWriter
    from .infer.engine import InterpolationEngine
    from .ops.image import load_image, save_image

    engine = _load_engine(args, allow_random=True)
    gray = engine.cfg.channels == 1
    size = (args.height, args.width)
    f1 = load_image(args.frame1, grayscale=gray, size=size)
    f2 = load_image(args.frame2, grayscale=gray, size=size)
    n = args.num_intermediate
    if n < 1:
        raise SystemExit("error: --num-intermediate must be >= 1")

    if n == 1:
        mid = engine.interpolate_pair(f1, f2)
        save_image(args.output, mid)
        print(f"wrote {args.output}")
        return 0

    mids = engine.generate_intermediate_frames(f1, f2, n)
    base, _ = os.path.splitext(args.output)
    for i, m in enumerate(mids, 1):
        save_image(f"{base}_intermediate_{i:02d}.png", m)
    video_path = f"{base}_video.mp4"
    with VideoWriter(video_path, fps=args.fps) as w:
        for fr in [f1, *mids, f2]:
            w.write(fr)
    print(f"wrote {n} intermediate frames + {video_path}")
    if args.save_comparison:
        cmp_path = f"{base}_comparison.mp4"
        blends = InterpolationEngine.linear_transition_frames(f1, f2, n)
        with VideoWriter(cmp_path, fps=args.fps) as w:
            for fr in [f1, *blends, f2]:
                w.write(fr)
        print(f"wrote {cmp_path} (linear-blend comparison)")
    return 0


def cmd_video(args) -> int:
    engine = _load_engine(args, allow_random=True)
    if args.target_fps is not None:
        stats = engine.retime_video_file(args.input, args.output,
                                         target_fps=args.target_fps,
                                         batch_pairs=args.batch_pairs)
        print(f"{args.input} -> {args.output}: "
              f"{stats['input_frames']} frames @ {stats['input_fps']:.2f} fps "
              f"-> {stats['output_frames']} frames @ "
              f"{stats['output_fps']:.2f} fps (rate {stats['rate']:.3f}, "
              f"{stats['frames_per_second']:.1f} out-frames/s)")
        return 0
    stats = engine.interpolate_video_file(
        args.input, args.output, factor=args.factor,
        batch_pairs=args.batch_pairs, fps=args.fps)
    print(f"{args.input} -> {args.output}: "
          f"{stats['input_frames']} -> {stats['output_frames']} frames "
          f"@ {stats['output_fps']:.1f} fps "
          f"({stats['frames_per_second']:.1f} out-frames/s)")
    return 0


def cmd_eval(args) -> int:
    from .eval.harness import evaluate_model
    from .eval.report import generate_full_report, print_summary

    engine = _load_engine(args, allow_random=True)
    results = evaluate_model(
        engine, test_dir=args.test_dir, batch_size=args.batch_size,
        height=args.height, width=args.width,
        save_frames_dir=os.path.join(args.output_dir, "frames")
        if args.save_frames else None,
        max_triplets=args.max_triplets, progress=True)
    print_summary(results)
    artifacts = generate_full_report(results, args.output_dir, engine=engine,
                                     height=args.height, width=args.width)
    print(f"report artifacts in {args.output_dir}/ "
          f"(json, csv, plots, report.md, comparisons)")
    return 0


def cmd_serve(args) -> int:
    from .serve.server import Server, warmup

    engine = _load_engine(args, allow_random=True)
    cfg = ServeConfig(host=args.host, port=args.port, model_path=args.model)
    if not args.no_warmup:
        print("warmup: compiling the serving path...", flush=True)
        dt = warmup(engine, (args.height, args.width))
        print(f"warmup done in {dt:.1f}s")
    try:
        server = Server(engine, cfg, resolution=(args.height, args.width))
    except OSError as e:
        raise SystemExit(f"error: cannot bind {args.host}:{args.port} ({e})")
    print(f"serving on http://{args.host}:{server.port}  "
          "(POST /interpolate, GET /, /health, /model-info)")
    # production process managers stop services with SIGTERM; exit through
    # the same clean path as Ctrl-C (drains the engine, closes the socket)
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("\nshutting down")
        server.shutdown()
    return 0


def cmd_info(args) -> int:
    import dataclasses
    import json

    from .models.unet import count_parameters

    if args.model.endswith((".pth", ".pt")):
        import torch

        ckpt = torch.load(args.model, map_location="cpu", weights_only=False)
        print(f"PyTorch checkpoint: {args.model}")
        if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
            # reference format; tolerate missing keys (main.py:152-153 crashes
            # formatting missing values — SURVEY.md §8.12)
            for key in ("epoch", "train_loss", "val_loss"):
                val = ckpt.get(key)
                if isinstance(val, float):
                    print(f"  {key}: {val:.6f}")
                elif val is not None:
                    print(f"  {key}: {val}")
            sd = ckpt["model_state_dict"]
        else:
            sd = ckpt
        n = sum(int(v.numel()) for v in sd.values()
                if hasattr(v, "numel") and v.dtype.is_floating_point)
        print(f"  parameters: {n:,}")
        return 0

    engine = _load_engine(args)
    print(f"checkpoint: {args.model}")
    print(f"  model config: {dataclasses.asdict(engine.cfg)}")
    print(f"  parameters: {count_parameters(engine.variables):,}")
    meta_path = os.path.join(args.model, "latest_meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        # meta['epoch'] is the 0-indexed last finished epoch (what resume
        # restores from); report the human count
        done = meta.get("epoch")
        print(f"  epochs completed: {done + 1 if isinstance(done, int) else '?'}")
        hist = meta.get("history") or {}
        if hist.get("val_loss"):
            print(f"  best val loss: {min(hist['val_loss']):.6f}")
            print(f"  last val psnr: {hist['val_psnr'][-1]:.2f} dB, "
                  f"ssim {hist['val_ssim'][-1]:.4f}")
    return 0


def cmd_demo(args) -> int:
    """Fixture generation + component smoke run (capability of reference
    ``demo_simple.py`` / ``test_basic.py``, but through the real APIs)."""
    import numpy as np

    from .config import ModelConfig
    from .data.synthetic import write_fixture_tree, write_fixture_video
    from .eval.harness import evaluate_model
    from .eval.report import print_summary
    from .infer.engine import InterpolationEngine

    print("1) writing moving-circle fixtures")
    dirs = write_fixture_tree(args.output_dir, num_videos=1, num_frames=5,
                              height=args.size, width=args.size)
    clip = write_fixture_video(
        os.path.join(args.output_dir, "sample_clip.mp4"),
        num_frames=8, height=args.size, width=args.size)
    print(f"   {dirs[0]}/  and  {clip}")

    print("2) building the model (random weights) + forward pass")
    engine = InterpolationEngine.random_init(ModelConfig())
    f = np.zeros((args.size, args.size, 1), np.uint8)
    mid = engine.interpolate_pair(f, f)
    print(f"   forward ok: {mid.shape} {mid.dtype}")

    print("3) 3-method evaluation on the fixture")
    results = evaluate_model(engine, test_dir=args.output_dir,
                             height=args.size, width=args.size)
    print_summary(results)

    print("4) 2x video interpolation on the fixture clip")
    out_clip = os.path.join(args.output_dir, "sample_clip_2x.mp4")
    stats = engine.interpolate_video_file(clip, out_clip, factor=2,
                                          batch_pairs=4)
    print(f"   {stats['input_frames']} -> {stats['output_frames']} frames "
          f"({out_clip})")
    print("demo complete — train on real data with: fi-tpu train "
          f"--data-dir {args.output_dir}")
    return 0


def cmd_dataset(args) -> int:
    """Generate a procedural training dataset: textured panning backgrounds
    with multiple anti-aliased moving sprites (every frame rendered at its
    own time, so the triplet midpoint contract holds for any motion tier).
    A training-scale substitute for real footage — much more diverse than
    the reference's single moving-circle demo clip
    (``demo_simple.py:17-40``)."""
    from .data.synthetic import write_scene_tree

    dirs = write_scene_tree(args.output_dir, num_videos=args.videos,
                            num_frames=args.frames, height=args.size,
                            width=args.size, channels=args.channels,
                            num_sprites=args.sprites, seed=args.seed,
                            motion=args.motion,
                            max_speed=args.max_speed,
                            flicker=args.flicker)
    n_triplets = args.videos * max(0, args.frames - 2)
    print(f"wrote {len(dirs)} clips x {args.frames} frames "
          f"({n_triplets} triplets) to {args.output_dir}")
    print(f"train with: fi-tpu train --data-dir {args.output_dir}")
    return 0


def cmd_convert(args) -> int:
    from .train.checkpoint import (export_pth, import_pth, load_variables,
                                   save_variables)

    if args.input.endswith((".pth", ".pt")):
        cfg = None   # inferred from the state dict (bilinear detection)
        variables = import_pth(args.input, cfg)
        inferred = ModelConfig(channels=args.channels)
        save_variables(args.output, variables, inferred)
        print(f"{args.input} (PyTorch) -> {args.output} (orbax)")
    else:
        variables, cfg = load_variables(args.input)
        if not args.output.endswith((".pth", ".pt")):
            raise SystemExit("error: output must be a .pth file when "
                             "converting from orbax")
        export_pth(args.output, variables, cfg)
        print(f"{args.input} (orbax) -> {args.output} (PyTorch reference "
              "format)")
    return 0


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for every CLI entry point. Remote TPU
    compiles of 1080p/full-res graphs take minutes each and A/B sweeps
    re-run the same configs; the cache (env-overridable via
    ``FI_TPU_COMPILE_CACHE``; set it empty to disable) makes repeat
    invocations skip them entirely — the same policy bench.py and the test
    conftest already use."""
    cache = os.environ.get("FI_TPU_COMPILE_CACHE",
                           "/tmp/fi_tpu_compile_cache")
    if not cache:
        return
    import jax

    from .utils.cache import host_keyed

    # host-keyed: the hosts rotate between sessions while /tmp persists,
    # and a cache written by another machine type feeds this one AOT CPU
    # code specialized to missing ISA extensions (SIGILL class)
    jax.config.update("jax_compilation_cache_dir", host_keyed(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    _enable_compile_cache()
    try:
        return {"train": cmd_train, "infer": cmd_infer, "video": cmd_video,
                "eval": cmd_eval, "serve": cmd_serve, "demo": cmd_demo,
                "convert": cmd_convert, "dataset": cmd_dataset,
                "info": cmd_info}[args.command](args)
    except (FileNotFoundError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
