#!/bin/bash
# Scenes-harness quality A/B runner — the "standard arms" recipe behind the
# flow-family table in docs/PERF.md (procedural scenes, 24 train clips +
# 6 held-out test clips, 128px, 50-epoch budget, lr 3e-4, identical seeds).
#
# Usage:  scripts/scenes_ab.sh "name:--arch flow --base-width 32 ..." ...
# Env:    WORK   work dir (default /tmp/scenes_ab; dataset is reused)
#         EPOCHS training budget (default 50)
#         MOTION dataset motion tier (default linear; "hard" = rotation/
#                zoom/acceleration/orbits — use a separate WORK dir)
#         MAXSPEED sprite px/frame bound (default 6; >=16 probes the
#                shifts-warp --max-flow clamp at training time)
#         SIZE   frame resolution (default 128; 256 = the reference's own
#                eval contract, model/evaluation_simple.py:19-37 — the
#                round-5 resolution-transfer tier)
#         FLICKER per-frame exposure flicker amplitude (default 0; 0.15 =
#                the census-loss motivating tier)
#
# Each arm trains into $WORK/ck_<name>, evaluates on the held-out clips
# into $WORK/eval_<name>/, and the script ends with a summary table.
# Arms whose eval results already exist are skipped, so the script is
# re-runnable / resumable. Runs on whatever backend jax selects (the TPU
# when the tunnel is up); metrics are backend-independent (docs/PERF.md).
set -u
set -f   # $flags is word-split on purpose below; never glob-expanded
WORK=${WORK:-/tmp/scenes_ab}
EPOCHS=${EPOCHS:-50}
MOTION=${MOTION:-linear}
MAXSPEED=${MAXSPEED:-6}
SIZE=${SIZE:-128}
FLICKER=${FLICKER:-0}
cd /root/repo
mkdir -p "$WORK"

# guard each dataset dir independently: an interrupted first run may have
# created train/ but not test/
if [ ! -d "$WORK/train" ]; then
  python -m ai_based_frame_interpolation_tpu dataset \
    --output-dir "$WORK/train" --videos 24 --size "$SIZE" --seed 0 \
    --motion "$MOTION" --max-speed "$MAXSPEED" --flicker "$FLICKER"
fi
if [ ! -d "$WORK/test" ]; then
  python -m ai_based_frame_interpolation_tpu dataset \
    --output-dir "$WORK/test" --videos 6 --size "$SIZE" --seed 100 \
    --motion "$MOTION" --max-speed "$MAXSPEED" --flicker "$FLICKER"
fi

for spec in "$@"; do
  case "$spec" in
    *:*) ;;
    *) echo "== bad arm spec (want name:flags): $spec"; continue;;
  esac
  name=${spec%%:*}
  flags=${spec#*:}
  ck="$WORK/ck_$name"
  # NOTE: test an explicit filename, not a glob — `set -f` above disables
  # globbing, which silently broke the skip (arms re-ran every invocation)
  if [ -e "$WORK/eval_$name/results.json" ]; then
    echo "== $name: already evaluated, skipping"
    continue
  fi
  echo "== $name: train ($flags)"
  # --resume is a no-op on a fresh dir; with --save-every 10 it makes an
  # interrupted arm continue instead of retraining 50 epochs from scratch
  python -m ai_based_frame_interpolation_tpu train --data-dir "$WORK/train" \
    --epochs "$EPOCHS" --lr 3e-4 --height "$SIZE" --width "$SIZE" --save-every 10 \
    --resume \
    --checkpoint-dir "$ck" $flags > "$WORK/train_$name.log" 2>&1 \
    || { echo "== $name: TRAIN FAILED (see $WORK/train_$name.log)"; continue; }
  echo "== $name: eval"
  python -m ai_based_frame_interpolation_tpu eval --test-dir "$WORK/test" \
    --model "$ck" --height "$SIZE" --width "$SIZE" \
    --output-dir "$WORK/eval_$name" > "$WORK/eval_$name.log" 2>&1 \
    || echo "== $name: EVAL FAILED (see $WORK/eval_$name.log)"
done

echo "== summary"
python - "$WORK" <<'EOF'
import glob, json, os, sys
work = sys.argv[1]
for path in sorted(glob.glob(os.path.join(work, "eval_*", "*.json"))):
    name = os.path.basename(os.path.dirname(path))[5:]
    with open(path) as f:
        r = json.load(f)
    m = r.get("metrics_by_method", {})
    row = []
    for method, met in sorted(m.items()):
        row.append(f"{method}: SSIM {met['ssim']['avg']:.4f} "
                   f"PSNR {met['psnr']['avg']:.2f}")
    print(f"{name:24s} " + " | ".join(row))
EOF
