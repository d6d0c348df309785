#!/bin/bash
# Guided-pipeline validation on the procedural synthetic scene: uses the
# trained baseline (scripts/run_synthetic_e2e.sh) as the frozen renderer and
# runs the FULL guided trainer — trajectory pool, diffusion events (mock
# engine unless a ViewCrafter ckpt is supplied), pseudo-camera stacks,
# per-event artifacts — then render + metrics.
set -e

src=${1:-/tmp/synthetic_scene}
base=${2:-output/synthetic_e2e}
work=${3:-output/synthetic_guided_e2e}
iters=${4:-10000}

if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ]; then
    echo "baseline model missing — run scripts/run_synthetic_e2e.sh first" >&2
    exit 1
fi

python train_guidedvd.py --dataset colmap --source_path "$src" \
    --model_path "$work" --baseline_path "$base" --eval --n_views 6 \
    --raster_backend tiles \
    --iterations "$iters" --test_iterations "$iters" --save_iterations "$iters" \
    ${VIEWCRAFTER_CKPT:+--viewcrafter_ckpt "$VIEWCRAFTER_CKPT"}

python render.py --source_path "$src" --model_path "$work" --iteration "$iters"
python metrics.py -m "$work"
cat "$work/results.json"
