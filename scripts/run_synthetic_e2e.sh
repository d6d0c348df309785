#!/bin/bash
# Full-pipeline validation on the procedural synthetic scene (no external
# data needed): generate -> train baseline -> render -> metrics.
set -e

out=${1:-/tmp/synthetic_scene}
work=${2:-output/synthetic_e2e}
iters=${3:-10000}

if [ ! -f "$out/sparse/0/cameras.txt" ]; then
    python tools/make_synthetic_scene.py --out "$out"
fi

python train_baseline.py --dataset colmap --source_path "$out" \
    --model_path "$work" --eval --n_views 6 \
    --raster_backend tiles \
    --iterations "$iters" --test_iterations "$iters" --save_iterations "$iters"

python render.py --source_path "$out" --model_path "$work" --iteration "$iters"
python metrics.py -m "$work"
cat "$work/results.json"
