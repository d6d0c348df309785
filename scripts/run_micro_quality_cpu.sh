#!/bin/bash
# CPU-feasible quality validation (no TPU, no external weights): a micro
# synthetic scene (96x128, 6 train views), a 3DGS baseline, and an
# ORACLE-guided run (pseudo-GT rendered from the known GT gaussians — a
# perfect generative prior, so the guided machinery must lift held-out PSNR
# above the equal-iteration baseline). Produces results.json for both and
# prints the comparison. Stages skip when their outputs already exist.
#
#   JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= bash scripts/run_micro_quality_cpu.sh
#
# (the PALLAS_AXON_POOL_IPS= prefix skips axon TPU registration, which hangs
# every first jax op during tunnel outages)
set -e
cd "$(dirname "$0")/.."

scene=${1:-/tmp/micro_scene}
iters=${2:-450}
tag=$(basename "$scene")
base=output/${tag}_base_${iters}
guided=output/${tag}_guided_${iters}

if [ ! -f "$scene/gt_gaussians.npz" ]; then
    python tools/make_synthetic_scene.py --out "$scene" --height 96 --width 128 \
        --n_gt 6000 --n_init 2000 --n_cams 24 --n_train 6 --backend dense
fi

if [ ! -f "$base/point_cloud/iteration_$iters/point_cloud.ply" ]; then
    python train_baseline.py --dataset colmap --source_path "$scene" \
        --model_path "$base" --eval --n_views 6 --raster_backend dense \
        --gaussian_capacity 2048 --no_scan \
        --iterations "$iters" --test_iterations "$iters" --save_iterations "$iters"
fi

if [ ! -f "$guided/point_cloud/iteration_$iters/point_cloud.ply" ]; then
    python train_guidedvd.py --dataset colmap --source_path "$scene" \
        --model_path "$guided" --baseline_path "$base" --baseline_iteration "$iters" \
        --oracle_gt_npz "$scene/gt_gaussians.npz" --oracle_backend dense \
        --raster_backend dense --eval --n_views 6 --gaussian_capacity 2048 \
        --no_use_trajectory_pool --no_scan \
        --iterations "$iters" --guidance_vd_iter 110 \
        --start_sample_pseudo 50 --end_sample_pseudo $((iters - 10)) \
        --test_iterations "$iters" --save_iterations "$iters"
fi

for m in "$base" "$guided"; do
    if [ ! -f "$m/results.json" ]; then
        python render.py --source_path "$scene" --model_path "$m" \
            --iteration "$iters" --raster_backend dense --skip_train
        python metrics.py -m "$m"
    fi
done

echo "== held-out test views =="
python - "$base" "$guided" "$iters" <<'EOF'
import json, sys
b, g, it = sys.argv[1], sys.argv[2], sys.argv[3]
rb = json.load(open(f"{b}/results.json"))[f"ours_{it}"]
rg = json.load(open(f"{g}/results.json"))[f"ours_{it}"]
print(f"baseline      PSNR {rb['PSNR']:.2f}  SSIM {rb['SSIM']:.4f}")
print(f"oracle-guided PSNR {rg['PSNR']:.2f}  SSIM {rg['SSIM']:.4f}")
print(f"delta         PSNR {rg['PSNR']-rb['PSNR']:+.2f}  SSIM {rg['SSIM']-rb['SSIM']:+.4f}")
EOF
