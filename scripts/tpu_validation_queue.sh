#!/bin/bash
# TPU validation queue — run everything that needs the real chip, in priority
# order, as soon as the axon tunnel is up. Each stage persists its artifact
# and the queue keeps going on failure so one broken stage doesn't starve the
# rest. Designed to be launched once and left alone:
#
#   bash scripts/tpu_validation_queue.sh [stage...]   # default: all stages
#
# Stages:
#   bench   -> BENCH_DETAIL.json + one-line JSON (the driver metric)
#   smoke   -> DIFFUSION_SMOKE.json (320x448x25 UNet-320 memory/latency smoke)
#   e2e     -> output/synthetic_oracle_e2e results.json (10k-iter oracle-guided
#              run on the full synthetic scene vs its trained baseline)
set -u
cd "$(dirname "$0")/.."

stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(bench smoke e2e)

probe() {
    timeout 120 python -c "import jax; assert jax.devices()" 2>/dev/null
}

echo "== probing TPU tunnel =="
if ! probe; then
    echo "tunnel down — aborting (re-run when it is back)" >&2
    exit 3
fi

for stage in "${stages[@]}"; do
    echo "== stage: $stage ($(date -u +%H:%M:%S)) =="
    case "$stage" in
    bench)
        timeout 1800 python bench.py || echo "bench FAILED (see BENCH_DETAIL.json)" >&2
        ;;
    smoke)
        timeout 7200 python tools/diffusion_fullsize_smoke.py --full \
            || echo "diffusion smoke FAILED" >&2
        ;;
    e2e)
        src=/tmp/synthetic_scene
        base=output/synthetic_e2e
        work=output/synthetic_oracle_e2e
        if [ ! -d "$src" ]; then
            echo "generating synthetic scene at $src"
            timeout 3600 python tools/make_synthetic_scene.py --out "$src" || continue
        fi
        if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ]; then
            echo "training baseline first (scripts/run_synthetic_e2e.sh)"
            timeout 14400 bash scripts/run_synthetic_e2e.sh "$src" "$base" \
                || { echo "baseline FAILED" >&2; continue; }
        fi
        timeout 28800 python train_guidedvd.py --dataset colmap \
            --source_path "$src" --model_path "$work" \
            --baseline_path "$base" --eval --n_views 6 \
            --oracle_gt_npz "$src/gt_gaussians.npz" \
            --raster_backend tiles \
            --iterations 10000 --test_iterations 10000 --save_iterations 10000 \
            || { echo "oracle e2e train FAILED" >&2; continue; }
        timeout 3600 python render.py --source_path "$src" --model_path "$work" \
            --iteration 10000 || continue
        timeout 1800 python metrics.py -m "$work" || continue
        cat "$work/results.json"
        # hours-per-scene projection at the reference workload (3-4 h on 2xV100)
        timeout 600 python tools/project_wallclock.py "$work" \
            ${DIFFUSION_SMOKE:+--smoke DIFFUSION_SMOKE.json} \
            | tee WALLCLOCK_PROJECTION.txt || true
        ;;
    *)
        echo "unknown stage: $stage" >&2
        ;;
    esac
done
echo "== queue done ($(date -u +%H:%M:%S)) =="
