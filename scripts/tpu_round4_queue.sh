#!/bin/bash
# Round-4 chip queue: perf-round measurements, serialized on the one v5e.
# Stages (override with args): study bench guided baseline overlap
#
#   nohup bash scripts/tpu_round4_queue.sh > /tmp/r4_queue.log 2>&1 &
#
# Each stage is independently timeout-bounded and failure-tolerant so a
# wedged tunnel can't kill the whole queue.
set -u
cd "$(dirname "$0")/.."

stages=${@:-"study bench guided baseline overlap"}
echo "== round-4 queue: $stages ($(date -u +%H:%M:%S)) =="

for stage in $stages; do
    echo "== stage: $stage ($(date -u +%H:%M:%S)) =="
    case "$stage" in
    study)
        timeout 3600 python tools/counting_sort_study.py \
            || echo "counting-sort study FAILED" >&2
        ;;
    densify)
        timeout 3600 python tools/profile_densify.py \
            || echo "densify profile FAILED" >&2
        ;;
    knnscale)
        timeout 7200 python tools/validate_knn_scale.py \
            || echo "knn scale FAILED" >&2
        ;;
    bench)
        timeout 3600 python bench.py || echo "bench FAILED" >&2
        ;;
    guided)
        timeout 14400 python tools/profile_guided_step.py --decompose \
            || echo "guided-step profile FAILED" >&2
        ;;
    baseline)
        src=/tmp/synthetic_scene
        base=output/synthetic_e2e
        if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ]; then
            timeout 14400 bash scripts/run_synthetic_e2e.sh "$src" "$base" \
                || echo "baseline FAILED" >&2
        else
            echo "baseline already trained"
        fi
        ;;
    overlap)
        timeout 14400 bash scripts/measure_pipeline_overlap.sh \
            || echo "overlap FAILED" >&2
        ;;
    smokefull)
        timeout 14400 python tools/diffusion_fullsize_smoke.py --full \
            || echo "full smoke FAILED" >&2
        timeout 600 python tools/project_wallclock.py output/synthetic_oracle_e2e_r3d \
            --smoke DIFFUSION_SMOKE.json | tee WALLCLOCK_PROJECTION_r4.txt || true
        ;;
    *)
        echo "unknown stage: $stage" >&2
        ;;
    esac
done
echo "== queue done ($(date -u +%H:%M:%S)) =="
