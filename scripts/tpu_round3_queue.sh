#!/bin/bash
# Round-3 proof queue — runs every chip-bound artifact the round-2 VERDICT
# asked for, in priority order, with crash-resume on the long e2e stage.
# Designed to be launched ONCE from a snapshot clone so concurrent dev edits
# in /root/repo cannot break a mid-queue stage:
#
#   git clone /root/repo /tmp/proofrun && cd /tmp/proofrun
#   ARTIFACT_DEST=/root/repo bash scripts/tpu_round3_queue.sh [stage...]
#
# Stages (default order): smoke knn e2e overlap
#   smoke   -> DIFFUSION_SMOKE.json   (full-size 25x320x448 UNet-320 workload)
#   knn     -> KNN_SCALE.json         (1M-point KNN accuracy/latency + densify)
#   e2e     -> output/synthetic_oracle_e2e/{results,timing_summary}.json +
#              WALLCLOCK_PROJECTION.txt (10k-iter oracle-guided run, resumable
#              via --checkpoint_iterations every 1000)
#   overlap -> PIPELINE_OVERLAP.json  (serial vs --pipeline_guidance, 2k iters)
#
# Each finished stage mirrors its small JSON artifacts into $ARTIFACT_DEST so
# they can be committed from the dev tree the moment they exist.
set -u
cd "$(dirname "$0")/.."
DEST=${ARTIFACT_DEST:-$(pwd)}

stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(smoke knn e2e overlap)

probe() {
    timeout 180 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null
}

mirror() {  # mirror $1 (file) into $DEST preserving relative path
    local f=$1
    [ -f "$f" ] || return 0
    mkdir -p "$DEST/$(dirname "$f")"
    cp -f "$f" "$DEST/$f"
}

echo "== probing TPU tunnel =="
if ! probe; then
    echo "tunnel down — aborting (re-run when it is back)" >&2
    exit 3
fi

src=/tmp/synthetic_scene
base=output/synthetic_e2e
work=output/synthetic_oracle_e2e

for stage in "${stages[@]}"; do
    echo "== stage: $stage ($(date -u +%H:%M:%S)) =="
    case "$stage" in
    smoke)
        timeout 10800 python tools/diffusion_fullsize_smoke.py --full \
            || echo "diffusion smoke FAILED" >&2
        mirror DIFFUSION_SMOKE.json
        ;;
    knn)
        timeout 3600 python tools/validate_knn_scale.py \
            || echo "knn scale FAILED" >&2
        mirror KNN_SCALE.json
        ;;
    parity)
        timeout 3600 python tools/check_packed_parity_onchip.py \
            || echo "packed parity FAILED" >&2
        mirror PACKED_PARITY.json
        ;;
    e2e)
        if [ ! -d "$src" ]; then
            echo "generating synthetic scene at $src"
            timeout 3600 python tools/make_synthetic_scene.py --out "$src" || continue
        fi
        if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ]; then
            echo "training baseline first (scripts/run_synthetic_e2e.sh)"
            timeout 14400 bash scripts/run_synthetic_e2e.sh "$src" "$base" \
                || { echo "baseline FAILED" >&2; continue; }
        fi
        mirror "$base/results.json"; mirror "$base/timing_summary.json"
        # guided run, resumable: checkpoint every 1000 iters; on crash retry
        # from the newest checkpoint (guided ckpts restore pools + RNG exactly)
        ok=0
        for attempt in 1 2 3; do
            resume=()
            latest=$(ls -1 "$work"/chkpnt*.ckpt 2>/dev/null \
                     | sed 's/.*chkpnt\([0-9]*\).ckpt/\1 &/' | sort -n \
                     | tail -1 | cut -d' ' -f2)
            [ -n "${latest:-}" ] && resume=(--start_checkpoint "$latest")
            echo "-- e2e attempt $attempt ${resume[*]:-fresh}"
            if timeout 28800 python train_guidedvd.py --dataset colmap \
                --source_path "$src" --model_path "$work" \
                --baseline_path "$base" --eval --n_views 6 \
                --oracle_gt_npz "$src/gt_gaussians.npz" \
                --raster_backend tiles \
                --iterations 10000 --test_iterations 10000 \
                --save_iterations 10000 \
                --checkpoint_iterations 1000 2000 3000 4000 5000 6000 7000 8000 9000 \
                "${resume[@]}"; then
                ok=1; break
            fi
            echo "oracle e2e attempt $attempt FAILED" >&2
            mirror "$work/metrics.jsonl"
        done
        [ "$ok" = 1 ] || continue
        mirror "$work/metrics.jsonl"; mirror "$work/timing_summary.json"
        timeout 3600 python render.py --source_path "$src" --model_path "$work" \
            --iteration 10000 || continue
        timeout 1800 python metrics.py -m "$work" || continue
        cat "$work/results.json"
        mirror "$work/results.json"; mirror "$work/per_view.json"
        timeout 600 python tools/project_wallclock.py "$work" \
            ${DIFFUSION_SMOKE:+--smoke DIFFUSION_SMOKE.json} \
            | tee WALLCLOCK_PROJECTION.txt || true
        mirror WALLCLOCK_PROJECTION.txt
        ;;
    overlap)
        # self-sufficient: regenerate scene + baseline if a reboot wiped /tmp
        if [ ! -d "$src" ]; then
            echo "generating synthetic scene at $src"
            timeout 3600 python tools/make_synthetic_scene.py --out "$src" || continue
        fi
        if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ]; then
            echo "training baseline first (scripts/run_synthetic_e2e.sh)"
            timeout 14400 bash scripts/run_synthetic_e2e.sh "$src" "$base" \
                || { echo "baseline FAILED" >&2; continue; }
            mirror "$base/results.json"; mirror "$base/timing_summary.json"
        fi
        bash scripts/measure_pipeline_overlap.sh \
            || echo "overlap FAILED" >&2
        mirror PIPELINE_OVERLAP.json
        for t in serial pipelined; do
            mirror "output/overlap_$t/timing_summary.json"
        done
        ;;
    *)
        echo "unknown stage: $stage" >&2
        ;;
    esac
done
echo "== queue done ($(date -u +%H:%M:%S)) =="
