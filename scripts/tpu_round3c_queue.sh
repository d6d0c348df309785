#!/bin/bash
# Round-3 third chip session — runs with the sublane-fixed fused preprocess
# and the lax.map-serialized guided step. Priority order: the two artifacts
# that have never existed (memory budget + full-size smoke), then refreshed
# perf numbers, then the overlap measurement, then a fresh 10k e2e.
#
#   git clone /root/repo /tmp/proofrun3 && cd /tmp/proofrun3
#   ARTIFACT_DEST=/root/repo bash scripts/tpu_round3c_queue.sh [stage...]
set -u
cd "$(dirname "$0")/.."
DEST=${ARTIFACT_DEST:-$(pwd)}

stages=("$@")
# sweep omitted from the default order: the r3b run settled GVD_EXPAND_BLK
# (128: 33.7 ms, 256: 30.5 ms binning TOTAL — overhead beats arithmetic)
# and r2 found the other knobs at a plateau; e2e time matters more.
[ ${#stages[@]} -eq 0 ] && stages=(mem smoke bench stages iter parity overlap e2e)

probe() {
    timeout 300 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null
}

mirror() {
    local f=$1
    [ -f "$f" ] || return 0
    mkdir -p "$DEST/$(dirname "$f")"
    cp -f "$f" "$DEST/$f"
}

# A fresh client occasionally wedges during axon plugin init (all threads
# in futex_wait, no tunnel socket ever opened) — observed twice after a
# previous chip client died uncleanly. A successful probe connection clears
# the state, so probe WITH RETRIES before every stage.
probe_retry() {
    for i in 1 2 3 4 5; do
        probe && return 0
        echo "  tunnel probe $i failed/wedged — retrying" >&2
        sleep 10
    done
    return 1
}

echo "== probing TPU tunnel =="
if ! probe_retry; then
    echo "tunnel down — aborting" >&2
    exit 3
fi

src=/tmp/synthetic_scene
base=output/synthetic_e2e
work=output/synthetic_oracle_e2e_r3c

for stage in "${stages[@]}"; do
    echo "== stage: $stage ($(date -u +%H:%M:%S)) =="
    probe_retry || { echo "tunnel unavailable at stage $stage" >&2; continue; }
    case "$stage" in
    mem)
        timeout 7200 python tools/diffusion_memory_analysis.py \
            || echo "memory analysis FAILED" >&2
        mirror DIFFUSION_MEMORY.json
        ;;
    smoke)
        timeout 10800 python tools/diffusion_fullsize_smoke.py --full \
            || echo "diffusion smoke FAILED" >&2
        mirror DIFFUSION_SMOKE.json
        ;;
    bench)
        timeout 3600 python bench.py || echo "bench FAILED" >&2
        mirror BENCH_DETAIL.json
        ;;
    stages)
        timeout 3600 python tools/profile_stages_r2.py \
            | tee STAGE_PROFILE_r3.txt || echo "stage profile FAILED" >&2
        mirror STAGE_PROFILE_r3.txt
        ;;
    sweep)
        timeout 7200 python tools/sweep_block_sizes.py \
            | tee BLOCK_SWEEP_r3.txt || echo "sweep FAILED" >&2
        mirror BLOCK_SWEEP_r3.txt
        ;;
    iter)
        timeout 3600 python tools/profile_guided_iter.py \
            || echo "iter profile FAILED" >&2
        mirror GUIDED_ITER_PROFILE.json
        ;;
    parity)
        timeout 3600 python tools/check_packed_parity_onchip.py \
            || echo "packed parity FAILED" >&2
        mirror PACKED_PARITY.json
        ;;
    overlap)
        if [ ! -d "$src" ]; then
            timeout 3600 python tools/make_synthetic_scene.py --out "$src" || continue
        fi
        if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ] \
           && [ -d /tmp/proofrun2/output_synthetic_e2e_stash ]; then
            mkdir -p output
            cp -r /tmp/proofrun2/output_synthetic_e2e_stash "$base"
        fi
        if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ]; then
            timeout 14400 bash scripts/run_synthetic_e2e.sh "$src" "$base" \
                || { echo "baseline FAILED" >&2; continue; }
        fi
        bash scripts/measure_pipeline_overlap.sh \
            || echo "overlap FAILED" >&2
        mirror PIPELINE_OVERLAP.json
        for t in serial pipelined; do
            mirror "output/overlap_$t/timing_summary.json"
        done
        ;;
    e2e)
        # fresh 10k oracle-guided run on the round-3 kernels (async
        # artifacts, banded-matmul SSIM, fused preprocess): refreshes
        # it/s + PSNR; resumable via checkpoints like the r3 queue
        if [ ! -d "$src" ]; then
            timeout 3600 python tools/make_synthetic_scene.py --out "$src" || continue
        fi
        if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ]; then
            echo "e2e needs the baseline (run overlap stage first)" >&2
            continue
        fi
        ok=0
        for attempt in 1 2 3; do
            resume=()
            latest=$(ls -1 "$work"/chkpnt*.ckpt 2>/dev/null \
                     | sed 's/.*chkpnt\([0-9]*\).ckpt/\1 &/' | sort -n \
                     | tail -1 | cut -d' ' -f2)
            [ -n "${latest:-}" ] && resume=(--start_checkpoint "$latest")
            echo "-- e2e attempt $attempt ${resume[*]:-fresh}"
            timeout 7200 python train_guidedvd.py --dataset colmap \
                --source_path "$src" --model_path "$work" \
                --baseline_path "$base" --eval --n_views 6 \
                --oracle_gt_npz "$src/gt_gaussians.npz" \
                --raster_backend tiles \
                --iterations 10000 --test_iterations 10000 \
                --save_iterations 10000 \
                --checkpoint_iterations 2000 4000 6000 8000 \
                "${resume[@]}" &
            tpid=$!
            rc=1
            # wedge watchdog: a client that never opens a tunnel socket
            # writes no metrics.jsonl; kill it after 25 min of nothing
            # instead of burning the whole timeout
            for tick in $(seq 1 150); do
                sleep 60
                if ! kill -0 "$tpid" 2>/dev/null; then
                    wait "$tpid"; rc=$?; break
                fi
                fresh=$(find "$work" -name metrics.jsonl -mmin -20 2>/dev/null)
                if [ "$tick" -ge 25 ] && [ -z "$fresh" ]; then
                    echo "no metrics progress after ${tick} min — wedge/stall, killing" >&2
                    kill "$tpid"; wait "$tpid" 2>/dev/null; rc=99; break
                fi
            done
            if [ "$rc" = 0 ]; then ok=1; break; fi
            echo "e2e attempt $attempt FAILED rc=$rc" >&2
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
            --smoke DIFFUSION_SMOKE.json \
            | tee WALLCLOCK_PROJECTION_r3c.txt || true
        mirror WALLCLOCK_PROJECTION_r3c.txt
        ;;
    *)
        echo "unknown stage: $stage" >&2
        ;;
    esac
done
echo "== queue done ($(date -u +%H:%M:%S)) =="
