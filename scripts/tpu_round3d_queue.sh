#!/bin/bash
# Round-3 fourth chip session — runs with the multi-camera batched render
# (guided chunk: train+pseudo in one kernel chain; frozen renderer: 5-frame
# groups) and the FIXED full-size smoke (sched/ddim_params precomputed so
# the 50-step sample compiles under jit; incremental JSON writes).
#
#   git clone /root/repo /tmp/proofrun4 && cd /tmp/proofrun4
#   ARTIFACT_DEST=/root/repo bash scripts/tpu_round3d_queue.sh [stage...]
set -u
cd "$(dirname "$0")/.."
DEST=${ARTIFACT_DEST:-$(pwd)}

stages=("$@")
# bench omitted: BENCH_DETAIL was refreshed by the 3c queue and the round
# driver runs bench.py itself at round end
[ ${#stages[@]} -eq 0 ] && stages=(multiparity knn smoke iter e2e overlap)

copy_baseline() {
    for stash in /tmp/proofrun3/output/synthetic_e2e \
                 /tmp/proofrun2/output_synthetic_e2e_stash; do
        if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ] \
           && [ -f "$stash/point_cloud/iteration_10000/point_cloud.ply" ]; then
            mkdir -p output && cp -r "$stash" "$base"
        fi
    done
}

probe() {
    timeout 300 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null
}

mirror() {
    local f=$1
    [ -f "$f" ] || return 0
    mkdir -p "$DEST/$(dirname "$f")"
    cp -f "$f" "$DEST/$f"
}

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
work=output/synthetic_oracle_e2e_r3d

for stage in "${stages[@]}"; do
    echo "== stage: $stage ($(date -u +%H:%M:%S)) =="
    probe_retry || { echo "tunnel unavailable at stage $stage" >&2; continue; }
    case "$stage" in
    multiparity)
        # cheap insurance before the batched e2e: the Mosaic compilation of
        # the batched grid must match two single renders on REAL hardware
        timeout 3600 python tools/check_multi_parity_onchip.py \
            || echo "multi parity FAILED" >&2
        mirror MULTI_PARITY.json
        ;;
    knn)
        # refresh KNN_SCALE.json on the block-pairwise shifted-grid knn
        # (the committed artifact predates it: 0.37 mean rel err at 1M)
        timeout 7200 python tools/validate_knn_scale.py \
            || echo "knn scale FAILED" >&2
        mirror KNN_SCALE.json
        ;;
    smoke)
        timeout 10800 python tools/diffusion_fullsize_smoke.py --full \
            || echo "diffusion smoke FAILED" >&2
        mirror DIFFUSION_SMOKE.json
        ;;
    iter)
        # extended decomposition: baseline chunk + guided chunk
        # serial-vs-batched + the VGG term (random-weight architecture)
        timeout 7200 python tools/profile_guided_iter.py \
            || echo "iter profile FAILED" >&2
        mirror GUIDED_ITER_PROFILE.json
        ;;
    bench)
        timeout 3600 python bench.py || echo "bench FAILED" >&2
        mirror BENCH_DETAIL.json
        ;;
    overlap)
        # serial vs --pipeline_guidance wall-clock (round-1 ask; the 3c
        # run lost it to a tunnel wedge inside the baseline's metrics)
        if [ ! -d "$src" ]; then
            timeout 3600 python tools/make_synthetic_scene.py --out "$src" || continue
        fi
        copy_baseline
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
        # fresh 10k oracle-guided run on the BATCHED two-camera chunk —
        # the headline is in-chunk it/s vs the r3 run's 4.68
        if [ ! -d "$src" ]; then
            timeout 3600 python tools/make_synthetic_scene.py --out "$src" || continue
        fi
        copy_baseline
        if [ ! -f "$base/point_cloud/iteration_10000/point_cloud.ply" ]; then
            timeout 14400 bash scripts/run_synthetic_e2e.sh "$src" "$base" \
                || { echo "baseline FAILED" >&2; continue; }
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
            | tee WALLCLOCK_PROJECTION_r3d.txt || true
        mirror WALLCLOCK_PROJECTION_r3d.txt
        ;;
    *)
        echo "unknown stage: $stage" >&2
        ;;
    esac
done
echo "== queue done ($(date -u +%H:%M:%S)) =="
