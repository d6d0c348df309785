#!/bin/bash
# Round-5 chip queue: measurement stages, serialized on the one v5e.
# Default stages (override with args): e1 densify tattn guided
# Decision-dependent stages run separately after wiring: smoke bench e2e
#
#   nohup bash scripts/tpu_round5_queue.sh > /tmp/r5_queue.log 2>&1 &
#
# Each stage is independently timeout-bounded and failure-tolerant so a
# wedged tunnel can't kill the whole queue.
set -u
cd "$(dirname "$0")/.."

stages=${@:-"e1 densify tattn guided"}
echo "== round-5 queue: $stages ($(date -u +%H:%M:%S)) =="

for stage in $stages; do
    echo "== stage: $stage ($(date -u +%H:%M:%S)) =="
    case "$stage" in
    e1)
        # experiment E1: payload-free sort + packed row gather vs the
        # 9-operand binning sort, real key distribution (VERDICT r4 #3)
        timeout 7200 python tools/e1_sort_gather_study.py \
            || echo "e1 study FAILED" >&2
        ;;
    densify)
        # re-capture the clobbered DENSIFY_PROFILE.json on-chip (weak #1)
        timeout 3600 python tools/profile_densify.py \
            || echo "densify profile FAILED" >&2
        ;;
    tattn)
        # grouped block-diagonal temporal attention sweep (VERDICT r4 #4)
        timeout 3600 python tools/profile_temporal_attn.py \
            || echo "temporal attn sweep FAILED" >&2
        ;;
    guided)
        # serial_ckpt_half / batched_ckpt at the freed-encoder HBM budget
        # (VERDICT r4 #1): encoders deleted from HBM -> ~2 GB more headroom
        timeout 21600 python tools/profile_guided_step.py --free-encoders \
            --exec-limit-gb 15.3 \
            --variants serial_ckpt:1,serial_ckpt_half:1,batched_ckpt:1 \
            || echo "guided-step profile FAILED" >&2
        ;;
    smoke)
        timeout 21600 python tools/diffusion_fullsize_smoke.py --steps 50 \
            || echo "fullsize smoke FAILED" >&2
        ;;
    bench)
        timeout 3600 python bench.py || echo "bench FAILED" >&2
        ;;
    knnscale)
        timeout 7200 python tools/validate_knn_scale.py \
            || echo "knn scale FAILED" >&2
        ;;
    e2e)
        # clean unwedged full 10k oracle-guided run (VERDICT r4 #6): the r4
        # headline pace rests on a resumed 8000-iter segment; this stage
        # re-runs from scratch with the r3d watchdog (auto-resume on stall)
        src=/tmp/synthetic_scene
        base=output/synthetic_e2e
        work=output/synthetic_oracle_e2e_r5
        if [ ! -f "$src/gt_gaussians.npz" ]; then
            timeout 1800 python tools/make_synthetic_scene.py --out "$src" \
                || { echo "scene build FAILED" >&2; continue; }
        fi
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
            timeout 10800 python train_guidedvd.py --dataset colmap \
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
            for tick in $(seq 1 170); do
                sleep 60
                if ! kill -0 "$tpid" 2>/dev/null; then
                    wait "$tpid"; rc=$?; break
                fi
                fresh=$(find "$work" -name metrics.jsonl -mmin -20 2>/dev/null)
                if [ "$tick" -ge 25 ] && [ -z "$fresh" ]; then
                    echo "no metrics progress after ${tick} min — stall, killing" >&2
                    kill "$tpid"; wait "$tpid" 2>/dev/null; rc=99; break
                fi
            done
            if [ "$rc" = 0 ]; then ok=1; break; fi
            echo "e2e attempt $attempt FAILED rc=$rc" >&2
        done
        [ "$ok" = 1 ] || continue
        timeout 3600 python render.py --source_path "$src" --model_path "$work" \
            --iteration 10000 || continue
        timeout 1800 python metrics.py -m "$work" || continue
        cat "$work/results.json"
        timeout 600 python tools/project_wallclock.py "$work" \
            --smoke DIFFUSION_SMOKE.json | tee WALLCLOCK_PROJECTION_r5.txt || true
        timeout 600 python tools/project_wallclock.py "$work" \
            --smoke DIFFUSION_SMOKE.json --tp2 --pipeline \
            | tee WALLCLOCK_PROJECTION_r5_tp2.txt || true
        ;;
    *)
        echo "unknown stage: $stage" >&2
        ;;
    esac
done
echo "== queue done ($(date -u +%H:%M:%S)) =="
