#!/bin/bash
# Round-3 second chip session: artifacts that need the round-3 kernels
# (fused preprocess wired in, guided-step double remat, banded-matmul SSIM).
# Run from a FRESH clone of the dev tree; mirrors artifacts like
# tpu_round3_queue.sh:
#
#   git clone /root/repo /tmp/proofrun2 && cd /tmp/proofrun2
#   ARTIFACT_DEST=/root/repo bash scripts/tpu_round3b_queue.sh [stage...]
#
# Stages (default order): smoke bench stages sweep iter parity
set -u
cd "$(dirname "$0")/.."
DEST=${ARTIFACT_DEST:-$(pwd)}

stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(smoke bench stages sweep iter parity)

probe() {
    timeout 300 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null
}

mirror() {
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

for stage in "${stages[@]}"; do
    echo "== stage: $stage ($(date -u +%H:%M:%S)) =="
    case "$stage" in
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
    *)
        echo "unknown stage: $stage" >&2
        ;;
    esac
done
echo "== queue done ($(date -u +%H:%M:%S)) =="
