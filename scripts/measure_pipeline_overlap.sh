#!/bin/bash
# VERDICT r1 #6: price the event path and measure the pipelined-guidance
# overlap win. Runs two SHORT oracle-guided trainings (2000 iters, ~7
# diffusion events) on the synthetic scene — identical but for
# --pipeline_guidance — and diffs their wall-clocks / event phase costs.
#
# Prereqs: /tmp/synthetic_scene + output/synthetic_e2e baseline (the
# tpu_validation_queue e2e stage creates both).
#
#   bash scripts/measure_pipeline_overlap.sh
#
# Writes PIPELINE_OVERLAP.json at the repo root.
set -eu
cd "$(dirname "$0")/.."

src=/tmp/synthetic_scene
base=output/synthetic_e2e

run() {  # $1 = model_path, extra args after
    local work=$1; shift
    rm -rf "$work"
    timeout 7200 python train_guidedvd.py --dataset colmap \
        --source_path "$src" --model_path "$work" \
        --baseline_path "$base" --eval --n_views 6 \
        --oracle_gt_npz "$src/gt_gaussians.npz" \
        --raster_backend tiles \
        --iterations 2000 --test_iterations 2000 --save_iterations 2000 \
        "$@"
}

echo "== serialized (reference-style) =="
run output/overlap_serial
echo "== pipelined (--pipeline_guidance) =="
run output/overlap_pipelined --pipeline_guidance

python - << 'EOF'
import json

out = {}
for tag, path in (("serial", "output/overlap_serial"),
                  ("pipelined", "output/overlap_pipelined")):
    with open(f"{path}/timing_summary.json") as f:
        t = json.load(f)
    out[tag] = {k: t[k] for k in
                ("total_s", "it_per_s", "chunk_s", "event_s", "other_s",
                 "events_run", "event_phase_s")
                if k in t}
if "serial" in out and "pipelined" in out:
    s, p = out["serial"]["total_s"], out["pipelined"]["total_s"]
    out["overlap_win_s"] = round(s - p, 1)
    out["overlap_win_pct"] = round(100.0 * (s - p) / s, 1)
with open("PIPELINE_OVERLAP.json", "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print(json.dumps(out, indent=1))
EOF
