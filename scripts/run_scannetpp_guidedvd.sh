#!/bin/bash
# Per-scene ScanNet++ guidedvd loop (role of the reference's scannetpp
# scripts); pass --hybrid to run the hybrid-trajectory variant
# (train_scannetpp_guidedvd_hybrid_traj.py equivalent).
set -e

exp_name=${1:?usage: run_scannetpp_guidedvd.sh <exp_name> <baseline_exp> [data_root] [--hybrid]}
baseline_exp=${2:?need the baseline exp name}
data_root=${3:-dataset/scannetpp}
hybrid_flag=${4:-}

extra=()
if [ "$hybrid_flag" = "--hybrid" ]; then extra+=(--hybrid_traj); fi

datasets=('8a20d62ac0' '94ee15e8ba' '7831862f02' 'a29cccc784')

for dataset in "${datasets[@]}"; do
    source="$data_root/$dataset"
    workspace="output/${exp_name}/${dataset}"
    baseline="output/${baseline_exp}/${dataset}"
    echo "Processing dataset: $source with workspace: $workspace"

    python train_guidedvd.py --dataset scannetpp --images rgb \
        --source_path "$source" --model_path "$workspace" --eval --n_views 6 \
        --baseline_path "$baseline" \
        --start_sample_pseudo 0 --sample_pseudo_interval 1 \
        --iterations 10000 --pseudo_cam_weight 0.05 \
        --guidance_ddim_steps 50 --guidance_vd_iter 260 \
        --use_trajectory_pool \
        --pseudo_cam_lpips --pseudo_cam_lpips_weight 0.1 "${extra[@]}"

    python render.py --source_path "$source" --model_path "$workspace" --iteration 10000
    python metrics.py -m "$workspace"
done

python get_avg_results.py --dataset scannetpp -m "${exp_name}"
