#!/bin/bash
# Per-scene ScanNet++ baseline loop (role of reference
# scripts/run_scannetpp_baseline.sh:1-31; the GPU-id argument is a no-op on
# a single TPU host).
set -e

exp_name=${1:?usage: run_scannetpp_baseline.sh <exp_name> [data_root]}
data_root=${2:-dataset/scannetpp}

datasets=('8a20d62ac0' '94ee15e8ba' '7831862f02' 'a29cccc784')

for dataset in "${datasets[@]}"; do
    source="$data_root/$dataset"
    workspace="output/${exp_name}/${dataset}"
    echo "Processing dataset: $source with workspace: $workspace"

    python train_baseline.py --dataset scannetpp --images dslr/undistorted_images \
        --source_path "$source" --model_path "$workspace" --eval --n_views 6 \
        --densify_grad_threshold 1e10

    python render.py --source_path "$source" --model_path "$workspace" --iteration 10000
    python metrics.py -m "$workspace"
done

python get_avg_results.py --dataset scannetpp -m "${exp_name}"
