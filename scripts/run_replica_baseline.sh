#!/bin/bash
# Per-scene Replica baseline loop (role of reference
# scripts/run_replica_baseline.sh:1-30; the GPU-id argument becomes a no-op
# on a single TPU host).
set -e

exp_name=${1:?usage: run_replica_baseline.sh <exp_name> [data_root]}
data_root=${2:-dataset/Replica}

datasets=('office_2/Sequence_2' 'office_3/Sequence_1' 'office_4/Sequence_2' 'room_0/Sequence_2' 'room_1/Sequence_1' 'room_2/Sequence_1')

for dataset in "${datasets[@]}"; do
    source="$data_root/$dataset"
    workspace="output/${exp_name}/${dataset}"
    echo "Processing dataset: $source with workspace: $workspace"

    python train_baseline.py --dataset replica --images rgb \
        --source_path "$source" --model_path "$workspace" --eval --n_views 6 \
        --densify_grad_threshold 1e10 --position_lr_init 0. --position_lr_final 0.

    python render.py --source_path "$source" --model_path "$workspace" --iteration 10000
    python metrics.py -m "$workspace"
done

python get_avg_results.py --dataset replica -m "${exp_name}"
