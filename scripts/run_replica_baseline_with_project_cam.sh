#!/bin/bash
# Per-scene Replica project-cam baseline loop (role of reference
# scripts/run_replica_baseline_with_project_cam.sh:1-33): DUSt3R-projection
# supervision at project_cam_prob/weight, frozen xyz (lr 0) like the plain
# baseline runs.
set -e

exp_name=${1:?usage: run_replica_baseline_with_project_cam.sh <exp_name> [data_root]}
data_root=${2:-dataset/Replica}

datasets=('office_2/Sequence_2' 'office_3/Sequence_1' 'office_4/Sequence_2' 'room_0/Sequence_2' 'room_1/Sequence_1' 'room_2/Sequence_1')

for dataset in "${datasets[@]}"; do
    source="$data_root/$dataset"
    workspace="output/${exp_name}/${dataset}"
    echo "Processing dataset: $source with workspace: $workspace"

    python train_project_cam.py --dataset replica --images rgb \
        --source_path "$source" --model_path "$workspace" --eval --n_views 6 \
        --sample_pseudo_interval 1 --densify_grad_threshold 1e10 \
        --project_cam_prob 0.8 --project_cam_weight 0.05

    python render.py --source_path "$source" --model_path "$workspace" --iteration 10000
    python metrics.py -m "$workspace"
done

python get_avg_results.py --dataset replica -m "${exp_name}"
