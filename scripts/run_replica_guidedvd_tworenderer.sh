#!/bin/bash
# Per-scene Replica guidedvd TWO-RENDERER loop (role of reference
# scripts/run_replica_guidedvd_tworenderer.sh:1-40 +
# train_replica_guidedvd_tworenderer.py:64-72): guidance rgb/depth from the
# PROJECT-CAM baseline, guidance mask from the PLAIN baseline. Train both
# first (run_replica_baseline.sh + run_replica_baseline_with_project_cam.sh).
set -e

exp_name=${1:?usage: run_replica_guidedvd_tworenderer.sh <exp_name> <projectcam_exp> <baseline_exp> [data_root] [vc_ckpt]}
projectcam_exp=${2:?need the project-cam baseline exp name}
baseline_exp=${3:?need the plain baseline exp name}
data_root=${4:-dataset/Replica}
vc_ckpt=${5:-}

extra=()
if [ -n "$vc_ckpt" ]; then extra+=(--viewcrafter_ckpt "$vc_ckpt"); fi

datasets=('office_2/Sequence_2' 'office_3/Sequence_1' 'office_4/Sequence_2' 'room_0/Sequence_2' 'room_1/Sequence_1' 'room_2/Sequence_1')

for dataset in "${datasets[@]}"; do
    source="$data_root/$dataset"
    workspace="output/${exp_name}/${dataset}"
    echo "Processing dataset: $source with workspace: $workspace"

    python train_guidedvd.py --dataset replica --images rgb \
        --source_path "$source" --model_path "$workspace" --eval --n_views 6 \
        --baseline_path "output/${projectcam_exp}/${dataset}" \
        --mask_baseline_path "output/${baseline_exp}/${dataset}" \
        --start_sample_pseudo 0 --sample_pseudo_interval 1 \
        --iterations 10000 --pseudo_cam_weight 0.05 \
        --guidance_ddim_steps 50 --guidance_vd_iter 260 \
        --use_trajectory_pool \
        --pseudo_cam_lpips --pseudo_cam_lpips_weight 0.1 \
        --guidance_save_videos "${extra[@]}"

    python render.py --source_path "$source" --model_path "$workspace" --iteration 10000
    python metrics.py -m "$workspace"
done

python get_avg_results.py --dataset replica -m "${exp_name}"
