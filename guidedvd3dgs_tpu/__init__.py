"""TPU-native sparse-view guided 3D Gaussian Splatting framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
zhongyingji/guidedvd-3dgs (CVPR 2025): two-stage sparse-input 3DGS training
(baseline + video-diffusion-guided) for indoor scenes, with a Pallas tile
rasterizer replacing the reference CUDA extension
(`submodules/diff-gaussian-rasterization-confidence`), a JAX KNN replacing
`simple-knn`, and a JAX port of the ViewCrafter latent video-diffusion stack
with scene-grounding guided DDIM sampling.

Layout (maps onto SURVEY.md section 7.1):
  utils/      L0 math + IO (graphics, SH, losses, schedules, poses)
  ops/        L1 compute kernels (Pallas rasterizer + dense oracle, KNN,
              point splatting)
  models/     L3 Gaussian model state (fixed-capacity pytree, masked Adam,
              densify/clone/split/prune)
  scene/      L3 scene & data loading (COLMAP, PLY, cameras, splits)
  diffusion/  L4b ViewCrafter stack (VAE, UNet3D, CLIP cond, DDIM samplers)
  guidance/   L4a guidance subsystem (trajectory pool, LossGuidance, masks)
  parallel/   device-mesh placement (splat chips vs diffusion chips over ICI)
  train/      L6 training loops (baseline, guided)
"""

__version__ = "0.1.0"
