"""Baseline trainer with DUSt3R-projection cameras (L6 variant).

Role of reference train_replica_baseline_with_project_cam.py:35-239: when the
viewpoint stack empties, with probability (1 - project_cam_prob) the next
epoch samples PROJECTION cameras (every-6th full-trajectory view whose
"image" is the DUSt3R point cloud projected to that view + validity mask,
produced offline by tools/get_replica_dust3r_project_2d.py) and supervises
with masked L1 at weight project_cam_weight; otherwise the normal train-view
epoch runs (reference :56, :71-89).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.models.render import render_gaussians
from guidedvd3dgs_tpu.ops.projection import RasterCamera
from guidedvd3dgs_tpu.train.baseline import (
    BaselineTrainer,
    densify_cfg,
    densify_and_prune_jit,
    lrs_for,
    reset_opacity_jit,
)
from guidedvd3dgs_tpu.utils.losses import l1_loss_mask, psnr


@partial(
    jax.jit,
    static_argnames=("sh_degree", "use_confidence", "backend", "apply_adam", "update_stats"),
    donate_argnames=("state",),
)
def project_cam_step(
    state: G.GaussianState,
    cam: RasterCamera,
    projected_image: jnp.ndarray,  # (3, H, W)
    mask: jnp.ndarray,  # (1, H, W) or (H, W)
    weight: jnp.ndarray,
    bg: jnp.ndarray,
    lrs: G.LearningRates,
    sh_degree: int,
    use_confidence: bool = False,
    backend: str = "auto",
    apply_adam: bool = True,
    update_stats: bool = True,
):
    """loss = project_cam_weight * masked-L1 (reference :82-88)."""
    offset0 = jnp.zeros((state.capacity, 2), jnp.float32)

    def loss_fn(params, offset):
        r = render_gaussians(
            params, state.active, state.confidence, cam, bg, sh_degree,
            means2d_offset=offset, use_confidence=use_confidence, backend=backend,
        )
        ll1 = l1_loss_mask(r.color, projected_image, mask)
        return weight * ll1, (r, ll1)

    (loss, (r, ll1)), (gparams, goffset) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, offset0)

    if update_stats:
        state = G.update_max_radii(state, r.radii, r.visibility_filter)
        state = G.add_densification_stats(state, goffset, r.visibility_filter)
    if apply_adam:
        state = G.adam_step(state, gparams, lrs)
    return state, {"loss": loss, "l1": ll1, "psnr": psnr(r.color, projected_image)[0, 0]}


class ProjectCamTrainer(BaselineTrainer):
    """reference train_replica_baseline_with_project_cam.py semantics."""

    def __init__(self, scene, state, opt, pipe, model_params, background=None):
        super().__init__(scene, state, opt, pipe, model_params, background)
        self.use_project_cam = False
        self.np_rng = np.random.default_rng(getattr(opt, "seed", 1))

    def pick_camera(self):
        if not self.viewpoint_stack:
            # epoch-level coin flip (reference :72-74)
            self.use_project_cam = (
                self.np_rng.random() > self.opt.project_cam_prob
                and len(self.scene.getProjectCameras()) > 0
            )
            src = (
                self.scene.getProjectCameras()
                if self.use_project_cam
                else self.scene.getTrainCameras()
            )
            self.viewpoint_stack = list(src)
        return self.viewpoint_stack.pop(self.rng.randint(0, len(self.viewpoint_stack) - 1))

    def step(self, iteration: int):
        opt = self.opt
        if iteration % 500 == 0 and self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

        cam = self.pick_camera()
        rc = cam.raster_camera()

        do_densify = (
            iteration < opt.densify_until_iter
            and iteration > opt.densify_from_iter
            and iteration % opt.densification_interval == 0
        )
        apply_adam = (iteration < opt.iterations) and not do_densify
        update_stats = iteration < opt.densify_until_iter

        if self.use_project_cam and cam.projected_image is not None:
            self.state, metrics = project_cam_step(
                self.state, rc,
                jnp.asarray(cam.projected_image),
                jnp.asarray(cam.projected_mask),
                jnp.float32(opt.project_cam_weight),
                self.bg, lrs_for(opt, self.xyz_lr),
                sh_degree=self.active_sh_degree,
                use_confidence=getattr(self.pipe, "use_confidence", False),
                backend=self.backend,
                apply_adam=apply_adam, update_stats=update_stats,
            )
        else:
            from guidedvd3dgs_tpu.train.baseline import train_step

            self.state, metrics = train_step(
                self.state, rc, jnp.asarray(cam.image), self.bg,
                lrs_for(opt, self.xyz_lr),
                jnp.float32(self.active_sh_degree),
                sh_degree=self.max_sh_degree,
                lambda_dssim=opt.lambda_dssim,
                use_confidence=getattr(self.pipe, "use_confidence", False),
                backend=self.backend,
                apply_adam=apply_adam, update_stats=update_stats,
            )

        if do_densify:
            cfg = densify_cfg(opt, self.scene.cameras_extent, iteration)
            self.state = densify_and_prune_jit(self.state, jax.random.key(iteration), cfg)
            self.maybe_grow()

        self.xyz_lr = self.xyz_sched(iteration)
        if iteration % opt.opacity_reset_interval == 0:
            self.state = reset_opacity_jit(self.state)

        loss = float(metrics["loss"])
        self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
        from guidedvd3dgs_tpu.train.baseline import StepStats

        return StepStats(
            loss=loss, l1=float(metrics["l1"]), psnr=float(metrics["psnr"]),
            num_active=int(self.state.num_active()),
        )
