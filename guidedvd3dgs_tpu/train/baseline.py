"""Baseline 3DGS training loop (L6).

Role of reference train_baseline.py:35-126 with the same schedule semantics:
  * SH degree +1 every 500 iterations (up to max)
  * random camera epochs without replacement
  * loss = (1-lambda)*L1 + lambda*(1-SSIM)
  * densify stats every iter while iter < densify_until; densify+prune every
    densification_interval after densify_from (size_threshold disabled)
  * Adam step skipped on densify iterations (the reference's optimizer sees
    freshly-rebuilt tensors with no grads there)
  * xyz LR scheduled AFTER the step with the current iteration index
  * opacity reset every opacity_reset_interval

TPU design: one jitted, donated train step (render + loss + grads + masked
Adam); densify/prune/reset are separate jitted ops invoked on schedule from
the host loop (SURVEY.md section 7.1.4).
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.models.render import render_gaussians
from guidedvd3dgs_tpu.ops.projection import RasterCamera
from guidedvd3dgs_tpu.utils.general import get_expon_lr_func
from guidedvd3dgs_tpu.utils.losses import l1_loss, psnr, ssim


@dataclass
class StepStats:
    loss: float
    l1: float
    psnr: float
    num_active: int


@partial(
    jax.jit,
    static_argnames=(
        "sh_degree",
        "use_confidence",
        "backend",
        "lambda_dssim",
        "apply_adam",
        "update_stats",
        "max_instances",
    ),
    donate_argnames=("state",),
)
def train_step(
    state: G.GaussianState,
    cam: RasterCamera,
    gt_image: jnp.ndarray,
    bg: jnp.ndarray,
    lrs: G.LearningRates,
    active_degree: jnp.ndarray,  # traced f32: SH warmup without recompiles
    sh_degree: int,
    lambda_dssim: float,
    use_confidence: bool = False,
    backend: str = "auto",
    apply_adam: bool = True,
    update_stats: bool = True,
    max_instances: int = 0,
):
    """One baseline optimization step. Returns (state, metrics)."""
    offset0 = jnp.zeros((state.capacity, 2), jnp.float32)

    def loss_fn(params, offset):
        r = render_gaussians(
            params,
            state.active,
            state.confidence,
            cam,
            bg,
            sh_degree,
            means2d_offset=offset,
            use_confidence=use_confidence,
            backend=backend,
            max_instances=max_instances,
            active_degree=active_degree,
        )
        ll1 = l1_loss(r.color, gt_image)
        loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(r.color, gt_image))
        return loss, (r, ll1)

    (loss, (r, ll1)), (gparams, goffset) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, offset0)

    if update_stats:
        state = G.update_max_radii(state, r.radii, r.visibility_filter)
        state = G.add_densification_stats(state, goffset, r.visibility_filter)
    if apply_adam:
        state = G.adam_step(state, gparams, lrs)

    metrics = {
        "loss": loss,
        "l1": ll1,
        "psnr": psnr(r.color, gt_image)[0, 0],
        # tile-instance capacity pressure: dropped instances this render
        # (the reference never drops — trainers regrow on overflow)
        "overflow": r.overflow if r.overflow is not None else jnp.int32(0),
        "num_instances": r.num_instances if r.num_instances is not None else jnp.int32(0),
    }
    return state, metrics


@partial(
    jax.jit,
    static_argnames=(
        "sh_degree", "use_confidence", "backend", "lambda_dssim", "max_instances",
    ),
    donate_argnames=("state",),
)
def train_steps_chunk(
    state: G.GaussianState,
    rcs: RasterCamera,  # stacked train cameras, leaves (V, ...)
    gts: jnp.ndarray,  # (V, 3, H, W)
    cam_idx: jnp.ndarray,  # (K,) int32 per-step camera index
    xyz_lrs: jnp.ndarray,  # (K,) per-step scheduled xyz LR
    apply_adam: jnp.ndarray,  # (K,) bool
    update_stats: jnp.ndarray,  # (K,) bool
    degrees: jnp.ndarray,  # (K,) f32 per-step active SH degree
    bg: jnp.ndarray,
    lrs: G.LearningRates,  # xyz overridden per step
    sh_degree: int,
    lambda_dssim: float,
    use_confidence: bool = False,
    backend: str = "auto",
    max_instances: int = 0,
):
    """K baseline steps in ONE device dispatch (lax.scan over the step body).

    Identical per-step semantics to `train_step`; the host loop calls this
    between schedule events (densify/reset/eval all land on chunk
    boundaries). Exists because per-step host dispatch dominates wall-clock
    on remotely-attached TPUs (~0.5 s/step latency vs ~15 ms compute)."""

    def body(state, per):
        idx, lr_xyz, do_adam, do_stats, adeg = per
        cam = jax.tree.map(lambda a: a[idx], rcs)
        gt = gts[idx]
        offset0 = jnp.zeros((state.capacity, 2), jnp.float32)

        def loss_fn(params, offset):
            r = render_gaussians(
                params, state.active, state.confidence, cam, bg, sh_degree,
                means2d_offset=offset, use_confidence=use_confidence,
                backend=backend, max_instances=max_instances,
                active_degree=adeg,
            )
            ll1 = l1_loss(r.color, gt)
            loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(r.color, gt))
            return loss, (r, ll1)

        (loss, (r, ll1)), (gparams, goffset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, offset0)

        def with_stats(s):
            s = G.update_max_radii(s, r.radii, r.visibility_filter)
            return G.add_densification_stats(s, goffset, r.visibility_filter)

        state = jax.lax.cond(do_stats, with_stats, lambda s: s, state)
        state = jax.lax.cond(
            do_adam,
            lambda s: G.adam_step(s, gparams, lrs._replace(xyz=lr_xyz)),
            lambda s: s,
            state,
        )
        metrics = (
            loss, ll1, psnr(r.color, gt)[0, 0],
            r.overflow if r.overflow is not None else jnp.int32(0),
            r.num_instances if r.num_instances is not None else jnp.int32(0),
        )
        return state, metrics

    state, (losses, l1s, psnrs, ovfs, dems) = jax.lax.scan(
        body, state, (cam_idx, xyz_lrs, apply_adam, update_stats, degrees)
    )
    metrics = {
        "loss": losses[-1], "l1": l1s[-1], "psnr": psnrs[-1],
        "loss_mean": losses.mean(),
        "overflow": ovfs.max(), "num_instances": dems.max(),
    }
    return state, metrics


@partial(jax.jit, static_argnames=("sh_degree", "backend"))
def eval_render(
    state: G.GaussianState,
    cam: RasterCamera,
    bg: jnp.ndarray,
    sh_degree: int,
    backend: str = "auto",
):
    return render_gaussians(
        state.params, state.active, state.confidence, cam, bg, sh_degree, backend=backend
    )


def make_lr_schedule(opt, spatial_lr_scale: float):
    return get_expon_lr_func(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )


def lrs_for(opt, xyz_lr: float) -> G.LearningRates:
    return G.LearningRates(
        xyz=jnp.float32(xyz_lr),
        f_dc=jnp.float32(opt.feature_lr),
        f_rest=jnp.float32(opt.feature_lr / 20.0),
        opacity=jnp.float32(opt.opacity_lr),
        scaling=jnp.float32(opt.scaling_lr),
        rotation=jnp.float32(opt.rotation_lr),
    )


def densify_cfg(opt, extent: float, iteration: int, max_screen_size: float = 0.0):
    return G.DensifyConfig(
        grad_threshold=opt.densify_grad_threshold,
        min_opacity=opt.prune_threshold,
        extent=float(extent),
        max_screen_size=float(max_screen_size or 0.0),
        percent_dense=opt.percent_dense,
        dist_thres=opt.dist_thres,
        prune_enabled=iteration > opt.prune_from_iter,
        proximity_enabled=iteration < 2000,
    )


def _round_chunk(x: int, chunk: int = 128) -> int:
    return max(-(-x // chunk) * chunk, 1 << 14)


densify_and_prune_jit = jax.jit(G.densify_and_prune, static_argnames=("cfg",))
reset_opacity_jit = jax.jit(G.reset_opacity, donate_argnums=0)


class BaselineTrainer:
    """Host-side schedule around the jitted step (reference training()
    semantics, train_baseline.py:35-126)."""

    def __init__(self, scene, state, opt, pipe, model_params, background=None):
        self.scene = scene
        self.state = state
        self.opt = opt
        self.pipe = pipe
        self.model_params = model_params
        self.max_sh_degree = model_params.sh_degree
        self.active_sh_degree = 0
        bg = [1.0, 1.0, 1.0] if model_params.white_background else [0.0, 0.0, 0.0]
        self.bg = jnp.asarray(background if background is not None else bg, jnp.float32)
        self.xyz_sched = make_lr_schedule(opt, scene.cameras_extent)
        self.xyz_lr = self.xyz_sched(0)
        self.viewpoint_stack = []
        self.rng = random.Random(getattr(opt, "seed", 1))
        self.backend = getattr(pipe, "raster_backend", "auto")
        self.ema_loss = 0.0
        # tile-instance buffer size (static per compile): starts at the
        # 4x-capacity default, then tracks the measured per-render instance
        # demand with 1.5x headroom — grown on overflow, shrunk when demand
        # falls well below (each change recompiles the jitted step, like a
        # densify capacity regrow)
        self.max_instances = 0  # 0 => rasterizer default (4x capacity)
        self._demand_peak = 0
        self.logger = None  # set via attach_logger

    def pick_camera(self):
        if not self.viewpoint_stack:
            self.viewpoint_stack = list(self.scene.getTrainCameras())
        return self.viewpoint_stack.pop(self.rng.randint(0, len(self.viewpoint_stack) - 1))

    def write_checkpoint(self, path: str, iteration: int) -> None:
        """Checkpoint hook — GuidedTrainer overrides with the guided
        (pool/RNG-carrying) variant so both train paths stay resumable."""
        from guidedvd3dgs_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(path, self.state, iteration)
        print(f"[ITER {iteration}] saved checkpoint {path}")

    def maybe_grow(self):
        n = int(self.state.num_active())
        cap = self.state.capacity
        if n > 0.9 * cap:
            self.state = G.grow_capacity(self.state, cap * 2)

    def attach_logger(self, logger):
        self.logger = logger

    def check_overflow(self, metrics, iteration: int):
        """Track per-render instance demand and keep the tile-instance
        buffer sized demand*1.5 (the CUDA reference sizes its buffer exactly
        and never drops, rasterizer_impl.cu:278-309). Growing on overflow /
        shrinking on sustained low demand each trigger one recompile of the
        jitted step — rare, like a densify regrow."""
        ovf = int(metrics.get("overflow", 0))
        demand = int(metrics.get("num_instances", 0))
        self._demand_peak = max(self._demand_peak, demand + ovf)
        cur = self.max_instances or 4 * self.state.capacity
        if ovf > 0:
            self.max_instances = _round_chunk(int(self._demand_peak * 1.5), 4096)
            print(
                f"[iter {iteration}] tile-instance overflow ({ovf} dropped): "
                f"instance buffer regrown to {self.max_instances}"
            )
        elif iteration % 500 == 0 and self._demand_peak > 0:
            # Resize ONLY when the peak eats into the 1.5x headroom (>90% of
            # capacity, overflow imminent) or demand collapsed (<60%·cap/1.5
            # ≈ shrink-worthy): every max_instances change recompiles every
            # scan-chunk variant of the jitted step (~4 min each through the
            # remote-TPU tunnel), so steady densify growth must NOT creep the
            # capacity each window. Coarse 4096 rounding keeps the shape set
            # small for the persistent compile cache.
            target = _round_chunk(int(self._demand_peak * 1.5), 4096)
            if target < cur * 0.6 or self._demand_peak > 0.9 * cur:
                self.max_instances = target
            self._demand_peak = demand

    def step(self, iteration: int) -> StepStats:
        opt = self.opt
        if iteration % 500 == 0 and self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

        cam = self.pick_camera()
        rc = cam.raster_camera()
        gt = jnp.asarray(cam.image)

        do_densify = (
            iteration < opt.densify_until_iter
            and iteration > opt.densify_from_iter
            and iteration % opt.densification_interval == 0
        )
        apply_adam = (iteration < opt.iterations) and not do_densify
        update_stats = iteration < opt.densify_until_iter

        self.state, metrics = train_step(
            self.state,
            rc,
            gt,
            self.bg,
            lrs_for(opt, self.xyz_lr),
            jnp.float32(self.active_sh_degree),
            sh_degree=self.max_sh_degree,
            lambda_dssim=opt.lambda_dssim,
            use_confidence=getattr(self.pipe, "use_confidence", False),
            backend=self.backend,
            apply_adam=apply_adam,
            update_stats=update_stats,
            max_instances=self.max_instances,
        )
        self.check_overflow(metrics, iteration)

        if do_densify:
            cfg = densify_cfg(opt, self.scene.cameras_extent, iteration)
            self.state = densify_and_prune_jit(
                self.state, jax.random.key(iteration), cfg
            )
            self.maybe_grow()

        self.xyz_lr = self.xyz_sched(iteration)

        if iteration % opt.opacity_reset_interval == 0:
            self.state = reset_opacity_jit(self.state)

        loss = float(metrics["loss"])
        self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
        return StepStats(
            loss=loss,
            l1=float(metrics["l1"]),
            psnr=float(metrics["psnr"]),
            num_active=int(self.state.num_active()),
        )

    def evaluate(self, cameras, max_cams: Optional[int] = None):
        """PSNR over a camera list (role of reference training_report,
        train_baseline.py:153-197)."""
        psnrs, l1s = [], []
        for cam in cameras[: max_cams or len(cameras)]:
            r = eval_render(
                self.state, cam.raster_camera(), self.bg, self.active_sh_degree,
                backend=self.backend,
            )
            img = jnp.clip(r.color, 0.0, 1.0)
            gt = jnp.asarray(cam.image)
            psnrs.append(float(psnr(img, gt)[0, 0]))
            l1s.append(float(l1_loss(img, gt)))
        return {"psnr": float(np.mean(psnrs)), "l1": float(np.mean(l1s))} if psnrs else {}

    def _stacked_train_cams(self):
        if getattr(self, "_stacked", None) is None:
            from guidedvd3dgs_tpu.parallel.data_parallel import stack_cameras

            cams = list(self.scene.getTrainCameras())
            rcs = stack_cameras([c.raster_camera() for c in cams])
            gts = jnp.stack([jnp.asarray(c.image) for c in cams])
            self._stacked = (rcs, gts, len(cams))
        return self._stacked

    def _next_cam_idx(self) -> int:
        if not getattr(self, "_idx_stack", None):
            self._idx_stack = list(range(self._stacked[2]))
        return self._idx_stack.pop(self.rng.randint(0, len(self._idx_stack) - 1))

    def train_scan(
        self,
        iterations=None,
        log_every=100,
        test_iterations=(),
        saving_iterations=(),
        checkpoint_iterations=(),
        checkpoint_dir=None,
        start_iteration=0,
        nan_debug=False,
    ):
        """Chunked trainer: identical schedule semantics to `train` but runs
        up to densification_interval steps per device dispatch via
        `train_steps_chunk` — per-step host dispatch costs ~0.5 s through a
        remotely-attached TPU, making the classic loop latency-bound.

        nan_debug: snapshot the state before every chunk and halt on the
        first non-finite parameter, dumping a replayable bundle (pre-chunk
        state + the chunk's full schedule) next to the checkpoints — the
        role of the reference's --detect_anomaly + debug snapshot dumps
        (reference train_baseline.py:208, diff_gaussian_rasterization/
        __init__.py:83-90)."""
        opt = self.opt
        iterations = iterations or opt.iterations
        rcs, gts, n_cams = self._stacked_train_cams()
        t0 = time.time()

        # chunk boundaries: all host-side events land here. "after step it"
        # events are multiples of densification_interval / reset / eval /
        # save; the SH-degree bump happens BEFORE step k*500, so k*500-1 is
        # also a stop while the degree is still climbing.
        stops = set()
        stops.update(range(0, iterations + 1, opt.densification_interval))
        stops.update(range(0, iterations + 1, opt.opacity_reset_interval))
        stops.update(int(x) for x in test_iterations)
        stops.update(int(x) for x in saving_iterations)
        stops.update(int(x) for x in checkpoint_iterations)
        stops.add(iterations)
        bounds = sorted(x for x in stops if start_iteration < x <= iterations)

        it0 = start_iteration
        for it1 in bounds:
            k = it1 - it0
            its = np.arange(it0 + 1, it1 + 1)
            # SH degree +1 before every 500th step (reference
            # train_baseline.py:65-67) — a traced per-step value, so the
            # warmup does not recompile the chunk
            degrees = np.minimum(its // 500, self.max_sh_degree).astype(np.float32)
            self.active_sh_degree = int(degrees[-1])
            cam_idx = np.asarray([self._next_cam_idx() for _ in range(k)], np.int32)
            xyz_lrs = np.asarray([self.xyz_sched(i - 1) for i in its], np.float32)
            do_densify = (
                (its < opt.densify_until_iter)
                & (its > opt.densify_from_iter)
                & (its % opt.densification_interval == 0)
            )
            apply_adam = (its < iterations) & ~do_densify
            update_stats = its < opt.densify_until_iter

            if nan_debug:
                prev_state = jax.device_get(self.state)

            self.state, metrics = train_steps_chunk(
                self.state, rcs, gts,
                jnp.asarray(cam_idx), jnp.asarray(xyz_lrs),
                jnp.asarray(apply_adam), jnp.asarray(update_stats),
                jnp.asarray(degrees),
                self.bg, lrs_for(opt, 0.0),
                sh_degree=self.max_sh_degree,
                lambda_dssim=opt.lambda_dssim,
                use_confidence=getattr(self.pipe, "use_confidence", False),
                backend=self.backend,
                max_instances=self.max_instances,
            )
            self.check_overflow(metrics, it1)
            self.xyz_lr = self.xyz_sched(it1)
            self.ema_loss = float(metrics["loss_mean"])

            if (
                it1 < opt.densify_until_iter
                and it1 > opt.densify_from_iter
                and it1 % opt.densification_interval == 0
            ):
                cfg = densify_cfg(opt, self.scene.cameras_extent, it1)
                self.state = densify_and_prune_jit(self.state, jax.random.key(it1), cfg)
                self.maybe_grow()
            if it1 % opt.opacity_reset_interval == 0:
                self.state = reset_opacity_jit(self.state)

            if nan_debug:
                p = self.state.params
                ok = bool(
                    jnp.isfinite(p.xyz).all()
                    & jnp.isfinite(p.opacity).all()
                    & jnp.isfinite(p.scaling).all()
                )
                if not ok:
                    import pickle

                    bundle = {
                        "state": prev_state,
                        "it0": it0, "it1": it1,
                        "cam_idx": cam_idx, "xyz_lrs": xyz_lrs,
                        "apply_adam": np.asarray(apply_adam),
                        "update_stats": np.asarray(update_stats),
                        "degrees": degrees,
                        "max_instances": self.max_instances,
                    }
                    dump = f"{checkpoint_dir or '.'}/nan_chunk_{it0}_{it1}.pkl"
                    with open(dump, "wb") as f:
                        pickle.dump(bundle, f)
                    raise RuntimeError(
                        f"non-finite params after chunk {it0}->{it1}; "
                        f"pre-chunk state + schedule dumped to {dump}"
                    )

            if log_every and it1 % log_every == 0:
                rate = (it1 - start_iteration) / (time.time() - t0)
                print(
                    f"[{it1}/{iterations}] loss={float(metrics['loss']):.5f} "
                    f"psnr={float(metrics['psnr']):.2f} "
                    f"n={int(self.state.num_active())} {rate:.1f} it/s",
                    flush=True,
                )
                if self.logger is not None:
                    self.logger.scalars(
                        it1,
                        {
                            "loss": float(metrics["loss"]), "l1": float(metrics["l1"]),
                            "psnr": float(metrics["psnr"]),
                            "total_points": int(self.state.num_active()),
                            "it_per_s": rate,
                        },
                        prefix="train/",
                    )
            if it1 in test_iterations:
                m = self.evaluate(self.scene.getTestCameras())
                if m:
                    print(f"[ITER {it1}] test psnr {m['psnr']:.3f} l1 {m['l1']:.4f}")
                    if self.logger is not None:
                        self.logger.scalars(it1, m, prefix="test/")
            if it1 in saving_iterations:
                self.scene.save(it1, self.state)
            if it1 in checkpoint_iterations and checkpoint_dir:
                self.write_checkpoint(f"{checkpoint_dir}/chkpnt{it1}.ckpt", it1)
            it0 = it1
        return self.state

    def train(
        self,
        iterations=None,
        log_every=100,
        test_iterations=(),
        saving_iterations=(),
        checkpoint_iterations=(),
        checkpoint_dir=None,
        start_iteration=0,
        profile_dir=None,
        profile_window=(50, 60),
    ):
        """Host schedule (reference train_baseline.py:58-126): jitted steps,
        eval reports at test_iterations (:153-197), ply saves, periodic full
        checkpoints (:101-104), optional jax.profiler trace window."""
        iterations = iterations or self.opt.iterations
        t0 = time.time()
        done0 = start_iteration
        for it in range(start_iteration + 1, iterations + 1):
            if profile_dir and it - start_iteration == profile_window[0]:
                import jax.profiler

                jax.profiler.start_trace(profile_dir)
            stats = self.step(it)
            if profile_dir and it - start_iteration == profile_window[1]:
                import jax.profiler

                jax.profiler.stop_trace()
            if log_every and it % log_every == 0:
                rate = (it - done0) / (time.time() - t0)
                print(
                    f"[{it}/{iterations}] loss={self.ema_loss:.5f} psnr={stats.psnr:.2f} "
                    f"n={stats.num_active} {rate:.1f} it/s"
                )
                if self.logger is not None:
                    self.logger.scalars(
                        it,
                        {
                            "loss": stats.loss, "l1": stats.l1, "psnr": stats.psnr,
                            "total_points": stats.num_active, "it_per_s": rate,
                        },
                        prefix="train/",
                    )
            if it in test_iterations:
                m = self.evaluate(self.scene.getTestCameras())
                if m:
                    print(f"[ITER {it}] test psnr {m['psnr']:.3f} l1 {m['l1']:.4f}")
                    if self.logger is not None:
                        self.logger.scalars(it, m, prefix="test/")
                mt = self.evaluate(self.scene.getTrainCameras())
                if mt and self.logger is not None:
                    self.logger.scalars(it, mt, prefix="train_eval/")
                if self.logger is not None:
                    op = G.get_opacity(self.state.params)
                    act = np.asarray(self.state.active)
                    self.logger.histogram(it, "opacity", np.asarray(op)[act])
            if it in saving_iterations:
                self.scene.save(it, self.state)
            if it in checkpoint_iterations and checkpoint_dir:
                self.write_checkpoint(f"{checkpoint_dir}/chkpnt{it}.ckpt", it)
        return self.state
