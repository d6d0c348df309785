"""Guided 3DGS training loop (L6) — train_guidedvd equivalent.

Role of reference train_guidedvd.py:48-636 with the same semantics:
  * frozen-baseline renderer supplies guidance rgb/alpha/depth
    (EasyRenderer, reference utils/easy_renderer.py:15-78)
  * trajectory-pool initialization (Eq. 7): per train view x 3 center
    scales, render a (phi, theta) candidate grid with the frozen model,
    erode the alpha<0.7 mask, keep top-k candidates whose unobserved area is
    below 0.1*H*W, interpolate each into a 25-pose trajectory
    (reference train_guidedvd.py:121-298)
  * per-iteration: train-view loss + pseudo-camera loss (L1 [+SSIM]
    [+ w*VGG]) at weight pseudo_cam_weight, 50/50 drawn from the current vs
    all-time stack (reference :343-381); combined densify stats (:403-416)
  * every guidance_vd_iter iterations: a diffusion event — splat the scene
    point cloud along a pooled trajectory, render the frozen 3DGS along it,
    run scene-grounding guided DDIM, rebuild the pseudo stack of 24
    PseudoCameras (frame 0 skipped, 20% promoted to the all-time stack)
    (reference :431-636)

TPU design: the 3DGS step stays the jitted/donated baseline step extended
with the pseudo branch; the diffusion engine is pluggable (the real
ViewCrafter-equivalent JAX stack, or a mock for tests and weightless runs) —
the reference's two-GPU placement becomes a device/mesh choice inside the
engine (SURVEY.md §2.5).
"""

from __future__ import annotations

import copy
import random
import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Protocol, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from guidedvd3dgs_tpu.guidance import morphology as morph
from guidedvd3dgs_tpu.guidance import pose_math as pm
from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.models.render import (
    RenderResult,
    render_gaussians,
    render_gaussians_multi,
)
from guidedvd3dgs_tpu.ops.point_splat import splat_points_world
from guidedvd3dgs_tpu.ops.projection import RasterCamera
from guidedvd3dgs_tpu.scene.cameras import PseudoCamera, camera_from_w2c_K
from guidedvd3dgs_tpu.train.baseline import (
    StepStats,
    BaselineTrainer,
    densify_cfg,
    densify_and_prune_jit,
    lrs_for,
    reset_opacity_jit,
)
from guidedvd3dgs_tpu.utils.losses import l1_loss, psnr, ssim


# ----------------------------------------------------------------------------
# frozen renderer (EasyRenderer role)
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("height", "width"))
def _splat_along(points, colors, w2cs, K, height, width, visible=None):
    """Z-buffer point splat along a (T, 4, 4) trajectory in one dispatch.
    ``visible`` masks points out entirely (single-view mode)."""

    def body(_, w2c):
        out = splat_points_world(points, colors, w2c, K, height, width,
                                 point_mask=visible)
        return None, out.image

    return jax.lax.scan(body, None, w2cs)[1]


class FrozenRenderer:
    """Renders a frozen Gaussian state for guidance (reference
    utils/easy_renderer.py:15-78: loads the baseline model and returns
    rgb/alpha/depth for an arbitrary w2c+K)."""

    def __init__(self, state: G.GaussianState, sh_degree: int, bg=None, backend="auto"):
        self.state = state
        self.sh_degree = sh_degree
        self.bg = jnp.asarray(bg if bg is not None else [0.0, 0.0, 0.0], jnp.float32)
        self.backend = backend

        @partial(jax.jit, static_argnames=("height", "width"))
        def _render(state, viewmatrix, projmatrix, campos, tanfovx, tanfovy, height, width):
            cam = RasterCamera(viewmatrix, projmatrix, campos, tanfovx, tanfovy, height, width)
            r = render_gaussians(
                state.params, state.active, state.confidence, cam, self.bg,
                self.sh_degree, backend=self.backend,
            )
            return r.color, r.alpha, r.depth

        self._render = _render

        @partial(jax.jit, static_argnames=("height", "width"))
        def _render_many(state, viewmats, projmats, campos, tanfovx, tanfovy,
                         height, width):
            t = viewmats.shape[0]
            # tile backend: render the trajectory in groups of G frames,
            # each group ONE batched kernel chain (sorts are sublinear in
            # instance count, so a G-frame chain costs well under G single
            # chains); the groups ride a lax.scan. G=5 bounds the shared
            # instance buffer (and its < 2^24 exactness cap) at high splat
            # counts. Non-tile backends keep the per-frame scan.
            G_FR = 5
            if self.backend == "tiles" and t >= G_FR:
                from guidedvd3dgs_tpu.models.render import render_gaussians_multi

                def gbody(_, per):
                    vm, pm, cp = per
                    cams = RasterCamera(
                        vm, pm, cp, tanfovx, tanfovy, height, width
                    )
                    r = render_gaussians_multi(
                        state.params, state.active, state.confidence, cams,
                        self.bg, self.sh_degree, backend="tiles",
                    )
                    return None, (r.color, r.alpha, r.depth)

                # any trajectory length takes the batched path: floor(t/G)
                # full groups via the scan, plus ONE remainder group padded
                # by replaying the last frame (its outputs are sliced away)
                # — a length change must not silently fall back to the slow
                # per-frame scan (ADVICE r3 #3)
                tp = -(-t // G_FR) * G_FR
                per = jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a] + [a[-1:]] * (tp - t), axis=0
                    ).reshape((tp // G_FR, G_FR) + a.shape[1:]),
                    (viewmats, projmats, campos),
                )
                _, outs = jax.lax.scan(gbody, None, per)
                return jax.tree.map(
                    lambda a: a.reshape((tp,) + a.shape[2:])[:t], outs
                )

            def body(_, per):
                vm, pm, cp = per
                cam = RasterCamera(vm, pm, cp, tanfovx, tanfovy, height, width)
                r = render_gaussians(
                    state.params, state.active, state.confidence, cam, self.bg,
                    self.sh_degree, backend=self.backend,
                )
                return None, (r.color, r.alpha, r.depth)
            _, outs = jax.lax.scan(body, None, (viewmats, projmats, campos))
            return outs

        self._render_many = _render_many

    def render(self, w2c: np.ndarray, K: np.ndarray, height: int, width: int):
        cam = camera_from_w2c_K(np.asarray(w2c), np.asarray(K), height, width)
        rc = cam.raster_camera()
        return self._render(
            self.state, rc.viewmatrix, rc.projmatrix, rc.campos,
            rc.tanfovx, rc.tanfovy, height, width,
        )

    def render_many(self, w2cs: np.ndarray, K: np.ndarray, height: int, width: int):
        """Render T frames in ONE device dispatch (lax.scan over stacked
        cameras). A diffusion event needs 25 frozen renders; per-frame
        dispatch costs ~28 ms through a remotely-attached TPU, so the serial
        loop pays ~1 s of pure latency per event — the batched scan pays it
        once. Returns (color (T,3,H,W), alpha (T,H,W), depth (T,H,W))."""
        rcs = [
            camera_from_w2c_K(np.asarray(w), np.asarray(K), height, width)
            .raster_camera()
            for w in w2cs
        ]
        return self._render_many(
            self.state,
            jnp.stack([rc.viewmatrix for rc in rcs]),
            jnp.stack([rc.projmatrix for rc in rcs]),
            jnp.stack([rc.campos for rc in rcs]),
            rcs[0].tanfovx, rcs[0].tanfovy, height, width,
        )


# ----------------------------------------------------------------------------
# diffusion engine protocol
# ----------------------------------------------------------------------------


class DiffusionEngine(Protocol):
    video_length: int
    height: int
    width: int

    def generate(
        self,
        pc_renders: jnp.ndarray,  # (T, H, W, 3) in [0, 1], frame0 = real image
        guidance_images: jnp.ndarray,  # (T, 3, Hg, Wg) in [0, 1]
        guidance_masks: jnp.ndarray,  # (T, 1, Hg, Wg)
        guidance_depths: jnp.ndarray,  # (T, 1, Hg, Wg)
        rng: jax.Array,
        no_guidance: bool = False,
        scale_guidance_weight: float = 1.0,
    ) -> jnp.ndarray:  # (T, 3, H, W) in [0, 1]
        ...


class MockDiffusionEngine:
    """Weightless stand-in: returns the guidance renders filled with the
    point-cloud render where the mask says 'unobserved'. Lets the full
    guided trainer run end-to-end in tests and in environments without the
    ViewCrafter checkpoint."""

    def __init__(self, video_length=25, height=320, width=448, device=None):
        self.video_length = video_length
        self.height = height
        self.width = width
        self.device = device

    def generate(self, pc_renders, guidance_images, guidance_masks,
                 guidance_depths, rng, no_guidance=False, scale_guidance_weight=1.0):
        if self.device is not None:
            pc_renders, guidance_images, guidance_masks = jax.device_put(
                (pc_renders, guidance_images, guidance_masks), self.device
            )
        t = guidance_images.shape[0]
        pc = jax.image.resize(
            pc_renders, (t, guidance_images.shape[2], guidance_images.shape[3], 3),
            "bilinear",
        )
        pc = jnp.transpose(pc, (0, 3, 1, 2))
        # guidance_masks is the OBSERVED mask (1 - unobserved alpha mask, see
        # run_diffusion_event): keep the frozen render where observed, fill
        # the unobserved holes with the point-cloud render
        m = guidance_masks
        return jnp.clip(guidance_images * m + pc * (1 - m), 0.0, 1.0)


class OracleDiffusionEngine:
    """Validation engine: the pseudo-GT video is rendered from a *known*
    ground-truth Gaussian state (the `tools/make_synthetic_scene.py`
    `gt_gaussians.npz`), i.e. a perfect generative prior. This isolates the
    guided-trainer machinery — trajectory pool, pseudo stacks, novel-pose
    densification (reference train_guidedvd.py:343-416) — for end-to-end
    quality validation without external ViewCrafter weights: with an
    informative prior the guided run must beat the baseline on held-out
    views, which the mock engine (no new information) cannot show.

    The trainer passes the event trajectory via ``set_trajectory`` (duck-
    typed in ``submit_diffusion_event``) since ``generate`` itself only
    receives image buffers (the real engine needs nothing else)."""

    def __init__(self, gt_npz: str, video_length=25, height=320, width=448,
                 sh_degree=3, backend="auto", device=None):
        z = np.load(gt_npz)
        n = int(z["xyz"].shape[0])
        params = G.GaussianParams(
            xyz=jnp.asarray(z["xyz"]),
            features_dc=jnp.asarray(z["f_dc"]),
            features_rest=jnp.asarray(z["f_rest"]),
            scaling=jnp.asarray(z["scaling"]),
            rotation=jnp.asarray(z["rotation"]),
            opacity=jnp.asarray(z["opacity"]),
        )
        zeros = jax.tree.map(jnp.zeros_like, params)
        state = G.GaussianState(
            params=params, adam_m=zeros, adam_v=zeros,
            step=jnp.zeros((), jnp.int32),
            active=jnp.ones((n,), bool),
            confidence=jnp.ones((n, 1), jnp.float32),
            max_radii2d=jnp.zeros((n,), jnp.float32),
            xyz_gradient_accum=jnp.zeros((n, 1), jnp.float32),
            denom=jnp.zeros((n, 1), jnp.float32),
        )
        self.renderer = FrozenRenderer(state, sh_degree, backend=backend)
        self.video_length = video_length
        self.height = height
        self.width = width
        self.device = device
        self._w2cs = None
        self._K = None

    def set_trajectory(self, w2cs: np.ndarray, K: np.ndarray):
        self._w2cs = np.asarray(w2cs)
        self._K = np.asarray(K)

    def generate(self, pc_renders, guidance_images, guidance_masks,
                 guidance_depths, rng, no_guidance=False, scale_guidance_weight=1.0):
        if self._w2cs is None:
            raise RuntimeError("OracleDiffusionEngine: set_trajectory not called")
        rgb, _, _ = self.renderer.render_many(
            self._w2cs, self._K, self.height, self.width
        )
        return jnp.clip(rgb, 0.0, 1.0)


class ViewCrafterEngine:
    """The real engine: JAX ViewCrafter stack + guided DDIM
    (reference utils/viewcrafter_wrapper.py:550-573 run_video_diffusion)."""

    def __init__(self, params, mcfg, scfg, guided_cfg=None, video_length=25,
                 height=320, width=448, w_recon=0.5, ssim_guidance=False,
                 lpips_fn: Optional[Callable] = None, device=None,
                 recon_loss: str = "l2", mesh=None,
                 encoder_residency: str = "auto"):
        from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import GuidedSampleConfig

        # reference guidance_gpu_id analog (arguments/__init__.py:129): pin
        # the diffusion stack to its own chip of the slice so generation
        # overlaps 3DGS optimization when pipeline_guidance is on.
        # `mesh` replaces single-device placement with SPMD sharding: UNet/
        # VAE/encoder weights partitioned over the mesh's model axis
        # (parallel/model_parallel.py shard_params — XLA inserts the ICI
        # collectives), the SURVEY §2.5 design target the reference's
        # two-GPU split stands in for.
        #
        # encoder_residency — where the conditioning-only weights (CLIP
        # image tower + resampler + VAE encoder, ~1.4 GB bf16 at full size)
        # live between diffusion events:
        #   "resident": always on device (the r4 behavior; required under a
        #       mesh where weights are sharded).
        #   "offload": kept on host, uploaded at event start for
        #       build_conditioning, freed before the 50-step sampling scan.
        #       The CLIP text tower (0.66 GB) is dropped from device memory
        #       permanently — the prompt is fixed, so its two embeddings are
        #       computed once here. This is what lets the serial_ckpt_half
        #       CFG pair mode (no cond-branch recompute in the guided
        #       backward) fit a 16 GB v5e (GUIDED_STEP_PROFILE.json).
        #   "auto": "resident" under a mesh, else "offload".
        self.device = device
        self.mesh = mesh
        if encoder_residency == "auto":
            encoder_residency = "resident" if mesh is not None else "offload"
        if encoder_residency not in ("resident", "offload"):
            raise ValueError(f"unknown encoder_residency {encoder_residency!r}")
        if mesh is not None and encoder_residency == "offload":
            raise ValueError("encoder_residency='offload' is a single-device "
                             "discipline; sharded weights stay resident")
        self.encoder_residency = encoder_residency
        if mesh is not None:
            from guidedvd3dgs_tpu.parallel.model_parallel import shard_params

            params = shard_params(params, mesh)
            self.params = params
        elif encoder_residency == "offload":
            from guidedvd3dgs_tpu.diffusion.synthesis import (
                conditioning_params, sampler_params,
            )

            # host copies of the conditioning-only weights (uploaded per
            # event); only UNet + VAE decoder stay resident. clip_text is
            # dropped — build_conditioning always receives the precomputed
            # text_pair, so carrying the 0.66 GB text tower here would
            # re-upload dead weight every event.
            self._enc_host = jax.tree.map(
                np.asarray, conditioning_params(params)._replace(clip_text={})
            )
            slim = sampler_params(params)
            self.params = (
                jax.device_put(slim, device)
                if device is not None
                else jax.tree.map(jnp.asarray, slim)
            )
            self._text_pair = self._compute_text_pair(params, scfg)
        else:
            if device is not None:
                params = jax.device_put(params, device)
            self.params = params
        self.mcfg = mcfg
        self.scfg = scfg
        self.guided_cfg = guided_cfg or GuidedSampleConfig()
        self.video_length = video_length
        self.height = height
        self.width = width
        # guidance-loss mix (reference LossGuidance ctor args,
        # viewcrafter_wrapper.py:47-99): recon weight, optional SSIM mix,
        # optional VGG-LPIPS term
        self.w_recon = w_recon
        self.ssim_guidance = ssim_guidance
        self.lpips_fn = lpips_fn
        self.recon_loss = recon_loss
        self.verbose = False  # reference LossGuidance verbose flag
        # in warmup (scale_guidance_weight) mode the reference drops the
        # alpha mask and applies the recon loss everywhere
        # (viewcrafter_wrapper.py:147-151)
        self.scale_weight_mode = False
        # when set by the trainer (opt.save_pred_x0), per-DDIM-step pred_x0
        # videos are decoded and written here (reference LossGuidance
        # .save_pred_x0, viewcrafter_wrapper.py:174-192)
        self.save_pred_x0_dir: Optional[str] = None
        # jitted synthesis entries keyed by (guided, want_trace): weights
        # and per-event guidance buffers are jit ARGUMENTS, so one compile
        # serves every diffusion event. Calling image_guided_synthesis
        # eagerly instead would close the 50-step scan over the weights AND
        # the event's guidance buffers as embedded constants — multi-GB
        # executables recompiled at EVERY event because the buffer values
        # change (the reference has no such cliff: torch is eager).
        self._synth_cache: dict = {}

    def _compute_text_pair(self, params, scfg):
        """Encode the fixed prompt + the empty uncond prompt ONCE, then drop
        the CLIP text tower from device memory (reference encodes per event,
        diffusion_utils.py:140 — but its prompt never changes either)."""
        from guidedvd3dgs_tpu.diffusion import clip as clip_mod
        from guidedvd3dgs_tpu.diffusion.tokenizer import tokenize

        # jnp.asarray / device_put alias when a leaf already lives on the
        # target device — deleting an aliased buffer would invalidate the
        # CALLER's params. Only delete buffers this transfer created.
        caller_ids = {id(l) for l in jax.tree.leaves(params.clip_text)}
        ct = (
            jax.device_put(params.clip_text, self.device)
            if self.device is not None
            else jax.tree.map(jnp.asarray, params.clip_text)
        )
        enc = jax.jit(
            lambda p, toks: clip_mod.text_encode(p, scfg.text_config, toks)
        )
        txt = enc(ct, jnp.asarray(tokenize([scfg.prompt])))
        txt_uc = enc(ct, jnp.asarray(tokenize([""])))
        # force (host readback — the only reliable barrier through the
        # tunneled TPU) before freeing the tower's device buffers
        np.asarray(txt), np.asarray(txt_uc)
        for leaf in jax.tree.leaves(ct):
            if hasattr(leaf, "delete") and id(leaf) not in caller_ids:
                leaf.delete()
        return txt, txt_uc

    def _force_tiny(self, tree):
        """Read one element of every leaf back to host — the completion
        barrier that is reliable through the tunneled TPU (PERF_NOTES:
        block_until_ready is not)."""
        for leaf in jax.tree.leaves(tree):
            np.asarray(leaf.ravel()[0:1])

    def _generate_offload(self, video, rng, sw, buffers, no_guidance, want_trace):
        """Phase-split generation: upload encoder weights -> conditioning ->
        FREE the encoder weights -> sampling scan with only UNet + VAE
        decoder resident. Bit-identical to the one-jit path (the rng
        discipline is shared via split_synthesis_rng)."""
        from guidedvd3dgs_tpu.diffusion import schedules as S
        from guidedvd3dgs_tpu.diffusion.synthesis import (
            build_conditioning, sample_from_conditioning, split_synthesis_rng,
        )
        from guidedvd3dgs_tpu.guidance.loss_guidance import make_guidance_fn

        rng, ck, sk = split_synthesis_rng(rng)

        cond_jit = self._synth_cache.get("cond")
        if cond_jit is None:
            def bc(p, v, k, txt, txt_uc):
                return build_conditioning(
                    p, self.mcfg, self.scfg, v, k, text_pair=(txt, txt_uc)
                )

            cond_jit = jax.jit(bc)
            self._synth_cache["cond"] = cond_jit
        enc = (
            jax.device_put(self._enc_host, self.device)
            if self.device is not None
            else jax.tree.map(jnp.asarray, self._enc_host)
        )
        trip = cond_jit(enc, video, ck, *self._text_pair)
        self._force_tiny(trip)
        for leaf in jax.tree.leaves(enc):
            if hasattr(leaf, "delete"):
                leaf.delete()
        cond, uncond, uncond_img = trip

        key = ("sample", no_guidance, want_trace)
        sample_jit = self._synth_cache.get(key)
        if sample_jit is None:
            sched = self.mcfg.schedule()
            pr = S.make_ddim_params(
                sched, self.scfg.ddim_steps, eta=self.scfg.ddim_eta,
                method=self.scfg.timestep_spacing,
            )
            guided = not no_guidance

            def sample(p, c, u, ui, r, k, w, bufs):
                gf = None
                if guided:
                    gf = make_guidance_fn(
                        bufs, w_recon=self.w_recon,
                        ssim_guidance=self.ssim_guidance,
                        lpips_fn=self.lpips_fn,
                        recon_loss=self.recon_loss,
                    )
                return sample_from_conditioning(
                    p, self.mcfg, self.scfg, c, u, ui, r, k,
                    guidance_fn=gf, guided_cfg=self.guided_cfg,
                    scale_guidance_weight=w, pred_x0_trace=want_trace,
                    sched=sched, ddim_params=pr,
                )

            sample_jit = jax.jit(sample)
            self._synth_cache[key] = sample_jit
        return sample_jit(self.params, cond, uncond, uncond_img, rng, sk, sw, buffers)

    def _synth_jit(self, guided: bool, want_trace: bool):
        key = (guided, want_trace)
        fn = self._synth_cache.get(key)
        if fn is not None:
            return fn
        from guidedvd3dgs_tpu.diffusion import schedules as S
        from guidedvd3dgs_tpu.diffusion.synthesis import image_guided_synthesis
        from guidedvd3dgs_tpu.guidance.loss_guidance import make_guidance_fn

        # schedule tables are host-side numpy — precompute outside the trace
        sched = self.mcfg.schedule()
        pr = S.make_ddim_params(
            sched, self.scfg.ddim_steps, eta=self.scfg.ddim_eta,
            method=self.scfg.timestep_spacing,
        )

        def synth(params, video, rng, sw, buffers):
            gf = None
            if guided:
                gf = make_guidance_fn(
                    buffers, w_recon=self.w_recon,
                    ssim_guidance=self.ssim_guidance, lpips_fn=self.lpips_fn,
                    recon_loss=self.recon_loss,
                )
            return image_guided_synthesis(
                params, self.mcfg, self.scfg, video, rng,
                guidance_fn=gf, guided_cfg=self.guided_cfg,
                scale_guidance_weight=sw, pred_x0_trace=want_trace,
                sched=sched, ddim_params=pr,
            )

        fn = jax.jit(synth)
        self._synth_cache[key] = fn
        return fn

    def generate(self, pc_renders, guidance_images, guidance_masks,
                 guidance_depths, rng, no_guidance=False, scale_guidance_weight=1.0):
        from guidedvd3dgs_tpu.guidance.loss_guidance import resize_guidance

        if self.mesh is not None:
            from guidedvd3dgs_tpu.parallel.mesh import replicated

            pc_renders, guidance_images, guidance_masks, guidance_depths, rng = (
                jax.device_put(
                    (pc_renders, guidance_images, guidance_masks,
                     guidance_depths, rng),
                    replicated(self.mesh),
                )
            )
        elif self.device is not None:
            pc_renders, guidance_images, guidance_masks, guidance_depths, rng = (
                jax.device_put(
                    (pc_renders, guidance_images, guidance_masks,
                     guidance_depths, rng),
                    self.device,
                )
            )
        # conditioning renders arrive at train resolution; the diffusion
        # model runs at its own (height, width) — resize in, like the
        # reference does before encoding (viewcrafter_wrapper.py:531)
        t = pc_renders.shape[0]
        if pc_renders.shape[1] != self.height or pc_renders.shape[2] != self.width:
            pc_renders = jax.image.resize(
                pc_renders, (t, self.height, self.width, 3), "bilinear"
            )
        video = pc_renders * 2.0 - 1.0  # [0,1] -> [-1,1]
        guidance_fn = None
        if not no_guidance:
            buffers = resize_guidance(
                guidance_images, self.height, self.width,
                masks=None if self.scale_weight_mode else guidance_masks,
                depths=guidance_depths,
            )
        if self.verbose:
            print(
                f"  [engine] {self.height}x{self.width}x{t} "
                f"recon={self.recon_loss} w_recon={self.w_recon} "
                f"ssim={self.ssim_guidance} lpips={self.lpips_fn is not None} "
                f"guided={not no_guidance} sw={scale_guidance_weight}",
                flush=True,
            )
        # the multicond sampler has no trace output (synthesis routes
        # guidance_fn is None OR multiple_cond_cfg to samplers that return
        # trace=None)
        guided = not no_guidance and not self.scfg.multiple_cond_cfg
        want_trace = bool(self.save_pred_x0_dir) and guided
        sw = jnp.asarray(scale_guidance_weight, jnp.float32)
        if self.encoder_residency == "offload":
            frames = self._generate_offload(
                video, rng, sw, buffers if not no_guidance else None,
                no_guidance, want_trace,
            )
        else:
            synth = self._synth_jit(not no_guidance, want_trace)
            frames = synth(
                self.params, video, rng, sw,
                buffers if not no_guidance else None,
            )
        if want_trace:
            frames, trace = frames
            if trace is not None:
                self._save_pred_x0_videos(trace)
        return jnp.transpose(jnp.clip((frames + 1.0) / 2.0, 0.0, 1.0), (0, 3, 1, 2))

    def _save_pred_x0_videos(self, trace):
        """Decode the (S, T, h, w, 4) pred_x0 latent trace and write one mp4
        per DDIM step, named by descending sampler index like the reference
        (viewcrafter_wrapper.py:188-192 pred_x0_video_{index}). Debug path:
        one decode dispatch per step, host loop."""
        from guidedvd3dgs_tpu.diffusion.model import decode_video_frames
        from guidedvd3dgs_tpu.utils.video import artifact_writer, save_video

        dec = self._synth_cache.get("decode")
        if dec is None:
            # params as a jit argument: the eager per-frame decode scan
            # would close over the weights as embedded constants (see
            # _synth_jit) — one cached compile serves every debug dump
            dec = jax.jit(
                lambda p, z: decode_video_frames(p, self.mcfg, z)
            )
            self._synth_cache["decode"] = dec
        s = int(trace.shape[0])
        for i in range(s):
            fr = dec(self.params, trace[i])
            fr = np.asarray(jnp.clip((fr + 1.0) / 2.0, 0.0, 1.0))
            artifact_writer.submit(
                save_video, fr,
                f"{self.save_pred_x0_dir}/pred_x0_step{s - 1 - i:03d}.mp4",
            )


# ----------------------------------------------------------------------------
# trajectory pool
# ----------------------------------------------------------------------------


@dataclass
class TrajEntry:
    cand_idx: int
    traj_c2ws: np.ndarray  # (T, 4, 4) world frame
    center_scale: float
    scale_idx: int
    obj_c2w: np.ndarray  # (1, 4, 4) source pose in object frame
    transform_back: np.ndarray  # (4, 4)


def select_topk_candidates(areas: np.ndarray, mask_thresh: float, top_k: int) -> np.ndarray:
    """Pose-candidate selection rule (reference train_guidedvd.py:175-179):
    drop candidates whose unobserved-pixel count is >= 0.1*H*W, then keep the
    top_k LARGEST remaining areas (descending), preserving that order."""
    ok = np.nonzero(areas < mask_thresh)[0]
    order = np.argsort(-areas[ok], kind="stable")[:top_k]
    return ok[order]


def build_trajectory_pool(
    frozen: FrozenRenderer,
    train_c2ws: np.ndarray,  # (V, 4, 4)
    intrinsic: np.ndarray,  # (3, 3) at guidance res
    center_depths: np.ndarray,  # (V,) depth at the center pixel per view
    height: int,
    width: int,
    center_scale: float = 1.0,
    elevation: float = 5.0,
    video_length: int = 25,
) -> Dict[int, List[TrajEntry]]:
    """Eq. 7 trajectory pool (reference train_guidedvd.py:121-298): per view,
    3 radius scales x (5 phi x 4-5 theta) candidates; keep (3, 2, 1) best."""
    d_phi = [-30, -15, 0, 15, 30]
    d_theta = [-30, -15, 0, 15, 30] if center_scale != 1 else [-15, -7.5, 0, 7.5]
    mask_thresh = 0.1 * height * width
    scales = [
        (center_scale, 3, 1),
        (center_scale / 3.0, 2, 2),
        (center_scale / 10.0, 1, 3),
    ]

    pool: Dict[int, List[TrajEntry]] = {}
    for v in range(train_c2ws.shape[0]):
        pool[v] = []
        for cs, top_k, scale_idx in scales:
            radius = float(center_depths[v]) * cs
            obj_poses, _, back = pm.world_to_obj(
                train_c2ws[v][None], None, k=-1, r=radius, elevation_deg=elevation
            )
            cands, offsets = pm.candidate_pose_grid(obj_poses, back, d_phi, d_theta)

            # all candidates of this (view, scale) in ONE device dispatch:
            # the serial per-candidate loop paid ~450 dispatch round-trips
            # (~6 min of pool build through the remote-TPU link)
            w2cs = np.stack([np.linalg.inv(c) for c in cands])
            _, alphas, _ = frozen.render_many(w2cs, intrinsic, height, width)
            unobs = jax.vmap(lambda a: morph.erode((a < 0.7).astype(jnp.float32), 5))(
                alphas
            )
            areas = np.asarray(unobs.sum(axis=(1, 2)))
            for j in select_topk_candidates(areas, mask_thresh, top_k):
                ph, th, dr = offsets[j]
                traj = pm.interpolate_trajectory(obj_poses, ph, th, dr, frames=video_length)
                traj = back[None] @ traj
                pool[v].append(TrajEntry(int(j), traj, cs, scale_idx, obj_poses, back))
    return pool


# ----------------------------------------------------------------------------
# jitted guided train step
# ----------------------------------------------------------------------------


def make_guided_train_step(
    vgg_loss_fn: Optional[Callable] = None,
    pseudo_cam_lpips_weight: float = 0.1,
):
    """Build the jitted guided step. `vgg_loss_fn(x, y)` (both (1,3,H,W) in
    [0,1]) joins the pseudo loss at `pseudo_cam_lpips_weight` when provided —
    the reference's pseudo_cam_lpips term (train_guidedvd.py:368-371)."""

    @partial(
        jax.jit,
        static_argnames=(
            "sh_degree", "lambda_dssim", "use_confidence", "backend",
            "pseudo_ssim", "apply_adam", "update_stats", "has_pseudo",
            "max_instances",
        ),
        donate_argnames=("state",),
    )
    def train_step_guided(
        state: G.GaussianState,
        cam: RasterCamera,
        gt_image: jnp.ndarray,
        pseudo_cam: Optional[RasterCamera],
        pseudo_gt: Optional[jnp.ndarray],
        pseudo_weight: jnp.ndarray,
        bg: jnp.ndarray,
        lrs: G.LearningRates,
        sh_degree: int,
        lambda_dssim: float,
        use_confidence: bool = False,
        backend: str = "auto",
        pseudo_ssim: bool = False,
        apply_adam: bool = True,
        update_stats: bool = True,
        has_pseudo: bool = True,
        max_instances: int = 0,
    ):
        """Combined train-view + pseudo-view step (reference
        train_guidedvd.py:330-416)."""
        offset0 = jnp.zeros((state.capacity, 2), jnp.float32)
        max_inst = max_instances

        def loss_fn(params, offset, offset_p):
            r = render_gaussians(
                params, state.active, state.confidence, cam, bg, sh_degree,
                means2d_offset=offset, use_confidence=use_confidence, backend=backend,
                max_instances=max_inst,
            )
            ll1 = l1_loss(r.color, gt_image)
            loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(r.color, gt_image))
            if has_pseudo:
                rp = render_gaussians(
                    params, state.active, state.confidence, pseudo_cam, bg, sh_degree,
                    means2d_offset=offset_p, use_confidence=use_confidence, backend=backend,
                    max_instances=max_inst,
                )
                pl1 = l1_loss(rp.color, pseudo_gt)
                if pseudo_ssim:
                    ploss = (1.0 - lambda_dssim) * pl1 + lambda_dssim * (
                        1.0 - ssim(rp.color, pseudo_gt)
                    )
                else:
                    ploss = pl1
                if vgg_loss_fn is not None:
                    ploss = ploss + pseudo_cam_lpips_weight * vgg_loss_fn(
                        jnp.clip(rp.color, 0, 1)[None], jnp.clip(pseudo_gt, 0, 1)[None]
                    )
                loss = loss + pseudo_weight * ploss
                aux = (r, rp, ll1, pl1)
            else:
                aux = (r, None, ll1, jnp.float32(0.0))
            return loss, aux

        (loss, (r, rp, ll1, pl1)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.params, offset0, offset0)
        gparams, goffset, goffset_p = grads

        if update_stats:
            state = G.update_max_radii(state, r.radii, r.visibility_filter)
            if has_pseudo:
                state = G.update_max_radii(state, rp.radii, rp.visibility_filter)
                state = G.add_densification_stats_with_novel_pose(
                    state, goffset, r.visibility_filter, goffset_p, rp.visibility_filter
                )
            else:
                state = G.add_densification_stats(state, goffset, r.visibility_filter)
        if apply_adam:
            state = G.adam_step(state, gparams, lrs)

        ovf = r.overflow if r.overflow is not None else jnp.int32(0)
        dem = r.num_instances if r.num_instances is not None else jnp.int32(0)
        if has_pseudo and rp is not None and rp.overflow is not None:
            ovf = ovf + rp.overflow
            dem = jnp.maximum(dem, rp.num_instances)
        metrics = {
            "loss": loss, "l1": ll1, "pseudo_l1": pl1,
            "psnr": psnr(r.color, gt_image)[0, 0],
            "overflow": ovf, "num_instances": dem,
        }
        return state, metrics

    return train_step_guided


# profiler toggle: price the batched two-camera render against two single
# renders (tools/profile_guided_iter.py) without recompiling the module
_BATCH_RENDERS = [True]


def set_batch_renders(flag: bool) -> None:
    _BATCH_RENDERS[0] = flag


def make_guided_steps_chunk(
    vgg_loss_fn: Optional[Callable] = None,
    pseudo_cam_lpips_weight: float = 0.1,
):
    """Chunked guided step: K iterations of the guided step body in ONE
    device dispatch (lax.scan), the guided analog of
    baseline.train_steps_chunk. Pseudo ground-truth frames live in a
    device-resident pool (`pool_gts`/`pool_rcs`); the host only passes
    per-step slot indices, so chunks move O(K) scalars instead of O(K)
    images over the (high-latency) host link. Per-step semantics are
    identical to make_guided_train_step: steps without a pseudo camera get
    weight 0 + a masked stats filter, which contributes exactly zero."""

    @partial(
        jax.jit,
        static_argnames=(
            "sh_degree", "lambda_dssim", "use_confidence", "backend",
            "pseudo_ssim", "max_instances", "with_pseudo",
        ),
        donate_argnames=("state",),
    )
    def chunk(
        state: G.GaussianState,
        rcs: RasterCamera,  # stacked train cameras, leaves (V, ...)
        gts: jnp.ndarray,  # (V, 3, H, W)
        pool_rcs,  # stacked pool cameras, leaves (P, ...) (None w/o pseudo)
        pool_gts,  # (P, 3, H, W) device pseudo-frame pool (None w/o pseudo)
        cam_idx: jnp.ndarray,  # (K,) int32
        pseudo_idx: jnp.ndarray,  # (K,) int32 pool slot (0 when unused)
        pseudo_w: jnp.ndarray,  # (K,) f32 pseudo weight (0 = no pseudo)
        has_pseudo: jnp.ndarray,  # (K,) bool (stats gating)
        xyz_lrs: jnp.ndarray,  # (K,) f32
        apply_adam: jnp.ndarray,  # (K,) bool
        update_stats: jnp.ndarray,  # (K,) bool
        bg: jnp.ndarray,
        lrs: G.LearningRates,
        sh_degree: int,
        lambda_dssim: float,
        use_confidence: bool = False,
        backend: str = "auto",
        pseudo_ssim: bool = False,
        max_instances: int = 0,
        with_pseudo: bool = True,
    ):
        # Train + pseudo renders share the Gaussian state; on the tile
        # backend they run as ONE batched kernel chain (two vertical bands
        # of a virtual framebuffer, ops/raster_tiles.rasterize_tiles_multi)
        # — one binning sort over the union of both cameras' instances
        # instead of two (sorts are sublinear in M, docs/PERF_NOTES.md) and
        # every per-dispatch fixed cost paid once.
        batch_renders = with_pseudo and backend == "tiles" and _BATCH_RENDERS[0]

        def body(state, per):
            idx, pidx, pw, hp, lr_xyz, do_adam, do_stats = per
            cam = jax.tree.map(lambda a: a[idx], rcs)
            gt = gts[idx]
            offset0 = jnp.zeros((state.capacity, 2), jnp.float32)
            if with_pseudo:
                pcam = jax.tree.map(lambda a: a[pidx], pool_rcs)
                pgt = pool_gts[pidx]

            def pseudo_terms(rp_color, pl1):
                if pseudo_ssim:
                    ploss = (1.0 - lambda_dssim) * pl1 + lambda_dssim * (
                        1.0 - ssim(rp_color, pgt)
                    )
                else:
                    ploss = pl1
                if vgg_loss_fn is not None:
                    ploss = ploss + pseudo_cam_lpips_weight * vgg_loss_fn(
                        jnp.clip(rp_color, 0, 1)[None],
                        jnp.clip(pgt, 0, 1)[None],
                    )
                return ploss

            def loss_fn_batched(params, offsets):
                cams2 = jax.tree.map(lambda a, b: jnp.stack([a, b]), cam, pcam)
                mo = render_gaussians_multi(
                    params, state.active, state.confidence, cams2, bg,
                    sh_degree, means2d_offset=offsets,
                    use_confidence=use_confidence, backend="tiles",
                    max_instances=max_instances,
                )
                r = RenderResult(
                    mo.color[0], mo.depth[0], mo.alpha[0], mo.radii[0],
                    mo.visibility_filter[0], mo.overflow, mo.num_instances,
                )
                rp = RenderResult(
                    mo.color[1], mo.depth[1], mo.alpha[1], mo.radii[1],
                    mo.visibility_filter[1], None, None,
                )
                ll1 = l1_loss(r.color, gt)
                loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (
                    1.0 - ssim(r.color, gt)
                )
                pl1 = l1_loss(rp.color, pgt)
                loss = loss + pw * pseudo_terms(rp.color, pl1)
                return loss, (r, rp, ll1, pl1)

            def loss_fn(params, offset, offset_p):
                r = render_gaussians(
                    params, state.active, state.confidence, cam, bg, sh_degree,
                    means2d_offset=offset, use_confidence=use_confidence,
                    backend=backend, max_instances=max_instances,
                )
                ll1 = l1_loss(r.color, gt)
                loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (
                    1.0 - ssim(r.color, gt)
                )
                if with_pseudo:
                    rp = render_gaussians(
                        params, state.active, state.confidence, pcam, bg,
                        sh_degree, means2d_offset=offset_p,
                        use_confidence=use_confidence, backend=backend,
                        max_instances=max_instances,
                    )
                    pl1 = l1_loss(rp.color, pgt)
                    loss = loss + pw * pseudo_terms(rp.color, pl1)
                    aux = (r, rp, ll1, pl1)
                else:
                    aux = (r, None, ll1, jnp.float32(0.0))
                return loss, aux

            if batch_renders:
                (loss, (r, rp, ll1, pl1)), grads = jax.value_and_grad(
                    loss_fn_batched, argnums=(0, 1), has_aux=True
                )(state.params, jnp.stack([offset0, offset0]))
                gparams, goffsets = grads
                goffset, goffset_p = goffsets[0], goffsets[1]
            else:
                (loss, (r, rp, ll1, pl1)), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2), has_aux=True
                )(state.params, offset0, offset0)
                gparams, goffset, goffset_p = grads

            def with_stats(s):
                s = G.update_max_radii(s, r.radii, r.visibility_filter)
                if with_pseudo:
                    visp = rp.visibility_filter & hp
                    s = G.update_max_radii(s, rp.radii, visp)
                    s = G.add_densification_stats_with_novel_pose(
                        s, goffset, r.visibility_filter, goffset_p, visp
                    )
                else:
                    s = G.add_densification_stats(s, goffset, r.visibility_filter)
                return s

            state = jax.lax.cond(do_stats, with_stats, lambda s: s, state)
            state = jax.lax.cond(
                do_adam,
                lambda s: G.adam_step(s, gparams, lrs._replace(xyz=lr_xyz)),
                lambda s: s,
                state,
            )
            ovf = r.overflow if r.overflow is not None else jnp.int32(0)
            dem = r.num_instances if r.num_instances is not None else jnp.int32(0)
            if with_pseudo and rp.overflow is not None:
                ovf = ovf + rp.overflow
                dem = jnp.maximum(dem, rp.num_instances)
            metrics = (loss, ll1, pl1, psnr(r.color, gt)[0, 0], ovf, dem)
            return state, metrics

        state, per_step = jax.lax.scan(
            body, state,
            (cam_idx, pseudo_idx, pseudo_w, has_pseudo, xyz_lrs, apply_adam,
             update_stats),
        )
        # per-step (K,) metric arrays — the host slices off padded no-op
        # steps (chunk-length bucketing) before reducing
        losses, l1s, pl1s, psnrs, ovfs, dems = per_step
        return state, {
            "loss": losses, "l1": l1s, "pseudo_l1": pl1s, "psnr": psnrs,
            "overflow": ovfs, "num_instances": dems,
        }

    return chunk


@jax.jit
def _event_artifacts_u8(pc_renders, gs_rgb, gs_alpha, gs_depth):
    """Device-side uint8 quantization of the four per-event debug videos
    (render0 / gs_render / alpha / normalized masked depth): the artifact
    pulls are synchronous on the main thread (async pulls could contend on
    the tunnel), so shrinking them 4x is the lever."""
    u8 = lambda x: (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    d = gs_depth[:, 0] * (1.0 - gs_alpha[:, 0])
    dn = (d - d.min()) / jnp.maximum(d.max() - d.min(), 1e-8)
    return (
        u8(pc_renders),
        u8(jnp.transpose(gs_rgb, (0, 2, 3, 1))),
        u8(gs_alpha[:, 0]),
        u8(dn),
    )


@jax.jit
def _video_u8(v):
    """(T, 3, H, W) [0,1] -> (T, H, W, 3) uint8 on device (artifact pull)."""
    return (
        jnp.clip(jnp.transpose(v, (0, 2, 3, 1)), 0.0, 1.0) * 255.0 + 0.5
    ).astype(jnp.uint8)


@partial(jax.jit, donate_argnames=("pool",))
def _pool_write(pool, frames, cur_slots, promo_slots):
    """Write a new event's frames into the device pseudo pool: frames[1:]
    into the fixed current-stack slots, and (via the same source rows) into
    the promoted all-time slots; non-promoted rows carry an out-of-range
    slot and are dropped. Fixed shapes -> one compile for every event."""
    pool = pool.at[cur_slots].set(frames)
    pool = pool.at[promo_slots].set(frames, mode="drop")
    return pool


# ----------------------------------------------------------------------------
# trainer
# ----------------------------------------------------------------------------


class GuidedTrainer(BaselineTrainer):
    """train_guidedvd.py:48-636 semantics around the jitted guided step."""

    def __init__(
        self,
        scene,
        state: G.GaussianState,
        opt,
        pipe,
        model_params,
        frozen: FrozenRenderer,
        engine: DiffusionEngine,
        pcd_points: np.ndarray,  # scene point cloud for pc renders
        pcd_colors: np.ndarray,
        guidance_intrinsic: np.ndarray,  # (3, 3) at train res
        background=None,
        vgg_loss_fn: Optional[Callable] = None,
        seed: int = 1,
        elevation: float = 5.0,
        frozen_mask: Optional[FrozenRenderer] = None,
        hybrid_traj: bool = False,
        depth_estimator: Optional[Callable] = None,
        pipeline_guidance: bool = False,
    ):
        super().__init__(scene, state, opt, pipe, model_params, background)
        self.frozen = frozen
        self.engine = engine
        self.pcd_points = jnp.asarray(pcd_points, jnp.float32)
        self.pcd_colors = jnp.asarray(pcd_colors, jnp.float32)
        self.intrinsic = np.asarray(guidance_intrinsic)
        self.vgg_loss_fn = vgg_loss_fn
        self.elevation = elevation
        self.rng_np = np.random.default_rng(seed)
        self.jrng = jax.random.key(seed)

        self.train_cams = list(scene.getTrainCameras())
        self.H = self.train_cams[0].image_height
        self.W = self.train_cams[0].image_width

        # guided runs keep SH degree fixed at max (reference :327-329
        # comments out oneupSHdegree and loads the baseline's full SH state)
        self.active_sh_degree = self.max_sh_degree

        self.pseudo_stack: List[PseudoCamera] = []
        self.pseudo_stack_alltime: List[PseudoCamera] = []
        self.trajectory_pool: Dict[int, List[TrajEntry]] = {}
        self.trajectory_pool_shuffle: Dict[int, List[TrajEntry]] = {}
        self.vd_indices: List[int] = []
        self.events_run = 0
        # two-renderer variant: a second frozen model decides the guidance
        # MASK while `frozen` provides rgb/depth
        # (reference train_replica_guidedvd_tworenderer.py:60-74, :523-524)
        self.frozen_mask = frozen_mask
        # hybrid-traj variant: the first epoch of diffusion events uses the
        # fixed loop2 txt trajectory, then switches to the pool
        # (reference train_scannetpp_guidedvd_hybrid_traj.py:318, :455-493)
        self.hybrid_traj = hybrid_traj
        self.txt_traj_warmup = hybrid_traj
        # optional monocular-depth point appending
        # (reference train_guidedvd.py:569-612, default off)
        self.depth_estimator = depth_estimator
        # overlap mode: events are submitted at their boundary and only
        # materialized at the NEXT boundary, so generation k runs while
        # iterations k..k+guidance_vd_iter train (no-op on one device; on a
        # multi-chip mesh the engine lives on its own chip)
        self.pipeline_guidance = pipeline_guidance
        self._pending_event = None
        self._step_fn = make_guided_train_step(
            vgg_loss_fn=vgg_loss_fn,
            pseudo_cam_lpips_weight=getattr(opt, "pseudo_cam_lpips_weight", 0.1),
        )

    # -- setup ---------------------------------------------------------------

    def init_view_geometry(self):
        """Per-train-view c2w + center-pixel depth from the frozen model —
        needed by every trajectory mode (pool, txt preset, random)."""
        c2ws = []
        depths = []
        for cam in self.train_cams:
            rc = cam.raster_camera()
            w2c = np.asarray(rc.viewmatrix).T  # stored transposed
            c2w = np.linalg.inv(w2c)
            c2ws.append(c2w)
            _, _, depth = self.frozen.render(w2c, self.intrinsic, self.H, self.W)
            depths.append(float(depth[self.H // 2, self.W // 2]))
        self.train_c2ws = np.stack(c2ws)
        self.center_depths = np.asarray(depths)

    def init_trajectory_pool(self):
        self.init_view_geometry()
        depths = self.center_depths
        self.trajectory_pool = build_trajectory_pool(
            # the two-renderer variant selects candidates with the MASK
            # renderer (reference tworenderer diff at :161/:211/:260)
            self.frozen_mask or self.frozen,
            self.train_c2ws, self.intrinsic, np.asarray(depths),
            self.H, self.W,
            center_scale=self.opt.guidance_vc_center_scale,
            elevation=self.elevation,
            video_length=self.engine.video_length,
        )
        self.trajectory_pool_shuffle = {
            k: self._shuffled(v) for k, v in self.trajectory_pool.items()
        }

    def _shuffled(self, entries):
        out = list(entries)
        self.rng_np.shuffle(out)
        return out

    def _next_view(self) -> int:
        if not self.vd_indices:
            idx = np.arange(len(self.train_cams))
            self.rng_np.shuffle(idx)
            self.vd_indices = idx.tolist()
            if self.events_run > 0:
                # hybrid-traj warmup covers exactly the first epoch of views
                # (reference hybrid_traj :463-468)
                self.txt_traj_warmup = False
        return self.vd_indices.pop()

    def _txt_trajectory(self, view: int, preset: str = "loop2") -> np.ndarray:
        """Fixed txt trajectory anchored at the view (reference
        viewcrafter_wrapper.py:469-548 txt path + pvd_utils loop2 preset)."""
        cs = self.opt.guidance_vc_center_scale
        radius = float(self.center_depths[view]) * cs
        obj_poses, _, back = pm.world_to_obj(
            self.train_c2ws[view][None], None, k=-1, r=radius,
            elevation_deg=self.elevation,
        )
        phis, thetas, rs = pm.TRAJ_PRESETS[preset]
        traj = pm.traj_from_txt(obj_poses, phis, thetas, rs,
                                frames=self.engine.video_length)
        return back[None] @ traj

    # -- diffusion event -------------------------------------------------------

    def _event_dir(self, iteration: int) -> str:
        """Per-event artifact directory (reference LossGuidance.update_save_dir
        keys artifacts by train_iter, viewcrafter_wrapper.py:167-171); empty
        string disables artifact saving (no model_path, e.g. tests)."""
        mp = getattr(self.model_params, "model_path", "") or ""
        if not mp or not getattr(self.opt, "save_event_artifacts", True):
            return ""
        import os

        d = os.path.join(mp, "diffusion_events", f"train_iter{iteration}")
        os.makedirs(d, exist_ok=True)
        return d

    def pc_render_along(self, traj_c2ws: np.ndarray, view_idx: int) -> jnp.ndarray:
        """Splat the scene point cloud along the trajectory; frame 0 replaced
        by the real training image (reference viewcrafter_wrapper.py:469-548).
        All T frames run in ONE jitted dispatch — the eager per-frame loop
        paid op-by-op latency through the remote-TPU link.

        Default (reference pc_render_single_view=True, train_guidedvd.py:480):
        only the points SEEN FROM the source view are splatted — the merged
        scene cloud visibility-filtered from view k stands in for the
        reference's per-view DUSt3R pointmap. guidance_pc_render_all_views
        splats the whole cloud."""
        w2cs = np.stack([np.linalg.inv(c) for c in traj_c2ws]).astype(np.float32)
        visible = None
        if not getattr(self.opt, "guidance_pc_render_all_views", False):
            # the mask depends only on (pcd, source view): compute once per
            # view (jitted, one dispatch) and reuse across events
            cache = getattr(self, "_vis_mask_cache", None)
            if cache is None:
                cache = self._vis_mask_cache = {}
            visible = cache.get(view_idx)
            if visible is None:
                from guidedvd3dgs_tpu.ops.point_splat import visible_points_mask

                visible = cache[view_idx] = visible_points_mask(
                    self.pcd_points, jnp.asarray(w2cs[0]),
                    jnp.asarray(self.intrinsic, jnp.float32), self.H, self.W,
                )
        frames = _splat_along(
            self.pcd_points, self.pcd_colors, jnp.asarray(w2cs),
            jnp.asarray(self.intrinsic, jnp.float32), self.H, self.W,
            visible=visible,
        )  # (T, H, W, 3)
        real = jnp.transpose(jnp.asarray(self.train_cams[view_idx].image), (1, 2, 0))
        return frames.at[0].set(real)

    def run_diffusion_event(self, iteration: int):
        """reference train_guidedvd.py:431-636 (synchronous form)."""
        pending = self.submit_diffusion_event(iteration)
        if pending is not None:
            self.finalize_diffusion_event(pending)

    def _video_file_path(self, key="cur") -> Optional[str]:
        """Saved-video store path for an event's trajectory
        (reference train_guidedvd.py:562-566 video_files_scale layout; npz
        instead of pickle .pth)."""
        if key == "cur":
            key = getattr(self, "_cur_video_key", None)
        mp = getattr(self.model_params, "model_path", "") or ""
        if key is None or not mp:
            return None
        import os

        s, v, c = key
        return os.path.join(mp, f"video_files_scale{s}", str(v), f"{c}.npz")

    def submit_diffusion_event(self, iteration: int):
        """Launch one diffusion event and return a pending record without
        forcing the generated video to the host. JAX async dispatch keeps the
        sampler running on the guidance chip while the trainer keeps stepping
        on its own chip — the TPU-native replacement for the reference's
        serialized two-GPU split (SURVEY.md §2.5); the reference's all-time
        pseudo stack (train_guidedvd.py:633-634) already proves one-event
        staleness is tolerated."""
        view = self._next_view()
        self._cur_video_key = None
        if self.txt_traj_warmup:
            traj = self._txt_trajectory(view)
        elif not getattr(self.opt, "use_trajectory_pool", True):
            # txt-preset trajectory mode (reference train_guidedvd.py:434-452):
            # random preset when guidance_random_traj, else the fixed default
            # (loop2, the hardcoded vc_opts.traj_txt)
            if getattr(self.opt, "guidance_random_traj", False):
                r = self.rng_np.random()
                if getattr(self.opt, "guidance_no_wave_traj", False):
                    preset = "loop2" if r < 0.5 else "loop1"
                else:
                    preset = "loop2" if r < 0.33 else ("loop1" if r < 0.66 else "wave1")
            else:
                preset = "loop2"
            traj = self._txt_trajectory(view, preset)
        else:
            if not self.trajectory_pool_shuffle.get(view):
                self.trajectory_pool_shuffle[view] = self._shuffled(self.trajectory_pool[view])
            if not self.trajectory_pool_shuffle[view]:
                return  # no valid trajectory for this view
            entry = self.trajectory_pool_shuffle[view].pop()
            traj = entry.traj_c2ws
            # key for the saved-video store (reference layout
            # video_files_scale{scale}/{view}/{cand}.pth, train_guidedvd.py:562-566)
            self._cur_video_key = (entry.scale_idx, view, entry.cand_idx)

        import time as _time

        _t = _time.time()
        pc_renders = self.pc_render_along(traj, view)
        # readback barrier: block_until_ready is unreliable through the
        # remote-TPU tunnel (see bench.py)
        np.asarray(jax.tree.leaves(pc_renders)[0].ravel()[0:1])
        _t_pc = _time.time() - _t

        _t = _time.time()
        w2cs = np.stack([np.linalg.inv(traj[i]) for i in range(traj.shape[0])])
        use_train_gs = getattr(
            self.opt, "guidance_with_training_gs", False
        ) and iteration >= getattr(
            self.opt, "guidance_with_training_gs_startiter", 0
        )
        if use_train_gs:
            # guidance rgb/depth from the CURRENT training gaussians instead
            # of the frozen baseline (reference train_guidedvd.py:493-517);
            # one live renderer is kept and its state swapped per event so
            # the jitted render_many never recompiles
            live = getattr(self, "_live_renderer", None)
            if live is None or live.state.capacity != self.state.capacity:
                live = self._live_renderer = FrozenRenderer(
                    self.state, self.max_sh_degree, backend=self.frozen.backend
                )
            live.state = self.state
            rgb, alpha, depth = live.render_many(
                w2cs, self.intrinsic, self.H, self.W
            )
            if not getattr(self.opt, "guidance_with_training_gs_decide_mask", False):
                # mask still from the frozen baseline (reference :510-513)
                _, alpha, _ = (self.frozen_mask or self.frozen).render_many(
                    w2cs, self.intrinsic, self.H, self.W
                )
        else:
            rgb, alpha, depth = self.frozen.render_many(
                w2cs, self.intrinsic, self.H, self.W
            )
            if self.frozen_mask is not None:
                # two-renderer variant: mask alpha from the second model
                _, alpha, _ = self.frozen_mask.render_many(
                    w2cs, self.intrinsic, self.H, self.W
                )
        gs_rgb = jnp.clip(rgb, 0, 1)  # (T, 3, H, W)
        gs_alpha = (jnp.clip(alpha, 0, 1) < 0.9).astype(jnp.float32)[:, None]  # (T,1,H,W)
        gs_depth = depth[:, None]
        _t_frozen = _time.time() - _t

        _t = _time.time()
        event_dir = self._event_dir(iteration)
        if event_dir:
            # force the async frozen renders to materialize BEFORE the
            # artifact timer starts, so device compute is attributed to
            # 'frozen', not 'artifacts' (only when artifacts are on — the
            # pipelined no-artifact path must stay async)
            np.asarray(gs_rgb.ravel()[0:1])
            _t_frozen += _time.time() - _t
            _t = _time.time()
            # the reference's primary visual debugging artifacts
            # (train_guidedvd.py:531-542, viewcrafter_wrapper.py:542).
            # Quantized to uint8 ON DEVICE (one dispatch) so the synchronous
            # device->host pulls move 1/4 of the f32 bytes through the
            # remote tunnel; the mp4 encodes run on the artifact-writer
            # thread and overlap the next train chunk (drained by
            # _write_timing_summary).
            from guidedvd3dgs_tpu.utils.video import artifact_writer, save_video

            pc8, rgb8, a8, d8 = _event_artifacts_u8(
                pc_renders, gs_rgb, gs_alpha, gs_depth
            )
            artifact_writer.submit(
                save_video, np.asarray(pc8), f"{event_dir}/render0.mp4"
            )
            artifact_writer.submit(
                save_video, np.asarray(rgb8), f"{event_dir}/gs_render.mp4"
            )
            artifact_writer.submit(
                save_video, np.asarray(a8), f"{event_dir}/gs_render_alpha.mp4"
            )
            artifact_writer.submit(
                save_video, np.asarray(d8), f"{event_dir}/gs_render_depth.mp4"
            )

        _t_art = _time.time() - _t

        _t = _time.time()
        self.jrng, k = jax.random.split(self.jrng)
        # optional guidance-weight warmup over the run
        # (reference viewcrafter_wrapper.py:92-99 learning_rate_decay,
        # flag scale_guidance_weight, arguments/__init__.py:154)
        if getattr(self.opt, "scale_guidance_weight", False):
            from guidedvd3dgs_tpu.guidance.loss_guidance import guidance_weight_schedule

            sw = guidance_weight_schedule(iteration)
        else:
            sw = 1.0
        if hasattr(self.engine, "set_trajectory"):
            # oracle/validation engines render along the event trajectory
            self.engine.set_trajectory(w2cs, self.intrinsic)
        if hasattr(self.engine, "save_pred_x0_dir"):
            # per-DDIM-step pred_x0 debug videos into the event dir
            # (reference train_guidedvd.py --save_pred_x0 path)
            self.engine.save_pred_x0_dir = (
                event_dir
                if event_dir and getattr(self.opt, "save_pred_x0", False)
                else None
            )
        import os as _os

        vf = (
            self._video_file_path()
            if getattr(self.opt, "guidance_videos_from_file", False)
            else None
        )
        if vf is not None and _os.path.exists(vf):
            # reuse a previously generated video instead of sampling
            # (reference --guidance_videos_from_file: setup_diffusion off,
            # train_guidedvd.py:100; stored at train res already)
            video = jnp.asarray(np.load(vf)["video"])
            print(f"  [event it{iteration}] video from file {vf}", flush=True)
        else:
            video = self.engine.generate(
                pc_renders, gs_rgb, 1.0 - gs_alpha, gs_depth, k,
                no_guidance=getattr(self.opt, "no_guidance", False),
                scale_guidance_weight=sw,
            )  # (T, 3, engine_H, engine_W) [0, 1]
            # resize the generated video back to train resolution before it
            # becomes pseudo ground-truth (reference train_guidedvd.py:557-559)
            if video.shape[2] != self.H or video.shape[3] != self.W:
                video = jax.image.resize(
                    video, (video.shape[0], 3, self.H, self.W), "bilinear"
                )
        _t_gen = _time.time() - _t
        print(
            f"  [event it{iteration}] pc_render {_t_pc:.1f}s "
            f"frozen×{traj.shape[0]} {_t_frozen:.1f}s artifacts {_t_art:.1f}s "
            f"generate {_t_gen:.1f}s",
            flush=True,
        )
        ph = getattr(self, "event_phase_s", None)
        if ph is None:
            ph = self.event_phase_s = {
                "pc_render": 0.0, "frozen": 0.0, "artifacts": 0.0,
                "generate": 0.0,
            }
        ph["pc_render"] += _t_pc
        ph["frozen"] += _t_frozen
        ph["artifacts"] += _t_art
        ph["generate"] += _t_gen
        return (iteration, view, traj, video, gs_alpha, gs_depth, event_dir,
                getattr(self, "_cur_video_key", None))

    # -- device-resident pseudo pool (chunked trainer) ------------------------

    def _init_pseudo_pool(self, alltime_cap: int = 256):
        """Fixed-capacity device buffer of pseudo-GT frames: slots
        [0, T-1) hold the current stack (overwritten every event), slots
        [T-1, T-1+alltime_cap) the all-time stack (reservoir-evicted past
        capacity). The scan chunk indexes into this pool per step, so the
        host never re-uploads frames after the event that produced them."""
        T = self.engine.video_length
        P = (T - 1) + alltime_cap
        self._pool_capacity = P
        self._alltime_base = T - 1
        self._alltime_free = list(range(T - 1, P))
        self._cur_slots = jnp.arange(T - 1, dtype=jnp.int32)
        self._pool_gts = jnp.zeros((P, 3, self.H, self.W), jnp.float32)
        self._slot_cam = {}
        self._evict_rng = np.random.default_rng(
            getattr(self.opt, "seed", 1) + 7919
        )
        self._pool_rcs = None

    def _alloc_alltime_slot(self) -> int:
        if self._alltime_free:
            return self._alltime_free.pop()
        # reservoir eviction: replace a random existing all-time entry (the
        # reference's list grows unboundedly; at the defaults ~180 of 256
        # slots are ever used, so eviction is a capacity backstop only)
        slot = int(
            self._evict_rng.integers(self._alltime_base, self._pool_capacity)
        )
        victim = self._slot_cam.get(slot)
        if victim is not None:
            self.pseudo_stack_alltime = [
                c for c in self.pseudo_stack_alltime if c is not victim
            ]
        return slot

    def _stack_pool_cams(self):
        """Stacked RasterCamera pytree over every pool slot; empty slots get
        the first train camera (valid geometry, selected only with weight 0)."""
        from guidedvd3dgs_tpu.parallel.data_parallel import stack_cameras

        fallback = self.train_cams[0].raster_camera()
        rcs = [
            self._slot_cam[s].raster_camera()
            if s in self._slot_cam else fallback
            for s in range(self._pool_capacity)
        ]
        return stack_cameras(rcs)

    def finalize_diffusion_event(self, pending):
        """Materialize a submitted event's video and rebuild the pseudo
        stacks (reference train_guidedvd.py:557-636)."""
        (iteration, view, traj, video, gs_alpha, gs_depth, event_dir,
         video_key) = pending
        video_dev = video
        # Full-precision host pull ONLY for the paths that need f32 frames
        # on the host (npz store / depth lift); the mp4 artifact pulls
        # uint8 (4x fewer tunnel bytes) and the pseudo cameras keep lazy
        # device slices (the chunked trainer reads frames from the device
        # pool; the unscanned path jnp.asarray()s them on demand).
        need_f32 = bool(
            getattr(self.opt, "guidance_save_videos", False)
            or (
                getattr(self.opt, "append_pcd_from_video_diffusion", False)
                and self.depth_estimator is not None
            )
        )
        video = np.asarray(video_dev) if need_f32 else None

        if event_dir:
            from guidedvd3dgs_tpu.utils.video import artifact_writer, save_video

            artifact_writer.submit(
                save_video, np.asarray(_video_u8(video_dev)),
                f"{event_dir}/diffusion0.mp4",
            )
        if getattr(self.opt, "guidance_save_videos", False):
            # raw pseudo-GT tensor in the reference's video_files_scale
            # layout (train_guidedvd.py:561-566) — npz, no pickle; readable
            # back by --guidance_videos_from_file. Written SYNCHRONOUSLY:
            # --guidance_videos_from_file may read it back this run.
            vf = self._video_file_path(video_key)
            if vf is None and event_dir:
                vf = f"{event_dir}/video_view{view}.npz"
            if vf:
                import os as _os

                _os.makedirs(_os.path.dirname(vf), exist_ok=True)
                np.savez_compressed(vf, video=video)

        if (
            getattr(self.opt, "append_pcd_from_video_diffusion", False)
            and self.depth_estimator is not None
        ):
            from guidedvd3dgs_tpu.guidance.depth_lift import lift_video_to_points

            frames_hwc = np.transpose(video, (0, 2, 3, 1))
            rel = np.asarray(self.depth_estimator(frames_hwc * 2.0 - 1.0))
            pts, rgbs = lift_video_to_points(
                frames_hwc, rel,
                np.asarray(gs_depth[:, 0]), 1.0 - np.asarray(gs_alpha[:, 0]),
                traj, self.intrinsic,
            )
            if pts.shape[0]:
                self.state = G.add_points(self.state, pts, rgbs)
                self.maybe_grow()

        fovx = self.train_cams[view].FoVx
        fovy = self.train_cams[view].FoVy
        pooled = getattr(self, "_pool_gts", None) is not None
        if pooled:
            promo_slots = np.full(traj.shape[0] - 1, self._pool_capacity, np.int32)
            for s in range(self._alltime_base):
                self._slot_cam.pop(s, None)
        self.pseudo_stack = []
        for i in range(traj.shape[0]):
            if i == 0:
                continue  # skip the conditioning frame (reference :621-622)
            w2c = np.linalg.inv(traj[i])
            # pseudo_gt / mask stay LAZY DEVICE SLICES: the chunked trainer
            # reads frames from the device pool by slot, the unscanned path
            # jnp.asarray()s on demand, and checkpointing np.asarray()s at
            # save time — no per-frame host pull at event finalize.
            cam = PseudoCamera(
                R=w2c[:3, :3].T, T=w2c[:3, 3], FoVx=fovx, FoVy=fovy,
                width=self.W, height=self.H,
                pseudo_gt=video_dev[i], mask=gs_alpha[i],
                pool_slot=(i - 1) if pooled else -1,
            )
            self.pseudo_stack.append(cam)
            if pooled:
                self._slot_cam[i - 1] = cam
            if self.rng_np.random() > 0.8:  # 20% promoted (reference :633)
                if pooled:
                    # the current-stack slot is overwritten next event, so a
                    # promoted frame gets its own all-time slot (same
                    # contents; a distinct camera object owning that slot)
                    slot = self._alloc_alltime_slot()
                    promo_slots[i - 1] = slot
                    alt = copy.copy(cam)
                    alt.pool_slot = slot
                    self._slot_cam[slot] = alt
                    self.pseudo_stack_alltime.append(alt)
                else:
                    # non-pooled path: all-time cameras outlive the event, so
                    # a lazy device slice would pin the whole (T,3,H,W)
                    # diffusion video in HBM for every event that promoted a
                    # frame — pull promoted frames to host now (ADVICE r3 #4)
                    alt = copy.copy(cam)
                    alt.pseudo_gt = np.asarray(cam.pseudo_gt)
                    alt.mask = np.asarray(cam.mask)
                    self.pseudo_stack_alltime.append(alt)
        if pooled:
            self._pool_gts = _pool_write(
                self._pool_gts, video_dev[1:], self._cur_slots,
                jnp.asarray(promo_slots),
            )
            self._pool_rcs = self._stack_pool_cams()
        self.events_run += 1

    # -- per-iteration step ----------------------------------------------------

    def _pick_pseudo(self, iteration: int) -> Optional[PseudoCamera]:
        opt = self.opt
        if iteration % opt.sample_pseudo_interval != 0:
            return None
        if not (opt.start_sample_pseudo < iteration < opt.end_sample_pseudo):
            return None
        if not self.pseudo_stack and not self.pseudo_stack_alltime:
            return None
        if self.rng_np.random() > 0.5 and self.pseudo_stack_alltime:
            stack = self.pseudo_stack_alltime
        else:
            stack = self.pseudo_stack or self.pseudo_stack_alltime
        return stack[self.rng_np.integers(0, len(stack))]

    def _pseudo_weight(self, iteration: int) -> float:
        opt = self.opt
        w = opt.pseudo_cam_weight
        if getattr(opt, "pseudo_cam_weight_decay", False):
            interval = max(opt.guidance_vd_iter, 1)
            frac = np.clip((iteration % interval) / interval, 0, 1)
            w = opt.pseudo_cam_weight_start * (1 - frac) + frac * opt.pseudo_cam_weight_end
        return float(w)

    def step(self, iteration: int):
        opt = self.opt
        cam = self.pick_camera()
        rc = cam.raster_camera()
        gt = jnp.asarray(cam.image)

        pseudo = self._pick_pseudo(iteration)
        do_densify = (
            iteration < opt.densify_until_iter
            and iteration > opt.densify_from_iter
            and iteration % opt.densification_interval == 0
        )
        apply_adam = (iteration < opt.iterations) and not do_densify
        update_stats = iteration < opt.densify_until_iter

        if pseudo is not None:
            prc = pseudo.raster_camera()
            pgt = jnp.asarray(pseudo.pseudo_gt)
            self.state, metrics = self._step_fn(
                self.state, rc, gt, prc, pgt,
                jnp.float32(self._pseudo_weight(iteration)),
                self.bg, lrs_for(opt, self.xyz_lr),
                sh_degree=self.active_sh_degree,
                lambda_dssim=opt.lambda_dssim,
                use_confidence=getattr(self.pipe, "use_confidence", False),
                backend=self.backend,
                pseudo_ssim=getattr(opt, "pseudo_cam_ssim", False),
                apply_adam=apply_adam, update_stats=update_stats,
                has_pseudo=True, max_instances=self.max_instances,
            )
        else:
            self.state, metrics = self._step_fn(
                self.state, rc, gt, None, None, jnp.float32(0.0),
                self.bg, lrs_for(opt, self.xyz_lr),
                sh_degree=self.active_sh_degree,
                lambda_dssim=opt.lambda_dssim,
                use_confidence=getattr(self.pipe, "use_confidence", False),
                backend=self.backend,
                apply_adam=apply_adam, update_stats=update_stats,
                has_pseudo=False, max_instances=self.max_instances,
            )
        self.check_overflow(metrics, iteration)

        if do_densify:
            cfg = densify_cfg(opt, self.scene.cameras_extent, iteration)
            self.state = densify_and_prune_jit(self.state, jax.random.key(iteration), cfg)
            self.maybe_grow()

        self.xyz_lr = self.xyz_sched(iteration)
        if iteration % opt.opacity_reset_interval == 0:
            self.state = reset_opacity_jit(self.state)

        # diffusion event (reference :431: (iteration-1) % guidance_vd_iter)
        if (iteration - 1) % opt.guidance_vd_iter == 0 and iteration < opt.end_sample_pseudo:
            if self.pipeline_guidance:
                if self._pending_event is not None:
                    self.finalize_diffusion_event(self._pending_event)
                    self._pending_event = None
                self._pending_event = self.submit_diffusion_event(iteration)
            else:
                self.run_diffusion_event(iteration)

        loss = float(metrics["loss"])
        self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
        # the base train() loop consumes StepStats; keep the raw dict
        # available for tests via .last_metrics
        self.last_metrics = metrics
        return StepStats(
            loss=loss,
            l1=float(metrics["l1"]),
            psnr=float(metrics["psnr"]),
            num_active=int(self.state.num_active()),
        )

    def train(self, *args, **kwargs):
        t0 = time.time()
        out = super().train(*args, **kwargs)
        # drain a still-pending pipelined event so its artifacts land
        if self._pending_event is not None:
            self.finalize_diffusion_event(self._pending_event)
            self._pending_event = None
        # per-step path: events are timed by phase (event_phase_s); the rest
        # is host-interleaved step time — coarser than the scan path's
        # device-dispatch split, but enough for tools/project_wallclock.py
        total_s = time.time() - t0
        event_s = sum(getattr(self, "event_phase_s", {}).values())
        iters = kwargs.get("iterations") or (args[0] if args else None) \
            or self.opt.iterations
        start = kwargs.get("start_iteration", 0)
        self._write_timing_summary(
            iters, start, total_s, total_s - event_s, event_s,
            self.events_run,
        )
        return out

    def write_checkpoint(self, path: str, iteration: int) -> None:
        """Guided variant of the checkpoint hook: persists the pseudo pool,
        trajectory pool, and RNG streams next to the GaussianState. The
        per-step path lacks the device pool — fall back to the plain state
        checkpoint there (resume then rebuilds pools like the reference
        restarts would, but with exact gaussians+Adam).

        Note: with pipeline_guidance on, flushing the in-flight event here
        materializes it one boundary early, so a checkpointed run's sample
        stream diverges from the same run without --checkpoint_iterations
        (resume-vs-checkpointed remains bit-exact — that is the invariant
        the roundtrip test asserts)."""
        # flush the in-flight event first so the pseudo pool in the
        # checkpoint reflects everything generated up to this iteration
        if self._pending_event is not None:
            self.finalize_diffusion_event(self._pending_event)
            self._pending_event = None
        if getattr(self, "_pool_gts", None) is None:
            super().write_checkpoint(path, iteration)
            return
        from guidedvd3dgs_tpu.train.guided_checkpoint import save_guided_checkpoint

        save_guided_checkpoint(path, self, iteration)
        print(f"[ITER {iteration}] saved guided checkpoint {path}")

    def train_scan(
        self,
        iterations=None,
        log_every=100,
        test_iterations=(),
        saving_iterations=(),
        checkpoint_iterations=(),
        checkpoint_dir=None,
        start_iteration=0,
        alltime_cap=256,
        nan_debug=False,  # baseline-only; accepted for CLI symmetry
    ):
        """Chunked guided trainer: identical per-step semantics to `step`,
        but every span between schedule events (densify, opacity reset,
        diffusion events, eval/save) runs as ONE device dispatch via
        make_guided_steps_chunk. Pseudo-GT frames are uploaded once per
        diffusion event into the device pool; per-chunk traffic is O(K)
        scalars. Built for remotely-attached TPUs where per-step dispatch
        costs ~0.25 s against ~15 ms of compute."""
        import time

        opt = self.opt
        iterations = iterations or opt.iterations
        rcs, gts, n_cams = self._stacked_train_cams()
        if getattr(self, "_pool_gts", None) is None:
            self._init_pseudo_pool(alltime_cap)
        chunk_fn = make_guided_steps_chunk(
            self.vgg_loss_fn, getattr(opt, "pseudo_cam_lpips_weight", 0.1)
        )
        t0 = time.time()
        chunk_s = 0.0  # device-dispatch (+ metric readback) seconds
        event_s = 0.0  # diffusion-event seconds (renders, engine, artifacts)

        # diffusion events fire after step it when (it-1) % vd == 0
        # (reference train_guidedvd.py:431), gated by end_sample_pseudo
        event_its = {
            it for it in range(1, iterations + 1)
            if (it - 1) % opt.guidance_vd_iter == 0
            and it < opt.end_sample_pseudo
        }
        stops = set()
        stops.update(range(0, iterations + 1, opt.densification_interval))
        stops.update(range(0, iterations + 1, opt.opacity_reset_interval))
        stops.update(event_its)
        stops.update(int(x) for x in test_iterations)
        stops.update(int(x) for x in saving_iterations)
        stops.update(int(x) for x in checkpoint_iterations)
        stops.add(iterations)
        bounds = sorted(x for x in stops if start_iteration < x <= iterations)

        it0 = start_iteration
        for it1 in bounds:
            its = np.arange(it0 + 1, it1 + 1)
            k = len(its)
            cam_idx = np.asarray(
                [self._next_cam_idx() for _ in range(k)], np.int32
            )
            pseudo_idx = np.zeros(k, np.int32)
            pseudo_w = np.zeros(k, np.float32)
            has_p = np.zeros(k, bool)
            for j, it in enumerate(its):
                pcam = self._pick_pseudo(int(it))
                if pcam is not None and pcam.pool_slot >= 0:
                    pseudo_idx[j] = pcam.pool_slot
                    pseudo_w[j] = self._pseudo_weight(int(it))
                    has_p[j] = True
            xyz_lrs = np.asarray([self.xyz_sched(i - 1) for i in its], np.float32)
            do_densify = (
                (its < opt.densify_until_iter)
                & (its > opt.densify_from_iter)
                & (its % opt.densification_interval == 0)
            )
            apply_adam = (its < iterations) & ~do_densify
            update_stats = its < opt.densify_until_iter
            with_pseudo = bool(has_p.any())

            # pad every chunk to a bucketed length with no-op steps
            # (adam/stats/pseudo all masked off): diffusion-event boundaries
            # sit at 260k+1 while densify sits at 100k, so raw span lengths
            # take ~11 distinct values — each a separate XLA compile of the
            # scan. Buckets cut that to 4 per variant; a padded step renders
            # cam 0 and discards the result (~ms) vs minutes per compile
            # through the remote-TPU tunnel.
            B = next((b for b in (1, 25, 50, 100) if b >= k),
                     -(-k // 100) * 100)
            pad = B - k
            if pad:
                z = lambda a, v: np.concatenate(
                    [a, np.full(pad, v, a.dtype)])
                cam_idx = z(cam_idx, 0)
                pseudo_idx = z(pseudo_idx, 0)
                pseudo_w = z(pseudo_w, 0.0)
                has_p = z(has_p, False)
                xyz_lrs = z(xyz_lrs, 0.0)
                apply_adam = z(np.asarray(apply_adam), False)
                update_stats = z(np.asarray(update_stats), False)

            tc = time.time()
            self.state, metrics = chunk_fn(
                self.state, rcs, gts,
                self._pool_rcs if with_pseudo else None,
                self._pool_gts if with_pseudo else None,
                jnp.asarray(cam_idx), jnp.asarray(pseudo_idx),
                jnp.asarray(pseudo_w), jnp.asarray(has_p),
                jnp.asarray(xyz_lrs), jnp.asarray(apply_adam),
                jnp.asarray(update_stats),
                self.bg, lrs_for(opt, 0.0),
                sh_degree=self.active_sh_degree,
                lambda_dssim=opt.lambda_dssim,
                use_confidence=getattr(self.pipe, "use_confidence", False),
                backend=self.backend,
                pseudo_ssim=getattr(opt, "pseudo_cam_ssim", False),
                max_instances=self.max_instances,
                with_pseudo=with_pseudo,
            )
            m = {key: np.asarray(v)[:k] for key, v in metrics.items()}
            chunk_s += time.time() - tc
            metrics = {
                "loss": m["loss"][-1], "l1": m["l1"][-1],
                "pseudo_l1": m["pseudo_l1"][-1], "psnr": m["psnr"][-1],
                "loss_mean": m["loss"].mean(),
                "overflow": m["overflow"].max(),
                "num_instances": m["num_instances"].max(),
            }
            self.check_overflow(metrics, it1)
            self.xyz_lr = self.xyz_sched(it1)

            if (
                it1 < opt.densify_until_iter
                and it1 > opt.densify_from_iter
                and it1 % opt.densification_interval == 0
            ):
                cfg = densify_cfg(opt, self.scene.cameras_extent, it1)
                self.state = densify_and_prune_jit(
                    self.state, jax.random.key(it1), cfg
                )
                self.maybe_grow()
            if it1 % opt.opacity_reset_interval == 0:
                self.state = reset_opacity_jit(self.state)

            if it1 in event_its:
                te = time.time()
                if self.pipeline_guidance:
                    if self._pending_event is not None:
                        self.finalize_diffusion_event(self._pending_event)
                        self._pending_event = None
                    self._pending_event = self.submit_diffusion_event(it1)
                else:
                    self.run_diffusion_event(it1)
                event_s += time.time() - te

            self.ema_loss = float(metrics["loss_mean"])
            if log_every and it1 % log_every == 0:
                rate = (it1 - start_iteration) / (time.time() - t0)
                other_s = (time.time() - t0) - chunk_s - event_s
                print(
                    f"[{it1}/{iterations}] loss={float(metrics['loss']):.5f} "
                    f"psnr={float(metrics['psnr']):.2f} "
                    f"n={int(self.state.num_active())} {rate:.1f} it/s "
                    f"(chunk {chunk_s:.0f}s event {event_s:.0f}s "
                    f"other {other_s:.0f}s)",
                    flush=True,
                )
                if self.logger is not None:
                    self.logger.scalars(
                        it1,
                        {
                            "loss": float(metrics["loss"]),
                            "l1": float(metrics["l1"]),
                            "pseudo_l1": float(metrics["pseudo_l1"]),
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

        if self._pending_event is not None:
            self.finalize_diffusion_event(self._pending_event)
            self._pending_event = None
        self._write_timing_summary(
            iterations, start_iteration, time.time() - t0, chunk_s, event_s,
            len(event_its),
        )
        return self.state

    def _write_timing_summary(self, iterations, start_iteration, total_s,
                              chunk_s, event_s, n_events):
        """Persist the measured phase split for wall-clock projection
        (tools/project_wallclock.py) against the reference's 3-4 h/scene on
        2x V100 (reference README.md Quick Start)."""
        # settle outstanding async artifact encodes first: their wall-clock
        # belongs inside total_s, and a failed write must surface here, not
        # silently at interpreter exit
        from guidedvd3dgs_tpu.utils.video import artifact_writer

        artifact_writer.drain()
        mp = getattr(self.model_params, "model_path", "") or ""
        if not mp:
            return
        import json
        import os

        iters = iterations - start_iteration
        summary = {
            "iterations": iters,
            "total_s": round(total_s, 1),
            "chunk_s": round(chunk_s, 1),
            "event_s": round(event_s, 1),
            "other_s": round(total_s - chunk_s - event_s, 1),
            "events_run": self.events_run,
            "events_scheduled": n_events,
            "it_per_s": round(iters / max(total_s, 1e-9), 3),
            "train_res": [self.H, self.W],
            "event_phase_s": {
                k: round(v, 1)
                for k, v in getattr(self, "event_phase_s", {}).items()
            },
            "engine": type(self.engine).__name__,
        }
        with open(os.path.join(mp, "timing_summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
