"""Fused Pallas preprocess kernels (forward + hand-wired VJP twin).

The pure-XLA preprocess (`ops/projection.py::preprocess_gaussians`,
reference math: cuda_rasterizer/forward.cu:74-113,156-262 and
backward.cu:603-669) costs ~6.3 ms fwd / +4.2 ms VJP at 1M Gaussians for
~0.3 GFLOP and ~300 MB of true traffic: compiled-HLO cost analysis shows
XLA materializing ~2 GB of intermediates/relayouts across 5 fusions
(docs/PERF_NOTES.md "preprocess mystery"). These kernels stream each
Gaussian block through VMEM exactly once:

  forward : (3/3/4/1/3K, N) transposed parameter rows -> one (16, N) table
            (rows 0-9 = tiling F_* render fields, 10 radius, 11 visible,
            12/13 ext_x/ext_y) — the exact layout ops/tiling.py feeds the
            expansion kernel, so the XLA-side "table build" stack
            disappears with it.
  backward: the SAME row math, differentiated IN-KERNEL with jax.vjp on
            (1, BLK) rows (`projection.preprocess_field_rows` is traced
            inside the kernel body), consuming the 10 field-cotangent rows
            the instance-gradient reduction already produces — no
            linearization residuals ever touch HBM.

Both kernels share `preprocess_field_rows` with the XLA path, so parity is
structural, not re-derived. Camera scalars ride one (1, 128) VMEM constant
row (V, P row-major, campos, tanfovs, active_degree).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from guidedvd3dgs_tpu.ops.projection import preprocess_field_rows

# 1024 = 8 sublanes x 128 lanes: the kernels reshape every (1, BLKN) row to
# (8, BLKN // 8) before the field math — elementwise row ops on (1, n)
# shapes occupy a single VPU sublane (measured 4.98/7.35 ms fwd/bwd at 1M;
# 8x lane-density is the fix), and 128 lanes keeps the tiles full.
BLKN = int(_os.environ.get("GVD_PREPROC_BLK", "1024"))

_INTERPRET = [False]


def set_interpret(flag: bool):
    _INTERPRET[0] = flag


def _cam_consts(cam, active_degree) -> jnp.ndarray:
    """(1, 128) f32 camera-constant row: [V(16), P(16), campos(3),
    tanfovx, tanfovy, active_degree, pad...]."""
    act = jnp.float32(3.0) if active_degree is None else active_degree
    vals = jnp.concatenate(
        [
            jnp.asarray(cam.viewmatrix, jnp.float32).reshape(-1),
            jnp.asarray(cam.projmatrix, jnp.float32).reshape(-1),
            jnp.asarray(cam.campos, jnp.float32).reshape(-1),
            jnp.reshape(jnp.asarray(cam.tanfovx, jnp.float32), (1,)),
            jnp.reshape(jnp.asarray(cam.tanfovy, jnp.float32), (1,)),
            jnp.reshape(jnp.asarray(act, jnp.float32), (1,)),
        ]
    )
    return jnp.pad(vals, (0, 128 - vals.shape[0]))[None, :]


def _unpack_cam(cam_ref):
    c = cam_ref[...]

    def cs(i):
        return c[0:1, i : i + 1]

    V = tuple(tuple(cs(4 * r + k) for k in range(4)) for r in range(4))
    Pm = tuple(tuple(cs(16 + 4 * r + k) for k in range(4)) for r in range(4))
    campos = (cs(32), cs(33), cs(34))
    return V, Pm, campos, cs(35), cs(36), cs(37)


def _rows(ref, k):
    """k rows of a (k, BLK) block, each reshaped (1, BLK) -> (8, BLK // 8)
    so the elementwise field math fills all VPU sublanes (see BLKN note)."""
    x = ref[...]
    blk = x.shape[1]
    return tuple(x[i : i + 1, :].reshape(8, blk // 8) for i in range(k))


def _flat(rows):
    """Inverse of the _rows reshape: each (8, BLK // 8) -> (1, BLK)."""
    return [r.reshape(1, r.shape[0] * r.shape[1]) for r in rows]


def _sh48(sh_rows, n_coef):
    return [
        (sh_rows[3 * k], sh_rows[3 * k + 1], sh_rows[3 * k + 2])
        for k in range(n_coef)
    ]


def _fwd_kernel(
    mean_ref, scale_ref, rot_ref, op_ref, sh_ref, cam_ref, out_ref,
    *, sh_degree: int, scale_modifier: float, width: int, height: int,
):
    V, Pm, campos, tfx, tfy, act = _unpack_cam(cam_ref)
    n_coef = (sh_degree + 1) ** 2
    blk = out_ref.shape[1]
    fields10, radius, visible, ext_x, ext_y = preprocess_field_rows(
        _rows(mean_ref, 3), _rows(scale_ref, 3), _rows(rot_ref, 4),
        op_ref[...][0:1, :].reshape(8, blk // 8),
        _sh48(_rows(sh_ref, 3 * n_coef), n_coef),
        V, Pm, campos, tfx, tfy, width, height, sh_degree, scale_modifier,
        active_degree=act,
    )
    out_ref[...] = jnp.concatenate(
        _flat(list(fields10))
        + _flat([radius, visible.astype(jnp.float32), ext_x, ext_y])
        + [jnp.zeros((2, blk), jnp.float32)],
        axis=0,
    )


def _bwd_kernel(
    mean_ref, scale_ref, rot_ref, op_ref, sh_ref, cam_ref, cot_ref,
    dmean_ref, dscale_ref, drot_ref, dop_ref, dsh_ref,
    *, sh_degree: int, scale_modifier: float, width: int, height: int,
):
    V, Pm, campos, tfx, tfy, act = _unpack_cam(cam_ref)
    n_coef = (sh_degree + 1) ** 2
    blk = dmean_ref.shape[1]

    def f(m_t, s_t, q_t, op_row, sh_rows):
        fields10, *_ = preprocess_field_rows(
            m_t, s_t, q_t, op_row, _sh48(sh_rows, n_coef),
            V, Pm, campos, tfx, tfy, width, height, sh_degree, scale_modifier,
            active_degree=act,
        )
        return fields10

    primals = (
        _rows(mean_ref, 3), _rows(scale_ref, 3), _rows(rot_ref, 4),
        op_ref[...][0:1, :].reshape(8, blk // 8), _rows(sh_ref, 3 * n_coef),
    )
    _, vjp = jax.vjp(f, *primals)
    cot = cot_ref[...]
    g_m, g_s, g_q, g_op, g_sh = vjp(
        tuple(cot[i : i + 1, :].reshape(8, blk // 8) for i in range(10))
    )
    dmean_ref[...] = jnp.concatenate(_flat(g_m), axis=0)
    dscale_ref[...] = jnp.concatenate(_flat(g_s), axis=0)
    drot_ref[...] = jnp.concatenate(_flat(g_q), axis=0)
    dop_ref[...] = _flat([g_op])[0]
    dsh_ref[...] = jnp.concatenate(_flat(g_sh), axis=0)


def _transpose_inputs(means3d, scales, rotations, opacities, shs, sh_degree):
    n = means3d.shape[0]
    n_coef = (sh_degree + 1) ** 2
    mT = means3d.T
    sT = scales.T
    qT = rotations.T
    opT = jnp.reshape(opacities, (1, n))
    shT = shs.reshape(n, shs.shape[-2] * 3)[:, : 3 * n_coef].T  # (3K, N)
    return mT, sT, qT, opT, shT


def _pad_lane(x, npad):
    n = x.shape[1]
    if n == npad:
        return x
    return jnp.pad(x, ((0, 0), (0, npad - n)))


def preprocess_fused_fwd(
    means3d, scales, rotations, opacities, shs, cam,
    sh_degree: int, scale_modifier: float, active_degree=None,
):
    """Returns the (16, N) preprocess table (rows: 10 F_* fields, radius,
    visible flag, ext_x, ext_y, 2 spare)."""
    n = means3d.shape[0]
    npad = -(-n // BLKN) * BLKN
    mT, sT, qT, opT, shT = _transpose_inputs(
        means3d, scales, rotations, opacities, shs, sh_degree
    )
    args = [_pad_lane(x, npad) for x in (mT, sT, qT, opT, shT)]
    camc = _cam_consts(cam, active_degree)
    kr = 3 * (sh_degree + 1) ** 2
    kernel = functools.partial(
        _fwd_kernel, sh_degree=sh_degree, scale_modifier=float(scale_modifier),
        width=cam.width, height=cam.height,
    )
    out = pl.pallas_call(
        kernel,
        grid=(npad // BLKN,),
        in_specs=[
            pl.BlockSpec((3, BLKN), lambda i: (0, i)),
            pl.BlockSpec((3, BLKN), lambda i: (0, i)),
            pl.BlockSpec((4, BLKN), lambda i: (0, i)),
            pl.BlockSpec((1, BLKN), lambda i: (0, i)),
            pl.BlockSpec((kr, BLKN), lambda i: (0, i)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((16, BLKN), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, npad), jnp.float32),
        interpret=_INTERPRET[0],
    )(*args, camc)
    return out[:, :n]


def preprocess_fused_bwd(
    means3d, scales, rotations, opacities, shs, cam,
    sh_degree: int, scale_modifier: float, cot10, active_degree=None,
):
    """VJP twin: cot10 is the (>=10, N) field-cotangent rows in F_* order
    (rows past 10 ignored). Returns grads shaped like the inputs."""
    n = means3d.shape[0]
    npad = -(-n // BLKN) * BLKN
    mT, sT, qT, opT, shT = _transpose_inputs(
        means3d, scales, rotations, opacities, shs, sh_degree
    )
    cot = cot10[:10]
    m_args = [_pad_lane(x, npad) for x in (mT, sT, qT, opT, shT)]
    cot_p = _pad_lane(cot, npad)
    camc = _cam_consts(cam, active_degree)
    kr = 3 * (sh_degree + 1) ** 2
    kernel = functools.partial(
        _bwd_kernel, sh_degree=sh_degree, scale_modifier=float(scale_modifier),
        width=cam.width, height=cam.height,
    )
    blk = lambda k: pl.BlockSpec((k, BLKN), lambda i: (0, i))
    g_m, g_s, g_q, g_op, g_sh = pl.pallas_call(
        kernel,
        grid=(npad // BLKN,),
        in_specs=[
            blk(3), blk(3), blk(4), blk(1), blk(kr),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
            blk(10),
        ],
        out_specs=[blk(3), blk(3), blk(4), blk(1), blk(kr)],
        out_shape=[
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
            jax.ShapeDtypeStruct((3, npad), jnp.float32),
            jax.ShapeDtypeStruct((4, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((kr, npad), jnp.float32),
        ],
        interpret=_INTERPRET[0],
    )(*m_args, camc, cot_p)
    d_means = g_m[:, :n].T
    d_scales = g_s[:, :n].T
    d_rots = g_q[:, :n].T
    d_opac = jnp.reshape(g_op[0, :n], jnp.shape(opacities))
    k_tot = shs.shape[-2]
    d_sh_flat = g_sh[:, :n].T  # (N, 3K)
    kr_used = d_sh_flat.shape[1]
    if 3 * k_tot > kr_used:
        d_sh_flat = jnp.pad(d_sh_flat, ((0, 0), (0, 3 * k_tot - kr_used)))
    d_shs = d_sh_flat.reshape(shs.shape)
    return d_means, d_scales, d_rots, d_opac, d_shs
