"""Fixed-capacity Gaussian model state + masked Adam + densification (L3).

TPU-native redesign of the reference `GaussianModel`
(reference: scene/gaussian_model.py). Instead of dynamically-sized parameter
tensors with torch-Adam "optimizer surgery"
(reference: gaussian_model.py:296-394), the whole model is ONE pytree with a
static capacity C and an `active` mask, kept compacted to a prefix. Adam
moments are arrays in the same pytree, so densify/clone/split/prune/reset
become jitted mask-and-scatter ops with donated buffers — no dynamic shapes
under jit, no surgery, no atomics.

Semantics parity notes (vs reference scene/gaussian_model.py):
  * Adam: per-group LRs, eps=1e-15, shared step count (torch keeps per-tensor
    step across surgery; appended rows get zero moments) — `adam_step`.
  * densify_and_prune ordering: clone -> split (internally prunes split
    sources) -> proximity (iter<2000) -> opacity/size prune -> stats zeroed
    (densification_postfix re-zeroes accum/denom/max_radii every call).
  * prune gated by `iter > prune_from_iter` (reference :349-365).
  * reset_opacity clamps to 0.05 and zeroes the opacity Adam moments
    (replace_tensor_to_optimizer; reference :241-245, :296-317).
  * proximity(): reference pairs sources/NNs through a flattening bug
    (`repeat(1,N,1)` tiles instead of interleaving, :425-427); we implement
    the intended pairing (each selected point with its own 3 NNs).
  * add_points(): reference uses an all-zero quaternion that its unnormalized
    CUDA path treats as identity; we use the explicit identity quaternion.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from guidedvd3dgs_tpu.ops.knn import dist_knn3
from guidedvd3dgs_tpu.utils.general import build_rotation, inverse_sigmoid
from guidedvd3dgs_tpu.utils.sh import RGB2SH

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15


class GaussianParams(NamedTuple):
    """Raw (pre-activation) parameters, capacity-padded."""

    xyz: jnp.ndarray  # (C, 3)
    features_dc: jnp.ndarray  # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, R, 3)
    scaling: jnp.ndarray  # (C, 3) log-scale
    rotation: jnp.ndarray  # (C, 4) unnormalized quaternion (w,x,y,z)
    opacity: jnp.ndarray  # (C, 1) logit


class GaussianState(NamedTuple):
    params: GaussianParams
    adam_m: GaussianParams
    adam_v: GaussianParams
    step: jnp.ndarray  # () int32 shared Adam step
    active: jnp.ndarray  # (C,) bool — compacted prefix
    confidence: jnp.ndarray  # (C, 1)
    max_radii2d: jnp.ndarray  # (C,) float32
    xyz_gradient_accum: jnp.ndarray  # (C, 1)
    denom: jnp.ndarray  # (C, 1)

    @property
    def capacity(self) -> int:
        return self.active.shape[0]

    def num_active(self) -> jnp.ndarray:
        return self.active.sum()


# ----------------------------------------------------------------------------
# activations (reference: gaussian_model.py:105-134)
# ----------------------------------------------------------------------------


def get_scaling(p: GaussianParams) -> jnp.ndarray:
    return jnp.exp(p.scaling)


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    n = jnp.linalg.norm(p.rotation, axis=-1, keepdims=True)
    return p.rotation / jnp.maximum(n, 1e-12)


def get_opacity(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity)


def get_features(p: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)  # (C, 1+R, 3)


# ----------------------------------------------------------------------------
# construction
# ----------------------------------------------------------------------------


def default_capacity(n: int) -> int:
    cap = 1 << max(10, int(np.ceil(np.log2(max(n, 1) * 4))))
    return cap


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int = 0,
    max_sh_degree: int = 3,
    use_color: bool = True,
) -> GaussianState:
    """Initialize from a point cloud (reference: gaussian_model.py:142-171):
    SH DC from RGB, log-scale = log sqrt(mean 3NN dist^2), opacity 0.1,
    identity rotation, confidence 1."""
    n = points.shape[0]
    cap = capacity or default_capacity(n)
    assert cap >= n, f"capacity {cap} < init points {n}"
    rest = (max_sh_degree + 1) ** 2 - 1

    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = points
    fdc = np.zeros((cap, 1, 3), np.float32)
    if use_color:
        fdc[:n, 0] = RGB2SH(colors.astype(np.float32))
    frest = np.zeros((cap, rest, 3), np.float32)
    rot = np.zeros((cap, 4), np.float32)
    rot[:, 0] = 1.0
    opac = np.full((cap, 1), float(inverse_sigmoid(jnp.float32(0.1))), np.float32)

    active = np.zeros((cap,), bool)
    active[:n] = True

    d2, _ = dist_knn3(jnp.asarray(xyz), jnp.asarray(active))
    scales = 0.5 * jnp.log(jnp.maximum(d2, 1e-7))  # log sqrt(d2)
    scaling = jnp.where(active[:, None], scales[:, None], 0.0) * jnp.ones((1, 3))

    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(fdc),
        features_rest=jnp.asarray(frest),
        scaling=scaling.astype(jnp.float32),
        rotation=jnp.asarray(rot),
        opacity=jnp.asarray(opac),
    )
    zeros = jax.tree.map(jnp.zeros_like, params)
    return GaussianState(
        params=params,
        adam_m=zeros,
        adam_v=jax.tree.map(jnp.zeros_like, params),
        step=jnp.zeros((), jnp.int32),
        active=jnp.asarray(active),
        confidence=jnp.ones((cap, 1), jnp.float32),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((cap, 1), jnp.float32),
        denom=jnp.zeros((cap, 1), jnp.float32),
    )


# ----------------------------------------------------------------------------
# optimizer (reference: gaussian_model.py:174-194 + torch.optim.Adam)
# ----------------------------------------------------------------------------


class LearningRates(NamedTuple):
    xyz: jnp.ndarray  # scheduled per step
    f_dc: jnp.ndarray
    f_rest: jnp.ndarray
    opacity: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray


def adam_step(state: GaussianState, grads: GaussianParams, lrs: LearningRates) -> GaussianState:
    """Masked Adam over the whole pytree. Rows outside `active` are untouched
    (they do not exist in the reference's tensors); active rows with zero grad
    still decay their moments, matching torch."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1**t
    bc2 = 1.0 - ADAM_B2**t

    lr_map = GaussianParams(
        xyz=lrs.xyz,
        features_dc=lrs.f_dc,
        features_rest=lrs.f_rest,
        scaling=lrs.scaling,
        rotation=lrs.rotation,
        opacity=lrs.opacity,
    )

    def upd(p, g, m, v, lr):
        mask = state.active.reshape((-1,) + (1,) * (p.ndim - 1))
        m_new = jnp.where(mask, ADAM_B1 * m + (1 - ADAM_B1) * g, m)
        v_new = jnp.where(mask, ADAM_B2 * v + (1 - ADAM_B2) * g * g, v)
        update = lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + ADAM_EPS)
        p_new = jnp.where(mask, p - update, p)
        return p_new, m_new, v_new

    out = jax.tree.map(upd, state.params, grads, state.adam_m, state.adam_v, lr_map)
    params = GaussianParams(*(o[0] for o in out))
    m = GaussianParams(*(o[1] for o in out))
    v = GaussianParams(*(o[2] for o in out))
    return state._replace(params=params, adam_m=m, adam_v=v, step=step)


# ----------------------------------------------------------------------------
# densification statistics (reference: gaussian_model.py:524-544)
# ----------------------------------------------------------------------------


def add_densification_stats(
    state: GaussianState, viewspace_grad: jnp.ndarray, update_filter: jnp.ndarray
) -> GaussianState:
    gnorm = jnp.linalg.norm(viewspace_grad[:, :2], axis=-1, keepdims=True)
    f = update_filter[:, None]
    return state._replace(
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(f, gnorm, 0.0),
        denom=state.denom + f.astype(state.denom.dtype),
    )


def add_densification_stats_with_novel_pose(
    state: GaussianState,
    viewspace_grad: jnp.ndarray,
    update_filter: jnp.ndarray,
    viewspace_grad_novel: jnp.ndarray,
    update_filter_novel: jnp.ndarray,
    novel_pose_scale: float = 1.0,
) -> GaussianState:
    """Combined train + pseudo-view stats (reference: gaussian_model.py:530-544)."""
    g = viewspace_grad + viewspace_grad_novel / novel_pose_scale
    f = update_filter | update_filter_novel
    gnorm = jnp.linalg.norm(g[:, :2], axis=-1, keepdims=True)
    return state._replace(
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(f[:, None], gnorm, 0.0),
        denom=state.denom + f[:, None].astype(state.denom.dtype),
    )


def update_max_radii(
    state: GaussianState, radii: jnp.ndarray, visibility: jnp.ndarray
) -> GaussianState:
    return state._replace(
        max_radii2d=jnp.where(
            visibility, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)), state.max_radii2d
        )
    )


# ----------------------------------------------------------------------------
# append / prune machinery (fixed capacity, sort-carried permutations)
#
# TPU primitive costs at C ~ 1-2M rows (tools/profile_prims.py,
# COUNTING_SORT_STUDY.json): XLA row scatter ~1.8 ms/MB; row gather is
# SHAPE-DEPENDENT — skinny per-leaf gathers ((C,3) etc.) degrade to ~1 us
# per element, but ONE wide row gather streams (apply_gather_rows: 8.3 ms
# for 2.2M rows); a 2-operand lax.sort is ~3.4 ms. Dragging the payload
# through the sort itself (either k-operand or a batched (K, C) minor-dim
# sort) is the trap: the TPU sort is a bitonic network of ~log^2(C) passes
# and every payload row rides EVERY pass — measured 48.8 s for one append
# at C = 2^20 with ~60 payload rows (DENSIFY_PROFILE.json, pre-fix). So
# permutations here are applied as: stable argsort of (key, iota) — 2
# operands, payload-free — then ONE wide row gather of all columns packed
# into a single (C, K) f32 matrix.
# ----------------------------------------------------------------------------


def _sort_carried(key: jnp.ndarray, tree, extra_cols=()):
    """Stable-sort every (C, ...) leaf of `tree` (plus any extra (C,)
    columns) by the int32 `key`: a payload-free stable argsort of (key,
    iota) produces the permutation, which is applied as ONE row gather of
    the (C, Ktot) f32 matrix holding every column (wide gathers stream;
    see the cost note above). bool columns ride as exact 0.0/1.0; only
    f32/bool leaves are supported. Returns (sorted_tree, sorted_extras)."""
    leaves, treedef = jax.tree.flatten(tree)
    C = key.shape[0]
    idx = jnp.arange(C, dtype=jnp.int32)
    _, perm = jax.lax.sort((key, idx), dimension=0, num_keys=1, is_stable=True)
    cols = []
    for lf in list(leaves) + list(extra_cols):
        assert lf.dtype in (jnp.float32, jnp.bool_), lf.dtype
        cols.append(lf.reshape(C, -1).astype(jnp.float32))
    mat = jnp.concatenate(cols, axis=1)  # (C, Ktot)
    smat = jnp.take(mat, perm, axis=0, unique_indices=True)
    outs = []
    i = 0
    for lf in list(leaves) + list(extra_cols):
        k = int(np.prod(lf.shape[1:])) if lf.ndim > 1 else 1
        piece = smat[:, i : i + k].reshape(lf.shape)
        i += k
        outs.append(piece.astype(lf.dtype) if lf.dtype == jnp.bool_ else piece)
    n = len(leaves)
    return jax.tree.unflatten(treedef, outs[:n]), tuple(outs[n:])


def _append_rows(state: GaussianState, new: GaussianParams, sel: jnp.ndarray) -> GaussianState:
    """Place rows of `new` where `sel` into free slots after the active
    prefix. Adam moments of appended rows are zero and stats are zeroed by the
    caller — the contract of `cat_tensors_to_optimizer` +
    `densification_postfix` (reference: gaussian_model.py:368-421). Rows that
    would exceed capacity are dropped (stable index order, like the
    reference's cat-then-truncate).

    TPU note: deliberately scatter-free AND gather-free (see the section
    comment above). The placement is ONE data-carried sort of `new` keyed
    by each row's DESTINATION RANK: the r-th selected row (index order)
    gets key n_active + r, and unselected rows get the remaining ranks in
    index order — a bijection onto [0, cap) built from two cumsums, so the
    sort directly deposits selected rows into the free-slot window. (No
    roll/dynamic_slice step: a traced roll of (C, ...) data makes XLA
    materialize a CxC one-hot matrix, and a traced multi-dim dynamic_slice
    lowers to a serial per-row copy measured at ~50 s per append.) Existing
    rows never move in an append, so Adam moments and bookkeeping are plain
    masked selects."""
    cap = state.capacity
    n_active = state.active.sum()
    n_sel = sel.sum()
    slot = jnp.arange(cap)
    write = (slot >= n_active) & (slot < jnp.minimum(n_active + n_sel, cap))
    # destination-position bijection onto [0, cap): the r-th selected row
    # (index order, r < free capacity) goes to window slot n_active + r;
    # every other row (unselected + capacity-overflow selected) fills the
    # remaining positions in index order. Exact cover of [0, cap) keeps
    # sorted-position == key for the window rows under any overflow.
    n_eff = jnp.minimum(n_sel, cap - n_active)
    s_rank = jnp.cumsum(sel) - 1  # rank among selected (valid where sel)
    placed = sel & (s_rank < n_eff)
    o_rank = jnp.cumsum(~placed) - 1  # rank among the others
    dest = jnp.where(
        placed,
        n_active + s_rank,
        jnp.where(o_rank < n_active, o_rank, o_rank + n_eff),
    ).astype(jnp.int32)
    src_sorted, _ = _sort_carried(dest, new)

    def place(dst, src_s):
        w = write.reshape((-1,) + (1,) * (dst.ndim - 1))
        return jnp.where(w, src_s, dst)

    def zero_appended(dst):
        w = write.reshape((-1,) + (1,) * (dst.ndim - 1))
        return jnp.where(w, jnp.zeros((), dst.dtype), dst)

    params = jax.tree.map(place, state.params, src_sorted)
    zeros_new = jax.tree.map(zero_appended, state.adam_m)
    v_new = jax.tree.map(zero_appended, state.adam_v)
    active = state.active | write
    confidence = jnp.where(write[:, None], 1.0, state.confidence)  # (C, 1)
    return state._replace(
        params=params, adam_m=zeros_new, adam_v=v_new, active=active, confidence=confidence
    )


def _deactivate(state: GaussianState, mask: jnp.ndarray) -> GaussianState:
    return state._replace(active=state.active & ~mask)


def compact(state: GaussianState) -> GaussianState:
    """Restore the compacted-prefix invariant: permute active rows to the
    front — ONE data-carried stable sort keyed by ~active (every row array
    rides as a payload operand; see the sort-vs-gather cost note above)."""
    key = (~state.active).astype(jnp.int32)
    tree = (
        state.params, state.adam_m, state.adam_v, state.confidence,
        state.max_radii2d, state.xyz_gradient_accum, state.denom,
    )
    (params, adam_m, adam_v, confidence, max_radii2d, accum, denom), (
        active,
    ) = _sort_carried(key, tree, extra_cols=(state.active,))
    return GaussianState(
        params=params,
        adam_m=adam_m,
        adam_v=adam_v,
        step=state.step,
        active=active,
        confidence=confidence,
        max_radii2d=max_radii2d,
        xyz_gradient_accum=accum,
        denom=denom,
    )


# ----------------------------------------------------------------------------
# densify / prune (reference: gaussian_model.py:420-521)
# ----------------------------------------------------------------------------


class DensifyConfig(NamedTuple):
    grad_threshold: float
    min_opacity: float
    extent: float
    max_screen_size: float  # 0 => disabled
    percent_dense: float
    dist_thres: float
    prune_enabled: bool  # iter > prune_from_iter
    proximity_enabled: bool  # iter < 2000


def densify_and_clone(state: GaussianState, grads: jnp.ndarray, cfg: DensifyConfig) -> GaussianState:
    gnorm = grads[:, 0]
    sel = (
        state.active
        & (gnorm >= cfg.grad_threshold)
        & (get_scaling(state.params).max(-1) <= cfg.percent_dense * cfg.extent)
    )
    return _append_rows(state, state.params, sel)


def densify_and_split(
    state: GaussianState, grads: jnp.ndarray, key: jax.Array, cfg: DensifyConfig, n_split: int = 2
) -> GaussianState:
    scal = get_scaling(state.params)
    max_scale = scal.max(-1)
    sel = state.active & (grads[:, 0] >= cfg.grad_threshold) & (
        max_scale > cfg.percent_dense * cfg.extent
    )
    # extra isolation criterion (reference :450-453): mean 3NN dist^2 large
    # AND the Gaussian itself large
    d2, _ = dist_knn3(state.params.xyz, state.active)
    sel2 = state.active & (d2 > cfg.dist_thres * cfg.extent) & (max_scale > cfg.extent)
    sel = sel | sel2

    rot_mats = build_rotation(get_rotation(state.params))  # (C,3,3)
    new_scaling = jnp.log(scal / (0.8 * n_split))

    st = state
    for i in range(n_split):
        noise = jax.random.normal(jax.random.fold_in(key, i), scal.shape) * scal
        offset = jnp.einsum("nij,nj->ni", rot_mats, noise)
        new = state.params._replace(
            xyz=state.params.xyz + offset,
            scaling=new_scaling,
        )
        st = _append_rows(st, new, sel)
    if cfg.prune_enabled:
        st = _deactivate(st, sel)
    return st


def proximity(state: GaussianState, cfg: DensifyConfig) -> GaussianState:
    """Insert midpoints toward the 3 NNs of isolated large Gaussians
    (reference: gaussian_model.py:420-435; see parity note in module
    docstring about the reference's pairing bug)."""
    d2, nn_idx = dist_knn3(state.params.xyz, state.active)
    sel = (
        state.active
        & (d2 > 5.0 * cfg.extent)
        & (get_scaling(state.params).max(-1) > cfg.extent)
    )
    st = state
    p = state.params
    identity_rot = jnp.zeros_like(p.rotation).at[:, 0].set(1.0)
    for k in range(3):
        nk = nn_idx[:, k]
        new = GaussianParams(
            xyz=(p.xyz + p.xyz[nk]) / 2.0,
            features_dc=jnp.zeros_like(p.features_dc),
            features_rest=jnp.zeros_like(p.features_rest),
            scaling=p.scaling[nk],
            rotation=identity_rot,
            opacity=p.opacity[nk],
        )
        st = _append_rows(st, new, sel)
    return st


def densify_and_prune(
    state: GaussianState, key: jax.Array, cfg: DensifyConfig
) -> GaussianState:
    """Full densification event (reference: gaussian_model.py:493-521),
    jittable; returns a compacted state with stats zeroed."""
    grads = state.xyz_gradient_accum / jnp.maximum(state.denom, 1e-12)
    grads = jnp.where(state.denom > 0, grads, 0.0)
    grads = jnp.nan_to_num(grads)

    state = densify_and_clone(state, grads, cfg)
    # fresh clones have zero grads; pad grads to capacity semantics
    state = densify_and_split(state, jnp.pad(grads, ((0, 0), (0, 0))), key, cfg)
    if cfg.proximity_enabled:
        # split just deactivated its source rows, so `active` has holes —
        # restore the compacted-prefix invariant _append_rows relies on
        # (without this, proximity's appends land on slots still occupied
        # by the tail of split's children and silently overwrite them; the
        # reference never hits this because its torch arrays physically
        # shrink on prune, gaussian_model.py:368-421)
        if cfg.prune_enabled:
            state = compact(state)
        state = proximity(state, cfg)

    prune_mask = state.active & (get_opacity(state.params)[:, 0] < cfg.min_opacity)
    if cfg.max_screen_size > 0:
        big_vs = state.max_radii2d > cfg.max_screen_size
        big_ws = get_scaling(state.params).max(-1) > 0.1 * cfg.extent
        prune_mask = prune_mask | (state.active & (big_vs | big_ws))
    if cfg.prune_enabled:
        state = _deactivate(state, prune_mask)

    # densification_postfix zeroes stats for everything
    state = state._replace(
        xyz_gradient_accum=jnp.zeros_like(state.xyz_gradient_accum),
        denom=jnp.zeros_like(state.denom),
        max_radii2d=jnp.zeros_like(state.max_radii2d),
    )
    return compact(state)


def prune_only(state: GaussianState, cfg: DensifyConfig) -> GaussianState:
    """Standalone prune (reference: gaussian_model.py:512-521)."""
    prune_mask = state.active & (get_opacity(state.params)[:, 0] < cfg.min_opacity)
    if cfg.max_screen_size > 0:
        big_vs = state.max_radii2d > cfg.max_screen_size
        big_ws = get_scaling(state.params).max(-1) > 0.1 * cfg.extent
        prune_mask = prune_mask | (state.active & (big_vs | big_ws))
    if cfg.prune_enabled:
        state = _deactivate(state, prune_mask)
    return compact(state)


def reset_opacity(state: GaussianState) -> GaussianState:
    """Clamp opacity to <=0.05 and zero its Adam moments
    (reference: gaussian_model.py:241-245 + replace_tensor_to_optimizer)."""
    new_op = inverse_sigmoid(jnp.minimum(get_opacity(state.params), 0.05))
    return state._replace(
        params=state.params._replace(opacity=jnp.where(state.active[:, None], new_op, state.params.opacity)),
        adam_m=state.adam_m._replace(opacity=jnp.zeros_like(state.adam_m.opacity)),
        adam_v=state.adam_v._replace(opacity=jnp.zeros_like(state.adam_v.opacity)),
    )


def add_points(state: GaussianState, new_pts: np.ndarray, new_rgbs: np.ndarray) -> GaussianState:
    """Append diffusion-lifted points (reference: gaussian_model.py:547-567).
    Host-side helper (runs between training steps)."""
    n = new_pts.shape[0]
    cap = state.capacity
    pts = jnp.asarray(new_pts, jnp.float32)
    d2, _ = dist_knn3(pts)
    scaling = jnp.broadcast_to(0.5 * jnp.log(jnp.maximum(d2, 1e-7))[:, None], (n, 3))

    pad = cap - n
    if pad < 0:
        pts, scaling = pts[:cap], scaling[:cap]
        new_rgbs = new_rgbs[:cap]
        n, pad = cap, 0

    def padded(x, fill=0.0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)

    rot = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    new = GaussianParams(
        xyz=padded(pts),
        features_dc=padded(jnp.asarray(new_rgbs, jnp.float32)[:, None, :]),
        features_rest=padded(jnp.zeros((n, state.params.features_rest.shape[1], 3))),
        scaling=padded(scaling),
        rotation=padded(rot),
        opacity=padded(jnp.full((n, 1), float(inverse_sigmoid(jnp.float32(0.1))))),
    )
    sel = jnp.arange(cap) < n
    st = _append_rows(state, new, sel)
    st = st._replace(
        xyz_gradient_accum=jnp.zeros_like(st.xyz_gradient_accum),
        denom=jnp.zeros_like(st.denom),
        max_radii2d=jnp.zeros_like(st.max_radii2d),
    )
    return compact(st)


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side reallocation when the active count nears capacity (triggers
    one recompile of jitted consumers)."""
    cap = state.capacity
    extra = new_capacity - cap
    assert extra > 0

    def pad(x, fill=0.0):
        return jnp.pad(x, ((0, extra),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)

    pad_tree = lambda t: jax.tree.map(pad, t)
    rot_fix = pad(state.params.rotation)
    rot_fix = rot_fix.at[cap:, 0].set(1.0)
    return GaussianState(
        params=pad_tree(state.params)._replace(rotation=rot_fix),
        adam_m=pad_tree(state.adam_m),
        adam_v=pad_tree(state.adam_v),
        step=state.step,
        active=jnp.pad(state.active, (0, extra), constant_values=False),
        confidence=pad(state.confidence),
        max_radii2d=pad(state.max_radii2d),
        xyz_gradient_accum=pad(state.xyz_gradient_accum),
        denom=pad(state.denom),
    )
