"""Exact checkpoint/resume for the guided trainer.

The reference cannot resume a guided run at all: train_guidedvd.py never
wires --start_checkpoint, and its pseudo stacks / trajectory pool / RNG
streams live only in process memory (reference train_guidedvd.py:343-416,
615-634). A preempted 3-4 h run restarts from scratch. Here the full guided
state is persisted next to the GaussianState checkpoint so a resumed run
continues the identical sample stream:

  * GaussianState + iteration      -> <path>            (train/checkpoint.py)
  * guided extras                  -> <path>.guided.npz (this module)

Extras: the device pseudo-GT pool (f32), per-pseudo-camera metadata +
binary masks (packed uint8), the trajectory pool and its remaining-shuffle
order, the view-epoch order, both numpy RNG streams (bit-generator states)
and the JAX key, event counters, and the demand-adaptive instance capacity.
No pickle anywhere: arrays + one JSON sidecar string inside the npz.
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp


def _rng_state_json(gen: np.random.Generator) -> str:
    return json.dumps(gen.bit_generator.state)


def _restore_rng(state_json: str) -> np.random.Generator:
    st = json.loads(state_json)
    gen = np.random.default_rng()
    # reconstruct the exact bit-generator type before loading its state
    bg_name = st["bit_generator"]
    if type(gen.bit_generator).__name__ != bg_name:
        import numpy.random as npr

        gen = np.random.Generator(getattr(npr, bg_name)())
    gen.bit_generator.state = st
    return gen


def _cams_meta(cams) -> dict:
    n = len(cams)
    meta = {
        "R": np.stack([np.asarray(c.R) for c in cams]) if n else np.zeros((0, 3, 3)),
        "T": np.stack([np.asarray(c.T) for c in cams]) if n else np.zeros((0, 3)),
        "fovx": np.asarray([c.FoVx for c in cams], np.float64),
        "fovy": np.asarray([c.FoVy for c in cams], np.float64),
        "slot": np.asarray([c.pool_slot for c in cams], np.int32),
        "mask": (
            np.packbits(
                np.stack([np.asarray(c.mask) for c in cams]).astype(bool), axis=None
            )
            if n
            else np.zeros((0,), np.uint8)
        ),
        "mask_shape": np.asarray(
            [n, *(np.asarray(cams[0].mask).shape if n else (1, 1, 1))], np.int64
        ),
    }
    return meta


def save_guided_checkpoint(path: str, trainer, iteration: int) -> None:
    """Write <path> (GaussianState) and <path>.guided.npz (everything else).

    Requires the device pseudo pool (the chunked trainer's default): per-
    camera pseudo-GT content is NOT duplicated — it is reconstructed from the
    pool at load time via each camera's pool slot."""
    from guidedvd3dgs_tpu.train.checkpoint import save_checkpoint

    if getattr(trainer, "_pool_gts", None) is None:
        raise RuntimeError(
            "guided checkpoint requires the device pseudo pool "
            "(GuidedTrainer.train initializes it; call _init_pseudo_pool first)"
        )
    save_checkpoint(path, trainer.state, iteration)

    arrays: dict = {
        "pool_gts": np.asarray(trainer._pool_gts),
        "alltime_free": np.asarray(sorted(trainer._alltime_free), np.int32),
        "vd_indices": np.asarray(trainer.vd_indices, np.int32),
        "jrng": np.asarray(jax.random.key_data(trainer.jrng)),
        "max_instances": np.asarray(trainer.max_instances, np.int64),
    }
    for name, cams in (
        ("cur", trainer.pseudo_stack),
        ("alltime", trainer.pseudo_stack_alltime),
    ):
        for k, v in _cams_meta(cams).items():
            arrays[f"{name}/{k}"] = v

    # trajectory pool: arrays per (view, entry); shuffle order as indices
    pool_index = []
    for view, entries in trainer.trajectory_pool.items():
        for i, e in enumerate(entries):
            arrays[f"traj/{view}/{i}/traj_c2ws"] = np.asarray(e.traj_c2ws)
            arrays[f"traj/{view}/{i}/obj_c2w"] = np.asarray(e.obj_c2w)
            arrays[f"traj/{view}/{i}/transform_back"] = np.asarray(e.transform_back)
            pool_index.append(
                {
                    "view": int(view),
                    "i": i,
                    "cand_idx": int(e.cand_idx),
                    "center_scale": float(e.center_scale),
                    "scale_idx": int(e.scale_idx),
                }
            )
    shuffle = {}
    for view, remaining in trainer.trajectory_pool_shuffle.items():
        if view not in trainer.trajectory_pool:
            continue
        # identity match: TrajEntry is a dataclass of ndarrays, so == (and
        # hence list.index) is ambiguous
        ids = {id(x): i for i, x in enumerate(trainer.trajectory_pool[view])}
        shuffle[int(view)] = [ids[id(e)] for e in remaining]
    py_state = trainer.rng.getstate()  # camera-order RNG (stdlib Mersenne)
    sidecar = {
        "iteration": int(iteration),
        "events_run": int(trainer.events_run),
        "txt_traj_warmup": bool(trainer.txt_traj_warmup),
        "active_sh_degree": int(trainer.active_sh_degree),
        "ema_loss": float(getattr(trainer, "ema_loss", 0.0)),
        "rng_np": _rng_state_json(trainer.rng_np),
        "evict_rng": _rng_state_json(trainer._evict_rng),
        "rng_py": [py_state[0], list(py_state[1]), py_state[2]],
        "idx_stack": list(getattr(trainer, "_idx_stack", []) or []),
        "pool_index": pool_index,
        # every pool view, including those whose candidate list is empty —
        # submit_diffusion_event indexes trainer.trajectory_pool[view]
        # directly, so empty views must survive the roundtrip
        "pool_views": [int(v) for v in trainer.trajectory_pool],
        "shuffle": shuffle,
        "H": int(trainer.H),
        "W": int(trainer.W),
        "video_length": int(trainer.engine.video_length),
    }
    arrays["__sidecar__"] = np.frombuffer(
        json.dumps(sidecar).encode(), dtype=np.uint8
    )
    with open(path + ".guided.npz", "wb") as f:
        np.savez_compressed(f, **arrays)


def _unpack_cams(data, name, pool_gts, width, height):
    from guidedvd3dgs_tpu.scene.cameras import PseudoCamera

    shape = data[f"{name}/mask_shape"]
    n = int(shape[0])
    mask_shape = tuple(int(x) for x in shape[1:])
    masks = (
        np.unpackbits(
            data[f"{name}/mask"], count=n * int(np.prod(mask_shape))
        )
        .reshape(n, *mask_shape)
        .astype(np.float32)
        if n
        else np.zeros((0, *mask_shape), np.float32)
    )
    cams = []
    for i in range(n):
        slot = int(data[f"{name}/slot"][i])
        cams.append(
            PseudoCamera(
                R=data[f"{name}/R"][i],
                T=data[f"{name}/T"][i],
                FoVx=float(data[f"{name}/fovx"][i]),
                FoVy=float(data[f"{name}/fovy"][i]),
                width=width,
                height=height,
                pseudo_gt=np.asarray(pool_gts[slot]),
                mask=masks[i],
                pool_slot=slot,
            )
        )
    return cams


def load_guided_checkpoint(path: str, trainer) -> int:
    """Restore trainer state in place from save_guided_checkpoint output.
    Returns the checkpointed iteration. The trainer must be freshly
    constructed with the same scene/opt/engine configuration; its trajectory
    pool is REPLACED by the checkpointed one (no re-rendering).

    A plain (pool-less) checkpoint — written by the per-step train path,
    which has no device pseudo pool — is also accepted: the GaussianState
    and iteration are restored exactly and the trajectory pool is rebuilt
    by rendering, like a fresh start (the reference restarts lose even the
    gaussians)."""
    import os

    from guidedvd3dgs_tpu.train.checkpoint import load_checkpoint
    from guidedvd3dgs_tpu.train.guided import TrajEntry

    trainer.state, iteration = load_checkpoint(path, trainer.state)

    if not os.path.exists(path + ".guided.npz"):
        print(f"[resume] {path}: plain checkpoint (no .guided.npz) — "
              "rebuilding the trajectory pool")
        trainer.init_trajectory_pool()
        return iteration

    data = np.load(path + ".guided.npz")
    sidecar = json.loads(bytes(data["__sidecar__"]).decode())
    if [sidecar["H"], sidecar["W"]] != [trainer.H, trainer.W]:
        raise ValueError(
            f"checkpoint resolution {sidecar['H']}x{sidecar['W']} != "
            f"trainer {trainer.H}x{trainer.W}"
        )
    ck_T = sidecar.get("video_length")
    if ck_T is not None and int(ck_T) != trainer.engine.video_length:
        raise ValueError(
            f"checkpoint video_length {ck_T} != engine "
            f"{trainer.engine.video_length}: the pseudo-pool slot layout "
            "depends on it; resume with the original engine config"
        )

    pool_gts = data["pool_gts"]
    # recover the all-time capacity from the stored pool so a resumed run
    # doesn't need the original --pseudo_pool_cap flag repeated
    cap = int(pool_gts.shape[0]) - (trainer.engine.video_length - 1)
    if cap <= 0:
        raise ValueError(
            f"checkpoint pool of {pool_gts.shape[0]} slots is smaller than "
            f"video_length-1={trainer.engine.video_length - 1}"
        )
    trainer._init_pseudo_pool(cap)
    trainer._pool_gts = jnp.asarray(pool_gts)
    trainer._alltime_free = [int(x) for x in data["alltime_free"]]
    trainer.vd_indices = [int(x) for x in data["vd_indices"]]
    trainer.jrng = jax.random.wrap_key_data(jnp.asarray(data["jrng"]))
    trainer.max_instances = int(data["max_instances"])
    trainer.events_run = sidecar["events_run"]
    trainer.txt_traj_warmup = sidecar["txt_traj_warmup"]
    trainer.active_sh_degree = sidecar["active_sh_degree"]
    trainer.ema_loss = sidecar["ema_loss"]
    trainer.rng_np = _restore_rng(sidecar["rng_np"])
    trainer._evict_rng = _restore_rng(sidecar["evict_rng"])
    v, st, g = sidecar["rng_py"]
    trainer.rng.setstate((v, tuple(st), g))
    trainer._idx_stack = list(sidecar.get("idx_stack", []))

    trainer.pseudo_stack = _unpack_cams(data, "cur", pool_gts, trainer.W, trainer.H)
    trainer.pseudo_stack_alltime = _unpack_cams(
        data, "alltime", pool_gts, trainer.W, trainer.H
    )
    trainer._slot_cam = {
        c.pool_slot: c
        for c in [*trainer.pseudo_stack, *trainer.pseudo_stack_alltime]
    }
    trainer._pool_rcs = (
        trainer._stack_pool_cams() if trainer._slot_cam else None
    )

    pool: dict = {}
    for rec in sidecar["pool_index"]:
        v, i = rec["view"], rec["i"]
        pool.setdefault(v, {})[i] = TrajEntry(
            cand_idx=rec["cand_idx"],
            traj_c2ws=data[f"traj/{v}/{i}/traj_c2ws"],
            center_scale=rec["center_scale"],
            scale_idx=rec["scale_idx"],
            obj_c2w=data[f"traj/{v}/{i}/obj_c2w"],
            transform_back=data[f"traj/{v}/{i}/transform_back"],
        )
    trainer.trajectory_pool = {
        v: [d[i] for i in sorted(d)] for v, d in pool.items()
    }
    # views whose candidate list was empty have no pool_index records but
    # must exist: submit_diffusion_event indexes trajectory_pool[view]
    for v in sidecar.get("pool_views", []):
        trainer.trajectory_pool.setdefault(int(v), [])
    trainer.trajectory_pool_shuffle = {
        int(v): [trainer.trajectory_pool[int(v)][i] for i in idxs]
        for v, idxs in sidecar["shuffle"].items()
    }
    # trajectory modes other than the pool need view geometry too
    if not hasattr(trainer, "train_c2ws"):
        try:
            trainer.init_view_geometry()
        except Exception:
            pass
    return iteration
