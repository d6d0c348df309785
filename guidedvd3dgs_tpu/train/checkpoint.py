"""Full-training-state checkpointing (SURVEY.md §5.4 mechanism 2).

Role of the reference `torch.save((gaussians.capture(), iteration), ...)`
(reference: train_baseline.py:101-104, scene/gaussian_model.py:69-102):
persists the complete GaussianState — params, Adam moments, densify stats,
confidence, active mask — plus the iteration counter. Unlike the reference
(whose `restore` drops the Adam state, gaussian_model.py:102), restore here
is exact.

Format: a single .npz with flattened pytree paths (portable, no pickle).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.models import gaussians as G


def _flatten(state: G.GaussianState):
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(path: str, state: G.GaussianState, iteration: int) -> None:
    arrays, _ = _flatten(state)
    arrays["__iteration__"] = np.asarray(iteration)
    # np.savez appends ".npz" to bare string paths, which would desync the
    # announced path from the file on disk — write through a file object so
    # `path` is used verbatim whatever its extension
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(path: str, template: G.GaussianState) -> Tuple[G.GaussianState, int]:
    """Restore into the template's structure (capacity may differ: arrays are
    taken verbatim from the file)."""
    data = np.load(path)
    arrays, treedef = _flatten(template)
    leaves = []
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    for path_keys, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path_keys)
        if key not in data:
            raise KeyError(f"checkpoint missing {key}")
        leaves.append(jnp.asarray(data[key]))
    state = jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), leaves)
    return state, int(data["__iteration__"])
