"""Checkpoint / resume of solver and MPC state.

The reference has no checkpointing (SURVEY.md §5: closest artifact is the
append-only convergence trace).  For production MPC fleets this is a genuine
addition: persist (trajectory, multipliers, μ/reg schedule, warm starts) so
a restarted host resumes mid-run.  Uses orbax when available, .npz otherwise
— both write the same flat pytree-leaf dictionary.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # orbax is in the image, but keep the fallback path honest
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _flatten(tree) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}, treedef


def save(path: str, tree) -> None:
    """Save any pytree (SolveResult, AffineMults, MPC carry, …)."""
    if _HAS_ORBAX and not path.endswith(".npz"):
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), jax.tree.map(jnp.asarray, tree), force=True)
        ckptr.wait_until_finished()
    else:
        flat, _ = _flatten(tree)
        np.savez(path, **flat)


def load(path: str, like):
    """Load into the structure of ``like`` (a template pytree)."""
    if _HAS_ORBAX and not path.endswith(".npz") and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), jax.tree.map(jnp.asarray, like))
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
