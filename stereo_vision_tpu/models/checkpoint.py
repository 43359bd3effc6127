"""Model checkpointing (orbax).

The reference's "checkpoint/resume" story is on-disk pickles and
``--skip-existing`` (SURVEY.md §5); for the neural detectors the
framework equivalent is orbax-checkpoint over the flax variable trees.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def save_variables(path: str | Path, variables: dict[str, Any]) -> None:
    """Write a flax variables tree ({'params', 'batch_stats', ...})."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, variables, force=True)


def load_variables(path: str | Path, like: dict[str, Any] | None = None) -> dict[str, Any]:
    """Load a flax variables tree; ``like`` supplies the target structure
    (and shardings) when restoring onto a mesh."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, ocp.args.StandardRestore(like))
        return ckptr.restore(path)


def save_numpy_tree(path: str | Path, variables: dict[str, Any]) -> None:
    """Dependency-light fallback: the tree as a .npz of flattened paths."""
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)
