"""Checkpointing via Orbax (model variables and full train states).

The reference raw-torch.save's state_dicts per eval interval with `_curr` /
`_best` names (tools/train_src.py:151-158); we keep the naming and layout
but store Orbax checkpoints (a directory per checkpoint). Reference .pth
files are also loadable transparently through the torch->Flax converter
(utils/torch_convert.py), so converted reference weights drop straight in.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abspath(p: str) -> str:
    return os.path.abspath(os.path.expanduser(p))


def save_pytree(path: str, tree: Any):
    """Save any pytree of arrays to `path` (a directory, created fresh)."""
    path = _abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tree = jax.tree.map(np.asarray, tree)
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str) -> Any:
    path = _abspath(path)
    if path.endswith('.pth'):  # reference torch checkpoint
        from regda_tpu.utils.torch_convert import load_torch_checkpoint
        return load_torch_checkpoint(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def load_pytree_as(path: str, target: Any) -> Any:
    """Restore a checkpoint INTO the structure of `target` (custom pytree
    nodes like TrainState / optax named tuples come back as themselves,
    not as plain dicts). Used for elastic resume of full train states —
    the reference has no such recovery (SURVEY.md section 5); a crash
    there loses everything since the last manual checkpoint flag."""
    path = _abspath(path)
    ckptr = ocp.StandardCheckpointer()

    # shape/dtype-only template: StandardRestore never reads the template's
    # VALUES, so materializing them would be pure waste — in particular,
    # passing a device-resident TrainState here must not trigger a full
    # device->host download (627 MB for the ResNet-101 state, minutes over
    # this box's tunneled link)
    def _template(x):
        if hasattr(x, 'shape') and hasattr(x, 'dtype'):
            return np.empty(x.shape, np.dtype(x.dtype))
        return x

    template = jax.tree.map(_template, target)
    try:
        return ckptr.restore(path, template)
    except TypeError:
        return ckptr.restore(
            path, args=ocp.args.StandardRestore(template))


def save_prototypes(path: str, prototypes) -> None:
    """Prototype matrices are small; store as .npy (reference stores a bare
    tensor .pth — tools/init_prototypes.py:112)."""
    np.save(path if path.endswith('.npy') else path + '.npy',
            np.asarray(prototypes))


def load_prototypes(path: str) -> np.ndarray:
    if path.endswith('.pth'):
        import torch
        return torch.load(path, map_location='cpu').numpy()
    if not path.endswith('.npy') and os.path.exists(path + '.npy'):
        path = path + '.npy'
    return np.load(path)
