"""Convert reference PyTorch Deeplabv2 checkpoints to Flax variable pytrees.

The reference stores raw `model.state_dict()` files (tools/train_src.py:152)
with names like `encoder.resnet.layer1.0.conv1.weight` or
`layer5.ppm.0.1.weight`. This maps those onto our module tree
(models/resnet.py, models/heads.py): conv OIHW -> HWIO, BN weight/bias ->
scale/bias, running stats -> the `batch_stats` collection.

Only numpy arrays in, pytrees of numpy arrays out — torch itself is only
needed by the caller to `torch.load` the file (torch-cpu is available in
this image; nothing here depends on CUDA).
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_entry(key: str, arr: np.ndarray):
    """Returns (collection, flax_path, array) or None to skip."""
    parts = key.split('.')

    # --- resolve the module path ---
    if parts[0] == 'encoder':
        assert parts[1] == 'resnet', key
        rest = parts[2:]
        if rest[0] in ('conv1', 'bn1'):
            mod_path = ['encoder', rest[0]]
            rest = rest[1:]
        else:
            m = re.fullmatch(r'layer(\d)', rest[0])
            assert m, key
            block = rest[1]
            sub = rest[2]
            base = ['encoder', f'layer{m.group(1)}_{block}']
            if sub == 'downsample':
                which = rest[3]
                base.append('downsample_conv' if which == '0' else 'downsample_bn')
                rest = rest[4:]
            else:
                base.append(sub)
                rest = rest[3:]
            mod_path = base
    elif parts[0] in ('layer5', 'layer6', 'cls_pred'):
        head = parts[0]
        if parts[1] == 'ppm':
            i, slot = parts[2], parts[3]
            # Sequential(AdaptiveAvgPool2d, Conv2d, BN, ReLU) -> slots 1, 2
            name = {'1': f'ppm_{i}_conv', '2': f'ppm_{i}_bn'}[slot]
            mod_path = [head, name]
            rest = parts[4:]
        elif parts[1] == 'conv_last':
            slot = parts[2]
            name = {'0': 'conv_last_conv', '1': 'conv_last_bn',
                    '4': 'conv_last_out'}[slot]
            mod_path = [head, name]
            rest = parts[3:]
        elif parts[1] == 'conv2d_list':
            mod_path = [head, f'aspp_{parts[2]}']
            rest = parts[3:]
        else:
            raise KeyError(key)
    elif parts[0].startswith('instance_norm'):
        return None  # InstanceNorm2d(affine=False) has no params
    else:
        raise KeyError(f'unrecognized checkpoint key: {key}')

    # --- resolve the leaf ---
    leaf = rest[0]
    if leaf == 'num_batches_tracked':
        return None
    is_bn = mod_path[-1].endswith('bn') or mod_path[-1].startswith('bn')
    if is_bn:
        if leaf == 'weight':
            return 'params', mod_path + ['scale'], arr
        if leaf == 'bias':
            return 'params', mod_path + ['bias'], arr
        if leaf == 'running_mean':
            return 'batch_stats', mod_path + ['mean'], arr
        if leaf == 'running_var':
            return 'batch_stats', mod_path + ['var'], arr
        raise KeyError(key)
    if leaf == 'weight':
        assert arr.ndim == 4, key
        return 'params', mod_path + ['kernel'], arr.transpose(2, 3, 1, 0)
    if leaf == 'bias':
        return 'params', mod_path + ['bias'], arr
    raise KeyError(key)


def torch_state_dict_to_variables(state: Mapping[str, np.ndarray]) -> dict:
    """-> {'params': {...}, 'batch_stats': {...}} nested numpy pytree."""
    out = {'params': {}, 'batch_stats': {}}
    for key, arr in state.items():
        entry = _convert_entry(key, np.asarray(arr))
        if entry is None:
            continue
        coll, path, val = entry
        _set(out[coll], path, val)
    return out


def load_torch_checkpoint(path: str) -> dict:
    """torch.load a reference .pth state_dict and convert (CPU-only)."""
    import torch
    state = torch.load(path, map_location='cpu')
    return torch_state_dict_to_variables(
        {k: v.numpy() for k, v in state.items()})
