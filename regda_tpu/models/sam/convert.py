"""Convert official segment-anything checkpoints (sam_vit_{b,l,h}_*.pth)
into this package's Flax variable tree.

Key mapping (torch name -> flax path), covering every parameter family in
the official checkpoint layout:

  image_encoder.patch_embed.proj.{weight,bias}   -> image_encoder/patch_embed
  image_encoder.pos_embed                         -> image_encoder/pos_embed
  image_encoder.blocks.N.norm{1,2}.*              -> image_encoder/blockN/norm{1,2}
  image_encoder.blocks.N.attn.qkv|proj.*          -> .../blockN/attn/{qkv,proj}
  image_encoder.blocks.N.attn.rel_pos_{h,w}       -> .../blockN/attn/rel_pos_{h,w}
  image_encoder.blocks.N.mlp.lin{1,2}.*           -> .../blockN/mlp_lin{1,2}
  image_encoder.neck.{0,2}.weight                 -> neck_conv{1,2} (OIHW->HWIO)
  image_encoder.neck.{1,3}.{weight,bias}          -> neck_ln{1,2}
  prompt_encoder.pe_layer.positional_encoding_gaussian_matrix
  prompt_encoder.point_embeddings.N.weight        -> point_embed_N
  prompt_encoder.not_a_point_embed.weight, no_mask_embed.weight
  mask_decoder.transformer.layers.N.{self_attn,cross_attn_token_to_image,
      cross_attn_image_to_token}.{q,k,v,out}_proj -> layerN/...
  mask_decoder.transformer.layers.N.norm{1..4}, .mlp.lin{1,2}
  mask_decoder.transformer.final_attn_token_to_image, .norm_final_attn
  mask_decoder.iou_token.weight, mask_tokens.weight
  mask_decoder.output_upscaling.{0,3}             -> upscale_conv{1,2} (deconv)
  mask_decoder.output_upscaling.1                 -> upscale_ln
  mask_decoder.output_hypernetworks_mlps.N.layers.M -> hyper_mlpN/linM
  mask_decoder.iou_prediction_head.layers.M       -> iou_prediction_head/linM

Dense kernels transpose (out,in)->(in,out); convs OIHW->HWIO; transposed
convs OIHW->HWOI per flax ConvTranspose convention.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _dense(arr):
    return arr.T


def _conv(arr):
    return arr.transpose(2, 3, 1, 0)


def _deconv(arr):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    # kernel (kh, kw, in, out). torch's semantics place W[..., dy, dx] at
    # output offset (dy, dx); lax.conv_transpose applies its kernel
    # spatially FLIPPED, so the taps must flip to land at the same offsets
    # (caught by tests/test_sam_oracle.py against the upstream-faithful
    # torch oracle: without the flip, each 2x2 upscale block is mirrored).
    return arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)


def convert_sam_checkpoint(state: Mapping[str, np.ndarray]) -> dict:
    params: dict = {}
    for key, arr in state.items():
        arr = np.asarray(arr)
        parts = key.split('.')
        if parts[0] == 'image_encoder':
            if parts[1] == 'patch_embed':
                leaf = 'kernel' if parts[3] == 'weight' else 'bias'
                val = _conv(arr) if leaf == 'kernel' else arr
                _set(params, ['image_encoder', 'patch_embed', leaf], val)
            elif parts[1] == 'pos_embed':
                _set(params, ['image_encoder', 'pos_embed'], arr)
            elif parts[1] == 'blocks':
                n = parts[2]
                rest = parts[3:]
                base = ['image_encoder', f'block{n}']
                if rest[0] in ('norm1', 'norm2'):
                    leaf = 'scale' if rest[1] == 'weight' else 'bias'
                    _set(params, base + [rest[0], leaf], arr)
                elif rest[0] == 'attn':
                    if rest[1] in ('qkv', 'proj'):
                        leaf = 'kernel' if rest[2] == 'weight' else 'bias'
                        val = _dense(arr) if leaf == 'kernel' else arr
                        _set(params, base + ['attn', rest[1], leaf], val)
                    else:  # rel_pos_h / rel_pos_w
                        _set(params, base + ['attn', rest[1]], arr)
                elif rest[0] == 'mlp':
                    leaf = 'kernel' if rest[2] == 'weight' else 'bias'
                    val = _dense(arr) if leaf == 'kernel' else arr
                    _set(params, base + [f'mlp_{rest[1]}', leaf], val)
                else:
                    raise KeyError(key)
            elif parts[1] == 'neck':
                slot = parts[2]
                if slot in ('0', '2'):
                    name = 'neck_conv1' if slot == '0' else 'neck_conv2'
                    _set(params, ['image_encoder', name, 'kernel'], _conv(arr))
                else:
                    name = 'neck_ln1' if slot == '1' else 'neck_ln2'
                    _set(params, ['image_encoder', name, parts[3]], arr)
            else:
                raise KeyError(key)
        elif parts[0] == 'prompt_encoder':
            if parts[1] == 'pe_layer':
                _set(params, ['prompt_encoder', 'pe_layer',
                              'positional_encoding_gaussian_matrix'], arr)
            elif parts[1] == 'point_embeddings':
                _set(params, ['prompt_encoder', f'point_embed_{parts[2]}'], arr)
            elif parts[1] in ('not_a_point_embed', 'no_mask_embed'):
                _set(params, ['prompt_encoder', parts[1]], arr)
            elif parts[1] == 'mask_downscaling':
                continue  # unused in everything mode (no mask prompts)
            else:
                raise KeyError(key)
        elif parts[0] == 'mask_decoder':
            base = ['mask_decoder']
            if parts[1] == 'transformer':
                tbase = base + ['transformer']
                if parts[2] == 'layers':
                    n, rest = parts[3], parts[4:]
                    lbase = tbase + [f'layer{n}']
                    if rest[0].endswith('_proj') or rest[0] in (
                            'self_attn', 'cross_attn_token_to_image',
                            'cross_attn_image_to_token'):
                        leaf = 'kernel' if rest[2] == 'weight' else 'bias'
                        val = _dense(arr) if leaf == 'kernel' else arr
                        _set(params, lbase + [rest[0], rest[1], leaf], val)
                    elif rest[0].startswith('norm'):
                        leaf = 'scale' if rest[1] == 'weight' else 'bias'
                        _set(params, lbase + [rest[0], leaf], arr)
                    elif rest[0] == 'mlp':
                        leaf = 'kernel' if rest[2] == 'weight' else 'bias'
                        val = _dense(arr) if leaf == 'kernel' else arr
                        _set(params, lbase + [f'mlp_{rest[1]}', leaf], val)
                    else:
                        raise KeyError(key)
                elif parts[2] == 'final_attn_token_to_image':
                    leaf = 'kernel' if parts[4] == 'weight' else 'bias'
                    val = _dense(arr) if leaf == 'kernel' else arr
                    _set(params, tbase + ['final_attn_token_to_image',
                                          parts[3], leaf], val)
                elif parts[2] == 'norm_final_attn':
                    leaf = 'scale' if parts[3] == 'weight' else 'bias'
                    _set(params, tbase + ['norm_final_attn', leaf], arr)
                else:
                    raise KeyError(key)
            elif parts[1] in ('iou_token', 'mask_tokens'):
                _set(params, base + [parts[1]], arr)
            elif parts[1] == 'output_upscaling':
                slot = parts[2]
                if slot == '0':
                    _set(params, base + ['upscale_conv1', parts[3] if
                                         parts[3] == 'bias' else 'kernel'],
                         arr if parts[3] == 'bias' else _deconv(arr))
                elif slot == '1':
                    _set(params, base + ['upscale_ln', parts[3]], arr)
                elif slot == '3':
                    _set(params, base + ['upscale_conv2', parts[3] if
                                         parts[3] == 'bias' else 'kernel'],
                         arr if parts[3] == 'bias' else _deconv(arr))
                else:
                    raise KeyError(key)
            elif parts[1] == 'output_hypernetworks_mlps':
                n, m = parts[2], parts[4]
                leaf = 'kernel' if parts[5] == 'weight' else 'bias'
                val = _dense(arr) if leaf == 'kernel' else arr
                _set(params, base + [f'hyper_mlp{n}', f'lin{m}', leaf], val)
            elif parts[1] == 'iou_prediction_head':
                m = parts[3]
                leaf = 'kernel' if parts[4] == 'weight' else 'bias'
                val = _dense(arr) if leaf == 'kernel' else arr
                _set(params, base + ['iou_prediction_head', f'lin{m}', leaf],
                     val)
            else:
                raise KeyError(key)
        elif parts[0] in ('pixel_mean', 'pixel_std'):
            continue
        else:
            raise KeyError(key)
    return {'params': params}


def load_sam_checkpoint(path: str) -> dict:
    import torch
    state = torch.load(path, map_location='cpu')
    return convert_sam_checkpoint({k: v.numpy() for k, v in state.items()})
