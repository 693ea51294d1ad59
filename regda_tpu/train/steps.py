"""Jit'd train steps for the three RegDA stages.

Parity targets (hot loops):
  - stage 1: tools/train_src.py:108-141  (source CE x2 heads + optional CORAL)
  - stage 2: tools/train_align_reg.py:144-196 (prototype EMA, label refine,
    pseudo selection, LRH, PCL + CORAL)
  - stage 3: tools/train_ssl_reg.py:198-241 (offline prob pseudo-labels,
    refine + selection + LRH, UVEM/OHEM/focal/GHM/UPS/CE target loss)
  - prototype init: tools/init_prototypes.py:101-112

Each stage is one pure function (state, batches) -> (state, metrics),
closed over static flags and jit-compiled with donated state. Everything
the reference does between optimizer steps — including pseudo-label
refinement and LRH — lives inside the same XLA program, so there is no
host round-trip in the hot path.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from regda_tpu.ops import losses as L
from regda_tpu.ops.labels import downscale_label, one_hot_ignore
from regda_tpu.ops.lrh import homogenize
from regda_tpu.ops.prototypes import (prototype_update, prototype_accumulate)
from regda_tpu.ops.pseudo import pseudo_selection
from regda_tpu.ops.refine import label_refine
from regda_tpu.ops.resize import resize_bilinear_align_corners
from regda_tpu.train.state import TrainState


def _fwd(model, params, batch_stats, x, rng):
    (p1, p2, feat), mut = model.apply(
        {'params': params, 'batch_stats': batch_stats}, x, train=True,
        mutable=['batch_stats'], rngs={'dropout': rng})
    return p1, p2, feat, mut['batch_stats']


def _source_loss(ls: str, bcs: bool, num_classes: int, class_temp: float,
                 ignore_label: int = -1):
    """Returns fn(preds_list, labels, cb_state) -> (loss, cb_state).

    Mirrors loss_calc's per-head invocation of the loss (so with class
    balancing on, the frequency EMA updates once per head, like the
    reference's get_class_weight_4pixel side effect)."""

    base = (L.ohem_cross_entropy_loss if ls == 'OhemCrossEntropy'
            else L.cross_entropy_loss)

    def fn(preds, labels, cb_state):
        hw = labels.shape[-2:]
        total = 0.0
        for p in preds:
            if p.shape[1:3] != hw:
                p = resize_bilinear_align_corners(p, hw)
            if bcs:
                w, cb_state = L.class_balance_weights(
                    cb_state, labels, num_classes, ignore_label,
                    temperature=class_temp)
                total = total + base(p, labels, ignore_label, pixel_weight=w)
            else:
                total = total + base(p, labels, ignore_label)
        return total / len(preds), cb_state

    return fn


def _flat(feat):
    return feat.reshape(-1, feat.shape[-1])


# --------------------------------------------------------------------- stage 1

def make_stage1_step(model, tx, *, align_domain: bool = False,
                     ls: str = 'CrossEntropy', bcs: bool = False,
                     class_temp: float = 2.0, num_classes: int = 6,
                     ignore_label: int = -1) -> Callable:
    src_loss = _source_loss(ls, bcs, num_classes, class_temp, ignore_label)

    def step(state: TrainState, images_s, label_s, images_t):
        rng, r1, r2 = jax.random.split(state.rng, 3)

        def loss_fn(params):
            p1, p2, feat_s, bs = _fwd(model, params, state.batch_stats,
                                      images_s, r1)
            aux = {}
            loss_seg, cb_state = src_loss([p1, p2], label_s, state.class_freq_s)
            loss = loss_seg
            if align_domain:
                _, _, feat_t, bs = _fwd(model, params, bs, images_t, r2)
                loss_domain = L.coral_loss(_flat(feat_s), _flat(feat_t))
                loss = loss + loss_domain
                aux['loss_domain'] = loss_domain
            aux.update(loss_seg=loss_seg, batch_stats=bs, cb_state=cb_state)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            batch_stats=aux['batch_stats'], class_freq_s=aux['cb_state'],
            rng=rng)
        metrics = {'total': loss, 'loss_seg': aux['loss_seg'],
                   'loss_domain': aux.get('loss_domain', 0.0)}
        return new_state, metrics

    return step


# ------------------------------------------------------------- prototype init

def make_proto_accum_step(model) -> Callable:
    """One source pass accumulating per-class feature sums
    (init_prototypes.py:101-112 / alignment.py:107-126)."""

    def step(variables, data_sum, data_cnt, images_s, label_s,
             num_classes: int, ignore_label: int = -1):
        # the reference never switches to eval mode here
        # (init_prototypes.py:87-109), so run the train forward and discard
        # the batch-stat updates
        (_, _, feat), _ = model.apply(variables, images_s, train=True,
                                      mutable=['batch_stats'],
                                      rngs={'dropout': jax.random.PRNGKey(0)})
        lbl_down = downscale_label(label_s, 16, num_classes, ignore_label)
        onehot = one_hot_ignore(lbl_down.reshape(-1), num_classes, ignore_label)
        return prototype_accumulate(data_sum, data_cnt, _flat(feat), onehot)

    return step


# --------------------------------------------------------------------- stage 2

def make_stage2_step(model, tx, *, align_domain: bool = True,
                     refine_label: bool = True, refine_mode: str = 'all',
                     refine_temp: float = 2.0, sam_refine: bool = True,
                     percent: float = 0.5, ls: str = 'CrossEntropy',
                     bcs: bool = False, class_temp: float = 2.0,
                     pcl_temp: float = 8.0, proto_decay: float = 0.996,
                     num_classes: int = 6, ignore_label: int = -1,
                     cutoff_top: float = 0.8, cutoff_low: float = 0.6) -> Callable:
    src_loss = _source_loss(ls, bcs, num_classes, class_temp, ignore_label)

    def step(state: TrainState, images_s, label_s, images_t, regs_t):
        rng, r1, r2 = jax.random.split(state.rng, 3)

        def loss_fn(params):
            p_s1, p_s2, feat_s, bs = _fwd(model, params, state.batch_stats,
                                          images_s, r1)
            # EMA prototype update from source GT (before refine/PCL, matching
            # train_align_reg.py:158)
            label_s_down = downscale_label(label_s, 16, num_classes, ignore_label)
            oh_s = one_hot_ignore(label_s_down.reshape(-1), num_classes,
                                  ignore_label)
            protos = prototype_update(state.prototypes,
                                      jax.lax.stop_gradient(_flat(feat_s)),
                                      oh_s, proto_decay)

            p_t1, p_t2, feat_t, bs = _fwd(model, params, bs, images_t, r2)
            hw = images_t.shape[1:3]
            x1 = resize_bilinear_align_corners(p_t1, hw)
            x2 = resize_bilinear_align_corners(p_t2, hw)
            label_t_soft = jax.lax.stop_gradient(
                (jax.nn.softmax(x1, -1) + jax.nn.softmax(x2, -1)) * 0.5)
            if refine_label:
                label_t_soft = label_refine(
                    jax.lax.stop_gradient(feat_t),
                    [jax.lax.stop_gradient(p_t1), jax.lax.stop_gradient(p_t2)],
                    label_t_soft, protos, mode=refine_mode, temp=refine_temp)
            label_t_hard = pseudo_selection(label_t_soft, cutoff_top,
                                            cutoff_low, ignore_label)
            if sam_refine:
                label_t_hard = homogenize(label_t_hard, regs_t, percent,
                                          num_classes, ignore_label)
            label_t = downscale_label(label_t_hard, 16, num_classes, ignore_label)

            loss_seg, cb_state = src_loss([p_s1, p_s2], label_s,
                                          state.class_freq_s)
            loss_domain = (L.coral_loss(_flat(feat_s), _flat(feat_t))
                           if align_domain else 0.0)
            loss_align = 0.5 * (
                L.prototype_contrastive_loss(protos, _flat(feat_s),
                                             label_s_down, pcl_temp,
                                             ignore_label)
                + L.prototype_contrastive_loss(protos, _flat(feat_t),
                                               label_t, pcl_temp, ignore_label))
            loss = loss_seg + loss_domain + loss_align
            aux = dict(batch_stats=bs, cb_state=cb_state, prototypes=protos,
                       loss_seg=loss_seg, loss_domain=loss_domain,
                       loss_align=loss_align)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            batch_stats=aux['batch_stats'], prototypes=aux['prototypes'],
            class_freq_s=aux['cb_state'], rng=rng)
        metrics = {'total': loss, 'loss_seg': aux['loss_seg'],
                   'loss_align': aux['loss_align'],
                   'loss_domain': aux['loss_domain']}
        return new_state, metrics

    return step


# --------------------------------------------------------------------- stage 3

def make_stage3_step(model, tx, *, refine_label: bool = True,
                     refine_mode: str = 'all', refine_temp: float = 2.0,
                     sam_refine: bool = True, percent: float = 0.5,
                     ls: str = 'CrossEntropy', lt: str = 'uvem',
                     bcs: bool = False, bct: bool = False,
                     class_temp: float = 2.0, uvem_m: float = 0.2,
                     uvem_t: float = 0.7, uvem_g: float = 4.0,
                     proto_decay: float = 0.996, num_classes: int = 6,
                     ignore_label: int = -1, cutoff_top: float = 0.8,
                     cutoff_low: float = 0.6) -> Callable:
    src_loss = _source_loss(ls, bcs, num_classes, class_temp, ignore_label)

    def target_loss(preds, label_hard, label_soft, cb_state, ghm):
        """loss_calc/loss_calc_uvem over both heads (balance.py:437-457)."""
        hw = label_hard.shape[-2:]
        total = 0.0
        for p in preds:
            if p.shape[1:3] != hw:
                p = resize_bilinear_align_corners(p, hw)
            w = None
            if bct and lt in ('ours', 'uvem', 'ups', 'ohem', 'none', 'ce'):
                w, cb_state = L.class_balance_weights(
                    cb_state, label_hard, num_classes, ignore_label,
                    temperature=class_temp)
            if lt in ('ours', 'uvem'):
                total += L.uvem_loss(p, label_hard, label_soft, uvem_m,
                                     uvem_t, uvem_g, ignore_label,
                                     pixel_weight=w)
            elif lt == 'ups':
                total += L.ups_loss(p, label_hard, label_soft, uvem_t,
                                    ignore_label, pixel_weight=w)
            elif lt == 'ohem':
                total += L.ohem_cross_entropy_loss(p, label_hard, ignore_label)
            elif lt == 'focal':
                total += L.focal_loss(p, label_hard, 2.0, ignore_label)
            elif lt == 'ghm':
                l, ghm = L.ghm_loss(ghm, p, label_hard,
                                    ignore_label=ignore_label)
                total += l
            else:
                total += L.cross_entropy_loss(p, label_hard, ignore_label,
                                              pixel_weight=w)
        return total / len(preds), cb_state, ghm

    def step(state: TrainState, images_s, label_s, images_t, label_t_prob,
             regs_t):
        rng, r1, r2 = jax.random.split(state.rng, 3)

        def loss_fn(params):
            p_s1, p_s2, feat_s, bs = _fwd(model, params, state.batch_stats,
                                          images_s, r1)
            p_t1, p_t2, feat_t, bs = _fwd(model, params, bs, images_t, r2)

            label_t_soft = label_t_prob  # (B, H, W, C) loaded probabilities
            if refine_label:
                label_t_soft = label_refine(
                    jax.lax.stop_gradient(feat_t),
                    [jax.lax.stop_gradient(p_t1), jax.lax.stop_gradient(p_t2)],
                    label_t_soft, state.prototypes, mode=refine_mode,
                    temp=refine_temp)
            label_t_hard = pseudo_selection(label_t_soft, cutoff_top,
                                            cutoff_low, ignore_label)
            if sam_refine:
                label_t_hard = homogenize(label_t_hard, regs_t, percent,
                                          num_classes, ignore_label)

            # prototype EMA update from source (train_ssl_reg.py:225, after
            # the refine uses the previous prototypes)
            label_s_down = downscale_label(label_s, 16, num_classes, ignore_label)
            oh_s = one_hot_ignore(label_s_down.reshape(-1), num_classes,
                                  ignore_label)
            protos = prototype_update(state.prototypes,
                                      jax.lax.stop_gradient(_flat(feat_s)),
                                      oh_s, proto_decay)

            loss_source, cb_s = src_loss([p_s1, p_s2], label_s,
                                         state.class_freq_s)
            loss_target, cb_t, ghm = target_loss(
                [p_t1, p_t2], label_t_hard, label_t_soft,
                state.class_freq_t, state.ghm)
            loss = loss_source + loss_target
            aux = dict(batch_stats=bs, cb_s=cb_s, cb_t=cb_t, ghm=ghm,
                       prototypes=protos, loss_source=loss_source,
                       loss_target=loss_target)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            batch_stats=aux['batch_stats'], prototypes=aux['prototypes'],
            class_freq_s=aux['cb_s'], class_freq_t=aux['cb_t'],
            ghm=aux['ghm'], rng=rng)
        metrics = {'total': loss, 'loss_source': aux['loss_source'],
                   'loss_target': aux['loss_target']}
        return new_state, metrics

    return step


def jit_step(step_fn, donate_state: bool = True):
    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())
