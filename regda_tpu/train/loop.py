"""Shared host-side training-loop plumbing for the three stage tools.

Mirrors the reference loops' cadence (tools/train_src.py:108-166): loss log
every 50 steps, evaluate + checkpoint every EVAL_EVERY, keep `_best` by
mIoU and copy the vis dir. Device-side work is one jit'd step; here we only
shuttle numpy batches (sharded over the mesh when >1 device) and manage
checkpoints/eval.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Optional

import jax
import numpy as np

from regda_tpu.datasets import get_meta
from regda_tpu.infer import SegInferencer
from regda_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from regda_tpu.utils.checkpoint import load_pytree_as, save_pytree
from regda_tpu.utils.eval import evaluate
from regda_tpu.utils.profiling import StepTimer, trace_window


class Trainer:
    def __init__(self, model, cfg, logger, state, step_fn,
                 eval_slide: bool = True):
        self.model = model
        self.cfg = cfg
        self.logger = logger
        self.state = state
        self.meta = get_meta(cfg.DATASETS)
        batch_size = cfg.SOURCE_DATA_CONFIG.get('batch_size', 1)
        self.timer = StepTimer(items_per_step=batch_size)
        # profile 5 steps starting at REGDA_PROFILE_START (default 10) into
        # SNAPSHOT_DIR/trace when enabled via cfg.PROFILE=1 or
        # REGDA_PROFILE=1 (the reference has no tracing; SURVEY.md §5)
        self._profile = bool(getattr(cfg, 'PROFILE', 0)
                             or os.environ.get('REGDA_PROFILE'))
        self._profile_start = int(os.environ.get('REGDA_PROFILE_START', 10))
        self._trace_ctx = None
        n_dev = jax.device_count()
        # largest device count that evenly shards the batch
        n_data = max(d for d in range(1, n_dev + 1) if batch_size % d == 0)
        self.mesh = make_mesh(n_data=n_data, n_spatial=1) if n_data > 1 else None
        if self.mesh is not None:
            self.state = jax.device_put(self.state,
                                        replicated_sharding(self.mesh))
            logger.info(f'data-parallel over {n_data} devices')
        self.step_fn = jax.jit(step_fn, donate_argnums=(0,))
        self.inferencer = SegInferencer(model, None, self.meta.num_classes)
        self.mIoU_max = 0.0
        self.iter_max = 0

    def _close_trace(self):
        if self._trace_ctx is not None:
            self._trace_ctx.__exit__(None, None, None)
            self._trace_ctx = None

    def put_batch(self, **arrays):
        if self.mesh is not None:
            return shard_batch(self.mesh, arrays)
        return {k: jax.device_put(v) for k, v in arrays.items()}

    def run_step(self, i_iter: int = -1, **arrays):
        if self._profile:
            if i_iter == self._profile_start:
                self._trace_ctx = trace_window(
                    os.path.join(self.cfg.SNAPSHOT_DIR, 'trace'))
                self._trace_ctx.__enter__()
                import atexit
                atexit.register(self._close_trace)  # short runs still flush
            elif (i_iter == self._profile_start + 5
                  and self._trace_ctx is not None):
                self._close_trace()
        self.timer.start()
        # note: jax.tree.map canonicalizes dict key order, so index by the
        # caller's keyword order rather than iterating b.values()
        b = self.put_batch(**arrays)
        self.state, metrics = self.step_fn(self.state,
                                           *(b[k] for k in arrays))
        self.timer.stop()
        return metrics

    def maybe_log(self, i_iter: int, metrics: dict, extra: str = ''):
        if i_iter == 0 or (i_iter + 1) % 50 == 0:
            parts = [f'iter={i_iter + 1}']
            parts += [f'{k}={float(v):.3f}' for k, v in metrics.items()]
            parts.append(self.timer.summary())
            lr_line = ', '.join(parts)
            self.logger.info(lr_line + (f', {extra}' if extra else ''))

    # ------------------------------------------------------ elastic resume
    @property
    def _state_path(self):
        return os.path.join(self.cfg.SNAPSHOT_DIR,
                            self.cfg.TARGET_SET + '_state.ckpt')

    def save_state(self):
        """Persist the FULL TrainState (params, opt state, prototypes,
        class-freq EMAs, GHM histograms, RNG) so a crashed run resumes
        exactly — the reference can only restart from manually passed
        weight files (SURVEY.md section 5: no failure recovery)."""
        import json
        save_pytree(self._state_path, jax.device_get(self.state))
        # atomic sidecar write: a crash mid-write must not leave a truncated
        # JSON that breaks --auto-resume (or silently resets mIoU_max)
        tmp = self._state_path + '.json.tmp'
        with open(tmp, 'w') as f:
            json.dump({'mIoU_max': self.mIoU_max,
                       'iter_max': self.iter_max}, f)
        os.replace(tmp, self._state_path + '.json')

    def try_resume(self) -> int:
        """Restore the full train state if one exists in SNAPSHOT_DIR.
        Returns the iteration to resume from (0 = fresh run)."""
        import json
        if not os.path.isdir(self._state_path):
            return 0
        restored = load_pytree_as(self._state_path,
                                  jax.device_get(self.state))
        self.state = (jax.device_put(restored,
                                     replicated_sharding(self.mesh))
                      if self.mesh is not None else jax.device_put(restored))
        meta_path = self._state_path + '.json'
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    meta = json.load(f)
                self.mIoU_max = float(meta.get('mIoU_max', 0.0))
                self.iter_max = int(meta.get('iter_max', 0))
            except (ValueError, OSError) as e:
                self.logger.warning(
                    f'auto-resume: unreadable sidecar {meta_path} ({e}); '
                    'keeping mIoU_max=%.4f' % self.mIoU_max)
        start = int(np.asarray(jax.device_get(self.state.step)))
        self.logger.info(f'auto-resume: restored {self._state_path} at '
                         f'step {start} (best mIoU {self.mIoU_max:.4f} '
                         f'@ iter {self.iter_max})')
        return start

    def maybe_eval(self, i_iter: int, stop_steps: int,
                   eval_at_zero: bool = False) -> Optional[float]:
        due = ((i_iter + 1) % self.cfg.EVAL_EVERY == 0
               or (i_iter + 1) >= stop_steps
               or (eval_at_zero and i_iter == 0))
        if not due:
            return None
        variables = jax.device_get(
            {'params': self.state.params,
             'batch_stats': self.state.batch_stats})
        ckpt_path = os.path.join(self.cfg.SNAPSHOT_DIR,
                                 self.cfg.TARGET_SET + '_curr.ckpt')
        save_pytree(ckpt_path, variables)
        _, mIoU_curr = evaluate(self.model, variables, self.cfg,
                                is_training=True, ckpt_path=ckpt_path,
                                logger=self.logger,
                                inferencer=self.inferencer)
        if self.mIoU_max <= mIoU_curr:
            self.mIoU_max = mIoU_curr
            self.iter_max = i_iter + 1
            best_path = os.path.join(self.cfg.SNAPSHOT_DIR,
                                     self.cfg.TARGET_SET + '_best.ckpt')
            save_pytree(best_path, variables)
            best_vis = os.path.join(self.cfg.SNAPSHOT_DIR,
                                    f'vis-{self.cfg.TARGET_SET}_best')
            curr_vis = os.path.join(self.cfg.SNAPSHOT_DIR,
                                    f'vis-{os.path.basename(ckpt_path)}')
            if os.path.isdir(best_vis):
                shutil.rmtree(best_vis)
            if os.path.isdir(curr_vis):
                shutil.copytree(curr_vis, best_vis)
        self.logger.info(
            f'Best model in iter={self.iter_max}, best_mIoU={self.mIoU_max}.')
        self.save_state()
        return mIoU_curr

    @property
    def variables(self):
        return jax.device_get({'params': self.state.params,
                               'batch_stats': self.state.batch_stats})
