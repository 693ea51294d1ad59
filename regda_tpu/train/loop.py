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
        # Bounded async pipeline: with device-resident data the host side of
        # a step is ~instant, so without backpressure the dispatch queue
        # (and the HBM batches it pins) grows until the next host sync.
        # Reading one 4-byte metric from step i-K keeps K steps in flight —
        # enough to hide the tunnel's per-dispatch RPC latency, bounded
        # enough that queued sampler outputs can't accumulate in HBM.
        self._depth = int(os.environ.get('REGDA_PIPELINE_DEPTH', 8))
        self._inflight: list = []
        # async checkpoint saver: the full-TrainState download is ~35 s over
        # this box's tunneled d2h link (627 MB at ~18 MB/s for ResNet-101),
        # so the post-eval checkpoint chain runs in a background thread and
        # overlaps the next EVAL_EVERY training steps (FULLRUN.md run 3
        # measured ~68 s eval pauses, roughly half of it this download).
        # Disable with REGDA_SYNC_CKPT=1.
        self._saver = None
        self._saver_exc = None
        self._async_ckpt = os.environ.get('REGDA_SYNC_CKPT', '0') != '1'
        # deep on-device copy for the saver thread: the train step DONATES
        # the state buffers, so the thread must snapshot them (HBM-to-HBM,
        # ~1 ms) before training continues — a plain reference would be
        # reading deleted buffers.
        import jax.numpy as jnp
        self._dev_copy = jax.jit(
            lambda s: jax.tree.map(jnp.copy, s))

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
        if self._depth > 0:
            self._inflight.append(next(iter(metrics.values())))
            if len(self._inflight) > self._depth:
                # host read (not block_until_ready: the tunneled backend
                # returns from that before execution finishes)
                np.asarray(self._inflight.pop(0))
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

    def save_state(self, host_state=None):
        """Persist the FULL TrainState (params, opt state, prototypes,
        class-freq EMAs, GHM histograms, RNG) so a crashed run resumes
        exactly — the reference can only restart from manually passed
        weight files (SURVEY.md section 5: no failure recovery).
        host_state: an already-downloaded copy of self.state, to avoid a
        second full device->host transfer."""
        import json
        save_pytree(self._state_path,
                    host_state if host_state is not None
                    else jax.device_get(self.state))
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
        # self.state is passed as a shape/dtype template only — no download
        restored = load_pytree_as(self._state_path, self.state)
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
        self.join_saver()          # at most one checkpoint chain in flight
        # eval inference runs straight off the DEVICE-resident params
        # (device_put of an on-device pytree is a no-op); the host-side
        # chain — ONE full-state download serving the _curr ckpt, the
        # _best copy and save_state — runs in a background thread,
        # overlapped with the next EVAL_EVERY training steps.
        dev_variables = {'params': self.state.params,
                         'batch_stats': self.state.batch_stats}
        ckpt_path = os.path.join(self.cfg.SNAPSHOT_DIR,
                                 self.cfg.TARGET_SET + '_curr.ckpt')
        _, mIoU_curr = evaluate(self.model, dev_variables, self.cfg,
                                is_training=True, ckpt_path=ckpt_path,
                                logger=self.logger,
                                inferencer=self.inferencer)
        improved = self.mIoU_max <= mIoU_curr
        if improved:
            self.mIoU_max = mIoU_curr
            self.iter_max = i_iter + 1
        self.logger.info(
            f'Best model in iter={self.iter_max}, best_mIoU={self.mIoU_max}.')

        state_snap = (self._dev_copy(self.state) if self._async_ckpt
                      else self.state)

        def _save_chain():
            host_state = jax.device_get(state_snap)
            variables = {'params': host_state.params,
                         'batch_stats': host_state.batch_stats}
            save_pytree(ckpt_path, variables)
            if improved:
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
            self.save_state(host_state)

        if self._async_ckpt:
            import threading

            def _save_chain_capture():
                # A failed background save must not report success: stash
                # the exception and re-raise it at the next join point
                # (join_saver / the next eval / end of training).
                try:
                    _save_chain()
                except BaseException as e:  # noqa: BLE001
                    self._saver_exc = e

            self._saver = threading.Thread(target=_save_chain_capture,
                                           name='ckpt-saver')
            self._saver.start()
        else:
            _save_chain()
        return mIoU_curr

    def join_saver(self):
        """Block until the in-flight async checkpoint chain (if any) has
        fully written _curr/_best/_state to disk; re-raise any exception
        the background chain hit so a lost checkpoint cannot masquerade
        as a successful save."""
        if self._saver is not None:
            self._saver.join()
            self._saver = None
        exc = getattr(self, '_saver_exc', None)
        if exc is not None:
            self._saver_exc = None
            raise RuntimeError('async checkpoint chain failed') from exc

    @property
    def variables(self):
        return jax.device_get({'params': self.state.params,
                               'batch_stats': self.state.batch_stats})
