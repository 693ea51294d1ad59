"""Pure-functional algorithm ops (all jax.numpy, jit-safe, static shapes).

Every op here is a pure function on arrays; mutable reference-side state
(prototype EMA, class-frequency EMA, GHM histograms) becomes explicit
carried state returned alongside the result.
"""

from regda_tpu.ops.labels import one_hot_ignore, downscale_label
from regda_tpu.ops.resize import resize_bilinear_align_corners
from regda_tpu.ops.pseudo import pseudo_selection
from regda_tpu.ops.prototypes import (
    pearson_dist,
    local_prototypes,
    ema,
    prototype_update,
    prototype_accumulate,
    prototype_finalize,
)
from regda_tpu.ops.refine import label_refine
from regda_tpu.ops.lrh import homogenize, region_histogram
from regda_tpu.ops.schedule import poly_warmup_lr
