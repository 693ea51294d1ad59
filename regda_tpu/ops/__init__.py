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
from regda_tpu.ops.pseudo import pseudo_selection1
from regda_tpu.ops.refine import superpixel_weight
from regda_tpu.ops.mix import classmix, cutmix, cutmix2, mixup
from regda_tpu.ops.whiten import class_ware_whitening
from regda_tpu.ops.align_losses import (class_align_loss, instance_align_loss,
                                        saw_loss, pixel_contrast_loss,
                                        triplet_loss, msc_loss, icr_loss,
                                        ccr_loss, mse_context_loss)
from regda_tpu.ops.losses_extra import (GDPState, gdp_loss, examples_cnt,
                                        target_domain_weight)
from regda_tpu.ops.slic import (slic, lsc, edge_shrink, superpixel_stats,
                                adjacency)
