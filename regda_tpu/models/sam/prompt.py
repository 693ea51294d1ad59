"""SAM prompt encoder: random-Fourier positional encoding + point/box
embeddings (everything-mode only needs point prompts).

From-scratch JAX implementation of the published SAM architecture; fills
the role of segment-anything's PromptEncoder for the reference's
`SamAutomaticMaskGenerator` usage (local_region_homog.py:32-39).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn


class PositionEmbeddingRandom(nn.Module):
    """Fourier-feature PE: coords in [0,1]^2 -> (2*num_feats,) sin/cos."""
    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords01: jnp.ndarray) -> jnp.ndarray:
        gauss = self.param(
            'positional_encoding_gaussian_matrix',
            lambda key, shape: self.scale * jnp.asarray(
                np.random.default_rng(0).normal(size=shape), jnp.float32),
            (2, self.num_pos_feats))
        coords = 2.0 * coords01 - 1.0
        coords = coords @ gauss
        coords = 2.0 * np.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def grid_pe(self, size: tuple[int, int]) -> jnp.ndarray:
        """Dense PE over an (H, W) grid -> (H, W, C)."""
        h, w = size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing='xy'), axis=-1)  # (H,W,2) x,y
        return self(grid)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: tuple[int, int] = (64, 64)
    input_image_size: tuple[int, int] = (1024, 1024)

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2,
                                                name='pe_layer')
        # 0: negative point, 1: positive point, 2: box tl, 3: box br
        self.point_embeddings = [
            self.param(f'point_embed_{i}', nn.initializers.normal(1.0),
                       (1, self.embed_dim)) for i in range(4)]
        self.not_a_point_embed = self.param(
            'not_a_point_embed', nn.initializers.normal(1.0),
            (1, self.embed_dim))
        self.no_mask_embed = self.param(
            'no_mask_embed', nn.initializers.normal(1.0), (1, self.embed_dim))

    def get_dense_pe(self) -> jnp.ndarray:
        return self.pe_layer.grid_pe(self.image_embedding_size)  # (64,64,256)

    def __call__(self, points: jnp.ndarray, labels: jnp.ndarray):
        """points: (B, N, 2) pixel xy in input-image coords; labels (B, N)
        with 1=fg, 0=bg, -1=padding. Returns (sparse (B, N+1, C), dense PE).

        SAM appends a padding point when no box is given.
        """
        b, n, _ = points.shape
        pad_pt = jnp.zeros((b, 1, 2), points.dtype)
        pad_lb = -jnp.ones((b, 1), labels.dtype)
        pts = jnp.concatenate([points, pad_pt], axis=1) + 0.5
        lbs = jnp.concatenate([labels, pad_lb], axis=1)
        coords01 = pts / jnp.asarray([self.input_image_size[1],
                                      self.input_image_size[0]], jnp.float32)
        pe = self.pe_layer(coords01)                             # (B, N+1, C)
        emb = jnp.where((lbs == -1)[..., None],
                        self.not_a_point_embed[0],
                        jnp.where((lbs == 1)[..., None],
                                  pe + self.point_embeddings[1][0],
                                  pe + self.point_embeddings[0][0]))
        # not_a_point: PE zeroed entirely (SAM sets embedding, drops PE)
        dense = self.no_mask_embed.reshape(1, 1, 1, -1)
        dense = jnp.broadcast_to(
            dense, (b, *self.image_embedding_size, self.embed_dim))
        return emb, dense
