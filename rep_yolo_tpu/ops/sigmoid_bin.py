"""SigmoidBin: binned + residual-regression scalar encoding.

Functional JAX port of the reference's SigmoidBin module
(reference utils/loss.py:33-119): a scalar in [min, max] is predicted as
(a) a softmax-free bin classification over `bin_count` uniformly spaced
centers and (b) a sigmoid residual regression around the chosen center.
Used by the IBin head for width/height (reference models/yolo.py:421-494).

Pure functions over a static config — everything jit-safe, no modules.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SigmoidBinSpec:
    bin_count: int = 10
    vmin: float = 0.0
    vmax: float = 1.0
    reg_scale: float = 2.0
    use_loss_regression: bool = True
    use_fw_regression: bool = True
    bce_weight: float = 1.0
    smooth_eps: float = 0.0

    @property
    def length(self) -> int:
        return self.bin_count + 1

    @property
    def scale(self) -> float:
        return float(self.vmax - self.vmin)

    @property
    def step(self) -> float:
        return self.scale / self.bin_count

    def bins(self) -> jax.Array:
        """Bin centers (bin_count,) (reference utils/loss.py:55-60)."""
        start = self.vmin + (self.scale / 2.0) / self.bin_count
        return start + self.step * jnp.arange(self.bin_count, dtype=jnp.float32)

    def forward(self, pred: jax.Array) -> jax.Array:
        """Decode (..., length) *post-sigmoid* predictions to scalars
        (reference utils/loss.py:70-86; the IBin head sigmoids the whole
        map before slicing, models/yolo.py:469)."""
        assert pred.shape[-1] == self.length
        pred_reg = (pred[..., 0] * self.reg_scale
                    - self.reg_scale / 2.0) * self.step
        bin_idx = jnp.argmax(pred[..., 1:1 + self.bin_count], axis=-1)
        bin_bias = self.bins()[bin_idx]
        result = pred_reg + bin_bias if self.use_fw_regression else bin_bias
        return jnp.clip(result, self.vmin, self.vmax)

    def training_loss(self, pred: jax.Array, target: jax.Array,
                      mask: jax.Array | None = None):
        """(loss, decoded) from raw *logits* (..., length) and targets (...,)
        (reference utils/loss.py:89-119). `mask` makes the mean ignore
        padded rows (fixed-shape OTA matching)."""
        assert pred.shape[-1] == self.length
        cp = 1.0 - 0.5 * self.smooth_eps
        cn = 0.5 * self.smooth_eps
        pred_reg = (jax.nn.sigmoid(pred[..., 0]) * self.reg_scale
                    - self.reg_scale / 2.0) * self.step
        pred_bin = pred[..., 1:1 + self.bin_count]

        bins = self.bins()
        bin_idx = jnp.argmin(jnp.abs(target[..., None] - bins), axis=-1)
        bin_bias = jax.lax.stop_gradient(bins[bin_idx])
        result = pred_reg + bin_bias

        target_bins = jnp.full(pred_bin.shape, cn, pred_bin.dtype)
        onehot = jax.nn.one_hot(bin_idx, self.bin_count, dtype=pred_bin.dtype)
        target_bins = target_bins * (1 - onehot) + cp * onehot

        # BCE-with-logits with pos_weight (reference nn.BCEWithLogitsLoss)
        z = target_bins
        x = pred_bin
        log_sig = jax.nn.log_sigmoid(x)
        log_one_minus = jax.nn.log_sigmoid(-x)
        bce = -(self.bce_weight * z * log_sig + (1 - z) * log_one_minus)
        mse = (result - target) ** 2

        if mask is None:
            loss = bce.mean() + (mse.mean() if self.use_loss_regression else 0.0)
        else:
            m = mask.astype(bce.dtype)
            denom = jnp.maximum(m.sum(), 1.0)
            loss = (bce.mean(-1) * m).sum() / denom
            if self.use_loss_regression:
                loss = loss + (mse * m).sum() / denom
        return loss, jnp.clip(result, self.vmin, self.vmax)
