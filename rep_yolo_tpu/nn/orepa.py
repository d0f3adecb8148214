"""OREPA (online reparameterization) block family — TPU-first.

Reference: models/common.py:1049-1340 (`transI_fusebn`, `ConvBN`,
`OREPA_3x3_RepConv`, `RepConv_OREPA`). OREPA keeps *many* conv branches in
weight space and collapses them into ONE kernel every forward step
(`weight_gen`), so the compute graph is always a single conv — this is
already the ideal TPU formulation: the branch algebra is a handful of tiny
einsums XLA constant-folds per step, and the MXU only ever sees one conv.

Kernels here are HWIO (flax convention); the reference's OIHW einsums are
re-derived accordingly. Deploy-time fusion (`switch_to_deploy`,
reference models/common.py:1077-1090 and the RepConv_OREPA equivalent)
lives in `fuse_orepa_repconv_node` / `fuse_convbn_node`, keyed by the
param names this module emits, and is wired into
rep_yolo_tpu.nn.fuse.fuse_variables.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from rep_yolo_tpu.nn.blocks import BN, ConvUnit, _act
from rep_yolo_tpu.nn.fuse import fold_conv_bn, _identity_kernel, _pad_kernel_to


def _prior_tensor(cout: int, k: int) -> np.ndarray:
    """Frequency prior (cout, k, k) (reference fre_init,
    models/common.py:1184-1195): cosine over rows for the first half of the
    output channels, over columns for the second half."""
    prior = np.zeros((cout, k, k), np.float32)
    half = cout / 2
    for i in range(cout):
        for h in range(k):
            for w in range(k):
                if i < half:
                    prior[i, h, w] = math.cos(math.pi * (h + 0.5) * (i + 1) / 3)
                else:
                    prior[i, h, w] = math.cos(
                        math.pi * (w + 0.5) * (i + 1 - half) / 3)
    return prior


class ConvBN(nn.Module):
    """conv + BN (+ optional nonlinearity) with a BN-fold deploy path
    (reference models/common.py:1055-1089)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int = 0
    g: int = 1
    act: str | None = None
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = ConvUnit(self.c2, self.k, self.s, self.p, self.g,
                     use_bias=self.deploy, name="conv")(x)
        if not self.deploy:
            y = BN(name="bn")(y, train)
        return _act(self.act, y)


class OREPA3x3RepConv(nn.Module):
    """Online-reparam kxk conv: 5 weight-space branches summed into one
    kernel each forward (reference models/common.py:1092-1251).

    Branches (each scaled per-out-channel by a row of `vector`):
      0 origin   — full kxk kernel
      1 avg      — 1x1 kernel spread uniformly over kxk
      2 prior    — 1x1 kernel modulated by a fixed cosine frequency prior
      3 1x1_kxk  — (identity + 1x1) expansion followed by a kxk kernel
      4 dws      — depthwise kxk * pointwise 1x1 expanded to a full kernel
    Output goes through BN (fused at deploy).
    """

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: str | None = None
    expand_ratio: int = 8
    deploy: bool = False

    def weight_gen(self, c1: int) -> jax.Array:
        """Generate the single HWIO kernel from all branches."""
        k, c2, g = self.k, self.c2, self.g
        cig = c1 // g
        init = nn.initializers.variance_scaling(
            1.0 / 3, "fan_in", "uniform")  # kaiming_uniform(a=1) equivalent

        vector = self.param("vector", _vector_init, (5, c2))
        w_origin = self.param("w_origin", init, (k, k, cig, c2))
        w_avg = self.param("w_avg", init, (1, 1, cig, c2))
        w_pfir = self.param("w_pfir", init, (1, 1, cig, c2))
        w_1x1_id = self.param("w_1x1_idconv1", nn.initializers.zeros,
                              (1, 1, cig, c1))
        w_1x1_kxk2 = self.param("w_1x1_kxk_conv2", init, (k, k, c1 // g, c2))
        w_dw = self.param("w_gconv_dw", init,
                          (k, k, 1, c1 * self.expand_ratio))
        w_pw = self.param("w_gconv_pw", init,
                          (1, 1, c1 * self.expand_ratio, c2))

        # branch 0: origin
        w0 = w_origin * vector[0]
        # branch 1: avg — 1x1 spread uniformly over the kxk window
        w1 = (jnp.broadcast_to(w_avg, (k, k, cig, c2)) / (k * k)) * vector[1]
        # branch 2: prior — 1x1 modulated by the fixed cosine prior (o,h,w)
        prior = jnp.asarray(_prior_tensor(c2, k))            # (c2,k,k)
        w2 = (w_pfir * jnp.transpose(prior, (1, 2, 0))[:, :, None, :]) \
            * vector[2]
        # branch 3: (id + 1x1) -> kxk composition.
        # id tensor (HWIO, 1x1, cig->c1) then contract over the middle chans:
        # full[o, i, h, w] = sum_t conv1[t, i] * conv2[o, t, h, w]
        if g > 1:
            raise NotImplementedError(
                "grouped OREPA is not exercised by any reference config")
        id_k = _identity_kernel(1, c1, c1, self.g)           # (1,1,cig,c1)
        conv1 = (w_1x1_id + id_k)[0, 0]                      # (cig, c1)
        w3 = jnp.einsum("it,hwto->hwio", conv1, w_1x1_kxk2) * vector[3]
        # branch 4: depthwise(kxk, groups=c1) x pointwise -> full kernel.
        # dw filter t belongs to input channel i = t // expand_ratio.
        dw = w_dw[:, :, 0, :]                                # (k,k,t)
        dw_g = dw.reshape(k, k, c1, self.expand_ratio)       # (k,k,i,tg)
        pw_g = w_pw[0, 0].reshape(c1, self.expand_ratio, c2)  # (i,tg,o)
        w4 = jnp.einsum("hwit,ito->hwio", dw_g, pw_g) * vector[4]

        return w0 + w1 + w2 + w3 + w4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.deploy:
            y = ConvUnit(self.c2, self.k, self.s, self.k // 2, self.g,
                         use_bias=True, name="reparam")(x)
            return _act(self.act, y)
        c1 = x.shape[-1]
        weight = self.weight_gen(c1)
        p = self.k // 2
        y = jax.lax.conv_general_dilated(
            x, weight, (self.s, self.s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.g,
            precision=jax.lax.Precision.HIGHEST)
        y = BN(name="bn")(y, train)
        return _act(self.act, y)


def _vector_init(key, shape, dtype=jnp.float32):
    """Branch-scale init (reference models/common.py:1176-1181)."""
    v = jnp.zeros(shape, dtype)
    v = v.at[0].set(0.25)   # origin
    v = v.at[1].set(0.25)   # avg
    v = v.at[2].set(0.0)    # prior
    v = v.at[3].set(0.5)    # 1x1_kxk
    v = v.at[4].set(0.5)    # dws
    return v


class RepConvOREPA(nn.Module):
    """RepVGG topology with an OREPA dense branch: OREPA-3x3 || ConvBN-1x1
    || BN identity, summed, SiLU (reference models/common.py:1254-1340).
    Deploy: one biased 3x3 conv (`switch_to_deploy` equivalent in
    fuse.fuse_orepa_repconv_node)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: str | None = "silu"
    deploy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert self.k == 3
        if self.deploy:
            y = ConvUnit(self.c2, 3, self.s, 1, self.g, use_bias=True,
                         name="rbr_reparam")(x)
            return _act(self.act, y)
        dense = OREPA3x3RepConv(self.c2, 3, self.s, self.g,
                                name="rbr_dense")(x, train)
        one = ConvBN(self.c2, 1, self.s, 0, self.g, name="rbr_1x1")(x, train)
        out = dense + one
        if self.c1 == self.c2 and self.s == 1:
            out = out + BN(name="rbr_identity")(x, train)
        return _act(self.act, out)


# --------------------------------------------------------------------------
# deploy-time fusion (pure pytree transforms, fp32)
# --------------------------------------------------------------------------


def orepa_weight_gen_np(p: dict, c1: int, k: int, expand_ratio: int = 8):
    """Numpy/jnp replay of OREPA3x3RepConv.weight_gen over a param subtree
    (groups=1)."""
    vector = p["vector"]
    c2 = vector.shape[1]
    w0 = p["w_origin"] * vector[0]
    w1 = (jnp.broadcast_to(p["w_avg"], (k, k, c1, c2)) / (k * k)) * vector[1]
    prior = jnp.asarray(_prior_tensor(c2, k))
    w2 = (p["w_pfir"] * jnp.transpose(prior, (1, 2, 0))[:, :, None, :]) \
        * vector[2]
    id_k = _identity_kernel(1, c1, c1)
    conv1 = (p["w_1x1_idconv1"] + id_k)[0, 0]
    w3 = jnp.einsum("it,hwto->hwio", conv1, p["w_1x1_kxk_conv2"]) * vector[3]
    dw_g = p["w_gconv_dw"][:, :, 0, :].reshape(k, k, c1, expand_ratio)
    pw_g = p["w_gconv_pw"][0, 0].reshape(c1, expand_ratio, c2)
    w4 = jnp.einsum("hwit,ito->hwio", dw_g, pw_g) * vector[4]
    return w0 + w1 + w2 + w3 + w4


def fuse_orepa_dense_node(p: dict, s: dict) -> tuple:
    """OREPA3x3RepConv train node -> (kernel, bias) with BN folded."""
    k = p["w_origin"].shape[0]
    c1 = p["w_origin"].shape[2]
    kernel = orepa_weight_gen_np(p, c1, k)
    return fold_conv_bn(kernel, p["bn"]["norm"], s["bn"]["norm"])


def fuse_orepa_repconv_node(p: dict, s: dict) -> dict:
    """RepConvOREPA train node -> {'rbr_reparam': {'w': {...}}}
    (reference get_equivalent_kernel_bias, models/common.py:1340+)."""
    k3, b3 = fuse_orepa_dense_node(p["rbr_dense"], s["rbr_dense"])
    k1, b1 = fold_conv_bn(p["rbr_1x1"]["conv"]["w"]["kernel"],
                          p["rbr_1x1"]["bn"]["norm"],
                          s["rbr_1x1"]["bn"]["norm"])
    kernel = k3 + _pad_kernel_to(k1, 3)
    bias = b3 + b1
    if "rbr_identity" in p:
        cin, cout = kernel.shape[2], kernel.shape[3]
        kid, bid = fold_conv_bn(_identity_kernel(3, cin, cout),
                                p["rbr_identity"]["norm"],
                                s["rbr_identity"]["norm"])
        kernel = kernel + kid
        bias = bias + bid
    return {"rbr_reparam": {"w": {"kernel": kernel, "bias": bias}}}


def fuse_orepa_standalone_node(p: dict, s: dict) -> dict:
    """Bare OREPA3x3RepConv -> {'reparam': {'w': {...}}}."""
    kernel, bias = fuse_orepa_dense_node(p, s)
    return {"reparam": {"w": {"kernel": kernel, "bias": bias}}}
