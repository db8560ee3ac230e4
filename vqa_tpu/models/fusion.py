"""Multimodal fusion zoo (SURVEY.md C9, C12-fusion).

Every fusion maps a question embedding q [..., Dq] and a visual embedding
v [..., Dv] (leading dims broadcastable — attention applies fusions per
region) to a joint embedding z [..., dim_out].

Implementations are TPU-first einsums: MUTAN's rank-R Tucker core is a pair
of [R, D, M] batched matmuls + an R-sum (MXU-shaped, no Python loop over R);
MFB's k-way sum-pool + signed-sqrt + L2-norm chain is elementwise and fuses
under XLA (a Pallas fused variant lives in vqa_tpu.ops).

Equations follow the published papers the reference implements:
  MLB   (Kim et al. 2017):      z = act(W_q q) * act(W_v v)
  MUTAN (Ben-younes et al.):    z = sum_r (W_qr q~) * (W_vr v~)
  MFB   (Yu et al. 1708.01471): z = L2(signed_sqrt(sumpool_k(U q * V v)))
  MFH:  cascaded MFB blocks, block i reuses block i-1's pre-pool product
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACT = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "none": lambda x: x,
    None: lambda x: x,
}


def signed_sqrt(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x) + 1e-12)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


class ConcatFusion(nn.Module):
    """z = [dropout(q); dropout(v)] — graded config #1's fusion."""

    dropout_q: float = 0.0
    dropout_v: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, v: jax.Array, train: bool = False):
        q = nn.Dropout(self.dropout_q, deterministic=not train)(q)
        v = nn.Dropout(self.dropout_v, deterministic=not train)(v)
        lead = jnp.broadcast_shapes(q.shape[:-1], v.shape[:-1])
        q = jnp.broadcast_to(q, lead + q.shape[-1:])
        v = jnp.broadcast_to(v, lead + v.shape[-1:])
        return jnp.concatenate([q, v], axis=-1)


class MLBFusion(nn.Module):
    """Low-rank bilinear (Hadamard) fusion — graded config #2."""

    dim_h: int = 1200
    dropout_q: float = 0.5
    dropout_v: float = 0.5
    activation_q: str = "tanh"
    activation_v: str = "tanh"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, v: jax.Array, train: bool = False):
        q = nn.Dropout(self.dropout_q, deterministic=not train)(q)
        v = nn.Dropout(self.dropout_v, deterministic=not train)(v)
        qh = _ACT[self.activation_q](nn.Dense(self.dim_h, dtype=self.dtype, name="q_proj")(q))
        vh = _ACT[self.activation_v](nn.Dense(self.dim_h, dtype=self.dtype, name="v_proj")(v))
        return qh * vh


class MutanFusion(nn.Module):
    """Rank-R Tucker-core fusion — graded config #3.

    z_m = sum_r (q~ W_q[r])_m * (v~ W_v[r])_m with q~ = act(W q), v~ = act(W v).
    The r-axis rides a batched einsum so the MXU sees [*, D] x [D, R*M].
    """

    dim_hq: int = 310
    dim_hv: int = 310
    dim_mm: int = 510
    R: int = 5
    dropout_q: float = 0.5
    dropout_v: float = 0.5
    dropout_hq: float = 0.0
    dropout_hv: float = 0.0
    activation_q: str = "tanh"
    activation_v: str = "tanh"
    activation_hq: str = "none"
    activation_hv: str = "none"
    project_inputs: bool = True  # False when caller already projected (att path)
    # the torch lineage builds the core from per-rank nn.Linear(dim_h, dim_mm)
    # modules, whose default biases make each rank's term (W_r x + b_r) —
    # core_bias keeps that exact parametrization (and lets converted torch
    # checkpoints import exactly); the published equation's bias-free core is
    # core_bias=false
    core_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, v: jax.Array, train: bool = False):
        if self.project_inputs:
            q = nn.Dropout(self.dropout_q, deterministic=not train)(q)
            v = nn.Dropout(self.dropout_v, deterministic=not train)(v)
            q = _ACT[self.activation_q](nn.Dense(self.dim_hq, dtype=self.dtype, name="q_proj")(q))
            v = _ACT[self.activation_v](nn.Dense(self.dim_hv, dtype=self.dtype, name="v_proj")(v))
        wq = self.param(
            "w_core_q", nn.initializers.lecun_normal(), (q.shape[-1], self.R * self.dim_mm)
        )
        wv = self.param(
            "w_core_v", nn.initializers.lecun_normal(), (v.shape[-1], self.R * self.dim_mm)
        )
        q = nn.Dropout(self.dropout_hq, deterministic=not train)(q)
        v = nn.Dropout(self.dropout_hv, deterministic=not train)(v)
        qr = jnp.dot(q, wq.astype(self.dtype), preferred_element_type=self.dtype)
        vr = jnp.dot(v, wv.astype(self.dtype), preferred_element_type=self.dtype)
        if self.core_bias:
            bq = self.param("b_core_q", nn.initializers.zeros, (self.R * self.dim_mm,))
            bv = self.param("b_core_v", nn.initializers.zeros, (self.R * self.dim_mm,))
            qr = qr + bq.astype(self.dtype)
            vr = vr + bv.astype(self.dtype)
        qr = _ACT[self.activation_hq](qr).reshape(q.shape[:-1] + (self.R, self.dim_mm))
        vr = _ACT[self.activation_hv](vr).reshape(v.shape[:-1] + (self.R, self.dim_mm))
        return jnp.tanh((qr * vr).sum(axis=-2))


class MFBFusion(nn.Module):
    """Multi-modal factorized bilinear pooling — graded config #4.

    Exposes the pre-pool Hadamard product for MFH cascading.
    """

    pool_factor: int = 5
    dim_mm: int = 1000
    dropout_pre: float = 0.1
    dtype: Any = jnp.float32

    def pre_pool(self, q, v, prev, train):
        k = self.pool_factor * self.dim_mm
        qh = nn.Dense(k, dtype=self.dtype, name="q_proj")(q)
        vh = nn.Dense(k, dtype=self.dtype, name="v_proj")(v)
        z = qh * vh
        if prev is not None:
            z = z * prev
        return nn.Dropout(self.dropout_pre, deterministic=not train)(z)

    def pool(self, z):
        # fused sum-pool + signed-sqrt + L2 (vqa_tpu.ops.mfb_pool)
        from vqa_tpu.ops.mfb_pool import mfb_pool

        return mfb_pool(z, self.pool_factor)

    @nn.compact
    def __call__(self, q: jax.Array, v: jax.Array, train: bool = False, prev=None):
        z = self.pre_pool(q, v, prev, train)
        return self.pool(z), z


class MFHFusion(nn.Module):
    """MFH: ``order`` cascaded MFB blocks, outputs concatenated."""

    pool_factor: int = 5
    dim_mm: int = 1000
    mfh_order: int = 2
    dropout_pre: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, v: jax.Array, train: bool = False):
        outs, prev = [], None
        for i in range(self.mfh_order):
            block = MFBFusion(
                self.pool_factor, self.dim_mm, self.dropout_pre, self.dtype,
                name=f"mfb_{i}",
            )
            out, prev = block(q, v, train=train, prev=prev)
            outs.append(out)
        return jnp.concatenate(outs, axis=-1)


_FUSIONS = {
    "concat": ConcatFusion,
    "mlb": MLBFusion,
    "mutan": MutanFusion,
    "mfb": MFBFusion,
    "mfh": MFHFusion,
}


def factory(opt: Dict[str, Any], dtype=jnp.float32) -> nn.Module:
    """Build a fusion module from the model.fusion config dict.

    Unknown keys raise a config error naming the valid knobs for the arch
    (silently ignoring them would hide hyperparameter typos — the parity
    killers per SURVEY.md section 7)."""
    arch = opt.get("arch", "mutan")
    try:
        cls = _FUSIONS[arch]
    except KeyError:
        raise KeyError(f"unknown fusion arch {arch!r}; known: {sorted(_FUSIONS)}") from None
    valid = {f.name for f in cls.__dataclass_fields__.values()} - {"parent", "name", "dtype"}
    kwargs = {k: v for k, v in opt.items() if k != "arch"}
    unknown = set(kwargs) - valid
    if unknown:
        raise KeyError(
            f"fusion arch {arch!r} got unknown option(s) {sorted(unknown)}; "
            f"valid: {sorted(valid)}"
        )
    return cls(dtype=dtype, **kwargs)
