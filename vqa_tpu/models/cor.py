"""Chain-of-Reasoning model (SURVEY.md C13; graded config #5).

T-step relational chain over the 36 region objects (CoR, Wu et al.,
NeurIPS 2018 lineage): each step forms question-guided pairwise relations,
compresses them back into a refreshed object set (relation -> object), and
pools a per-step decision vector; the answer is decided from a gated sum of
the per-step decisions.

TPU-first formulation (the reason this is not a translation):
  * the pairwise relation logits s_ij = <p_i * g_q, r_j> are factorized so
    the NxN pair interaction is ONE batched [B,N,D]x[B,D,N] matmul (MXU),
    never a materialized [B,N,N,D] relation tensor;
  * the chain runs as a fixed-T ``lax.scan`` (nn.scan) with shared step
    weights — jittable, compile-once, no data-dependent control flow
    (SURVEY.md section 7 "CoR's data-dependent chain");
  * per-step decisions are gated by a softmax over steps computed from the
    question vector.

Equation-level pinning: a torch restatement of this chain (explicit O(N^2)
pairwise loop, shared step weights, lineage-style 1x1 convs) lives in
tests/test_importers_full_models.py::TCoR; a full converted checkpoint
reproduces our logits to 1e-4 through the import CLI, so the factorized
einsum is proven an exact reformulation, not an approximation. Verifying
the equations against the reference's own CoR source remains blocked on a
readable reference mount (SURVEY.md provenance [K]); the structure
(q-guided pairwise relations, T-step object refresh, gated per-step
decision sum) follows SURVEY.md C13 / BASELINE.json config #5.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqa_tpu.config import ModelOptions
from vqa_tpu.models.classifier import Classifier
from vqa_tpu.models.fusion import l2_normalize
from vqa_tpu.models.seq2vec import SeqEncoder


class CoRStep(nn.Module):
    """(objects [B,N,D], q [B,Dq]) -> (objects' [B,N,D], decision [B,D])."""

    dim_h: int
    dropout: float = 0.2
    dtype: Any = jnp.float32
    train: bool = False  # static; set at construction, not in the carry

    @nn.compact
    def __call__(self, carry, _):
        objects, q = carry
        d = self.dim_h
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not self.train)(x)

        p = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="rel_src")(drop(objects)))
        r = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="rel_dst")(drop(objects)))
        g = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="rel_guide")(drop(q)))

        # factorized pairwise relations s_ij = <p_i * g, r_j> -> softmax ->
        # absorb: fused relation core (vqa_tpu.ops.relation; jnp reference
        # elsewhere — one batched matmul each way, no [B,N,N,D] tensor)
        from vqa_tpu.ops.relation import relation_attend

        absorbed = relation_attend(p * g[:, None, :], r)

        # relation -> object: each object absorbs its attended partners,
        # modulated by the guided source projection (Hadamard), residual add
        update = nn.Dense(
            objects.shape[-1], dtype=self.dtype, name="rel_to_obj"
        )(absorbed * (p * g[:, None, :]))
        new_objects = objects + jnp.tanh(update)

        # per-step decision: q-guided pooling over the refreshed objects
        pool_logits = nn.Dense(1, dtype=self.dtype, name="pool_logits")(
            jnp.tanh(nn.Dense(d, dtype=self.dtype, name="pool_hidden")(new_objects))
            * g[:, None, :]
        )
        beta = jax.nn.softmax(pool_logits, axis=1)               # [B,N,1]
        pooled = (beta * new_objects).sum(axis=1)                # [B,D]
        decision = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="decision")(pooled)) * g
        # beta rides out of the scan as the per-step object-attention map
        # (the CoR lineage's qualitative visualization; cli/visu.py C23)
        return (new_objects, q), (decision, beta[..., 0])


class CoRModel(nn.Module):
    encoder: SeqEncoder
    steps: int
    dim_h: int
    dim_obj: int
    dropout: float
    classifier: Classifier
    l2norm_visual: bool = True
    # T is small (3): unrolling the scan lets XLA fuse across chain steps
    # and drop the per-step residual stacking in the backward (measured ADR
    # in the perf ledger); semantics/params/grads identical either way
    unroll: bool = True
    # remat="dots": nn.remat(policy=checkpoint_dots) on the chain step —
    # saves only GEMM outputs, recomputes the tanh/softmax/Hadamard chains
    # in the backward (an A/B lever for the chain bwd:fwd ~2.7 ADR; grads
    # numerically identical). MEASURED NEUTRAL on the real chip
    # (PROFILE_r04_cor.json: vqa-like blend 24.2k vs 24.1k native, +0.5%
    # = tunnel noise) — the chain backward is GEMM-transpose-bound, not
    # activation-traffic-bound, so recomputing the elementwise chains
    # buys nothing. Default stays off.
    remat: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        visual: jax.Array,
        question: jax.Array,
        lengths: Optional[jax.Array] = None,
        train: bool = False,
        return_attention: bool = False,
    ):
        v = visual.astype(self.dtype)
        if self.l2norm_visual:
            v = l2_normalize(v)
        q = self.encoder(question, lengths, train=train)          # [B, Hq]

        objects = jnp.tanh(
            nn.Dense(self.dim_obj, dtype=self.dtype, name="obj_proj")(v)
        )                                                          # [B, N, Dobj]

        step_cls = CoRStep
        if self.remat == "dots":
            step_cls = nn.remat(
                CoRStep, policy=jax.checkpoint_policies.checkpoint_dots
            )
        scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
            length=self.steps,
            unroll=self.steps if self.unroll else 1,
        )(self.dim_h, self.dropout, self.dtype, train, name="chain")
        _, (decisions, betas) = scan((objects, q), None)           # [T,B,D], [T,B,N]

        # gated sum over reasoning steps (decision gates from the question)
        gates = jax.nn.softmax(
            nn.Dense(self.steps, dtype=self.dtype, name="step_gates")(q), axis=-1
        )                                                          # [B, T]
        decision = jnp.einsum("bt,tbd->bd", gates, decisions)
        logits = self.classifier(decision, train=train)
        if return_attention:
            # per-step object attention, steps on the glimpse axis — the
            # same [B, N, G] contract AttModel's alpha uses (XLA drops the
            # stack when nobody consumes it)
            return logits, jnp.transpose(betas, (1, 2, 0))
        return logits

    @classmethod
    def build(cls, opt: ModelOptions, num_words: int, num_answers: int, dtype):
        from vqa_tpu.models import seq2vec as seq2vec_lib

        encoder = seq2vec_lib.factory(num_words, opt.seq2vec, dtype=dtype)
        fus = opt.fusion or {}
        classif = opt.classif or {}
        chain = opt.extra.get("chain", {})
        return cls(
            encoder=encoder,
            steps=chain.get("steps", 3),
            dim_h=fus.get("dim_h", 1024),
            dim_obj=fus.get("dim_h", 1024),
            dropout=fus.get("dropout", 0.2),
            classifier=Classifier(
                num_answers=num_answers,
                dim_h=classif.get("dim_h"),
                activation=classif.get("activation", "tanh"),
                dropout=classif.get("dropout", 0.5),
                dtype=dtype,
            ),
            l2norm_visual=opt.extra.get("l2norm_visual", True),
            unroll=chain.get("unroll", True),
            remat=chain.get("remat", "none"),
            dtype=dtype,
        )
