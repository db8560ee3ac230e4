"""Shared bits for the tools/ scripts (kept out of vqa_tpu: tool-only)."""

# One reduced-dims MutanAtt shape for every tool that needs a small real
# model (bench_serve, check_export): a single source so the serving bench
# measures exactly the model the export check validates.
REDUCED_MUTAN_ATT_OVERRIDES = [
    "model.seq2vec.emb_size=32", "model.seq2vec.hidden_size=64",
    "model.attention.dim_hv=24", "model.attention.dim_hq=24",
    "model.attention.dim_mm=32", "model.attention.R=2",
    "model.fusion.dim_hv=24", "model.fusion.dim_hq=24",
    "model.fusion.dim_mm=32", "model.fusion.R=2",
]


def as_opt_flags(overrides):
    """['k=v', ...] -> ['--opt', 'k=v', '--opt', ...] for the train CLI."""
    out = []
    for kv in overrides:
        out += ["--opt", kv]
    return out
