"""Model summary: params + FLOPs.

The reference computes per-layer params/FLOPs with forward hooks
(`get_model_summary`, lib/utils/utils.py:110-242). The TPU-native
equivalent uses XLA's own cost model: `jit(...).lower(...).cost_analysis()`.
"""

from __future__ import annotations

import jax


def model_summary(model, variables, sample_input, train: bool = False) -> dict:
    n_params = sum(int(p.size) for p in jax.tree.leaves(variables["params"]))
    n_stats = sum(
        int(p.size) for p in jax.tree.leaves(variables.get("batch_stats", {}))
    )

    def fwd(v, x):
        return model.apply(v, x, train=train)

    flops = None
    bytes_accessed = None
    try:
        lowered = jax.jit(fwd).lower(variables, sample_input)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        if cost:
            flops = cost.get("flops")
            bytes_accessed = cost.get("bytes accessed")
    except Exception:
        pass

    return {
        "params": n_params,
        "batch_stats": n_stats,
        "flops_per_batch": flops,
        "bytes_accessed_per_batch": bytes_accessed,
    }


def per_layer_summary(model, sample_input, train: bool = False,
                      depth: int = 3) -> str:
    """Per-layer params/FLOPs table (reference `get_model_summary`,
    lib/utils/utils.py:110-242, emitted per layer via forward hooks).
    flax.linen.tabulate computes the same columns from the jaxpr."""
    import flax.linen as nn

    try:
        return nn.tabulate(
            model, jax.random.PRNGKey(0),
            compute_flops=True, depth=depth,
            console_kwargs={"width": 120},
        )(sample_input, train=train)
    except Exception as e:  # cost analysis is best-effort on exotic modules
        return f"(per-layer summary unavailable: {e})"


def format_summary(info: dict, name: str = "model") -> str:
    lines = [f"=> {name} summary"]
    lines.append(f"   params: {info['params'] / 1e6:.2f}M")
    if info.get("flops_per_batch"):
        lines.append(f"   fwd FLOPs/batch: {info['flops_per_batch'] / 1e9:.2f}G")
    if info.get("bytes_accessed_per_batch"):
        lines.append(
            f"   bytes accessed/batch: {info['bytes_accessed_per_batch'] / 1e9:.2f}GB"
        )
    return "\n".join(lines)
