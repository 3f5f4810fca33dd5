"""A/B the full mxu train step: split pallas MLPs vs the fused PE-field
mega kernel (ops/pallas/fused_pe_field.py).

    python benchmarks/ab_pe_fused.py [impl ...]

Measures ms/step with bench.py's sound chained-dispatch sync.
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # each arg: FIELD_IMPL or FIELD_IMPL:PROP_IMPL
    impls = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["pallas", "pallas-fused"]
    import jax

    from bench import NUM_INNER, _make_bank, measure
    from cropnerf_tpu.models.config import PRESETS

    cfg0 = PRESETS["cropnerf-mxu"]
    bank, n_img = _make_bank()
    for spec in impls:
        impl, _, prop_impl = spec.partition(":")
        prop_impl = prop_impl or cfg0.model.proposal_fields[0].mlp_impl
        cfg = dataclasses.replace(
            cfg0, model=dataclasses.replace(
                cfg0.model,
                field=dataclasses.replace(cfg0.model.field, mlp_impl=impl),
                proposal_fields=tuple(
                    dataclasses.replace(p, mlp_impl=prop_impl)
                    for p in cfg0.model.proposal_fields)))
        rays_per_s, ms = measure(cfg, bank, n_img)
        print(f"field={impl:14s} prop={prop_impl:14s} {ms:8.3f} ms/step   "
              f"{rays_per_s:,.0f} rays/s", flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
