"""shard_map import shim across jax versions.

The varying-manual-axes checker is disabled: the lane engine's scan
carries start from replicated constants (initial states) and become
device-varying through the loop, which the checker rejects even though
the program is a plain data-parallel map.
"""

try:
    from jax import shard_map as _impl  # jax >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _impl


def shard_map(f, *, mesh, in_specs, out_specs):
    try:
        return _impl(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)
    except TypeError:  # pragma: no cover - older jax spelling
        return _impl(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=False)
