from .intersect import Hit, trace_brute_jnp, moller_trumbore  # noqa: F401
