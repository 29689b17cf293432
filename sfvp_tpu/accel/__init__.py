from .lbvh import BVH, build_bvh, bvh_from_arrays  # noqa: F401
