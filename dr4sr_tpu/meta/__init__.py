from dr4sr_tpu.meta.hypergrad import hypergradient, tree_add, tree_scale  # noqa: F401
