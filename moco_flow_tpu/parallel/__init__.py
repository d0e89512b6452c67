from .mesh import DATA_AXIS, dp_jit, fold_key_if, make_mesh, pmean_if

__all__ = ["DATA_AXIS", "dp_jit", "fold_key_if", "make_mesh", "pmean_if"]
