from .kernels import guarded_ratio, na_stringify, sum_with_guard  # noqa: F401
