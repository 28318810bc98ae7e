from .optimize import optimize_lens, OptimizeConfig  # noqa: F401
