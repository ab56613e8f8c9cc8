from .sharded_checker import ShardedChecker, make_mesh

__all__ = ["ShardedChecker", "make_mesh"]
from .sharded_msm import make_sharded_msm  # noqa: E402

__all__.append("make_sharded_msm")
