from .sharded_checker import ShardedChecker, make_mesh

__all__ = ["ShardedChecker", "make_mesh"]
