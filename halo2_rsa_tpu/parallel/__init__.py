from .sharded_checker import ShardedChecker, WireShardedChecker, make_mesh

__all__ = ["ShardedChecker", "WireShardedChecker", "make_mesh"]
from .sharded_msm import make_sharded_msm  # noqa: E402
from .sharded_ntt import intt_sharded, ntt_sharded  # noqa: E402

__all__ += ["make_sharded_msm", "ntt_sharded", "intt_sharded"]


def __getattr__(name):  # lazy: mesh_prove pulls in the whole prover stack
    if name == "MeshKernels":
        from .mesh_prove import MeshKernels

        return MeshKernels
    raise AttributeError(name)


__all__ += ["MeshKernels"]
