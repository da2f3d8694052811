from .mesh import create_mesh, local_mesh
from .svi import DataParallelSVI
from .mcmc import sharded_chain_mcmc

__all__ = [
    "DataParallelSVI",
    "create_mesh",
    "local_mesh",
    "sharded_chain_mcmc",
]
