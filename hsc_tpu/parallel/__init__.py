from .mesh import make_mesh, initialize_distributed
from .dp import DataParallelEncoder
from .sp import sp_encode
from .learn import distributed_kmeans_step

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "DataParallelEncoder",
    "sp_encode",
    "distributed_kmeans_step",
]
