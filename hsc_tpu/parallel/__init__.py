from .mesh import make_mesh, initialize_distributed
from .dp import (
    DataParallelDecoder,
    DataParallelEncoder,
    HierarchicalDataParallelEncoder,
)
from .sp import sp_encode
from .tp import tp_encode
from .learn import distributed_kmeans_step, distributed_kmeans

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "DataParallelDecoder",
    "DataParallelEncoder",
    "HierarchicalDataParallelEncoder",
    "sp_encode",
    "tp_encode",
    "distributed_kmeans_step",
    "distributed_kmeans",
]
