from . import halo, mesh, partition
