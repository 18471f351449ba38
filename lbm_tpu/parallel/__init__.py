from . import halo, mesh, pallas_sharded, partition
