from . import halo, mesh, pallas_sharded, pallas_sharded_3d, partition
